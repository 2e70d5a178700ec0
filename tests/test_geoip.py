"""index-geoip: broadcast geo enrichment semantics
(GeoIPIndexingFilter.java:140-230, GeoIPDocumentCreator.java:70-190)."""

import pytest

from nutch_spark.operators.geoip import USAGE_FIELDS, geoip_index, load_maxmind


def _geodb(spark):
    return spark.createDataFrame(
        [
            ("1.2.3.4", "Minneapolis", "US", None),
            ("5.6.7.8", "Berlin", "DE", "10115"),
        ],
        "ip string, cityName string, countryIsoCode string, postalCode string",
    ).selectExpr(
        "ip",
        "cityName",
        "'NA' AS continentCode",
        "'NorthAm' AS continentName",
        "countryIsoCode",
        "'X' AS countryName",
        "'1.0,2.0' AS latLon",
        "CAST(3 AS INT) AS accRadius",
        "'UTC' AS timeZone",
        "postalCode",
        "'Sub' AS subDivName",
        "'S1' AS subDivIsoCode",
    )


def test_city_join_and_null_passthrough(spark):
    docs = spark.createDataFrame(
        [("u1", "1.2.3.4"), ("u2", "5.6.7.8"), ("u3", None), ("u4", "9.9.9.9")],
        "url string, ip string",
    )
    out = {r["url"]: r for r in geoip_index(docs, _geodb(spark)).collect()}
    assert out["u1"]["cityName"] == "Minneapolis"
    # addIfNotNull: a null attribute simply isn't added
    assert out["u1"]["postalCode"] is None
    assert out["u2"]["postalCode"] == "10115"
    # unresolved / unknown IPs keep the doc, all geo fields null
    assert out["u3"]["cityName"] is None
    assert out["u4"]["cityName"] is None
    assert len(out) == 4


def test_usage_validation(spark):
    docs = spark.createDataFrame([("u", "1.1.1.1")], "url string, ip string")
    with pytest.raises(ValueError, match="unknown index.geoip.usage"):
        geoip_index(docs, _geodb(spark), usage="satelliteDatabase")
    with pytest.raises(ValueError, match="lacks ispDatabase columns"):
        geoip_index(docs, _geodb(spark), usage="ispDatabase")
    assert set(USAGE_FIELDS) == {
        "cityDatabase",
        "ispDatabase",
        "domainDatabase",
        "connectionTypeDatabase",
    }


def test_maxmind_reader_is_honestly_stubbed():
    with pytest.raises(NotImplementedError):
        load_maxmind("/nonexistent/GeoIP2-City.mmdb")


def test_collision_with_existing_columns_fails_fast(spark):
    docs = spark.createDataFrame(
        [("u", "1.2.3.4", "old-city")],
        "url string, ip string, cityName string",
    )
    with pytest.raises(ValueError, match="already carry geo columns"):
        geoip_index(docs, _geodb(spark))
