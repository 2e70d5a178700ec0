"""HttpDateFormat parity tests.

Golden vectors ported from
``reference/src/test/org/apache/nutch/net/protocols/TestHttpDateFormat.java``
(:35-65): the RFC example date round-trip, single-digit day-of-month,
garbage -> error, and the NUTCH-2814 PDT regression.
"""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from nutch_spark.data.httpdate import (
    http_date_col,
    parse_http_date_col,
    parse_http_date_pdf,
    to_date,
    to_long,
    to_string,
)

DATE_STRING = "Sun, 06 Nov 1994 08:49:37 GMT"
DATE_MILLIS = 784111777000


def test_http_date_format_roundtrip():
    # TestHttpDateFormat.testHttpDateFormat:38-47
    assert to_long(DATE_STRING) == DATE_MILLIS
    assert to_string(DATE_MILLIS) == DATE_STRING
    assert to_date(DATE_STRING) == dt.datetime(
        1994, 11, 6, 8, 49, 37, tzinfo=dt.timezone.utc
    )
    # single-digit day-of-month accepted on parse
    assert to_long("Sun, 6 Nov 1994 08:49:37 GMT") == DATE_MILLIS


def test_http_date_format_exception():
    # TestHttpDateFormat.testHttpDateFormatException:50-53
    with pytest.raises((ValueError, TypeError)):
        to_long("this is not a valid date")


def test_http_date_format_time_zone():
    # TestHttpDateFormat.testHttpDateFormatTimeZone:59-64 (NUTCH-2814):
    # parsing a PDT date must not disturb GMT formatting, and PDT is
    # seven hours behind GMT.
    pdt = to_long("Mon, 21 Oct 2019 03:18:16 PDT")
    assert to_string(DATE_MILLIS) == DATE_STRING
    assert pdt == to_long("Mon, 21 Oct 2019 10:18:16 GMT")


def test_column_twins(spark):
    rows = [
        (DATE_MILLIS, DATE_STRING),
        (DATE_MILLIS, "Sun, 6 Nov 1994 08:49:37 GMT"),
        (DATE_MILLIS, "Sun, 06 Nov 1994 08:49:37 UTC"),
        (0, "Thu, 01 Jan 1970 00:00:00 GMT"),
    ]
    df = spark.createDataFrame(rows, "millis long, header string")
    got = df.select(
        http_date_col(F.col("millis")).alias("fmt"),
        parse_http_date_col(F.col("header")).alias("parsed"),
        parse_http_date_pdf(F.col("header")).alias("parsed_full"),
    ).collect()
    for (millis, header), r in zip(rows, got):
        assert r["fmt"] == to_string(millis)
        assert r["parsed"] == millis
        assert r["parsed_full"] == millis


def test_column_twin_exotic_zone_and_garbage(spark):
    df = spark.createDataFrame(
        [("Mon, 21 Oct 2019 03:18:16 PDT",), ("not a date",), (None,)],
        "header string",
    )
    got = df.select(
        parse_http_date_col(F.col("header")).alias("gmt_only"),
        parse_http_date_pdf(F.col("header")).alias("full"),
    ).collect()
    # GMT fast path returns NULL for the exotic zone; the pandas twin parses it
    assert got[0]["gmt_only"] is None
    assert got[0]["full"] == to_long("Mon, 21 Oct 2019 03:18:16 PDT")
    assert got[1]["gmt_only"] is None and got[1]["full"] is None
    assert got[2]["gmt_only"] is None and got[2]["full"] is None
