"""HTTP date (RFC 7231 / RFC 1123) formatting and parsing.

Parity target: ``reference/src/java/org/apache/nutch/net/protocols/
HttpDateFormat.java`` — ``FORMAT`` at :48 (``EEE, dd MMM yyyy HH:mm:ss
'GMT'``, Locale.US, UTC) for output, ``PARSE_FORMAT`` at :56 (``EEE, d
MMM yyyy HH:mm:ss z`` — single-digit day-of-month and any timezone
accepted) for input.  Golden vectors ported from
``TestHttpDateFormat.java:35-65`` including the NUTCH-2814 regression
(parsing a PDT date must not shift later GMT formatting — trivially
true here because these helpers are stateless).

Two surfaces:

- Python scalars (``to_string`` / ``to_long`` / ``to_date``) for
  driver-side header synthesis (file protocol listings, WARC record
  headers).  Invalid input raises ``ValueError`` — the ParseException
  twin.
- JVM Column twins (``http_date_col`` / ``parse_http_date_col``) for
  distributed use over header columns.  Formatting is exact.  Parsing
  JVM-side covers the dominant GMT/UTC/UT/+0000 forms (every
  spec-compliant server; Spark's CORRECTED-mode parser cannot consume
  day-of-week names or zone abbreviations, so the weekday token is
  stripped by regexp first); rows in an exotic zone come back NULL and
  callers that must accept them use ``parse_http_date_pdf`` — an
  Arrow-batched twin of the Python scalar.

Scale: formatting/parsing are per-row column expressions inside
whole-stage codegen; no shuffle, no Python in the GMT hot path.
"""

from __future__ import annotations

import datetime as _dt
from email.utils import parsedate_to_datetime

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F

_DAYS = ["Mon", "Tue", "Wed", "Thu", "Fri", "Sat", "Sun"]
_MONTHS = ["Jan", "Feb", "Mar", "Apr", "May", "Jun",
           "Jul", "Aug", "Sep", "Oct", "Nov", "Dec"]


def to_string(millis: int) -> str:
    """HttpDateFormat.toString(long) — RFC 1123, Locale.US, GMT.

    Day/month names are emitted from fixed US tables (not strftime) so
    the output is locale-independent, like the reference's Locale.US.
    """
    t = _dt.datetime.fromtimestamp(millis / 1000.0, tz=_dt.timezone.utc)
    return (
        f"{_DAYS[t.weekday()]}, {t.day:02d} {_MONTHS[t.month - 1]} {t.year:04d} "
        f"{t.hour:02d}:{t.minute:02d}:{t.second:02d} GMT"
    )


def to_date(date_string: str) -> _dt.datetime:
    """HttpDateFormat.toDate — parse, accepting single-digit day and any
    zone name RFC 2822 knows (GMT/UT/EST/PDT/... and numeric offsets).
    Raises ValueError on garbage (the ParseException twin)."""
    d = parsedate_to_datetime(date_string)
    if d.tzinfo is None:  # obsolete military zones parse as naive UTC
        d = d.replace(tzinfo=_dt.timezone.utc)
    return d


def to_long(date_string: str) -> int:
    """HttpDateFormat.toLong — epoch milliseconds."""
    return int(to_date(date_string).timestamp() * 1000)


# ---------------------------------------------------------------------------
# Column twins
# ---------------------------------------------------------------------------

def http_date_col(millis: Column) -> Column:
    """Format epoch-millis to the exact FORMAT string, JVM-side.

    Requires session timezone UTC (nutch_spark.session.get_spark sets
    it); Spark's EEE/MMM formatting names are Locale.US by default.
    """
    return F.date_format(
        F.timestamp_millis(millis.cast("long")), "EEE, dd MMM yyyy HH:mm:ss 'GMT'"
    )


# "Sun, 06 Nov 1994 08:49:37 GMT" -> "06 Nov 1994 08:49:37" for the
# GMT-equivalent zones; the optional weekday prefix is dropped because
# Spark's CORRECTED parser rejects day-of-week patterns in to_timestamp.
_GMT_STRIP = r"^\s*(?:[A-Za-z]{3},\s*)?(\d{1,2} [A-Za-z]{3} \d{4} \d{2}:\d{2}:\d{2})\s*(?:GMT|UTC|UT|\+0000|Z)\s*$"


def parse_http_date_col(s: Column) -> Column:
    """Epoch millis from an HTTP date string, JVM-side (GMT fast path).

    NULL for non-GMT zones or malformed input — pair with
    ``parse_http_date_pdf`` when exotic zones must be accepted.
    """
    core = F.regexp_extract(s, _GMT_STRIP, 1)
    ts = F.to_timestamp(
        F.when(core != "", core), "d MMM yyyy HH:mm:ss"
    )
    return (F.unix_timestamp(ts) * 1000).cast("long")


def _parse_http_date_batch(s: pd.Series) -> pd.Series:
    def one(v):
        if v is None:
            return None
        try:
            return to_long(v)
        except (ValueError, TypeError):
            return None

    return s.map(one).astype("object")


def parse_http_date_pdf(s: Column) -> Column:
    """Arrow-batched full parser (any RFC 2822 zone); NULL on garbage.
    (The udf is built per-call: pandas_udf resolves its return type
    against the active session, so it can't be a module-level global.)"""
    return F.pandas_udf(_parse_http_date_batch, "long")(s)
