"""X11/S3 — Apache/NASA log parsing, fully native.

The reference (nasa.py:35-117) parses Apache Common Log prefixes with a
Python ``re`` + ``time.mktime`` pipeline over an RDD of ``Row`` objects:

    '(\\S*) - - \\[(\\d{2})\\/(\\S*)\\/(\\d{4}):(\\d{2}):(\\d{2}):(\\d{2}) (\\S*)\\]'

then rejoins the pieces and ``strptime('%Y-%b-%d %H:%M:%S')`` → epoch →
TimestampType cast (nasa.py:117). Every row crosses the JVM→Python
boundary twice. Here the same parse is 8 ``regexp_extract`` + one
``to_timestamp``, all inside whole-stage codegen; unparsable lines yield
all-null fields (mirroring the reference's all-None Row at nasa.py:67-91)
and are dropped by the same ``dropna(how='any')`` step.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

APACHE_LOG_PATTERN = r"(\S*) - - \[(\d{2})\/(\S*)\/(\d{4}):(\d{2}):(\d{2}):(\d{2}) (\S*)\]"

_FIELDS = [
    ("ip_addr", 1, "string"),
    ("day_of_month", 2, "string"),
    ("month", 3, "string"),
    ("year", 4, "string"),
    ("hour", 5, "int"),
    ("minute", 6, "int"),
    ("second", 7, "int"),
    ("timezone", 8, "string"),
]


def parse_apache_log(df: DataFrame, value_col: str = "value", drop_unparsed: bool = True) -> DataFrame:
    """Parse a text DataFrame of Apache log lines into the reference's
    schema (nasa.py:78-91,117): ip_addr, day_of_month, month, year,
    hour/minute/second int, timezone, datetime_stamp timestamp.

    ``regexp_extract`` returns '' on no-match; we convert '' → null so
    unparsed lines become all-null rows exactly like the reference's
    ``None``-filled Row, then optionally drop them (nasa.py:117 dropna).
    """
    src = F.col(value_col)
    matched = src.rlike(APACHE_LOG_PATTERN)
    out = df
    for name, idx, typ in _FIELDS:
        extracted = F.regexp_extract(src, APACHE_LOG_PATTERN, idx)
        out = out.withColumn(name, F.when(matched, extracted).cast(typ))
    # reference: '-'.join([year, month, day]) + ' HH:MM:SS' via
    # time.mktime(strptime('%Y-%b-%d %H:%M:%S')) → TimestampType
    stamp = F.concat_ws(
        " ",
        F.concat_ws("-", F.col("year"), F.col("month"), F.col("day_of_month")),
        F.concat_ws(
            ":",
            F.lpad(F.col("hour").cast("string"), 2, "0"),
            F.lpad(F.col("minute").cast("string"), 2, "0"),
            F.lpad(F.col("second").cast("string"), 2, "0"),
        ),
    )
    out = out.withColumn("datetime_stamp", F.to_timestamp(stamp, "yyyy-MMM-dd HH:mm:ss"))
    out = out.drop(value_col)
    if drop_unparsed:
        out = out.na.drop(how="any")
    return out
