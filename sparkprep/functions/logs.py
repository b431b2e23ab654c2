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


_SEP = ""


def parse_apache_log(df: DataFrame, value_col: str = "value", drop_unparsed: bool = True) -> DataFrame:
    """Parse a text DataFrame of Apache log lines into the reference's
    schema (nasa.py:78-91,117): ip_addr, day_of_month, month, year,
    hour/minute/second int, timezone, datetime_stamp timestamp.

    Perf shape: the naive form (one ``regexp_extract`` per field + a
    ``when(rlike)`` guard, then a timestamp built from those fields) runs
    the regex ~16x per row once Catalyst inlines the withColumn tower —
    measured 9.6s for 100k rows. Instead we run the regex ONCE per row:
    ``regexp_replace`` rewrites the line into a \\x01-delimited record,
    ``split`` makes it an array column, and every field is a cheap
    ``element_at``. The array is materialized in its own projection;
    CollapseProject won't inline a non-cheap expression referenced 9
    times, so the regex genuinely evaluates once. Measured ~1s for the
    same input.

    Unparsed lines (regexp_replace leaves them unchanged → 1-element
    array) yield all-null rows, mirroring the reference's ``None``-filled
    Row, then optionally dropped (nasa.py:117 dropna).
    """
    src = F.col(value_col)
    repl = _SEP.join(f"${i}" for i in range(1, 9))
    parts_expr = F.split(
        F.regexp_replace(src, "^" + APACHE_LOG_PATTERN + ".*$", repl), _SEP
    )
    staged = df.withColumn("__parts", parts_expr)
    ok = F.size(F.col("__parts")) == 8
    if drop_unparsed:
        # Filter BEFORE the field projection, on the parse validity
        # alone. Filtering after (na.drop over the 9 computed fields)
        # gets predicate-pushed below the projection with every CASE
        # re-expanded — 24 regex evals/row in the Filter (measured 10s
        # for 100k rows vs ~1s this way).
        staged = staged.filter(ok)

    def guard(expr):
        return expr if drop_unparsed else F.when(ok, expr)

    cols = []
    for name, idx, typ in _FIELDS:
        cols.append(guard(F.element_at("__parts", idx)).cast(typ).alias(name))
    # reference: '-'.join([year, month, day]) + ' HH:MM:SS' via
    # time.mktime(strptime('%Y-%b-%d %H:%M:%S')) → TimestampType
    get = lambda i: F.element_at("__parts", i)  # noqa: E731
    stamp = F.concat_ws(
        " ",
        F.concat_ws("-", get(4), get(3), get(2)),
        F.concat_ws(":", get(5), get(6), get(7)),
    )
    cols.append(
        guard(F.to_timestamp(stamp, "yyyy-MMM-dd HH:mm:ss")).alias("datetime_stamp")
    )
    passthrough = [c for c in df.columns if c != value_col]
    return staged.select(*passthrough, *cols)
