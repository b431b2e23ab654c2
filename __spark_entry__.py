"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query smoke check at sf0.001.
``queries()``    — one entry per implemented operator (SURVEY.md §2 plus
                   the LLM-pipeline extension ops), registered in
                   ``sparkprep.queries.*``.
``oracle_sql()`` — DuckDB-equivalent ANSI SQL per query key; keys absent
                   here are genuinely non-SQL-expressible and get the
                   driver's rows-only check.

Parity conventions (see sparkprep/queries/__init__.py): identical column
aliases both sides, rounded float aggregates, BIGINT casts for computed
ints, UTC session timezone.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from sparkprep.queries import registry  # noqa: E402

DEFAULT_SF = "/root/testdata/sf0.001"

_QUERIES, _ORACLES = registry()


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return _QUERIES["pricing_summary"](spark, DEFAULT_SF)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(_QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(_ORACLES)
