"""Composable pipeline steps with timing + row-conservation reports —
the reference's ad-hoc ``t.time()`` prints and eyeballed counts
(mssql.ipynb:770-895, dedup.ipynb:2230) systematized into machine-
readable run reports (SURVEY §5 'reconciliation patterns').

Pipelines are plain callables over DataFrames, so any scheduler can
drive them — the Airflow DAGs (§2.16) reduce to "call this function on
a cadence"; no Airflow dependency in core.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from typing import Callable

from pyspark.sql import DataFrame


@dataclass
class Step:
    name: str
    fn: Callable[[DataFrame], DataFrame]
    # row counting forces a job per step; default off (lazy end-to-end),
    # turn on for audited runs (the reference's dedup audit mode)
    count_rows: bool = False


@dataclass
class StepReport:
    name: str
    seconds: float
    rows_out: int | None = None


@dataclass
class RunReport:
    steps: list[StepReport] = field(default_factory=list)

    @property
    def total_seconds(self) -> float:
        return sum(s.seconds for s in self.steps)

    def as_rows(self) -> list[dict]:
        return [
            {"step": s.name, "seconds": round(s.seconds, 3), "rows_out": s.rows_out}
            for s in self.steps
        ]


class Pipeline:
    """Sequential DataFrame transformation with a run report.

    Lazy by default: steps only build the plan (one Spark job at the
    terminal action, letting Catalyst fuse everything). With
    ``count_rows`` steps, each counted step materializes — use
    deliberately, exactly like the reference's audit counts.
    """

    def __init__(self, *steps: Step):
        self.steps = list(steps)

    def add(self, name: str, fn: Callable[[DataFrame], DataFrame], count_rows: bool = False):
        self.steps.append(Step(name, fn, count_rows))
        return self

    def run_observed(self, df: DataFrame):
        """One-pass funnel accounting via the Observation API: each
        step's output carries an ``observe(count)`` node, so the SINGLE
        terminal action the caller runs yields every step's row count —
        no per-step count() jobs (``run`` with ``count_rows`` pays one
        full materialization per audited step; this pays zero).

        Returns ``(out, finish)``; call ``finish()`` AFTER running an
        action on ``out`` (or a descendant) to collect the RunReport.
        Caveat: observe nodes count rows per EXECUTION — keep the
        downstream plan linear (a self-join above the observed subtree
        re-executes it and double-counts unless the exchange is reused).
        """
        from pyspark.sql import Observation
        from pyspark.sql import functions as F

        observations: list[tuple[str, Observation]] = []
        out = df
        for step in self.steps:
            out = step.fn(out)
            o = Observation()
            out = out.observe(o, F.count(F.lit(1)).alias("rows"))
            observations.append((step.name, o))

        def finish() -> RunReport:
            report = RunReport()
            for name, o in observations:
                report.steps.append(StepReport(name, 0.0, o.get["rows"]))
            return report

        return out, finish

    def run(self, df: DataFrame) -> tuple[DataFrame, RunReport]:
        report = RunReport()
        out = df
        for step in self.steps:
            t0 = time.perf_counter()
            out = step.fn(out)
            rows = out.count() if step.count_rows else None
            report.steps.append(
                StepReport(step.name, time.perf_counter() - t0, rows)
            )
        return out, report


def explain_formatted(df: DataFrame) -> str:
    """``df.explain('formatted')`` as a string — for plan assertions in
    tests (PushedFilters present, no CartesianProduct, broadcast where
    expected)."""
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "formatted"
    )


def plan_contains(df: DataFrame, needle: str) -> bool:
    return needle in explain_formatted(df)
