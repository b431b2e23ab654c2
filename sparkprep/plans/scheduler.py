"""Scheduler adapters for pipelines-as-callables (SURVEY §2.16, OR5).

The reference schedules its production job as an Airflow DAG of four
cloud operators — create_cluster >> create_dataset >> pyspark_task >>
delete_cluster (dag_DataproctoBQ_scheduled.py:31-83, every 15 min).
This engine keeps pipelines as plain callables (plans/pipeline.py), so
"scheduling" reduces to: acquire a session, run the callable, record
the manifest, release the session. This module gives that lifecycle a
name and two drivers:

- :func:`run_scheduled` — the dependency-free path any cron/systemd
  timer/K8s CronJob can invoke (``python -m`` one-liner in the
  docstring), mirroring the reference's create→run→teardown chain with
  SparkSession acquire/stop standing in for cluster create/delete.
- :func:`build_airflow_dag` — an optional-dependency Airflow adapter:
  ONE PythonOperator per lifecycle phase, same >> chain as the
  reference. Import-guarded; environments without Airflow get a clear
  ImportError, and the callable path above is always available.

See ``examples/schedule_loanstats.py`` for the wired-up example.
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass, field
from typing import Any, Callable

from pyspark.sql import SparkSession


@dataclass
class ScheduledJob:
    """A schedulable unit: name + cadence + the pipeline callable.

    ``task`` takes the live SparkSession and returns a JSON-able
    manifest (e.g. :func:`sparkprep.pipelines.run_loanstats_job`'s
    return value). ``schedule`` is a human cadence string recorded in
    the manifest — the EXTERNAL scheduler owns the actual clock, same
    as Airflow's ``schedule_interval`` owned it for the reference.
    """

    name: str
    task: Callable[[SparkSession], dict]
    schedule: str = "@daily"
    session_factory: Callable[[], SparkSession] | None = None
    manifest_dir: str | None = None
    tags: dict = field(default_factory=dict)


def _default_session() -> SparkSession:
    from sparkprep.session import build_session

    return build_session(app_name="sparkprep-scheduled")


def run_scheduled(job: ScheduledJob, stop_session: bool = True) -> dict[str, Any]:
    """One scheduled run: acquire session → run task → persist manifest
    → teardown. The four phases map 1:1 to the reference DAG's operator
    chain; timings per phase land in the manifest so a missed-SLA run
    is diagnosable from the artifact alone.

    ``stop_session=False`` supports warm-session schedulers (repeated
    in-process runs, tests) — teardown then only stamps the phase.
    """
    phases: dict[str, float] = {}

    t0 = time.perf_counter()
    spark = (job.session_factory or _default_session)()
    phases["acquire_session"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    result = job.task(spark)
    phases["run_task"] = time.perf_counter() - t0

    manifest: dict[str, Any] = {
        "job": job.name,
        "schedule": job.schedule,
        "tags": job.tags,
        "phases_sec": {k: round(v, 3) for k, v in phases.items()},
        "result": result,
    }

    t0 = time.perf_counter()
    if job.manifest_dir:
        os.makedirs(job.manifest_dir, exist_ok=True)
        path = os.path.join(job.manifest_dir, f"{job.name}-manifest.json")
        with open(path, "w") as f:
            json.dump(manifest, f, indent=2, default=str)
        manifest["manifest_path"] = path
    if stop_session:
        spark.stop()
    manifest["phases_sec"]["teardown"] = round(time.perf_counter() - t0, 3)
    return manifest


def build_airflow_dag(job: ScheduledJob, **dag_kwargs):
    """Airflow adapter (optional dependency): the reference's operator
    chain with PythonOperators driving the SAME callables cron would —
    acquire >> run >> teardown, scheduled by ``job.schedule``.

    Raises ImportError with guidance when Airflow isn't installed; the
    cron path (:func:`run_scheduled`) needs nothing.
    """
    try:
        from airflow import DAG
        from airflow.operators.python import PythonOperator
    except ImportError as e:  # pragma: no cover - exercised only w/ airflow
        raise ImportError(
            "apache-airflow is not installed; use run_scheduled() from "
            "cron/systemd/K8s CronJob, or install airflow for DAG mode"
        ) from e

    state: dict[str, Any] = {}

    def _acquire():
        state["spark"] = (job.session_factory or _default_session)()

    def _run():
        state["manifest"] = run_scheduled(
            ScheduledJob(
                name=job.name,
                task=job.task,
                schedule=job.schedule,
                session_factory=lambda: state["spark"],
                manifest_dir=job.manifest_dir,
                tags=job.tags,
            ),
            stop_session=False,
        )

    def _teardown():
        state["spark"].stop()

    dag = DAG(dag_id=job.name, schedule=job.schedule, **dag_kwargs)
    acquire = PythonOperator(task_id="acquire_session", python_callable=_acquire, dag=dag)
    run = PythonOperator(task_id="run_pipeline", python_callable=_run, dag=dag)
    teardown = PythonOperator(task_id="teardown", python_callable=_teardown, dag=dag)
    acquire >> run >> teardown
    return dag
