"""Scheduled EP1 job — the engine's answer to the reference's Airflow
DAG (dag_DataproctoBQ_scheduled.py:45-83: create_cluster >>
create_dataset >> pyspark_task >> delete_cluster every 15 min).

Cron path (no dependencies beyond the engine):

    */15 * * * * python /path/to/examples/schedule_loanstats.py

Airflow path: drop this file in the dags/ folder — when airflow is
importable, ``dag`` below is a real three-task DAG of the same
lifecycle; without it, the module still runs standalone.
"""

import os

from sparkprep.pipelines import run_loanstats_job
from sparkprep.plans.scheduler import ScheduledJob, build_airflow_dag, run_scheduled

CSV_PATH = os.environ.get("LOANSTATS_CSV", "/data/loanstats/LoanStats_web.csv")
STAGING = os.environ.get("LOANSTATS_STAGING", "/tmp/loanstats-staging")
MANIFESTS = os.environ.get("LOANSTATS_MANIFESTS", "/tmp/loanstats-manifests")

job = ScheduledJob(
    name="loanstats_ep1",
    schedule="*/15 * * * *",
    task=lambda spark: run_loanstats_job(
        spark, CSV_PATH, STAGING, dataset="loans", table="loanstats"
    ),
    manifest_dir=MANIFESTS,
    tags={"pipeline": "ep1", "sink": "bq_staged_load"},
)

try:  # Airflow present -> expose the DAG for the scheduler to pick up
    dag = build_airflow_dag(job, start_date=None, catchup=False)
except ImportError:
    dag = None

if __name__ == "__main__":
    manifest = run_scheduled(job)
    print(manifest["phases_sec"], "->", manifest.get("manifest_path"))
