"""SFT training-set prep as a runnable job: event log → chat-template
conversation assembly → turn/char gate → deterministic shard order →
hive-sharded JSONL, with the per-step funnel printed as the manifest.

    python examples/prep_sft.py [sf_dir] [out_dir]

Defaults read the driver testdata events table. Fully deterministic:
the same events + salt yield byte-identical shards (no RNG in the
assembly/gate/order decisions), so reruns are reproducible.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from sparkprep.pipelines.sft_prep import prepare_sft_set  # noqa: E402
from sparkprep.queries import t  # noqa: E402
from sparkprep.session import build_session  # noqa: E402

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/prepared-sft"

if __name__ == "__main__":
    spark = build_session(app_name="sft-prep")
    spark.sparkContext.setLogLevel("WARN")
    # t() absorbs the events table's ts-encoding drift (nanos vs micros)
    ev = t(spark, SF_DIR, "events").select(
        "user_id",
        "ts",
        "event_id",
        F.concat("event_type", F.lit("|"), "props").alias("msg"),
    )
    manifest = prepare_sft_set(
        spark, ev, OUT, num_shards=8, salt="epoch0", min_turns=2
    )
    print(json.dumps(manifest, indent=2))
    spark.stop()
