"""LLM training-corpus prep as a runnable job: Gopher quality gate →
exact dedup → MinHash-LSH near-dedup → deterministic shard order →
hive-sharded JSONL, with the per-step funnel printed as the manifest.

    python examples/prep_corpus.py [sf_dir] [out_dir]

Defaults read the driver testdata documents table. Fully deterministic:
the same corpus + salt yields byte-identical shards (no RNG anywhere in
the keep/drop/order decisions), so reruns are reproducible and any
engine can replay the decisions.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sparkprep.pipelines.corpus_prep import prepare_training_corpus  # noqa: E402
from sparkprep.session import build_session  # noqa: E402

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/prepared-corpus"

if __name__ == "__main__":
    spark = build_session(app_name="corpus-prep")
    spark.sparkContext.setLogLevel("WARN")
    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    manifest = prepare_training_corpus(
        spark, docs, OUT, num_shards=8, salt="epoch0"
    )
    print(json.dumps(manifest, indent=2))
    spark.stop()
