"""Physical-layout techniques from the scale brief: bucketed co-located
joins (no exchange) and partition pruning (no I/O for pruned values) —
asserted on the actual plans."""

import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from sparkprep.sources.writers import write_bucketed, write_partitioned


def _simple(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "simple")


def test_bucketed_join_has_no_exchange(spark, sf_dir):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    lineitem = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    write_bucketed(orders, "orders_b", ["o_orderkey"], 8, sort_cols=["o_orderkey"])
    write_bucketed(lineitem, "lineitem_b", ["l_orderkey"], 8, sort_cols=["l_orderkey"])
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        a = spark.table("orders_b")
        b = spark.table("lineitem_b")
        joined = a.join(b, a.o_orderkey == b.l_orderkey).select("o_orderkey", "l_quantity")
        plan = _simple(joined)
        assert "SortMergeJoin" in plan
        assert "Exchange hashpartitioning" not in plan  # co-located: no shuffle
        # correctness unchanged
        plain = orders.join(
            lineitem, orders.o_orderkey == lineitem.l_orderkey
        ).count()
        assert joined.count() == plain
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE IF EXISTS orders_b")
        spark.sql("DROP TABLE IF EXISTS lineitem_b")


def test_partition_pruning(spark, sf_dir):
    from sparkprep.queries import t as load_table

    out = tempfile.mkdtemp(prefix="sparkprep-part-")
    try:
        ev = load_table(spark, sf_dir, "events")
        write_partitioned(ev, out, ["event_type"])
        back = spark.read.parquet(out)
        q = back.filter(F.col("event_type") == "click").select("event_id")
        plan = q._sc._jvm.PythonSQLUtils.explainString(q._jdf.queryExecution(), "formatted")
        assert "PartitionFilters: [isnotnull(event_type" in plan
        # pruning is real: only the click partition's rows are read
        clicks = ev.filter(F.col("event_type") == "click").count()
        assert q.count() == clicks
    finally:
        shutil.rmtree(out, ignore_errors=True)

def test_compact_files_reduces_file_count(spark, sf_dir, tmp_path):
    from sparkprep.operators.physical import compact_files

    src = str(tmp_path / "fragmented")
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    docs.repartition(37).write.parquet(src)
    dst = str(tmp_path / "compacted")
    manifest = compact_files(spark, src, dst)
    assert manifest["files_before"] == 37
    assert manifest["files_after"] < manifest["files_before"]
    back = spark.read.parquet(dst)
    assert back.count() == manifest["rows"] == docs.count()


def test_max_records_per_file_bounds_files(spark, sf_dir, tmp_path):
    import glob

    from sparkprep.sources.writers import write_parquet

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet")).coalesce(1)
    out = str(tmp_path / "bounded")
    write_parquet(docs, out, max_records_per_file=100)
    parts = glob.glob(os.path.join(out, "part-*"))
    total = docs.count()
    assert len(parts) >= -(-total // 100)
    for p in parts:
        import pyarrow.parquet as pq

        assert pq.read_metadata(p).num_rows <= 100


def test_merge_schema_reads_evolved_table(spark, tmp_path):
    from pyspark.sql import functions as F

    from sparkprep.sources.readers import read_parquet

    base = str(tmp_path / "evolve")
    spark.range(10).select(F.col("id").alias("a")).write.parquet(base + "/e1")
    spark.range(10).select(
        F.col("id").alias("a"), (F.col("id") * 2).alias("b")
    ).write.parquet(base + "/e2")
    merged = read_parquet(spark, base + "/e*", merge_schema=True)
    assert set(merged.columns) == {"a", "b"}
    assert merged.count() == 20
    assert merged.filter(F.col("b").isNull()).count() == 10


def test_file_skipping_report_detects_clustered_layout(spark, sf_dir, tmp_path):
    from sparkprep.operators import physical

    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select("event_id", "value")

    rand_dir = str(tmp_path / "random")
    sort_dir = str(tmp_path / "sorted")
    # unclustered: hash-repartitioned on an unrelated key
    ev.repartition(8, "event_id").write.parquet(rand_dir)
    # clustered: range-partitioned and sorted by the probe column
    ev.repartitionByRange(8, "value").sortWithinPartitions("value").write.parquet(sort_dir)

    rep_rand = physical.file_skipping_report(spark.read.parquet(rand_dir), "value")
    rep_sort = physical.file_skipping_report(spark.read.parquet(sort_dir), "value")
    s_rand = physical.clustering_summary(rep_rand).collect()[0]
    s_sort = physical.clustering_summary(rep_sort).collect()[0]

    assert s_rand.n_files >= 8 and s_sort.n_files >= 2
    # random layout: every file spans most of the range (the heavy-tail
    # max compresses fractions below 1.0); sorted layout: narrow slices
    assert s_rand.avg_span_frac > 0.6
    assert s_sort.avg_span_frac < 0.5
    assert s_sort.avg_span_frac < s_rand.avg_span_frac / 2
    # per-file rows carry usable zone-map bounds
    r = rep_sort.collect()
    assert all(row.col_min <= row.col_max for row in r)
    assert sum(row.n_rows for row in r) == ev.count()


# --- layout advisor (round 9): pruning_sim's verdict in the write path ----


def _advisor_frame(spark):
    # x sorted-friendly (16 dense sweeps of the domain), y an
    # INDEPENDENT hash dimension: a linear x-sort clusters x perfectly
    # and scatters y, and vice versa — the sorted-vs-hash tension
    # z-order splits. (An earlier cut used (id*K) % 4096 for y, which
    # is a fixed bijection of x mod 4096 — degenerate: every layout
    # tied. xxhash64 breaks the dependence.)
    return spark.range(65_536).select(
        (F.col("id") % 4096).alias("x"),
        F.pmod(F.xxhash64("id"), 4096).alias("y"),
    )


_PANEL = [
    ("x:block", {"x": (1024, 1280)}),
    ("y:block", {"y": (1024, 1280)}),
    ("x&y", {"x": (1024, 1280), "y": (1024, 1280)}),
]


def test_layout_advisor_single_dim_prefers_linear(spark):
    from sparkprep.operators.physical import layout_advisor

    df = _advisor_frame(spark)
    # x-only workload: the x-sorted linear layout must dominate
    adv = layout_advisor(df, ["x", "y"], [_PANEL[0]], num_files=64)
    by = {(r["layout"], r["predicate"]): r["files_scanned"] for r in adv["table"]}
    assert adv["recommended"] == "linear:x"
    assert by[("linear:x", "x:block")] <= 6  # 256/4096 of the range ≈ 4 files
    assert by[("linear:y", "x:block")] == 64  # scatters x: scans everything


def test_layout_advisor_mixed_panel_prefers_zorder(spark):
    from sparkprep.operators.physical import layout_advisor

    df = _advisor_frame(spark)
    adv = layout_advisor(df, ["x", "y"], _PANEL, num_files=64)
    assert adv["recommended"] == "zorder"
    # z-order strictly beats each single-dimension sort on the mix
    assert adv["per_layout"]["zorder"] < adv["per_layout"]["linear:x"]
    assert adv["per_layout"]["zorder"] < adv["per_layout"]["linear:y"]
    # and buys the second dimension without fully giving up the first:
    # every predicate prunes most files under z-order (the 64 files
    # tile z-space ~8x8, so a 256-wide band touches ~1 block column)
    zrows = {r["predicate"]: r["files_scanned"] for r in adv["table"]
             if r["layout"] == "zorder"}
    assert zrows["x:block"] <= 20 and zrows["y:block"] <= 20
    assert zrows["x&y"] <= 6


def test_layout_advisor_apply_matches_simulation(spark, tmp_path):
    # the written files' REAL min/max zone maps must reproduce the
    # simulated scan counts (within the repartitionByRange sampler's
    # boundary slack — the simulation assigns exact ntile boundaries,
    # the writer samples them)
    import duckdb

    from sparkprep.sources.writers import write_laid_out

    df = _advisor_frame(spark)
    path = str(tmp_path / "laid")
    adv = write_laid_out(df, path, ["x", "y"], _PANEL, num_files=64)
    assert adv["recommended"] == "zorder"
    sim = {
        r["predicate"]: r["files_scanned"]
        for r in adv["table"]
        if r["layout"] == "zorder"
    }
    con = duckdb.connect()
    n_files = con.execute(
        f"SELECT count(DISTINCT filename) FROM read_parquet('{path}/*.parquet', filename=true)"
    ).fetchone()[0]
    assert n_files >= 32  # sampler may merge a few of the 64 ranges
    real = {}
    for label, ranges in _PANEL:
        conds = " AND ".join(
            f"NOT (hi_{c} < {lo} OR lo_{c} >= {hi})"
            for c, (lo, hi) in ranges.items()
        )
        real[label] = con.execute(
            "SELECT sum(hit::BIGINT) FROM ("
            f"  SELECT ({conds}) AS hit FROM ("
            "    SELECT filename, min(x) lo_x, max(x) hi_x,"
            "           min(y) lo_y, max(y) hi_y"
            f"   FROM read_parquet('{path}/*.parquet', filename=true)"
            "    GROUP BY filename))"
        ).fetchone()[0]
    for label in sim:
        # same pruning story: scans a small minority of files, within
        # a few boundary files of the exact-ntile simulation
        assert abs(real[label] - sim[label]) <= 6, (label, sim, real)
        assert real[label] < n_files / 2


def test_layout_advisor_validates_inputs(spark):
    from sparkprep.operators.physical import layout_advisor

    df = _advisor_frame(spark)
    with pytest.raises(ValueError):
        layout_advisor(df, [], _PANEL)
    with pytest.raises(ValueError):
        layout_advisor(df, ["x"], [("bad", {"z": (0, 1)})])


def test_footer_skipping_report_matches_scan_report(spark, tmp_path):
    # footer-only zone maps must agree with the ground truth computed
    # by actually scanning the data (DuckDB per-file min/max)
    import duckdb

    from sparkprep.operators.physical import footer_skipping_report
    from sparkprep.sources.writers import write_laid_out

    df = _advisor_frame(spark)
    path = str(tmp_path / "laid_f")
    write_laid_out(df, path, ["x", "y"], _PANEL, num_files=16)
    rep = footer_skipping_report(spark, path, ["x", "y"]).toPandas()
    assert (rep["n_rows"] > 0).all()
    con = duckdb.connect()
    truth = con.execute(
        "SELECT regexp_extract(filename, '[^/]+$') AS file,"
        "       count(*) AS n, min(x) x_lo, max(x) x_hi,"
        "       min(y) y_lo, max(y) y_hi"
        f" FROM read_parquet('{path}/*.parquet', filename=true) GROUP BY 1"
    ).fetchdf().set_index("file")
    # one row group per file at this size: fold footer rows per file
    folded = rep.groupby("file").agg(
        n=("n_rows", "sum"), x_lo=("x_min", "min"), x_hi=("x_max", "max"),
        y_lo=("y_min", "min"), y_hi=("y_max", "max"))
    assert set(folded.index) == set(truth.index)
    for f in folded.index:
        assert folded.loc[f, "n"] == truth.loc[f, "n"]
        assert folded.loc[f, "x_lo"] == truth.loc[f, "x_lo"]
        assert folded.loc[f, "x_hi"] == truth.loc[f, "x_hi"]
        assert folded.loc[f, "y_lo"] == truth.loc[f, "y_lo"]
        assert folded.loc[f, "y_hi"] == truth.loc[f, "y_hi"]


def test_footer_skipping_report_validates(spark, tmp_path):
    from sparkprep.operators.physical import footer_skipping_report

    with pytest.raises(ValueError):
        footer_skipping_report(spark, str(tmp_path / "empty_dir_nothing"), ["x"])
    df = _advisor_frame(spark).limit(100)
    p = str(tmp_path / "one")
    df.coalesce(1).write.parquet(p)
    with pytest.raises(Exception, match="not in footer schema"):
        footer_skipping_report(spark, p, ["zzz"]).collect()


def test_footer_skipping_report_tolerates_empty_file(spark, tmp_path):
    """ADVICE r9: a zero-row-group parquet file must contribute zero
    report rows, not a misleading 'columns not in footer schema' error
    (column indices now come from the file schema, which exists even
    with no row groups)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from sparkprep.operators.physical import footer_skipping_report

    d = tmp_path / "mix"
    d.mkdir()
    full = pa.table({"x": pa.array([1, 2, 3], pa.int64())})
    pq.write_table(full, str(d / "full.parquet"))
    # a genuinely zero-row-group file: open/close a writer without
    # writing (pq.write_table of a 0-row table emits ONE empty row
    # group on this pyarrow — cover that shape separately below)
    pq.ParquetWriter(str(d / "empty.parquet"), full.schema).close()
    assert pq.ParquetFile(str(d / "empty.parquet")).metadata.num_row_groups == 0
    pq.write_table(full.slice(0, 0), str(d / "zero_rg.parquet"))

    rep = footer_skipping_report(spark, str(d), ["x"]).toPandas()
    # zero-row-group file contributes nothing; an empty ROW GROUP (if
    # the writer emitted one) contributes an n_rows=0 row at most
    assert "full.parquet" in set(rep["file"])
    assert "empty.parquet" not in set(rep["file"])
    assert rep["n_rows"].sum() == 3
    zr = rep[rep["file"] == "zero_rg.parquet"]
    assert (zr["n_rows"] == 0).all()
    # the schema check still fires for genuinely absent columns,
    # including on the empty file
    with pytest.raises(Exception, match="not in footer schema"):
        footer_skipping_report(spark, str(d / "empty.parquet"), ["zzz"]).collect()
