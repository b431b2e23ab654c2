"""Similarity search over embedding columns (north-star extension ops):
brute-force cosine top-k as correctness baseline, LSH-bucketed and
IVF-style variants as the scale paths, plus embedding-cosine near-dup.

Vector math strategies, by scale:
- **native** (``F.zip_with`` + ``F.aggregate``): pure Catalyst, fully
  engine-reproducible (oracle-checkable), fine up to ~10^5 pairs.
  Higher-order lambdas run interpreted, so this is NOT the 100 TB path.
- **arrow** (``mapInPandas`` + numpy): vectorized BLAS dot products over
  Arrow batches against a broadcast query matrix — the scale path for
  brute force; ~100x the native throughput.
- **lsh / ivf**: prune the corpus before any exact math — the real
  100 TB answer: candidates via random-hyperplane buckets (or coarse
  centroids), exact rerank only within buckets.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd  # module-level so pandas_udf type hints resolve
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from sparkprep.checkpointing import lazy_checkpoint


#: max vectors per folded bucket row in the Arrow verify stages — at
#: 1024-dim doubles one block row is <= 4096 * 8 KiB = 32 MiB, safely
#: inside executor memory and Arrow record-size limits.
BUCKET_BLOCK_CAP = 4096


def _id_ddl(df: DataFrame, id_col: str) -> str:
    """DDL type of the id column, interpolated into every Arrow
    mapInPandas / pandas_udf schema string — the arrow twins must not
    silently assume bigint ids when the native engine handles any
    orderable id type (ADVICE r9)."""
    return df.schema[id_col].dataType.simpleString()


def dot_native(a, b) -> Column:
    """Order-stable dot product: left fold over zip_with products, all
    in double (float32 summation differs across engines)."""
    prod = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prod, F.lit(0.0), lambda acc, x: acc + x)


def norm_native(a) -> Column:
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double"))
    )


def _unit_vector(vec_col, norm_col) -> Column:
    """x_i / norm, with the norm evaluated ONCE per row. A plain
    ``transform(v, x -> try_divide(x, __n))`` is a trap: CollapseProject
    inlines a single-use ``__n`` alias into the lambda body, and
    interpreted HOFs then re-evaluate the whole norm fold PER ELEMENT
    (64 folds per 64-dim vector — 7x measured on the unit stage).
    Routing the norm through ``array_repeat`` keeps it an argument
    expression (one evaluation per row) no matter what the optimizer
    collapses; the lambda touches only its own variables. try_divide:
    a zero-norm vector must yield NULL units, not an ANSI
    DIVIDE_BY_ZERO that kills the corpus-wide job. Values are
    bit-identical to the transform form."""
    return F.zip_with(
        vec_col,
        F.array_repeat(norm_col, F.size(vec_col)),
        lambda x, n: F.try_divide(x.cast("double"), n),
    )


def cosine_native(a, b) -> Column:
    """try_divide, not ``/``: ANSI mode (Spark 4 default) throws
    DIVIDE_BY_ZERO on a zero-norm vector — one all-zeros embedding in a
    100 TB corpus would kill the whole job. NULL cosine falls out of
    every >= / top-k comparison naturally."""
    return F.try_divide(dot_native(a, b), norm_native(a) * norm_native(b))


def cosine_from_norms(a, b, na, nb) -> Column:
    """:func:`cosine_native` with the two norms precomputed per ROW —
    attach ``norm_native`` as a column on each JOIN SIDE so the
    per-pair work is ONE interpreted dot fold instead of dot + 2 norm
    folds (the norms otherwise re-run per candidate pair: 3x the fold
    cost on every rerank fan-out). Bit-identical to cosine_native:
    same dot, same ``na * nb`` product, same try_divide."""
    return F.try_divide(dot_native(a, b), na * nb)


def cosine_topk_native(
    emb_df: DataFrame,
    query_df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    round_to: int = 4,
) -> DataFrame:
    """Brute-force top-k neighbors for each query vector, native
    expressions only (oracle-reproducible).

    Plan shape: broadcast the (small) query side against the corpus —
    a broadcast-nested-loop join, each task scoring its corpus slice
    against all queries — then per-query top-k via window row_number
    (partition count = #queries, tiny). No corpus shuffle at all.
    """
    from pyspark.sql.window import Window

    # norms attached per JOIN SIDE (one fold per row), so the per-pair
    # rerank is a single dot fold — bit-identical, see cosine_from_norms
    q = query_df.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("__qv"),
        norm_native(F.col(vec_col)).alias("__qn"),
    )
    c = emb_df.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__cv"),
        norm_native(F.col(vec_col)).alias("__cn"),
    )
    scored = (
        c.join(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            cosine_from_norms(
                F.col("__qv"), F.col("__cv"), F.col("__qn"), F.col("__cn")
            ).alias("__cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("__cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            F.col("rank").cast("long").alias("rank"),
            F.round("__cos", round_to).alias("cosine"),
        )
    )


def cosine_topk_arrow(
    emb_df: DataFrame,
    query_vecs: dict[int, list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
) -> DataFrame:
    """Brute-force top-k with numpy over Arrow batches — the scale-path
    twin of :func:`cosine_topk_native`.

    The query matrix rides inside the serialized closure (broadcast by
    Spark); each Arrow batch computes a (batch x queries) GEMM and emits
    only per-batch top-k, so the driver-side reduce is tiny. Final exact
    top-k via groupBy window on batch winners (k * num_batches rows).
    """
    import pandas as pd
    from pyspark.sql.window import Window

    qids = sorted(query_vecs)
    qmat = np.asarray([query_vecs[i] for i in qids], dtype=np.float64)
    qnorm = np.linalg.norm(qmat, axis=1)

    idt = _id_ddl(emb_df, id_col)
    out_schema = f"query_id {idt}, neighbor_id {idt}, cosine double"

    def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            ids = pdf[id_col].to_numpy()
            mat = np.asarray(list(pdf[vec_col]), dtype=np.float64)
            sims = (mat @ qmat.T) / (
                np.linalg.norm(mat, axis=1)[:, None] * qnorm[None, :]
            )
            frames = []
            for j, qid in enumerate(qids):
                col = sims[:, j]
                keep = min(k + 1, len(col))
                top = np.argpartition(-col, keep - 1)[:keep]
                frames.append(
                    pd.DataFrame(
                        {
                            "query_id": qid,
                            "neighbor_id": ids[top],
                            "cosine": col[top],
                        }
                    )
                )
            yield pd.concat(frames, ignore_index=True)

    scored = emb_df.select(id_col, vec_col).mapInPandas(score, out_schema)
    scored = scored.filter(F.col("neighbor_id") != F.col("query_id"))
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.col("rank").cast("long"), F.round("cosine", 4).alias("cosine"))
    )


def hyperplane_dots(vec_col, planes: np.ndarray) -> Column:
    """Per-plane dot products as ONE array<double> column — the shared
    base for both the bucket signature and multi-probe margin ranking
    (|dot| = distance to the hyperplane = flip confidence). Left-fold
    summation keeps the result bit-identical to any engine that sums
    sequentially (the oracle contract)."""
    return F.array(
        *[
            F.aggregate(
                F.zip_with(
                    vec_col,
                    F.array(*[F.lit(float(x)) for x in plane]),
                    lambda x, y: x.cast("double") * y,
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            for plane in planes
        ]
    )


def signature_from_dots(dots_col, num_planes: int) -> Column:
    """Bucket id from a MATERIALIZED dots column (pass ``F.col``, not
    the dots expression — interpreted lambdas re-evaluate embedded
    trees, see the near-dup norm note below)."""
    bits = [
        F.when(dots_col[b] >= 0, F.lit(1 << b).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        for b in range(num_planes)
    ]
    return sum(bits)


def hyperplane_signature(vec_col, planes: np.ndarray) -> Column:
    """Random-hyperplane LSH signature: bit b = sign(<v, plane_b>).
    Planes are plan literals (seeded numpy), so signatures are
    deterministic across runs and engines."""
    bits = []
    for b, plane in enumerate(planes):
        dot = F.aggregate(
            F.zip_with(
                vec_col,
                F.array(*[F.lit(float(x)) for x in plane]),
                lambda x, y: x.cast("double") * y,
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bits.append(F.when(dot >= 0, F.lit(1 << b).cast("long")).otherwise(F.lit(0).cast("long")))
    return sum(bits)


def ann_lsh_topk(
    emb_df: DataFrame,
    query_df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    num_planes: int = 8,
    dim: int = 64,
    seed: int = 42,
    round_to: int = 4,
    num_probes: int = 1,
    engine: str = "native",
) -> DataFrame:
    """Approximate top-k: random-hyperplane bucket join, exact cosine
    rerank only inside the probed buckets.

    At 100 TB the corpus signature is computed once and bucketed
    (optionally persisted bucketed-by-signature); each query touches
    ~num_probes * corpus/2^planes vectors. ``num_probes > 1`` enables
    multi-probe: beyond the exact bucket, the query also probes the
    buckets reached by flipping its ``num_probes - 1``
    lowest-|margin| sign bits (the planes it sits closest to — where
    a true neighbor most likely landed on the other side). Probe
    signatures are all distinct, so a corpus vector (one bucket) can
    match a query at most once — no candidate dedup shuffle needed.
    Multi-probe recovers the near-boundary recall single-probe loses
    WITHOUT touching the corpus side: only the (tiny, broadcast)
    query side explodes.

    ``engine='arrow'`` vectorizes the CORPUS signature (the wide-vector
    cost center: num_planes x dims interpreted evals per row — 38.6s
    at 50k x 1024-dim measured) as one GEMM per Arrow batch emitting
    only (id, sig); the vectors themselves never cross the JVM→Python
    boundary — the signature joins back to the corpus by id. The
    rerank (probed buckets only) and query side stay native: both are
    panel-bounded.
    """
    from pyspark.sql.window import Window

    rng = np.random.RandomState(seed)
    planes = rng.normal(size=(num_planes, dim))

    if engine == "arrow":
        pmat = planes.T
        bits = np.power(2.0, np.arange(num_planes))

        def corpus_sig(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                if pdf.empty:
                    continue
                mat = np.asarray(list(pdf[vec_col]), dtype=np.float64)
                sig = (((mat @ pmat) >= 0) @ bits).astype(np.int64)
                yield pd.DataFrame({id_col: pdf[id_col].to_numpy(), "__sig": sig})

        sigs = emb_df.select(id_col, vec_col).mapInPandas(
            corpus_sig, f"{id_col} {_id_ddl(emb_df, id_col)}, __sig long"
        )
        c = emb_df.select(
            F.col(id_col), F.col(vec_col).alias("__cv")
        ).join(sigs, id_col).select(
            F.col(id_col).alias("neighbor_id"), "__cv", "__sig",
            norm_native(F.col("__cv")).alias("__cn"),
        )
    else:
        c = emb_df.select(
            F.col(id_col).alias("neighbor_id"),
            F.col(vec_col).alias("__cv"),
            hyperplane_signature(F.col(vec_col), planes).alias("__sig"),
            norm_native(F.col(vec_col)).alias("__cn"),
        )
    # dots materialized in their own projection, signature + probe set
    # derived from the column (not the expression) — HOF re-eval trap.
    # Norms ride each join side so the per-pair rerank is ONE dot fold
    # (cosine_from_norms — bit-identical to cosine_native).
    q_stage = query_df.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("__qv"),
        hyperplane_dots(F.col(vec_col), planes).alias("__dots"),
        norm_native(F.col(vec_col)).alias("__qn"),
    ).select(
        "query_id",
        "__qv",
        "__qn",
        "__dots",
        signature_from_dots(F.col("__dots"), num_planes).alias("__sig0"),
    )
    if num_probes > 1:
        margins = F.array_sort(
            F.transform(
                F.col("__dots"),
                lambda d, i: F.struct(F.abs(d).alias("m"), i.alias("i")),
            )
        )
        flip_idx = F.transform(
            F.slice(margins, 1, min(num_probes - 1, num_planes)),
            lambda s: s["i"],
        )
        bitvals = F.array(*[F.lit(1 << b).cast("long") for b in range(num_planes)])
        probe_sigs = F.concat(
            F.array(F.col("__sig0")),
            F.transform(
                flip_idx,
                lambda ix: F.col("__sig0").bitwiseXOR(F.element_at(bitvals, ix + 1)),
            ),
        )
        q = q_stage.select(
            "query_id", "__qv", "__qn", F.explode(probe_sigs).alias("__sig")
        )
    else:
        q = q_stage.select(
            "query_id", "__qv", "__qn", F.col("__sig0").alias("__sig")
        )
    scored = (
        c.join(F.broadcast(q), "__sig")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            cosine_from_norms(
                F.col("__qv"), F.col("__cv"), F.col("__qn"), F.col("__cn")
            ).alias("__cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("__cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            F.col("rank").cast("long").alias("rank"),
            F.round("__cos", round_to).alias("cosine"),
        )
    )


def ivf_fit_centroid_units(
    emb_df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    num_centroids: int = 16,
    seed: int = 42,
    lloyd_iterations: int = 2,
    sample_size: int = 1024,
) -> "np.ndarray":
    """Fit the IVF coarse-quantizer and return UNIT-normalized
    centroids (num_centroids × dim float64) — the shared fit behind
    :func:`ann_ivf_topk` and ``pipelines.ann_index`` (one fit, so the
    ad-hoc operator and the persisted index can never disagree on cell
    geometry).

    A deterministic pseudo-random corpus sample (hash-order ``limit``)
    refined by ``lloyd_iterations`` rounds of spherical k-means ON THE
    SAMPLE, driver-side numpy — the sample is O(1) bounded
    (``sample_size`` rows × dim doubles) regardless of corpus size, so
    this stays off the scale path. Centroids are pre-normalized
    DRIVER-side: ranking cells by dot(v, c/|c|) orders identically to
    cosine(v, c) — the 1/|v| factor is constant across cells — so the
    per-row assignment costs num_centroids interpreted dot-folds
    instead of dot + 2 norms each (48 → 16 folds/row measured as the
    ann_ivf hot spot)."""
    sample = [
        [float(x) for x in r[1]]
        for r in emb_df.select(id_col, vec_col)
        .orderBy(F.pmod(F.xxhash64(F.col(id_col) + seed), 997), F.col(id_col))
        .limit(max(sample_size, num_centroids))
        .collect()
    ]
    cmat = np.asarray(sample[:num_centroids], dtype=np.float64)
    if lloyd_iterations > 0 and len(sample) > num_centroids:
        X = np.asarray(sample, dtype=np.float64)
        Xn = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
        for _ in range(lloyd_iterations):
            Cn = cmat / np.maximum(
                np.linalg.norm(cmat, axis=1, keepdims=True), 1e-12
            )
            assign = np.argmax(Xn @ Cn.T, axis=1)
            for j in range(num_centroids):
                members = X[assign == j]
                if len(members):  # empty cell keeps its old centroid
                    cmat[j] = members.mean(axis=0)
    return cmat / np.maximum(np.linalg.norm(cmat, axis=1, keepdims=True), 1e-12)


def ivf_cell_expr(cunit, vec_col_expr, num_probes: int = 1):
    """Native Column expression: the ``num_probes`` nearest cell ids
    (by centroid dot product, smallest-cid tie-break) for a vector
    column — the same ordering chain ann_ivf_topk scores with."""
    centroids = [(j, [float(x) for x in cunit[j]]) for j in range(len(cunit))]
    scored = F.array(
        *[
            F.struct(
                (-dot_native(vec_col_expr, F.array(*[F.lit(x) for x in cvec]))).alias(
                    "neg"
                ),
                F.lit(cid).cast("long").alias("cid"),
            )
            for cid, cvec in centroids
        ]
    )
    return F.transform(
        F.slice(F.array_sort(scored), 1, num_probes), lambda s: s["cid"]
    )


def ann_ivf_topk(
    emb_df: DataFrame,
    query_df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    num_centroids: int = 16,
    num_probes: int = 2,
    seed: int = 42,
    round_to: int = 4,
    lloyd_iterations: int = 2,
    sample_size: int = 1024,
    engine: str = "native",
) -> DataFrame:
    """IVF-style ANN: coarse-quantize the corpus to Lloyd-refined
    centroids, search only the query's ``num_probes`` nearest cells.

    ``engine='arrow'`` vectorizes the CORPUS cell assignment (the
    wide-vector cost center: num_centroids x dims interpreted evals
    per row — 58.3s at 50k x 1024-dim, 32 cells measured) as one GEMM
    argmax per Arrow batch emitting only (id, cell); vectors never
    cross the Python boundary (the cell frame joins back by id, ann_lsh's
    shape). Query side and rerank stay native — both panel-bounded.

    Centroids: a deterministic pseudo-random corpus sample (hash-order
    ``limit``) refined by ``lloyd_iterations`` rounds of spherical
    k-means ON THE SAMPLE, driver-side numpy — the sample is O(1)
    bounded (``sample_size`` rows x dim doubles) regardless of corpus
    size, so this stays off the scale path. Refined centroids spread
    with the data's actual density, which evens out cell populations
    (raw sampled centroids leave hot cells that blow up rerank cost).
    At 100 TB you'd persist the corpus BUCKETED BY cell so each query
    touches ~num_probes/num_centroids of the data with zero shuffle.
    Assignment is a broadcast of the (tiny) centroid set; recall is
    tunable via ``num_probes``.
    """
    from pyspark.sql.window import Window

    cunit = ivf_fit_centroid_units(
        emb_df,
        id_col=id_col,
        vec_col=vec_col,
        num_centroids=num_centroids,
        seed=seed,
        lloyd_iterations=lloyd_iterations,
        sample_size=sample_size,
    )
    centroids = [(j, [float(x) for x in cunit[j]]) for j in range(num_centroids)]

    def cell_scores(vec):
        return [
            (cid, dot_native(vec, F.array(*[F.lit(x) for x in cvec])))
            for cid, cvec in centroids
        ]

    def top_cells(vec, n):
        scored = F.array(
            *[F.struct((-s).alias("neg"), F.lit(cid).cast("long").alias("cid"))
              for cid, s in cell_scores(vec)]
        )
        return F.slice(F.array_sort(scored), 1, n)

    if engine == "arrow":
        cu_t = cunit.T

        def corpus_cells(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                if pdf.empty:
                    continue
                mat = np.asarray(list(pdf[vec_col]), dtype=np.float64)
                # argmax takes the FIRST maximum — the same smallest-cid
                # tie-break as the native array_sort((-dot, cid)) chain
                cell = np.argmax(mat @ cu_t, axis=1).astype(np.int64)
                yield pd.DataFrame({id_col: pdf[id_col].to_numpy(), "__cell": cell})

        cells = emb_df.select(id_col, vec_col).mapInPandas(
            corpus_cells, f"{id_col} {_id_ddl(emb_df, id_col)}, __cell long"
        )
        c = emb_df.select(F.col(id_col), F.col(vec_col).alias("__cv")).join(
            cells, id_col
        ).select(
            F.col(id_col).alias("neighbor_id"), "__cv", "__cell",
            norm_native(F.col("__cv")).alias("__cn"),
        )
    else:
        c = emb_df.select(
            F.col(id_col).alias("neighbor_id"),
            F.col(vec_col).alias("__cv"),
            top_cells(F.col(vec_col), 1)[0]["cid"].alias("__cell"),
            norm_native(F.col(vec_col)).alias("__cn"),
        )
    q = query_df.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("__qv"),
        norm_native(F.col(vec_col)).alias("__qn"),
        F.explode(
            F.transform(top_cells(F.col(vec_col), num_probes), lambda s: s["cid"])
        ).alias("__cell"),
    )
    scored = (
        c.join(F.broadcast(q), "__cell")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            cosine_from_norms(
                F.col("__qv"), F.col("__cv"), F.col("__qn"), F.col("__cn")
            ).alias("__cos"),
        )
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("__cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            F.col("rank").cast("long").alias("rank"),
            F.round("__cos", round_to).alias("cosine"),
        )
    )


def embedding_near_dup_pairs(
    emb_df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    num_planes: int = 8,
    dim: int = 64,
    seed: int = 42,
    round_to: int = 4,
    engine: str = "native",
    block_cap: int = BUCKET_BLOCK_CAP,
) -> DataFrame:
    """Embedding-cosine near-dup pairs (id_a < id_b, cosine >= threshold)
    via hyperplane-bucket self-join: vectors with cosine ~1 almost always
    share all sign bits, so the exact check runs only within buckets.

    ``engine='native'`` is the bit-reproducible oracle path.
    ``engine='arrow'`` is the wide-vector scale path (semantic_dedup's
    shape): signature + unit come from one GEMM per Arrow batch, and
    each signature bucket folds into ONE ordered array row whose pair
    cosines a scalar Arrow pandas_udf GEMMs block-wise — every vector
    crosses the JVM→Python boundary once; the per-pair dot never runs
    interpreted (the 1µs/element HOF cost makes 1024-dim pair folds the
    dominant term: mutual NN at 10k x 1024d measured 57.4s native →
    see scale_smoke widevec). Differences vs native are the documented
    ~1e-16 tolerance class (GEMM vs left-fold summation on near-zero
    plane projections; np.round half-even vs F.round half-up)."""
    rng = np.random.RandomState(seed)
    planes = rng.normal(size=(num_planes, dim))
    if engine == "arrow":
        return _near_dup_pairs_arrow(
            emb_df, id_col, vec_col, float(threshold), planes, int(round_to),
            block_cap=block_cap,
        )
    # Normalize ONCE per vector (materialized alongside the signature),
    # so the per-pair work is a single dot product instead of
    # dot + 2 norms — interpreted higher-order lambdas are the cost
    # center here, and pairs >> vectors inside any hot bucket.
    # The norm must not appear INSIDE a lambda body: CollapseProject
    # inlines a single-use alias into the consuming projection even
    # across an intermediate select, so ``transform(v, x -> x / __n)``
    # becomes ``transform(v, x -> x / sqrt(aggregate(v, ...)))`` — the
    # interpreted fold re-evaluated per ELEMENT (64 norms per vector;
    # 7x measured on the unit stage). ``_unit_vector`` routes the norm
    # through ``array_repeat`` so it is an argument evaluated once per
    # row, collapse or not.
    staged = emb_df.select(
        F.col(id_col),
        F.col(vec_col),
        norm_native(F.col(vec_col)).alias("__n"),
    )
    unit = _unit_vector(F.col(vec_col), F.col("__n"))
    sig = staged.select(
        F.col(id_col),
        unit.alias("__unit"),
        hyperplane_signature(F.col(vec_col), planes).alias("__sig"),
    )
    # the self-join consumes sig as BOTH sides under different aliases,
    # so the exchanges never canonicalize equal and the whole
    # normalize+signature subtree (num_planes interpreted plane dots
    # per vector) would execute twice — truncate lineage once here
    # (same family as the unions-of-selects re-execution landmine)
    sig = sig.transform(lazy_checkpoint)
    a = sig.select(F.col(id_col).alias("id_a"), F.col("__unit").alias("__va"), "__sig")
    b = sig.select(F.col(id_col).alias("id_b"), F.col("__unit").alias("__vb"), "__sig")
    return (
        a.join(b, "__sig")
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            F.round(dot_native(F.col("__va"), F.col("__vb")), round_to).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )


def _blocked_bucket_fold(
    frame: DataFrame, keys: list[str], id_col: str, cap: int = BUCKET_BLOCK_CAP
) -> DataFrame:
    """Fold bucket members into BOUNDED array rows for the Arrow GEMM
    verify stages (``_near_dup_pairs_arrow``, ``semantic_dedup``'s
    arrow path).

    The unblocked form collected an entire ``keys`` bucket into ONE
    collect_list row: correct until a degenerate corpus (many
    near-identical vectors sharing a signature) produces a single row
    of n x dim x 8 bytes and OOMs the executor (ADVICE r9). Here each
    member is salted into ``ceil(n/cap)`` blocks by a deterministic id
    hash and emitted once per block-PAIR, so every unordered member
    pair co-occurs in exactly one ``(gi <= gj)`` group and a folded row
    holds at most ``2*cap`` vectors. Any bucket <= ``cap`` degenerates
    to the original single fold (one (0,0) group, fan-out 1) — the
    per-row block tag ``b`` tells the verify UDF which side of a cross
    group a member belongs to.

    Bucket sizes come from a VECTOR-FREE aggregate joined back on the
    keys (AQE broadcasts the tiny sizes frame), NOT a window count: a
    window over the keys would shuffle AND buffer the full 8 KB/row
    vector payload just to count rows (measured 2-4x on the widevec
    panel). Callers must lazy-checkpoint ``frame`` first — the sizes
    aggregate is a second consumer.
    """
    sizes = frame.select(*keys).groupBy(*keys).agg(
        F.count(F.lit(1)).alias("__bn")
    )
    staged = frame.join(sizes, list(keys)).withColumn(
        "__nblk", F.ceil(F.col("__bn") / F.lit(int(cap))).cast("int")
    ).withColumn(
        # deterministic, not oracle-reaching: the pair SET is
        # blocking-invariant, so any stable hash works here
        "__blk",
        F.pmod(F.crc32(F.col(id_col).cast("string")), F.col("__nblk")).cast("int"),
    )
    pair_keys = F.transform(
        F.sequence(F.lit(0), F.col("__nblk") - 1),
        lambda x: F.struct(
            F.least(F.col("__blk"), x).alias("gi"),
            F.greatest(F.col("__blk"), x).alias("gj"),
        ),
    )
    exploded = staged.select(
        *keys,
        F.col(id_col),
        F.col("__unit"),
        F.col("__blk"),
        F.explode(pair_keys).alias("__g"),
    ).select(
        *keys,
        F.col(id_col),
        F.col("__unit"),
        F.col("__blk"),
        F.col("__g.gi").alias("__gi"),
        F.col("__g.gj").alias("__gj"),
    )
    return exploded.groupBy(*keys, "__gi", "__gj").agg(
        F.array_sort(
            F.collect_list(
                F.struct(
                    F.col(id_col).alias("i"),
                    F.col("__unit").alias("u"),
                    F.col("__blk").alias("b"),
                )
            )
        ).alias("__bucket")
    )


def _near_dup_pairs_arrow(
    emb_df: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float,
    planes: np.ndarray,
    round_to: int,
    block_cap: int = BUCKET_BLOCK_CAP,
) -> DataFrame:
    """Arrow twin of the near-dup bucket self-join (see
    embedding_near_dup_pairs docstring). Zero-norm vectors get NaN
    units → NaN pair cosine → fails every >= threshold, matching the
    native NULL-cosine semantics."""
    from pyspark.sql.functions import pandas_udf

    pmat = planes.T
    bits = np.power(2.0, np.arange(planes.shape[0]))

    def assign(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            mat = np.asarray(list(pdf[vec_col]), dtype=np.float64)
            norms = np.linalg.norm(mat, axis=1, keepdims=True)
            with np.errstate(divide="ignore", invalid="ignore"):
                unit = mat / norms  # 0-norm rows → NaN units
            sig = (((mat @ pmat) >= 0) @ bits).astype(np.int64)
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].to_numpy(),
                    "__unit": list(unit),
                    "__sig": sig,
                }
            )

    idt = _id_ddl(emb_df, id_col)
    sig_df = emb_df.select(id_col, vec_col).mapInPandas(
        assign, f"{id_col} {idt}, __unit array<double>, __sig long"
    )
    # two consumers (the bucket-size aggregate + the fold itself) —
    # without the lineage cut the signature GEMM runs twice
    sig_df = sig_df.transform(lazy_checkpoint)

    @pandas_udf(f"array<struct<a: {idt}, b: {idt}, c: double>>")
    def _bucket_pairs(
        buckets: pd.Series, gis: pd.Series, gjs: pd.Series
    ) -> pd.Series:
        out = []
        for bucket, gi, gj in zip(buckets, gis, gjs):
            if gi == gj:
                # within-block: ids sorted by the fold, so upper
                # triangle gives id_a < id_b directly
                n = len(bucket)
                if n < 2:
                    out.append([])
                    continue
                ids = [r["i"] for r in bucket]
                mat = np.asarray([np.asarray(r["u"]) for r in bucket])
                rows_out = []
                # block the GEMM: memory bounds at (256 x n), never n^2
                for lo in range(0, n, 256):
                    hi = min(lo + 256, n)
                    with np.errstate(invalid="ignore"):
                        sims = np.round(mat[lo:hi] @ mat.T, round_to)
                        rr, cc = np.nonzero(sims >= threshold)
                    keep = (rr + lo) < cc
                    for r_, c_ in zip((rr[keep] + lo).tolist(), cc[keep].tolist()):
                        rows_out.append(
                            {"a": ids[r_], "b": ids[c_], "c": float(sims[r_ - lo, c_])}
                        )
                out.append(rows_out)
                continue
            # cross-block: left (b == gi) x right (b == gj) full GEMM;
            # ids interleave across blocks, so order each pair explicitly
            left = [r for r in bucket if r["b"] == gi]
            right = [r for r in bucket if r["b"] == gj]
            if not left or not right:
                out.append([])
                continue
            lids = [r["i"] for r in left]
            rids = [r["i"] for r in right]
            lmat = np.asarray([np.asarray(r["u"]) for r in left])
            rmat = np.asarray([np.asarray(r["u"]) for r in right])
            rows_out = []
            for lo in range(0, len(left), 256):
                hi = min(lo + 256, len(left))
                with np.errstate(invalid="ignore"):
                    sims = np.round(lmat[lo:hi] @ rmat.T, round_to)
                    rr, cc = np.nonzero(sims >= threshold)
                for r_, c_ in zip(rr.tolist(), cc.tolist()):
                    li, ri = lids[r_ + lo], rids[c_]
                    a, b = (li, ri) if li < ri else (ri, li)
                    rows_out.append({"a": a, "b": b, "c": float(sims[r_, c_])})
            out.append(rows_out)
        return pd.Series(out)

    folded = _blocked_bucket_fold(sig_df, ["__sig"], id_col, cap=block_cap)
    return (
        folded.select(
            F.explode(_bucket_pairs("__bucket", "__gi", "__gj")).alias("__p")
        )
        .select(
            F.col("__p.a").alias("id_a"),
            F.col("__p.b").alias("id_b"),
            F.col("__p.c").alias("cosine"),
        )
    )


def grouped_centroids(
    df: DataFrame,
    vec_col: str,
    group_col: str,
    round_to: int = 6,
) -> DataFrame:
    """Per-group elementwise mean vector (class prototypes / cluster
    centroids / label embeddings). Emits (group, n_vecs, centroid).

    Explode-by-dimension, NOT collect-and-average: posexplode fans each
    vector into (group, dim, value) rows, and the groupBy(group, dim)
    average partial-aggregates map-side — every partition contributes
    at most |groups| x D pre-combined rows to the shuffle regardless of
    corpus size. The collect_list alternative ships every vector to one
    reducer per group (OOM at the first million-vector label). Second
    tiny shuffle folds (group, dim, mean) back to an ordered array.
    """
    dims = df.select(
        F.col(group_col), F.posexplode(F.col(vec_col)).alias("__d", "__v")
    )
    # Mean accumulates as an exact DECIMAL sum (per-row double→decimal
    # cast is engine-identical; decimal addition is order-independent)
    # with ONE IEEE division at the end — a plain double avg drifts
    # ~1e-12 by summation order and can flip round(m, 6) at a half
    # boundary between Spark and the DuckDB oracles (ADVICE r5 #4).
    per_dim = dims.groupBy(group_col, "__d").agg(
        (
            F.sum(F.col("__v").cast("double").cast("decimal(30,12)")).cast(
                "double"
            )
            / F.count(F.lit(1))
        ).alias("__m"),
        F.count(F.lit(1)).alias("__n"),
    )
    return (
        per_dim.groupBy(group_col)
        .agg(
            F.max("__n").alias("n_vecs"),
            F.transform(
                F.array_sort(F.collect_list(F.struct("__d", "__m"))),
                # DECIMAL(18,8) re-cast BEFORE the display round: the
                # quotient is bit-identical cross-engine, but round(double)
                # itself diverges when it sits on an exact decimal half
                # (Spark HALF_UPs the shortest repr, DuckDB doesn't) —
                # the CLAUDE.md half-round landmine
                lambda s: F.round(
                    s["__m"].cast("decimal(18,8)"), round_to
                ).cast("double"),
            ).alias("centroid"),
        )
        .select(group_col, F.col("n_vecs").cast("long").alias("n_vecs"), "centroid")
    )


def _semantic_assign_native(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    cents: np.ndarray,
    planes: np.ndarray,
    num_clusters: int,
) -> DataFrame:
    """Oracle-reproducible assignment: left-fold dots, first-k-wins
    argmax CASE chain (ties to lowest index, mirrored in SQL)."""
    # Norm evaluated once per row via _unit_vector — NOT referenced
    # inside a transform lambda, where CollapseProject inlining would
    # re-evaluate the fold per element (see _unit_vector docstring).
    staged = df.select(
        F.col(id_col),
        F.col(vec_col),
        norm_native(F.col(vec_col)).alias("__n"),
    )
    unit = _unit_vector(F.col(vec_col), F.col("__n"))
    scored = staged.select(
        F.col(id_col),
        unit.alias("__unit"),
        hyperplane_signature(F.col(vec_col), planes).alias("__sig"),
        *[
            dot_native(
                F.col(vec_col),
                F.array(*[F.lit(float(x)) for x in cents[k]]),
            ).alias(f"__d{k}")
            for k in range(num_clusters)
        ],
    )
    # argmax over unit centroids == argmax cosine (|v| scales all dots
    # equally); first-k-wins CASE chain = ties to lowest index.
    cluster = None
    for k in range(num_clusters - 1):
        cond = None
        for j in range(k + 1, num_clusters):
            c2 = F.col(f"__d{k}") >= F.col(f"__d{j}")
            cond = c2 if cond is None else (cond & c2)
        cluster = (
            F.when(cond, F.lit(k)) if cluster is None else cluster.when(cond, F.lit(k))
        )
    cluster = cluster.otherwise(F.lit(num_clusters - 1))
    return scored.select(
        F.col(id_col), F.col("__unit"), F.col("__sig"),
        cluster.cast("long").alias("cluster"),
    )


def _semantic_assign_arrow(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    cents: np.ndarray,
    planes: np.ndarray,
) -> DataFrame:
    """Scale-path assignment: one (batch x dim) @ (dim x K+P) GEMM per
    Arrow batch replaces 8+num_planes interpreted dot-folds per row.
    numpy argmax takes the FIRST maximum — the same lowest-index
    tie-break as the native CASE chain."""
    import pandas as pd

    cmat = cents.T  # dim x K
    pmat = planes.T  # dim x P
    bits = np.power(2.0, np.arange(planes.shape[0]))

    def assign(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            mat = np.asarray(list(pdf[vec_col]), dtype=np.float64)
            unit = mat / np.linalg.norm(mat, axis=1, keepdims=True)
            cluster = np.argmax(mat @ cmat, axis=1).astype(np.int64)
            sig = (((mat @ pmat) >= 0) @ bits).astype(np.int64)
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].to_numpy(),
                    "__unit": list(unit),
                    "__sig": sig,
                    "cluster": cluster,
                }
            )

    return df.select(id_col, vec_col).mapInPandas(
        assign,
        f"{id_col} {_id_ddl(df, id_col)}, __unit array<double>, "
        "__sig long, cluster long",
    )


def semantic_dedup(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    num_clusters: int = 8,
    dim: int = 64,
    tau: float = 0.95,
    seed: int = 7,
    num_planes: int = 8,
    round_to: int = 4,
    engine: str = "native",
    block_cap: int = BUCKET_BLOCK_CAP,
) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023, public):
    partition the corpus into clusters by nearest centroid, then inside
    each cluster drop every item whose cosine to a LOWER-id item is
    ``>= tau``. Emits (id, cluster, keep) for every input row.

    Scale shape: cluster assignment is map-only (K fixed dot products
    per row, no shuffle); candidate pairs come from an equi-join on
    (cluster, hyperplane-signature) — at tau >= 0.95 near-dups agree on
    every sign bit with overwhelming probability, so the quadratic term
    is bounded by the largest (cluster x signature) bucket, never by the
    cluster alone (measured 12.5s -> sub-second at sf0.1: 8 clusters x
    2^8 signatures vs 8 clusters). Same skeleton as
    :func:`embedding_near_dup_pairs`. At 100 TB, K grows ~sqrt(N) and
    centroids come from a k-means fit on an O(1) driver-side sample
    (see :func:`ann_ivf_topk`); here they are seeded random unit vectors
    so the DuckDB oracle can inline them as literals and replay the
    exact assignment. SIZE THE BUCKET GRID TO THE CORPUS:
    ``num_planes ≈ log2(N / (num_clusters * target_bucket_rows))`` —
    a fixed grid re-grows the quadratic pair term (8x256 buckets
    measured 61.7s at 500k vectors vs 21.9s with 12 planes;
    scripts/scale_smoke.py guards this).

    Determinism: argmax ties break to the LOWEST cluster index (strict
    CASE chain, mirrored in SQL); the keep rule is non-transitive by
    design (a dropped item still shadows its own higher-id neighbors),
    matching the one-pass semantics of the published method.

    ``engine='native'`` keeps every double bit-reproducible for the
    DuckDB oracle; ``engine='arrow'`` computes the assignment stage
    (unit vectors, signature, centroid argmax) as one numpy GEMM over
    Arrow batches — the 100 TB path (interpreted HOF folds are the cost
    center; 20.1s native vs 16.0s arrow at 500k vectors, and the gap
    grows with num_clusters + num_planes) — AND the verify stage: each
    (cluster, sig) bucket folds into one ordered array row and a scalar
    Arrow pandas_udf GEMMs it block-wise, so every vector crosses the
    JVM→Python boundary once and the per-pair dot never runs
    interpreted (187s → 23s measured at 50k x 1024-dim vectors,
    scripts/scale_smoke.py widevec). Results agree with native except
    on ~1e-16 argmax/rounding ties (np.round is half-even, F.round
    half-up — same documented tolerance class; see
    test_semantic_dedup_arrow_agrees_with_native).
    """
    rng = np.random.RandomState(seed)
    cents = rng.normal(size=(num_clusters, dim))
    cents = cents / np.linalg.norm(cents, axis=1, keepdims=True)
    planes = np.random.RandomState(seed + 100).normal(size=(num_planes, dim))

    if engine == "arrow":
        assigned = _semantic_assign_arrow(df, id_col, vec_col, cents, planes)
    else:
        assigned = _semantic_assign_native(
            df, id_col, vec_col, cents, planes, num_clusters
        )
    # materialize ONCE: `assigned` feeds both self-join sides and the
    # final output — without the (lazy) checkpoint the 8+num_planes
    # interpreted dot-folds per row execute three times (28s -> 22s
    # measured at 500k vectors, 12 planes)
    assigned = assigned.transform(lazy_checkpoint)
    if engine == "arrow":
        # Verify stage, scale path: the native pair filter evaluates an
        # interpreted 1024-element dot fold PER CANDIDATE PAIR (1.2e9
        # element-evals = 187s measured at 50k x 1024d in the widevec
        # panel). Instead fold each (cluster, sig) bucket into ONE
        # ordered array row (ships each vector once — pair fan-out
        # never crosses the JVM->Python boundary) and GEMM the bucket
        # in a scalar Arrow pandas_udf: one groupBy, no per-group
        # applyInPandas overhead (the croston 1.4ms/group trap).
        from pyspark.sql.functions import pandas_udf

        tau_ = float(tau)
        round_ = int(round_to)

        @pandas_udf(f"array<{_id_ddl(df, id_col)}>")
        def _bucket_dropped(
            buckets: pd.Series, gis: pd.Series, gjs: pd.Series
        ) -> pd.Series:
            out = []
            for bucket, gi, gj in zip(buckets, gis, gjs):
                dropped_ids: set = set()
                if gi == gj:
                    n = len(bucket)
                    if n < 2:
                        out.append([])
                        continue
                    ids = [r["i"] for r in bucket]
                    mat = np.asarray([np.asarray(r["u"]) for r in bucket])
                    # block the GEMM so memory bounds at (block x n),
                    # never n^2
                    for lo in range(0, n, 256):
                        hi = min(lo + 256, n)
                        sims = np.round(mat[lo:hi] @ mat.T, round_)
                        rows, cols = np.nonzero(sims >= tau_)
                        keep = (rows + lo) < cols  # id_a < id_b (sorted)
                        dropped_ids.update(ids[c] for c in cols[keep].tolist())
                else:
                    # cross-block: the HIGHER id of any >= tau pair is
                    # dropped (the keep rule is pairwise, so blocking
                    # cannot change the dropped set)
                    left = [r for r in bucket if r["b"] == gi]
                    right = [r for r in bucket if r["b"] == gj]
                    if not left or not right:
                        out.append([])
                        continue
                    lids = [r["i"] for r in left]
                    rids = [r["i"] for r in right]
                    lmat = np.asarray([np.asarray(r["u"]) for r in left])
                    rmat = np.asarray([np.asarray(r["u"]) for r in right])
                    for lo in range(0, len(left), 256):
                        hi = min(lo + 256, len(left))
                        sims = np.round(lmat[lo:hi] @ rmat.T, round_)
                        rows, cols = np.nonzero(sims >= tau_)
                        dropped_ids.update(
                            max(lids[r + lo], rids[c])
                            for r, c in zip(rows.tolist(), cols.tolist())
                        )
                out.append(sorted(dropped_ids))
            return pd.Series(out)

        folded = _blocked_bucket_fold(
            assigned, ["cluster", "__sig"], id_col, cap=block_cap
        )
        dropped = (
            folded.select(
                F.explode(_bucket_dropped("__bucket", "__gi", "__gj")).alias(id_col)
            )
            .distinct()
            .withColumn("__dropped", F.lit(True))
        )
    else:
        a = assigned.select(
            F.col("cluster"), F.col("__sig"),
            F.col(id_col).alias("__id_a"), F.col("__unit").alias("__va"),
        )
        b = assigned.select(
            F.col("cluster"), F.col("__sig"),
            F.col(id_col).alias("__id_b"), F.col("__unit").alias("__vb"),
        )
        # Rounded-then-compared cosine: boundary-stable across engines
        # (identical double rounding on both sides of the oracle).
        dropped = (
            a.join(b, ["cluster", "__sig"])
            .filter(F.col("__id_a") < F.col("__id_b"))
            .filter(
                F.round(dot_native(F.col("__va"), F.col("__vb")), round_to) >= tau
            )
            .select(F.col("__id_b").alias(id_col))
            .distinct()
            .withColumn("__dropped", F.lit(True))
        )
    return (
        assigned.join(dropped, id_col, "left")
        .select(
            F.col(id_col),
            F.col("cluster"),
            F.coalesce(~F.col("__dropped"), F.lit(True)).alias("keep"),
        )
    )


def mutual_nn_pairs(
    emb_df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    num_planes: int = 8,
    dim: int = 64,
    seed: int = 42,
    round_to: int = 4,
    engine: str = "native",
) -> DataFrame:
    """Reciprocal (mutual) nearest-neighbor pairs within hyperplane
    LSH buckets — the canonical-pair picker for dedup merge queues: a
    pair survives only if each side is the OTHER's best in-bucket
    neighbor, which suppresses the hub vectors that one-directional
    top-1 lists glue to half the corpus.

    Candidate generation reuses :func:`embedding_near_dup_pairs` with
    the threshold open (≥ −1), so pair cost stays bucket-bounded (the
    all-pairs exact variant this replaces is O(n²·d)). Each undirected
    candidate explodes to its two directions in one row-local
    struct-array explode (never a union of selects — re-execution
    trap); per-source top-1 is a keyed window (desc cosine, asc
    neighbor id — deterministic under rounded-cosine ties); mutuality
    is one self-equi-join on the reversed pair. Vectors alone in
    their bucket (or zero-norm → NULL cosine) simply drop out.
    """
    from pyspark.sql.window import Window

    pairs = embedding_near_dup_pairs(
        emb_df, id_col, vec_col, threshold=-1.0,
        num_planes=num_planes, dim=dim, seed=seed, round_to=round_to,
        engine=engine,
    )
    directed = pairs.select(
        F.explode(
            F.array(
                F.struct(
                    F.col("id_a").alias("src"),
                    F.col("id_b").alias("dst"),
                    F.col("cosine"),
                ),
                F.struct(
                    F.col("id_b").alias("src"),
                    F.col("id_a").alias("dst"),
                    F.col("cosine"),
                ),
            )
        ).alias("__e")
    ).select("__e.src", "__e.dst", "__e.cosine")
    w = Window.partitionBy("src").orderBy(F.desc("cosine"), F.asc("dst"))
    top1 = (
        directed.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") == 1)
        .select("src", "dst", "cosine")
    ).transform(lazy_checkpoint)  # consumed as BOTH join sides
    reverse = top1.select(
        F.col("dst").alias("src"), F.col("src").alias("dst")
    )
    return (
        top1.join(reverse, ["src", "dst"])
        .filter(F.col("src") < F.col("dst"))
        .select(
            F.col("src").alias("id_a"),
            F.col("dst").alias("id_b"),
            "cosine",
        )
    )


def topk_ranked(
    df: DataFrame,
    score_col: str,
    id_col: str,
    k: int,
    rank_col: str = "rank",
) -> DataFrame:
    """(id, rank) for the top-k rows by ``score_col`` (desc, id-asc
    tie-break). The limit runs as distributed TakeOrderedAndProject —
    each task keeps its local top-k, the driver merges k·P candidates —
    so no global sort of the corpus ever happens; the global
    ``row_number`` window then runs on the ALREADY-BOUNDED k-row frame
    (single-partitioning k rows is free — the fatal version of that
    pattern is on raw data)."""
    from pyspark.sql.window import Window

    top = df.select(id_col, score_col).orderBy(
        F.desc(score_col), F.asc(id_col)
    ).limit(k)
    w = Window.orderBy(F.desc(score_col), F.asc(id_col))
    return top.select(
        id_col, F.row_number().over(w).cast("long").alias(rank_col)
    )


def rrf_fuse(
    legs: list[DataFrame],
    id_col: str,
    k: int = 60,
    round_to: int = 6,
) -> DataFrame:
    """Reciprocal-rank fusion of N bounded candidate lists — the
    standard hybrid-retrieval merge (lexical BM25 + dense cosine, plus
    any other retriever): rrf(d) = Σ_legs 1/(k + rank_leg(d)), with a
    doc absent from a leg contributing 0.

    Each leg must already carry (id_col, rank) — produce them with
    :func:`topk_ranked` so every leg is top-k-bounded BEFORE fusion;
    fusing full corpus rankings is both statistically pointless (RRF
    weight at rank r decays as 1/r) and a scale bug (a global rank of
    1e9 docs). The fusion itself joins K-row frames: outer-join chain,
    all tiny.

    k=60 is the canonical damping constant (Cormack et al.) — it keeps
    a rank-1 hit from one retriever from drowning consensus mid-rank
    hits from several.
    """
    if not legs:
        raise ValueError("rrf_fuse needs at least one ranked leg")
    renamed = [
        leg.select(F.col(id_col), F.col("rank").alias(f"__r{i}"))
        for i, leg in enumerate(legs)
    ]
    fused = renamed[0]
    for nxt in renamed[1:]:
        fused = fused.join(nxt, id_col, "full_outer")
    score = None
    for i in range(len(legs)):
        term = F.coalesce(
            1.0 / (F.lit(float(k)) + F.col(f"__r{i}")), F.lit(0.0)
        )
        score = term if score is None else score + term
    from pyspark.sql.window import Window

    out = fused.select(F.col(id_col), F.round(score, round_to).alias("rrf"))
    w = Window.orderBy(F.desc("rrf"), F.asc(id_col))
    return out.select(
        id_col,
        F.row_number().over(w).cast("long").alias("rrf_rank"),
        "rrf",
    )


def negative_pairs(
    emb_df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    k: int = 3,
    buckets: int = 8,
    salt: str = "",
    round_to: int = 4,
) -> DataFrame:
    """Deterministic negative sampling for contrastive training: for
    each anchor, the first ``k`` different-label rows from the anchor's
    md5 bucket, ordered by md5(anchor‖neg‖salt) — an engine-replayable
    stand-in for RNG negative sampling (same corpus + salt ⇒ same
    pairs; a new salt re-deals, e.g. per epoch). Cosine similarity is
    attached so downstream can grade hardness (high-cosine negatives
    are the informative ones).

    Scale shape, in order:
    1. bucket assignment is map-only (md5 of the id);
    2. the candidate join is (id, label)-only — vectors do NOT ride
       through it — and equi-keyed on the bucket, so pairs ≈ n²/buckets,
       never all-pairs: grow ``buckets`` ∝ n to hold the per-anchor
       candidate pool (n/buckets) constant;
    3. rank-and-keep cuts to ≤ k·n surviving pairs BEFORE the two
       id-keyed joins that fetch vectors — the expensive payload only
       ever moves for survivors.

    NULL labels never pair (NULL ≠ x is NULL → filtered on both
    engines): a row with unknown label can't be proven a negative.
    Anchors whose bucket holds only same-label rows get no pairs —
    detectable downstream via an anti-join; re-deal with another salt
    or more probes rather than widening buckets globally.
    """
    from pyspark.sql.window import Window

    bucket = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.col(id_col).cast("string"), F.lit(salt))),
                1,
                15,
            ),
            16,
            10,
        ).cast("long")
        % buckets
    )
    ids = emb_df.select(F.col(id_col), F.col(label_col), bucket.alias("__b"))
    a = ids.select(
        F.col(id_col).alias("anchor_id"),
        F.col(label_col).alias("anchor_label"),
        "__b",
    )
    c = ids.select(
        F.col(id_col).alias("neg_id"),
        F.col(label_col).alias("neg_label"),
        "__b",
    )
    w = Window.partitionBy("anchor_id").orderBy(
        F.md5(
            F.concat(
                F.col("anchor_id").cast("string"),
                F.lit("|"),
                F.col("neg_id").cast("string"),
                F.lit(salt),
            )
        ),
        F.col("neg_id"),
    )
    kept = (
        a.join(c, "__b")
        .filter(F.col("anchor_label") != F.col("neg_label"))
        .withColumn("neg_rank", F.row_number().over(w))
        .filter(F.col("neg_rank") <= k)
        .select(
            "anchor_id",
            "anchor_label",
            "neg_id",
            "neg_label",
            F.col("neg_rank").cast("long").alias("neg_rank"),
        )
    )
    va = emb_df.select(
        F.col(id_col).alias("anchor_id"), F.col(vec_col).alias("__av"),
        norm_native(F.col(vec_col)).alias("__an"),
    )
    vc = emb_df.select(
        F.col(id_col).alias("neg_id"), F.col(vec_col).alias("__cv"),
        norm_native(F.col(vec_col)).alias("__cn"),
    )
    return (
        kept.join(va, "anchor_id")
        .join(vc, "neg_id")
        .select(
            "anchor_id",
            "anchor_label",
            "neg_id",
            "neg_label",
            "neg_rank",
            F.round(
                cosine_from_norms(
                    F.col("__av"), F.col("__cv"), F.col("__an"), F.col("__cn")
                ),
                round_to,
            ).alias("cosine"),
        )
    )


def embedding_covariance(
    df: DataFrame, vec_col: str, dim: int, round_to: int = 6
) -> DataFrame:
    """One-pass sample covariance of an embedding column — the
    sufficient statistic for PCA / whitening / Mahalanobis outlier
    gates over a vector corpus (fit the rotation driver-side from this
    d x d table; the projection is then a native per-row expression).

    Shape: each row explodes to its d(d+1)/2 upper-triangle product
    terms and ONE map-combined groupBy(i, j) reduces them: the shuffle
    carries d(d+1)/2 partial rows per partition, never the data. The
    pair array is GENERATED by nested sequence/transform lambdas over
    the once-materialized double-cast vector — a literal array of
    d(d+1)/2 structs (2,080 at d=64) makes the projection's expression
    tree so large that codegen/Janino OOMs a 1g driver (measured);
    the lambda form is O(1) expressions regardless of d. Per-term
    products are cast to DECIMAL(28,12) BEFORE summing, so sums are
    order-independent and engine-exact; the covariance combine
    arithmetic runs in double on both engines in the same op order.
    try_divide: a single-vector corpus reports NULL (n-1 = 0), not a
    job kill. ``dim`` must not exceed the true vector length (ANSI
    element_at throws out-of-bounds).
    """
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    staged = df.filter(F.col(vec_col).isNotNull()).select(v.alias("__v"))

    def _term(i, j):
        xi = F.element_at(F.col("__v"), (i + 1).cast("int"))
        xj = F.element_at(F.col("__v"), (j + 1).cast("int"))
        return F.struct(
            i.cast("long").alias("i"),
            j.cast("long").alias("j"),
            (xi * xj).cast("decimal(28,12)").alias("xy"),
            xi.cast("decimal(28,12)").alias("xi"),
        )

    entries = F.flatten(
        F.transform(
            F.sequence(F.lit(0), F.lit(dim - 1)),
            lambda i: F.transform(
                F.sequence(i, F.lit(dim - 1)), lambda j: _term(i, j)
            ),
        )
    )
    terms = staged.select(F.explode(entries).alias("e")).select(
        "e.i", "e.j", "e.xy", "e.xi"
    )
    agg = terms.groupBy("i", "j").agg(
        F.sum("xy").alias("__sxy"),
        F.sum("xi").alias("__sxi"),
        F.count(F.lit(1)).cast("long").alias("__n"),
    )
    # the diagonal re-reads the 2080-row AGGREGATED frame, not the data
    agg = agg.transform(lazy_checkpoint)
    diag = agg.filter(F.col("j") == F.col("i")).select(
        F.col("i").alias("__d"), F.col("__sxi").alias("__s")
    )
    di = diag.select(F.col("__d").alias("i"), F.col("__s").alias("__si"))
    dj = diag.select(F.col("__d").alias("j"), F.col("__s").alias("__sj"))
    # 0.0 + x: a vanishing covariance can round to -0.0 on one engine
    # and +0.0 on the other (observed); IEEE x + 0.0 normalizes both.
    cov = F.lit(0.0) + F.round(
        F.try_divide(
            F.col("__sxy").cast("double")
            - F.col("__si").cast("double")
            * F.col("__sj").cast("double")
            / F.col("__n"),
            F.col("__n") - 1,
        ),
        round_to,
    )
    return (
        agg.join(F.broadcast(di), "i")
        .join(F.broadcast(dj), "j")
        .select("i", "j", cov.alias("cov"))
    )


def embedding_covariance_arrow(
    df: DataFrame, vec_col: str, dim: int, round_to: int = 6
) -> DataFrame:
    """Full-width covariance, the production path: per Arrow batch,
    numpy computes X^T X + column sums (BLAS matmul — three orders of
    magnitude over per-element expression evaluation), emitting ONE
    partial-sums row per batch; a single reduce over those few rows
    finishes. Sanctioned Arrow use: 64 dims is 2,080 per-row product
    terms, where the exact-decimal expression form
    (:func:`embedding_covariance`) pays ~10M interpreted lambda evals
    per 5k rows (14s at sf0.1, measured) — built-ins genuinely can't
    express a matmul.

    Trade: float64 batch sums are order-dependent at ~1e-12 (batch
    boundaries follow the layout), so this path is NOT oracle-exact —
    it is reconciled against the decimal-exact operator in tests at
    1e-9 and intended for fitting PCA/whitening, which is insensitive
    at that scale. Emits the same (i, j, cov) table.
    """
    import pandas as pd  # noqa: PLC0415 — Arrow path only
    from pyspark.sql.types import (
        ArrayType,
        DoubleType,
        LongType,
        StructField,
        StructType,
    )

    partial_schema = StructType(
        [
            StructField("xtx", ArrayType(DoubleType())),
            StructField("sums", ArrayType(DoubleType())),
            StructField("n", LongType()),
        ]
    )

    def partials(batches):
        import numpy as np

        for pdf in batches:
            vecs = pdf[vec_col].dropna()
            if not len(vecs):
                continue
            X = np.asarray(
                [np.asarray(v, dtype=np.float64)[:dim] for v in vecs]
            )
            yield pd.DataFrame(
                {
                    "xtx": [(X.T @ X).ravel().tolist()],
                    "sums": [X.sum(axis=0).tolist()],
                    "n": [len(X)],
                }
            )

    staged = df.select(vec_col).mapInPandas(partials, schema=partial_schema)
    # one partial row per Arrow batch; three consumers below would
    # re-run the Python stage without the checkpoint
    staged = staged.transform(lazy_checkpoint)
    # merge by POSITION via posexplode + groupBy — never a d² -wide
    # aggregate expression list (4,096 element_at sums is the same
    # codegen OOM the exact operator's literal-struct form hit)
    xtx = (
        staged.select(F.posexplode("xtx").alias("pos", "v"))
        .groupBy("pos")
        .agg(F.sum("v").alias("sxy"))
        .select(
            (F.col("pos") / dim).cast("long").alias("i"),
            (F.col("pos") % dim).cast("long").alias("j"),
            "sxy",
        )
        .filter(F.col("j") >= F.col("i"))
    )
    csums = (
        staged.select(F.posexplode("sums").alias("pos", "v"))
        .groupBy("pos")
        .agg(F.sum("v").alias("s"))
    )
    n_total = staged.agg(F.sum("n").cast("long").alias("n"))
    si = csums.select(F.col("pos").alias("i"), F.col("s").alias("__si"))
    sj = csums.select(F.col("pos").alias("j"), F.col("s").alias("__sj"))
    cov = F.lit(0.0) + F.round(
        F.try_divide(
            F.col("sxy") - F.col("__si") * F.col("__sj") / F.col("n"),
            F.col("n") - 1,
        ),
        round_to,
    )
    return (
        xtx.join(F.broadcast(si), "i")
        .join(F.broadcast(sj), "j")
        .join(F.broadcast(n_total))
        .select("i", "j", cov.alias("cov"))
    )


def fit_pca(
    df: DataFrame, vec_col: str, dim: int, n_components: int
) -> tuple[np.ndarray, np.ndarray]:
    """Driver-side PCA fit from ONE distributed pass: the covariance
    (numpy X^T X per Arrow batch via
    :func:`embedding_covariance_arrow`) and the column means. Only
    O(d²) scalars ever reach the driver — data-independent, the same
    bounded-collect contract as the IVF centroid fit. Eigenvectors are
    sign-normalized (largest-|component| coordinate positive) so the
    rotation is deterministic across LAPACK builds up to eigenvalue
    ties. Returns (mean[d], components[k x d], variance-descending).
    """
    cov_rows = embedding_covariance_arrow(
        df, vec_col, dim, round_to=12
    ).collect()
    C = np.zeros((dim, dim))
    for r in cov_rows:
        C[r.i][r.j] = C[r.j][r.i] = r.cov if r.cov is not None else 0.0
    mean_rows = (
        df.filter(F.col(vec_col).isNotNull())
        .select(
            F.posexplode(
                F.slice(
                    F.transform(F.col(vec_col), lambda x: x.cast("double")),
                    1,
                    dim,
                )
            ).alias("pos", "v")
        )
        .groupBy("pos")
        .agg(F.avg("v").alias("m"))
        .collect()
    )
    mean = np.zeros(dim)
    for r in mean_rows:
        mean[r.pos] = r.m
    vals, vecs = np.linalg.eigh(C)  # ascending eigenvalues
    order = np.argsort(vals)[::-1][:n_components]
    comps = vecs[:, order].T  # k x d
    for k in range(comps.shape[0]):
        j = int(np.argmax(np.abs(comps[k])))
        if comps[k, j] < 0:
            comps[k] = -comps[k]
    return mean, comps


def pca_project(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    mean: np.ndarray,
    components: np.ndarray,
    round_to: int = 4,
) -> DataFrame:
    """Project vectors onto fitted principal components, NATIVELY: the
    centered vector is materialized once (interpreted lambdas
    re-evaluate embedded trees per element — the measured landmine),
    then each component is a left-fold dot with a literal array.
    Map-only; the rotation ships as plan literals, no model object or
    UDF at serve time (same distilled-serving shape as
    lr_scoring_expr).
    """
    dim = int(components.shape[1])
    mean_arr = F.array(*[F.lit(float(m)) for m in mean])
    centered = F.zip_with(
        F.slice(F.transform(F.col(vec_col), lambda x: x.cast("double")), 1, dim),
        mean_arr,
        lambda x, m: x - m,
    )
    staged = df.select(F.col(id_col), centered.alias("__c"))
    outs = []
    for k in range(components.shape[0]):
        comp = F.array(*[F.lit(float(x)) for x in components[k]])
        dot = F.aggregate(
            F.zip_with(F.col("__c"), comp, lambda x, w: x * w),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        outs.append(F.round(dot, round_to).alias(f"c{k}"))
    return staged.select(id_col, *outs)


def knn_label_consistency(
    emb_df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    k: int = 5,
    num_planes: int = 8,
    dim: int = 64,
    seed: int = 42,
    round_to: int = 4,
    suspect_below: float = 0.5,
) -> DataFrame:
    """Label-error mining via in-bucket kNN agreement (the
    Confident-Learning-style neighborhood check): for each vector, the
    fraction of its k nearest in-bucket neighbors sharing its label —
    a row whose neighborhood overwhelmingly disagrees is a labeling
    suspect worth human review before training.

    Candidates stay LSH-bucket-bounded (reuses
    :func:`embedding_near_dup_pairs` with the threshold open), each
    undirected pair explodes to both directions row-locally, and the
    per-source top-k is a keyed window whose ``rank ≤ k`` filter
    compiles to WindowGroupLimit (map-side per-group limit — the
    scale-safe top-k shape). Labels attach by two keyed equi-joins on
    the id (entity-grain: never broadcast at corpus scale, AQE decides
    here). Vectors alone in their bucket drop out — they have no
    neighborhood to vote.
    """
    from pyspark.sql.window import Window

    pairs = embedding_near_dup_pairs(
        emb_df.select(id_col, vec_col), id_col, vec_col, threshold=-1.0,
        num_planes=num_planes, dim=dim, seed=seed, round_to=round_to,
    )
    directed = pairs.select(
        F.explode(
            F.array(
                F.struct(
                    F.col("id_a").alias("src"),
                    F.col("id_b").alias("dst"),
                    F.col("cosine"),
                ),
                F.struct(
                    F.col("id_b").alias("src"),
                    F.col("id_a").alias("dst"),
                    F.col("cosine"),
                ),
            )
        ).alias("__e")
    ).select("__e.src", "__e.dst", "__e.cosine")
    w = Window.partitionBy("src").orderBy(F.desc("cosine"), F.asc("dst"))
    topk = (
        directed.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= int(k))
    )
    labels = emb_df.select(
        F.col(id_col).alias("__id"), F.col(label_col).alias("__lbl")
    )
    scored = (
        topk.join(labels.withColumnsRenamed({"__id": "src", "__lbl": "__own"}), "src")
        .join(labels.withColumnsRenamed({"__id": "dst", "__lbl": "__nbr"}), "dst")
    )
    per = scored.groupBy("src", "__own").agg(
        F.count(F.lit(1)).alias("__n"),
        F.sum(
            F.when(F.col("__nbr") == F.col("__own"), 1).otherwise(0)
        ).alias("__agree"),
    )
    frac = F.round(
        F.try_divide(
            F.col("__agree").cast("double"), F.col("__n").cast("double")
        ),
        round_to,
    )
    return per.select(
        F.col("src").alias(id_col),
        F.col("__own").alias(label_col),
        F.col("__n").cast("long").alias("n_nbrs"),
        F.col("__agree").cast("long").alias("n_agree"),
        frac.alias("agree_frac"),
        (frac < F.lit(float(suspect_below))).alias("suspect"),
    )
