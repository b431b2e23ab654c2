"""Corpus-surgery queries (LLM-pipeline extensions, round 2 tail):
span-level exact dedup (C4/RefinedWeb-style repeated-passage removal)
and a self-trained bigram-LM fluency score. Registered AFTER every
module that still lacks a driver verdict — these get local sf0.001
oracle coverage now (tests/test_entry_oracle.py) and rotate into the
driver's 50-entry window next round.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sparkprep.operators import text as tx
from sparkprep.queries import t
from sparkprep.checkpointing import lazy_checkpoint


def q_span_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide exact span dedup at 32-token chunk granularity:
    repeated chunks keep only their first (doc_id, pos) occurrence and
    documents are reassembled from surviving chunks. The C4-style
    repeated-boilerplate scrub; see operators/text.dedup_spans for the
    one-text-exchange shuffle design."""
    docs = t(spark, sf_dir, "documents")
    out = tx.dedup_spans(docs, "text", "doc_id", width=32)
    return out.select(
        "doc_id",
        F.col("n_chunks").cast("long").alias("n_chunks"),
        F.col("n_kept").cast("long").alias("n_kept"),
        F.md5("dedup_text").alias("dedup_digest"),
    )


# The oracle compares an md5 digest of the reassembled text, not the
# text itself — same evidence, ~100x smaller compare payload.
_SPAN_DEDUP_SQL = r"""
WITH tk AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(trim(text), '\s+'), x -> x <> '') AS t
  FROM documents
), n AS (
  SELECT doc_id, t,
         greatest(ceil(len(t)::DOUBLE / 32)::BIGINT, 1) AS n_chunks
  FROM tk
), chunks AS (
  SELECT doc_id, i AS pos,
         array_to_string(t[i * 32 + 1 : i * 32 + 32], ' ') AS chunk
  FROM n, UNNEST(range(0, n_chunks)) AS u(i)
), ranked AS (
  SELECT doc_id, pos, chunk,
         row_number() OVER (PARTITION BY chunk ORDER BY doc_id, pos) AS rn
  FROM chunks
)
SELECT doc_id,
       count(*)::BIGINT AS n_chunks,
       coalesce(sum(CASE WHEN rn = 1 THEN 1 END), 0)::BIGINT AS n_kept,
       md5(coalesce(string_agg(chunk, ' ' ORDER BY pos) FILTER (WHERE rn = 1), ''))
         AS dedup_digest
FROM ranked
GROUP BY doc_id
"""


def q_bigram_lm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Self-trained bigram-LM fluency: mean log p(w2 | w1) per doc
    under the corpus's own bigram counts — the context-sensitive
    upgrade of lm_score (word-salad docs score low even when every
    individual token is common). Docs with < 2 tokens are dropped
    (no bigram evidence)."""
    docs = t(spark, sf_dir, "documents")
    return tx.bigram_lm_score(docs, "text", "doc_id")


_BIGRAM_LM_SQL = r"""
WITH toks AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(trim(text), '\s+'), x -> x <> '') AS t
  FROM documents
), bg AS (
  SELECT doc_id, t[i] AS w1, t[i + 1] AS w2
  FROM toks, UNNEST(range(1, len(t))) AS u(i)
), counts AS (
  SELECT w1, w2, count(*) AS c,
         sum(count(*)) OVER (PARTITION BY w1) AS c_prefix
  FROM bg GROUP BY w1, w2
)
SELECT doc_id, round(avg(ln(c / c_prefix)), 4) AS bigram_lm
FROM bg JOIN counts USING (w1, w2)
GROUP BY doc_id
"""


def q_train_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic training shuffle: (doc_id, shard, pos) via md5
    bucketing + per-shard md5 order. No RNG, engine-replayable, and no
    global window (parallelism == shard count)."""
    from sparkprep.operators.mix import training_order

    docs = t(spark, sf_dir, "documents")
    return training_order(docs, "doc_id", num_shards=16)


_TRAIN_ORDER_SQL = """
WITH keyed AS (
  SELECT doc_id, md5(doc_id::VARCHAR) AS k,
         ('0x' || substr(md5(doc_id::VARCHAR), 1, 15))::BIGINT % 16 AS shard
  FROM documents
)
SELECT doc_id, shard,
       row_number() OVER (PARTITION BY shard ORDER BY k, doc_id)::BIGINT AS pos
FROM keyed
"""


def q_label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label embedding centroids (class prototypes), emitted in
    long form (label, n_vecs, dim, c_val) so the oracle compares
    scalar doubles instead of float arrays."""
    from sparkprep.operators.similarity import grouped_centroids

    emb = t(spark, sf_dir, "embeddings")
    cent = grouped_centroids(emb, "embedding", "label")
    return cent.select(
        "label",
        "n_vecs",
        F.posexplode("centroid").alias("dim", "c_val"),
    ).select("label", "n_vecs", F.col("dim").cast("long").alias("dim"), "c_val")


_LABEL_CENTROIDS_SQL = """
WITH d AS (
  SELECT label, i - 1 AS dim, embedding[i] AS v
  FROM embeddings, UNNEST(range(1, len(embedding) + 1)) AS u(i)
)
SELECT label,
       count(*)::BIGINT AS n_vecs,
       dim::BIGINT AS dim,
       -- exact decimal accumulation + ONE IEEE division + DECIMAL(18,8)
       -- re-cast before the display round, mirroring grouped_centroids
       -- (order-independent mean; half-round landmine on the round)
       round((sum((v::DOUBLE)::DECIMAL(30,12))::DOUBLE / count(*))::DECIMAL(18,8), 6)::DOUBLE AS c_val
FROM d
GROUP BY label, dim
"""


def q_boilerplate_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain boilerplate removal (C4/RefinedWeb rule at 16-token
    chunk granularity): a chunk recurring in >= 2 distinct docs of the
    same source is dropped everywhere — distinct from span_dedup, which
    keeps a first occurrence corpus-wide. Digest compare like
    span_dedup."""
    docs = t(spark, sf_dir, "documents")
    out = tx.boilerplate_scrub(docs, "text", "doc_id", "source", width=16, min_docs=2)
    return out.select(
        "doc_id",
        F.col("n_chunks").cast("long").alias("n_chunks"),
        F.col("n_kept").cast("long").alias("n_kept"),
        F.md5("scrub_text").alias("scrub_digest"),
    )


_BOILERPLATE_SCRUB_SQL = r"""
WITH tk AS (
  SELECT doc_id, source,
         list_filter(regexp_split_to_array(trim(text), '\s+'), x -> x <> '') AS t
  FROM documents
), n AS (
  SELECT doc_id, source, t,
         greatest(ceil(len(t)::DOUBLE / 16)::BIGINT, 1) AS n_chunks
  FROM tk
), chunks AS (
  SELECT doc_id, source, i AS pos,
         array_to_string(t[i * 16 + 1 : i * 16 + 16], ' ') AS chunk
  FROM n, UNNEST(range(0, n_chunks)) AS u(i)
), bad AS (
  SELECT source, chunk
  FROM chunks GROUP BY source, chunk
  HAVING count(DISTINCT doc_id) >= 2
), marked AS (
  SELECT c.doc_id, c.pos, c.chunk, b.chunk IS NULL AS kept
  FROM chunks c LEFT JOIN bad b ON c.source = b.source AND c.chunk = b.chunk
)
SELECT doc_id,
       count(*)::BIGINT AS n_chunks,
       coalesce(sum(CASE WHEN kept THEN 1 END), 0)::BIGINT AS n_kept,
       md5(coalesce(string_agg(chunk, ' ' ORDER BY pos) FILTER (WHERE kept), ''))
         AS scrub_digest
FROM marked
GROUP BY doc_id
"""


def q_domain_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain corpus health report (the first screen of any
    CommonCrawl-style ingest): doc count, volume, average length,
    language spread, and the within-domain exact-dup count (docs minus
    distinct text digests). One map-combined groupBy on source;
    distinct-text via md5 so only 32-byte digests, not the corpus,
    reach the aggregate state."""
    docs = t(spark, sf_dir, "documents")
    return (
        docs.select(
            "source",
            F.length("text").alias("__len"),
            "lang",
            F.md5("text").alias("__h"),
        )
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("__len").alias("total_chars"),
            F.round(F.avg("__len"), 2).alias("avg_chars"),
            F.countDistinct("lang").alias("n_langs"),
            (F.count(F.lit(1)) - F.countDistinct("__h")).alias("n_exact_dups"),
        )
        .orderBy("source")
    )


_DOMAIN_STATS_SQL = """
SELECT source,
       count(*)::BIGINT AS n_docs,
       sum(length(text))::BIGINT AS total_chars,
       round(avg(length(text)), 2) AS avg_chars,
       count(DISTINCT lang)::BIGINT AS n_langs,
       (count(*) - count(DISTINCT md5(text)))::BIGINT AS n_exact_dups
FROM documents
GROUP BY source ORDER BY source
"""


_MIX_ALPHA = 0.7
_MIX_BUDGET = 100_000


def q_mix_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled corpus mixing (the GPT-3/PaLM rule, public):
    per-source sampling weight ∝ n_docs^alpha, alpha < 1 up-weighting
    small sources relative to raw proportion. Emits raw share,
    temperature share, the boost factor, and the per-source quota for a
    fixed token budget — the numbers `mix.resample_to_quotas` consumes.
    One map-combined groupBy; the normalizing window runs over the
    aggregated per-source frame only (tiny)."""
    from pyspark.sql import Window

    docs = t(spark, sf_dir, "documents")
    agg = docs.groupBy("source").agg(F.count(F.lit(1)).alias("n_docs"))
    w = Window.partitionBy()
    pw = F.pow(F.col("n_docs").cast("double"), F.lit(_MIX_ALPHA))
    scored = agg.select(
        "source",
        F.col("n_docs").cast("long").alias("n_docs"),
        (F.col("n_docs") / F.sum("n_docs").over(w)).alias("__raw"),
        (pw / F.sum(pw).over(w)).alias("__temp"),
    )
    return scored.select(
        "source",
        "n_docs",
        F.round("__raw", 4).alias("raw_share"),
        F.round("__temp", 4).alias("temp_share"),
        F.round(F.col("__temp") / F.col("__raw"), 4).alias("boost"),
        F.round(F.col("__temp") * _MIX_BUDGET, 0).cast("long").alias("quota"),
    ).orderBy("source")


_MIX_WEIGHTS_SQL = f"""
WITH agg AS (SELECT source, count(*)::BIGINT AS n_docs FROM documents GROUP BY source),
s AS (
  SELECT source, n_docs,
         n_docs / sum(n_docs) OVER () AS raw,
         pow(n_docs::DOUBLE, {_MIX_ALPHA}) / sum(pow(n_docs::DOUBLE, {_MIX_ALPHA})) OVER () AS temp
  FROM agg
)
SELECT source, n_docs,
       round(raw, 4) AS raw_share,
       round(temp, 4) AS temp_share,
       round(temp / raw, 4) AS boost,
       round(temp * {_MIX_BUDGET}, 0)::BIGINT AS quota
FROM s ORDER BY source
"""


def q_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical-version selection: documents grouped by a head
    fingerprint (md5 of the first 8 normalized words — the cheap
    "same opening" near-dup heuristic), keeping the LONGEST version per
    group with a deterministic doc_id tiebreak. Keep-best, not
    keep-first: corpus canonicalization wants the best surviving copy.
    One keyed shuffle + one sort (clean.dedup_keep_best)."""
    from sparkprep.operators import clean

    docs = t(spark, sf_dir, "documents")
    norm = F.trim(F.regexp_replace(F.lower(F.col("text")), r"\s+", " "))
    head = F.md5(F.array_join(F.slice(F.split(norm, " "), 1, 8), " "))
    kept = clean.dedup_keep_best(
        docs.withColumn("head_key", head), "head_key", "n_chars", "doc_id"
    )
    return kept.select(
        "doc_id", "head_key", F.col("n_chars").cast("long").alias("n_chars"), "dup_count"
    ).orderBy("doc_id")


_KEEP_BEST_SQL = r"""
WITH n AS (
  SELECT doc_id, n_chars,
         md5(array_to_string(list_slice(
           string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' '),
           1, 8), ' ')) AS head_key
  FROM documents
),
r AS (
  SELECT doc_id, head_key, n_chars,
         row_number() OVER (PARTITION BY head_key
                            ORDER BY n_chars DESC, doc_id ASC) AS rk,
         count(*) OVER (PARTITION BY head_key) AS dup_count
  FROM n
)
SELECT doc_id, head_key, n_chars::BIGINT AS n_chars, dup_count::BIGINT AS dup_count
FROM r WHERE rk = 1 ORDER BY doc_id
"""


def q_char_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-class Shannon entropy quality signal (map-only; see
    operators/text.add_char_entropy for the 28-class design and the
    HOF-materialization landmine it sidesteps)."""
    docs = t(spark, sf_dir, "documents")
    return tx.add_char_entropy(docs, "text").select("doc_id", "char_entropy")


def _entropy_sql() -> str:
    """Generate the DuckDB twin of add_char_entropy: 26 replace-length
    letter counts + digit class + remainder, same multiply-by-zero
    guard, same round(4)."""
    letters = [chr(o) for o in range(ord("a"), ord("z") + 1)] + [" "]
    count_cols = ",\n         ".join(
        f"length(s) - length(replace(s, '{ch}', '')) AS c{i}"
        for i, ch in enumerate(letters)
    )
    n_classes = len(letters)
    digit = f"length(s) - length(regexp_replace(s, '[0-9]', '', 'g')) AS c{n_classes}"
    known = " + ".join(f"c{i}" for i in range(n_classes + 1))
    other = f"len - ({known}) AS c{n_classes + 1}"
    terms = " + ".join(
        f"(c{i}/n)*log2(greatest(c{i}, 1.0)/n)" for i in range(n_classes + 2)
    )
    return f"""
WITH src AS (SELECT doc_id, lower(substring(text, 1, 1000)) AS s FROM documents),
cnt AS (
  SELECT doc_id, length(s) AS len,
         {count_cols},
         {digit}
  FROM src
),
cnt2 AS (SELECT *, {other}, len::DOUBLE AS n FROM cnt)
SELECT doc_id,
       CASE WHEN len > 0 THEN round(0.0 - ({terms}), 4) END AS char_entropy
FROM cnt2
"""


_CHAR_ENTROPY_SQL = _entropy_sql()


def q_grouped_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-safe 80/10/10 split keyed on ``source``: whole groups
    move together (operators/mix.grouped_split), so eval can never see
    shards of a training domain."""
    from sparkprep.operators import mix

    docs = t(spark, sf_dir, "documents")
    out = mix.grouped_split(
        docs, "source", {"train": 0.8, "val": 0.1, "test": 0.1}, salt="r3"
    )
    return out.select("doc_id", "source", "split")


_GROUPED_SPLIT_SQL = """
WITH u AS (
  SELECT doc_id, source,
         ('0x' || substr(md5(source || 'r3'), 1, 15))::BIGINT / 1152921504606846976.0 AS uv
  FROM documents
)
SELECT doc_id, source,
       CASE WHEN uv < 0.8 THEN 'train'
            WHEN uv < 0.9 THEN 'val'
            ELSE 'test' END AS split
FROM u
"""


def q_grouped_kfold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group-aware 5-fold CV assignment keyed on source (mix.grouped_kfold
    — whole domains share a fold; map-only md5 deal)."""
    from sparkprep.operators import mix

    docs = t(spark, sf_dir, "documents")
    return mix.grouped_kfold(docs, "source", k=5, salt="cv").select(
        "doc_id", "source", "fold"
    )


_GROUPED_KFOLD_SQL = """
SELECT doc_id, source,
       (('0x' || substr(md5(source || 'cv'), 1, 15))::BIGINT % 5) AS fold
FROM documents
"""


def q_url_canon(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL canonicalization over deterministically synthesized crawl
    variants: per group of 4 docs, three spellings of the same page
    (plain https / uppercase-scheme+www+trailing-slash / default-port+
    utm tracking param) must collapse to ONE canonical key, while the
    fourth (real query params, reordered) stays distinct with its
    params sorted. n_variants counts the dup group via a canonical-
    keyed window (functions/strings.canonical_url)."""
    from pyspark.sql.window import Window

    from sparkprep.functions.strings import canonical_url

    docs = t(spark, sf_dir, "documents")
    n = F.expr("doc_id div 4").cast("string")
    m = F.col("doc_id") % 4
    url = (
        F.when(m == 0, F.concat(F.lit("https://example.com/articles/"), n))
        .when(
            m == 1,
            F.concat(F.lit("HTTP://WWW.Example.com/articles/"), n, F.lit("/")),
        )
        .when(
            m == 2,
            F.concat(
                F.lit("https://example.com:443/articles/"),
                n,
                F.lit("?utm_source=feed"),
            ),
        )
        .otherwise(
            F.concat(
                F.lit("http://example.com/articles/"), n, F.lit("?b=2&a=1#frag")
            )
        )
    )
    canon = docs.select(
        "doc_id", canonical_url(url).alias("canonical")
    )
    w = Window.partitionBy("canonical")
    return canon.select(
        "doc_id",
        "canonical",
        F.count(F.lit(1)).over(w).cast("long").alias("n_variants"),
    )


_URL_CANON_SQL = r"""
WITH base AS (
  SELECT doc_id,
         CASE (doc_id % 4)
           WHEN 0 THEN 'https://example.com/articles/' || (doc_id // 4)::VARCHAR
           WHEN 1 THEN 'HTTP://WWW.Example.com/articles/' || (doc_id // 4)::VARCHAR || '/'
           WHEN 2 THEN 'https://example.com:443/articles/' || (doc_id // 4)::VARCHAR || '?utm_source=feed'
           ELSE 'http://example.com/articles/' || (doc_id // 4)::VARCHAR || '?b=2&a=1#frag'
         END AS url
  FROM documents
),
s2 AS (
  SELECT doc_id,
         regexp_replace(regexp_replace(trim(url), '#.*$', ''),
                        '(?i)^[a-z][a-z0-9+.-]*://', '') AS u
  FROM base
),
parts AS (
  SELECT doc_id,
         regexp_replace(regexp_replace(
           lower(regexp_extract(u, '^([^/?]+)', 1)), '^www\.', ''),
           ':(80|443)$', '') AS host,
         regexp_replace(u, '^[^/?]+', '') AS rest
  FROM s2
),
pq AS (
  SELECT doc_id, host,
         regexp_replace(regexp_replace(rest, '\?.*$', ''),
                        '/index\.html?$', '/') AS p1,
         CASE WHEN regexp_matches(rest, '\?')
              THEN regexp_replace(rest, '^[^?]*\?', '') ELSE '' END AS query
  FROM parts
),
norm AS (
  SELECT doc_id, host,
         regexp_replace(p1, '/+$', '') AS path,
         array_to_string(list_sort(list_filter(string_split(query, '&'),
           x -> x <> '' AND NOT regexp_matches(x, '^(utm_[^=]*|fbclid|gclid|ref)='))), '&') AS q2
  FROM pq
),
canon AS (
  SELECT doc_id,
         host || path || CASE WHEN q2 <> '' THEN '?' || q2 ELSE '' END AS canonical
  FROM norm
)
SELECT doc_id, canonical,
       count(*) OVER (PARTITION BY canonical)::BIGINT AS n_variants
FROM canon
"""


def q_ngram_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source corpus diversity: distinct-n over word trigrams — the
    share of trigram OCCURRENCES that are unique types. Low ratio =
    templated/repetitive source (a known generation-quality and
    memorization risk); the per-source number is what a training-mix
    decision consumes.

    Two map-combined keyed shuffles ((source, shingle) count, then a
    per-source rollup) — never count_distinct over the exploded stream
    (an Expand-based distinct agg would double the shuffle volume; the
    two-level groupBy carries one row per distinct type instead)."""
    from sparkprep.operators import dedup as dd

    docs = t(spark, sf_dir, "documents").select("source", "text")
    occ = dd.explode_shingles(docs, "text", "source", k=3, distinct=False)
    by_type = occ.groupBy("source", "shingle").agg(
        F.count(F.lit(1)).alias("occ")
    )
    return (
        by_type.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("distinct_ngrams"),
            F.sum("occ").alias("total_ngrams"),
        )
        .select(
            "source",
            F.col("distinct_ngrams").cast("long").alias("distinct_ngrams"),
            F.col("total_ngrams").cast("long").alias("total_ngrams"),
            F.round(
                F.try_divide("distinct_ngrams", "total_ngrams"), 6
            ).alias("distinct_ratio"),
        )
        .orderBy("source")
    )


# same trigram construction as the minhash oracles (llmprep), minus the
# per-doc DISTINCT: diversity wants every occurrence counted
_NGRAM_DIVERSITY_SQL = r"""
WITH toks AS (
  SELECT source, string_split(text, ' ') AS tk FROM documents
),
occ AS (
  SELECT source, tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2] AS shingle
  FROM toks, UNNEST(range(1, len(tk) - 1)) AS u(i)
),
by_type AS (
  SELECT source, shingle, count(*) AS occ FROM occ GROUP BY source, shingle
)
SELECT source,
       count(*)::BIGINT AS distinct_ngrams,
       sum(occ)::BIGINT AS total_ngrams,
       round(count(*) / sum(occ)::DOUBLE, 6) AS distinct_ratio
FROM by_type GROUP BY source ORDER BY source
"""


def q_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length-weighted deterministic document sample, 5 per source
    (mix.weighted_sample_topk): A-ES keys from salted md5 — the
    no-RNG sampling discipline, so DuckDB replays the exact draw."""
    from sparkprep.operators import mix

    docs = t(spark, sf_dir, "documents").select("source", "doc_id", "n_chars")
    out = mix.weighted_sample_topk(docs, "source", "n_chars", k=5, id_col="doc_id")
    return out.select(
        "source", "doc_id", F.col("n_chars").cast("long").alias("n_chars")
    ).orderBy("source", "doc_id")


_WEIGHTED_SAMPLE_SQL = """
WITH w AS (
  SELECT source, doc_id, n_chars,
         round(pow((('0x' || substr(md5(doc_id::VARCHAR || 'aes'), 1, 15))::BIGINT + 1)
                     / 1152921504606846976.0,
                   1.0 / n_chars), 12) AS key
  FROM documents WHERE n_chars IS NOT NULL AND n_chars > 0
),
r AS (
  SELECT source, doc_id, n_chars,
         row_number() OVER (PARTITION BY source
                            ORDER BY key DESC, doc_id ASC) AS rk
  FROM w
)
SELECT source, doc_id, n_chars::BIGINT AS n_chars
FROM r WHERE rk <= 5 ORDER BY source, doc_id
"""


def q_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mix planning under availability: water-fill a 140k-char budget
    across sources (weight = √docs, cap = chars available). Small
    sources saturate at their cap; the freed budget reflows to the rest
    exactly (mix.budget_allocation — closed form, windows over the
    20-row source frame only)."""
    from sparkprep.operators import mix

    docs = t(spark, sf_dir, "documents")
    src = docs.groupBy("source").agg(
        F.round(F.pow(F.count(F.lit(1)), 0.5), 6).alias("w"),
        F.sum("n_chars").cast("double").alias("cap"),
    )
    out = mix.budget_allocation(src, "source", "w", "cap", budget=140000.0)
    return out.orderBy("source")


_TOKEN_BUDGET_SQL = """
WITH src AS (
  SELECT source, round(pow(count(*), 0.5), 6) AS w, sum(n_chars)::DOUBLE AS cap
  FROM documents GROUP BY 1
),
st AS (SELECT source, w, cap, cap / w AS r FROM src),
c AS (
  SELECT source, w, cap, r,
         row_number() OVER (ORDER BY r, source) AS rn,
         (140000.0 - sum(cap) OVER (ORDER BY r, source ROWS UNBOUNDED PRECEDING))
           / nullif(sum(w) OVER ()
                    - sum(w) OVER (ORDER BY r, source ROWS UNBOUNDED PRECEDING), 0)
           AS lam_i,
         sum(w) OVER () AS tw
  FROM st
),
s AS (SELECT *, (lam_i IS NOT NULL AND r <= lam_i) AS sat FROM c),
p AS (SELECT *, max(CASE WHEN sat THEN rn END) OVER () AS pp FROM s),
l AS (SELECT *, max(CASE WHEN rn = pp THEN lam_i END) OVER () AS lam_sat FROM p)
SELECT source, w AS weight, cap,
       round(least(cap, coalesce(lam_sat, 140000.0 / tw) * w), 4) AS alloc
FROM l ORDER BY source
"""



def q_top_p_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nucleus (top-p) corpus trimming: per source, keep the
    highest-n_chars docs until 80% of the source's character mass is
    covered (crossing row kept, doc_id tiebreak). DECIMAL-exact
    running sums make the keep boundary engine- and layout-stable."""
    from sparkprep.operators import mix

    docs = t(spark, sf_dir, "documents").select("doc_id", "source", "n_chars")
    return mix.top_p_by_group(docs, "source", "n_chars", 0.8, "doc_id")


_TOP_P_SQL = """
WITH w AS (
  SELECT doc_id, source, n_chars,
         sum(CAST(n_chars AS DECIMAL(18,6))) OVER (
           PARTITION BY source ORDER BY n_chars DESC, doc_id ASC
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
         sum(CAST(n_chars AS DECIMAL(18,6))) OVER (PARTITION BY source) AS total
  FROM documents
)
SELECT doc_id, source, n_chars,
       (cum - n_chars::DECIMAL(18,6)) < total * 0.800000::DECIMAL(7,6) AS keep
FROM w
"""


def q_preference_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DPO/RLHF-style preference-pair construction: within each
    (lang, source) cell, pair the i-th longest document (chosen) with
    the i-th shortest (rejected) — n_chars as the stand-in quality
    signal — so every pair is (better, worse) with a non-negative
    margin and no document appears twice. One window + one
    co-partitioned equi-join (operators/mix.preference_pairs)."""
    from sparkprep.operators import mix

    docs = t(spark, sf_dir, "documents").select(
        "doc_id", "lang", "source", "n_chars"
    )
    pairs = mix.preference_pairs(
        docs, ["lang", "source"], "n_chars", "doc_id"
    )
    return pairs.select(
        "lang",
        "source",
        "chosen_id",
        "rejected_id",
        F.col("margin").cast("bigint").alias("margin"),
    )


_PREFERENCE_PAIRS_SQL = """
WITH ranked AS (
  SELECT lang, source, doc_id, n_chars,
         row_number() OVER (PARTITION BY lang, source
                            ORDER BY n_chars DESC, doc_id ASC) AS rb,
         count(*) OVER (PARTITION BY lang, source) AS n
  FROM documents
),
best AS (
  SELECT lang, source, rb AS i, doc_id AS chosen_id, n_chars AS cs
  FROM ranked WHERE rb <= n / 2.0
),
worst AS (
  SELECT lang, source, n + 1 - rb AS i, doc_id AS rejected_id,
         n_chars AS rs
  FROM ranked WHERE rb > n - floor(n / 2.0)
)
SELECT b.lang, b.source, b.chosen_id, w.rejected_id,
       (b.cs - w.rs)::BIGINT AS margin
FROM best b
JOIN worst w
  ON b.lang IS NOT DISTINCT FROM w.lang
 AND b.source IS NOT DISTINCT FROM w.source
 AND b.i = w.i
"""


def q_token_js(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary-level Jensen-Shannon divergence between the en slice
    and the rest of the corpus — the token-distribution drift monitor
    numeric PSI can't see (operators/text.token_js_divergence: one
    explode + one map-combined groupBy(token); rounded-ln
    DECIMAL(18,6) terms for engine parity)."""
    docs = t(spark, sf_dir, "documents")
    return tx.token_js_divergence(docs, "text", F.col("lang") == "en")


_TOKEN_JS_SQL = r"""
WITH tk AS (
  SELECT lang = 'en' AS side,
         unnest(list_filter(regexp_split_to_array(trim(text), '\s+'),
                            x -> x <> '')) AS tok
  FROM documents
),
counts AS (
  SELECT tok,
         sum(CASE WHEN side THEN 1 ELSE 0 END) AS na,
         sum(CASE WHEN NOT side THEN 1 ELSE 0 END) AS nb
  FROM tk GROUP BY tok
),
tot AS (SELECT sum(na)::DOUBLE AS ta, sum(nb)::DOUBLE AS tb FROM counts),
terms AS (
  SELECT round(CASE WHEN na > 0
               THEN (na/ta) * ln((na/ta) / (((na/ta)+(nb/tb))/2))
               ELSE 0 END, 6)::DECIMAL(18,6) AS tp,
         round(CASE WHEN nb > 0
               THEN (nb/tb) * ln((nb/tb) / (((na/ta)+(nb/tb))/2))
               ELSE 0 END, 6)::DECIMAL(18,6) AS tq,
         (na > 0)::INT AS va,
         (nb > 0)::INT AS vb,
         (na > 0 AND nb > 0)::INT AS vs
  FROM counts, tot
)
SELECT round((sum(tp)::DOUBLE + sum(tq)::DOUBLE) / 2, 4) AS js,
       sum(va)::BIGINT AS vocab_a,
       sum(vb)::BIGINT AS vocab_b,
       sum(vs)::BIGINT AS vocab_shared
FROM terms
"""


def q_bigram_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 collocations by PMI LIFT — N·c(w1,w2)/(c(w1)·c(w2)), the
    exponentiated pointwise mutual information — among bigrams seen ≥5
    times. Emitting the lift RATIO instead of its log keeps the whole
    statistic ONE IEEE division of exact int64 counts (a cross-engine
    ln() differs by a ulp and flips round() ties; log is monotone, so
    the ranking is identical anyway). Token totals broadcast into the
    bigram stream; ordering is (lift desc, w1, w2) for a deterministic
    top-k."""
    docs = t(spark, sf_dir, "documents")
    staged = docs.select(tx.tokens("text").alias("__tk")).filter(
        F.size("__tk") >= 2
    )
    n = F.size("__tk")
    bigrams = F.zip_with(
        F.slice(F.col("__tk"), 1, n - 1),
        F.slice(F.col("__tk"), 2, n - 1),
        lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
    )
    bg = staged.select(F.explode(bigrams).alias("__b")).select(
        F.col("__b.w1").alias("w1"), F.col("__b.w2").alias("w2")
    ).transform(lazy_checkpoint)  # feeds pair counts AND token totals
    pair = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c_xy"))
    # unigram totals over the SAME position stream (first-token-of-
    # bigram / second-token-of-bigram marginals), so N is shared and
    # the lift is a true contingency ratio
    totals = bg.select(F.explode(F.array("w1", "w2")).alias("side_tok"))
    nw = totals.groupBy("side_tok").agg(F.count(F.lit(1)).alias("c_w"))
    n_total = bg.count() * 2  # bounded driver scalar (A6 contract)
    c1 = nw.select(F.col("side_tok").alias("w1"), F.col("c_w").alias("__c1"))
    c2 = nw.select(F.col("side_tok").alias("w2"), F.col("c_w").alias("__c2"))
    scored = (
        # unigram marginals are VOCAB grain (scale with corpus
        # cardinality) — no forced broadcast; AQE picks the build side
        pair.filter(F.col("c_xy") >= 5)
        .join(c1, "w1")
        .join(c2, "w2")
        .select(
            "w1",
            "w2",
            F.col("c_xy").cast("long").alias("c_xy"),
            F.round(
                (F.lit(int(n_total)) * F.col("c_xy"))
                / (F.col("__c1") * F.col("__c2")),
                6,
            ).alias("pmi_lift"),
        )
    )
    return scored.orderBy(F.desc("pmi_lift"), "w1", "w2").limit(20)


_BIGRAM_PMI_SQL = r"""
WITH toks AS (
  SELECT list_filter(regexp_split_to_array(trim(text), '\s+'), x -> x <> '') AS tk
  FROM documents
),
bg AS (
  SELECT tk[i] AS w1, tk[i + 1] AS w2
  FROM toks, UNNEST(range(1, len(tk))) AS u(i)
  WHERE len(tk) >= 2
),
pair AS (SELECT w1, w2, count(*) AS c_xy FROM bg GROUP BY 1, 2),
totals AS (
  SELECT tok, count(*) AS c_w FROM (
    SELECT w1 AS tok FROM bg UNION ALL SELECT w2 AS tok FROM bg
  ) GROUP BY 1
),
n AS (SELECT count(*) * 2 AS n_total FROM bg)
SELECT w1, w2, c_xy::BIGINT AS c_xy,
       round((n.n_total * c_xy) / (c1.c_w * c2.c_w), 6) AS pmi_lift
FROM pair
JOIN totals c1 ON pair.w1 = c1.tok
JOIN totals c2 ON pair.w2 = c2.tok
CROSS JOIN n
WHERE c_xy >= 5
ORDER BY pmi_lift DESC, w1, w2
LIMIT 20
"""


def q_source_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise vocabulary Jaccard between corpus sources — the
    diversity matrix that says which feeds are near-clones of each
    other before any document-level dedup runs. Per-doc tokens are
    ``array_distinct``-ed BEFORE the explode (row-local, CLAUDE.md);
    one groupBy collapses to the distinct (source, token) stream; the
    intersection self-join keys on the token with fan-out bounded by
    (#sources containing it)² ≤ 400 — safe where the same join keyed
    by DOCUMENTS would be the all-pairs trap (the landmine this
    deliberately is not: sources are a bounded dimension). Jaccard is
    one IEEE division of exact int64 counts."""
    docs = t(spark, sf_dir, "documents")
    st = (
        docs.select(
            "source",
            F.explode(F.array_distinct(tx.tokens("text"))).alias("__tok"),
        )
        .groupBy("source", "__tok")
        .agg(F.count(F.lit(1)).alias("__dummy"))
        .select("source", "__tok")
    )
    st = st.transform(lazy_checkpoint)  # vocab sizes AND both join sides
    sizes = st.groupBy("source").agg(F.count(F.lit(1)).alias("n"))
    a = st.select(F.col("source").alias("source_a"), "__tok")
    b = st.select(F.col("source").alias("source_b"), "__tok")
    inter = (
        a.join(b, "__tok")
        .filter(F.col("source_a") < F.col("source_b"))
        .groupBy("source_a", "source_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    na = sizes.select(F.col("source").alias("source_a"), F.col("n").alias("__na"))
    nb = sizes.select(F.col("source").alias("source_b"), F.col("n").alias("__nb"))
    return (
        inter.join(F.broadcast(na), "source_a")
        .join(F.broadcast(nb), "source_b")
        .select(
            "source_a",
            "source_b",
            F.col("n_common").cast("long").alias("n_common"),
            F.round(
                F.col("n_common")
                / (F.col("__na") + F.col("__nb") - F.col("n_common")),
                4,
            ).alias("jaccard"),
        )
    )


_SOURCE_OVERLAP_SQL = r"""
WITH st AS (
  SELECT DISTINCT source, tok
  FROM documents,
       UNNEST(list_filter(regexp_split_to_array(trim(text), '\s+'),
                          x -> x <> '')) AS u(tok)
),
sizes AS (SELECT source, count(*) AS n FROM st GROUP BY 1),
inter AS (
  SELECT a.source AS source_a, b.source AS source_b, count(*) AS n_common
  FROM st a JOIN st b ON a.tok = b.tok AND a.source < b.source
  GROUP BY 1, 2
)
SELECT source_a, source_b, n_common::BIGINT AS n_common,
       round(n_common / (na.n + nb.n - n_common), 4) AS jaccard
FROM inter
JOIN sizes na ON inter.source_a = na.source
JOIN sizes nb ON inter.source_b = nb.source
"""



def q_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document n-gram novelty curve: the fraction of a doc's
    DISTINCT 3-gram shingles never seen in any earlier doc (by doc_id
    order) — the redundancy-growth readout a crawl pipeline watches to
    decide when a source is mined out. First-occurrence attribution is
    one map-combined min(doc_id) per shingle; the join back is 1:n on
    the shingle value against the AGGREGATED first-seen map (never a
    shingle-value self-join — that fan-out is the CLAUDE.md all-pairs
    trap); distinctness is ``array_distinct`` before the explode
    (row-local, no post-explode exchange). Exact integer counts; one
    division, DECIMAL(18,8)-recast before the display round."""
    from sparkprep.operators import dedup as dd

    docs = t(spark, sf_dir, "documents").select("doc_id", "text")
    occ = dd.explode_shingles(docs, "text", "doc_id", k=3, distinct=True)
    # first-seen attribution via a shingle-KEYED window (high-cardinality
    # key) instead of groupBy(shingle) + join-back: one exchange of the
    # shingle stream, no sort-merge join, and the single consumer chain
    # makes the checkpoint unnecessary (r10, the prefix_jaccard_join
    # rewrite; identical first-seen values)
    from pyspark.sql.window import Window

    first = occ.withColumn(
        "__first", F.min("doc_id").over(Window.partitionBy("shingle"))
    )
    per = first.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("__n"),
        F.sum(
            F.when(F.col("doc_id") == F.col("__first"), 1).otherwise(0)
        ).alias("__novel"),
    )
    return per.select(
        "doc_id",
        F.col("__n").cast("long").alias("n_shingles"),
        F.col("__novel").cast("long").alias("n_novel"),
        F.round(
            F.try_divide(F.col("__novel"), F.col("__n")).cast(
                "decimal(18,8)"
            ),
            4,
        ).cast("double").alias("novelty"),
    )


# same trigram construction as the minhash oracles (llmprep), WITH the
# per-doc DISTINCT: novelty is over shingle SETS
_NGRAM_NOVELTY_SQL = r"""
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS tk FROM documents
),
occ AS (
  SELECT DISTINCT doc_id, tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2] AS shingle
  FROM toks, UNNEST(range(1, len(tk) - 1)) AS u(i)
),
fst AS (SELECT shingle, min(doc_id) AS first_doc FROM occ GROUP BY 1)
SELECT doc_id,
       count(*)::BIGINT AS n_shingles,
       sum(CASE WHEN doc_id = first_doc THEN 1 ELSE 0 END)::BIGINT AS n_novel,
       round((sum(CASE WHEN doc_id = first_doc THEN 1 ELSE 0 END)
              / count(*)::DOUBLE)::DECIMAL(18,8), 4)::DOUBLE AS novelty
FROM occ JOIN fst USING (shingle)
GROUP BY doc_id
"""


QUERIES = {
    "source_overlap": q_source_overlap,
    "bigram_pmi": q_bigram_pmi,
    "span_dedup": q_span_dedup,
    "url_canon": q_url_canon,
    "keep_best": q_keep_best,
    "mix_weights": q_mix_weights,
    "top_p_sources": q_top_p_sources,
    "bigram_lm": q_bigram_lm,
    "train_order": q_train_order,
    "label_centroids": q_label_centroids,
    "boilerplate_scrub": q_boilerplate_scrub,
    "domain_stats": q_domain_stats,
    "char_entropy": q_char_entropy,
    "grouped_split": q_grouped_split,
    "grouped_kfold": q_grouped_kfold,
    "ngram_diversity": q_ngram_diversity,
    "ngram_novelty": q_ngram_novelty,
    "weighted_sample": q_weighted_sample,
    "token_budget": q_token_budget,
    "preference_pairs": q_preference_pairs,
    "token_js": q_token_js,
}

ORACLES = {
    "source_overlap": _SOURCE_OVERLAP_SQL,
    "bigram_pmi": _BIGRAM_PMI_SQL,
    "top_p_sources": _TOP_P_SQL,
    "ngram_diversity": _NGRAM_DIVERSITY_SQL,
    "ngram_novelty": _NGRAM_NOVELTY_SQL,
    "weighted_sample": _WEIGHTED_SAMPLE_SQL,
    "token_budget": _TOKEN_BUDGET_SQL,
    "url_canon": _URL_CANON_SQL,
    "preference_pairs": _PREFERENCE_PAIRS_SQL,
    "token_js": _TOKEN_JS_SQL,
    "span_dedup": _SPAN_DEDUP_SQL,
    "keep_best": _KEEP_BEST_SQL,
    "mix_weights": _MIX_WEIGHTS_SQL,
    "bigram_lm": _BIGRAM_LM_SQL,
    "train_order": _TRAIN_ORDER_SQL,
    "label_centroids": _LABEL_CENTROIDS_SQL,
    "boilerplate_scrub": _BOILERPLATE_SCRUB_SQL,
    "domain_stats": _DOMAIN_STATS_SQL,
    "char_entropy": _CHAR_ENTROPY_SQL,
    "grouped_split": _GROUPED_SPLIT_SQL,
    "grouped_kfold": _GROUPED_KFOLD_SQL,
}


# ---------------------------------------------------------------------------
# largest-remainder token-budget apportionment — round 8
# ---------------------------------------------------------------------------

_APPORTION_BUDGET = 100_000


def q_budget_apportion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Integer apportionment of a fixed token budget across sources by
    the largest-remainder (Hamilton) method: quota_i = ⌊B·n_i/N⌋ plus
    one extra token-share for the largest remainders until the budget
    is exact — the allocator that turns mix_weights' real-valued
    shares into per-source integer quotas that SUM EXACTLY to B (naive
    rounding over- or under-shoots; training-data manifests need the
    ledger to balance).

    Everything is exact integer arithmetic: remainders are compared as
    B·n_i mod N (ints — no float ranking anywhere), the rank comes
    from ONE window over the |sources| frame, and the test asserts
    Σquota = B to the token. Ties break by source name."""
    docs = t(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    toks = docs.groupBy("source").agg(
        F.sum(F.size(F.split(F.col("text"), " "))).cast("long").alias("n_tok")
    )
    tot = toks.agg(
        F.sum("n_tok").alias("N"), F.count(F.lit(1)).alias("k")
    )
    B = F.lit(_APPORTION_BUDGET).cast("long")
    staged = toks.crossJoin(F.broadcast(tot)).select(
        "source",
        "n_tok",
        F.expr(f"({_APPORTION_BUDGET} * n_tok) div N").alias("floor_q"),
        F.expr(f"({_APPORTION_BUDGET} * n_tok) % N").alias("rem"),
    )
    from pyspark.sql.window import Window

    wr = Window.orderBy(F.desc("rem"), F.asc("source"))
    # shortfall = B − Σfloor_q, computed on the |sources| frame itself
    wall = Window.partitionBy()
    ranked = staged.select(
        "source",
        "n_tok",
        "floor_q",
        "rem",
        F.row_number().over(wr).alias("__rk"),
        (B - F.sum("floor_q").over(wall)).alias("__short"),
    )
    return ranked.select(
        "source",
        F.col("n_tok").alias("n_tokens"),
        (
            F.col("floor_q")
            + (F.col("__rk") <= F.col("__short")).cast("long")
        ).cast("long").alias("quota"),
        F.col("rem").cast("long").alias("remainder"),
    ).orderBy("source")


_BUDGET_APPORTION_SQL = f"""
WITH ba_t AS (
  SELECT source, sum(len(string_split(text, ' ')))::BIGINT AS n_tok
  FROM documents WHERE text IS NOT NULL GROUP BY 1
),
ba_n AS (SELECT sum(n_tok) AS nn FROM ba_t),
ba_s AS (
  SELECT source, n_tok,
         ({_APPORTION_BUDGET} * n_tok) // nn AS floor_q,
         ({_APPORTION_BUDGET} * n_tok) % nn AS rem
  FROM ba_t CROSS JOIN ba_n
),
ba_r AS (
  SELECT *,
         row_number() OVER (ORDER BY rem DESC, source) AS rk,
         {_APPORTION_BUDGET} - sum(floor_q) OVER () AS short
  FROM ba_s
)
SELECT source, n_tok AS n_tokens,
       (floor_q + (rk <= short)::BIGINT)::BIGINT AS quota,
       rem::BIGINT AS remainder
FROM ba_r ORDER BY source
"""


QUERIES["budget_apportion"] = q_budget_apportion
ORACLES["budget_apportion"] = _BUDGET_APPORTION_SQL


# ---------------------------------------------------------------------------
# Burrows' delta stylometric source-distance panel — round 10
# ---------------------------------------------------------------------------

_BD_TOP_WORDS = 30
_BD_TOP_SOURCES = 10


def q_burrows_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Burrows' delta between the ten highest-volume sources — the
    classic stylometric distance (mean |Δz| of per-source relative
    frequencies of the corpus' 30 most frequent words, z-scored per
    word across sources). The corpus-forensics readout that clusters
    sources by REGISTER (function-word profile) where token_js and
    domain_stats only see topic/volume — near-zero delta between two
    'different' sources is a template/mirror red flag upstream of
    near-dup mining.

    Exactness: frequencies are ONE division of exact int64 counts;
    per-word mean/std use DECIMAL(38,18)-recast sums divided by the
    exact per-word row COUNT (robust to fewer sources at tiny SF);
    z and |Δz| are short IEEE chains on identical doubles; sd = 0
    degenerates through try_divide → NULL terms skipped identically
    by both engines' conditional sums. Scale shape: one token-explode
    groupBy (map-combined), then everything lives on bounded frames —
    the (word × source) grid is 30×10; counts and grid frames are
    localCheckpoint-ed for their multi-consumer joins; top-k cuts are
    TakeOrdered, the token stream is never globally ranked."""
    docs = t(spark, sf_dir, "documents")
    tok = docs.select(
        "source", F.explode(tx.tokens(F.lower(F.col("text")))).alias("w")
    )
    counts = (
        tok.groupBy("source", "w")
        .agg(F.count(F.lit(1)).alias("c"))
        .transform(lazy_checkpoint)
    )
    src_tot = counts.groupBy("source").agg(F.sum("c").alias("n"))
    top_src = (
        src_tot.orderBy(F.desc("n"), F.asc("source"))
        .limit(_BD_TOP_SOURCES)
    )
    top_w = (
        counts.groupBy("w")
        .agg(F.sum("c").alias("cw"))
        .orderBy(F.desc("cw"), F.asc("w"))
        .limit(_BD_TOP_WORDS)
        .select("w")
    )
    grid = top_src.crossJoin(F.broadcast(top_w))
    f = (
        grid.join(counts, ["source", "w"], "left")
        .select(
            "source",
            "w",
            F.try_divide(
                F.coalesce("c", F.lit(0)).cast("double"),
                F.col("n").cast("double"),
            ).alias("f"),
        )
        .transform(lazy_checkpoint)
    )
    mu = f.groupBy("w").agg(
        F.try_divide(
            F.sum(F.col("f").cast("decimal(38,18)")).cast("double"),
            F.count(F.lit(1)).cast("double"),
        ).alias("mu")
    )
    fm = f.join(mu, "w")
    sd = fm.groupBy("w").agg(
        F.sqrt(
            F.try_divide(
                F.sum(
                    (
                        (F.col("f") - F.col("mu")) * (F.col("f") - F.col("mu"))
                    ).cast("decimal(38,18)")
                ).cast("double"),
                F.count(F.lit(1)).cast("double"),
            )
        ).alias("sd")
    )
    z = (
        fm.join(sd, "w")
        .select(
            "source",
            "w",
            F.try_divide(F.col("f") - F.col("mu"), F.col("sd")).alias("z"),
        )
        .transform(lazy_checkpoint)
    )
    a = z.select(
        F.col("source").alias("source_a"), "w", F.col("z").alias("za")
    )
    b = z.select(
        F.col("source").alias("source_b"), F.col("w").alias("wb"),
        F.col("z").alias("zb"),
    )
    pairs = a.join(
        b,
        (F.col("w") == F.col("wb"))
        & (F.col("source_a") < F.col("source_b")),
    )
    return (
        pairs.groupBy("source_a", "source_b")
        .agg(
            F.count(F.col("za") - F.col("zb")).cast("long").alias("n_terms"),
            F.round(
                F.try_divide(
                    F.sum(
                        F.abs(F.col("za") - F.col("zb")).cast("decimal(38,18)")
                    ).cast("double"),
                    F.count(F.col("za") - F.col("zb")).cast("double"),
                ).cast("decimal(18,8)"),
                6,
            )
            .cast("double")
            .alias("delta"),
        )
        .orderBy("source_a", "source_b")
    )


_BURROWS_DELTA_SQL = f"""
WITH bd_tok AS (
  SELECT source, unnest(list_filter(
    regexp_split_to_array(trim(lower(text)), '\\s+'), x -> x <> '')) AS w
  FROM documents
),
bd_cnt AS MATERIALIZED (
  SELECT source, w, count(*)::BIGINT AS c FROM bd_tok GROUP BY 1, 2
),
bd_src AS MATERIALIZED (
  SELECT source, sum(c) AS n FROM bd_cnt GROUP BY 1
  ORDER BY sum(c) DESC, source LIMIT {_BD_TOP_SOURCES}
),
bd_w AS MATERIALIZED (
  SELECT w FROM (SELECT w, sum(c) AS cw FROM bd_cnt GROUP BY 1)
  ORDER BY cw DESC, w LIMIT {_BD_TOP_WORDS}
),
bd_f AS MATERIALIZED (
  SELECT s.source, g.w,
         coalesce(c.c, 0)::DOUBLE / s.n::DOUBLE AS f
  FROM bd_src s CROSS JOIN bd_w g
  LEFT JOIN bd_cnt c ON c.source = s.source AND c.w = g.w
),
bd_mu AS (
  SELECT w, sum((f)::DECIMAL(38,18))::DOUBLE / count(*)::DOUBLE AS mu
  FROM bd_f GROUP BY 1
),
bd_sd AS (
  SELECT f.w,
         sqrt(sum(((f.f - m.mu) * (f.f - m.mu))::DECIMAL(38,18))::DOUBLE
              / count(*)::DOUBLE) AS sd
  FROM bd_f f JOIN bd_mu m ON f.w = m.w GROUP BY 1
),
bd_z AS MATERIALIZED (
  SELECT f.source, f.w, (f.f - m.mu) / s.sd AS z
  FROM bd_f f JOIN bd_mu m ON f.w = m.w JOIN bd_sd s ON f.w = s.w
)
SELECT a.source AS source_a, b.source AS source_b,
       count(a.z - b.z)::BIGINT AS n_terms,
       round((sum((abs(a.z - b.z))::DECIMAL(38,18))::DOUBLE
              / count(a.z - b.z)::DOUBLE)::DECIMAL(18,8), 6)::DOUBLE AS delta
FROM bd_z a JOIN bd_z b ON a.w = b.w AND a.source < b.source
GROUP BY 1, 2 ORDER BY 1, 2
"""


QUERIES["burrows_delta"] = q_burrows_delta
ORACLES["burrows_delta"] = _BURROWS_DELTA_SQL
