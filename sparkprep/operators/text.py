"""Text-analysis operators for LLM training-data pipelines (north-star
extension beyond the reference surface — BASELINE.json): tokenization,
quality scoring, language ID, document fingerprinting, word counts.

All operators are native Catalyst expressions (higher-order array
functions), so they vectorize, partial-aggregate, and survive a 100 TB
scan without a Python boundary. The reference's only text op was the RDD
word count (Pyspark-WordCount-1.py) — kept here DataFrame-native (A11).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _col(c) -> Column:
    return F.col(c) if isinstance(c, str) else c


def tokens(c) -> Column:
    """Whitespace tokenization. ``split`` on ``\\s+`` after trim, so
    multi-space/tab/newline behave; empty string → single '' token
    filtered out."""
    return F.filter(F.split(F.trim(_col(c)), r"\s+"), lambda x: x != "")


def token_count(c) -> Column:
    return F.size(tokens(c)).cast("long")


BPE_ISH_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def regex_tokens(c, pattern: str = BPE_ISH_PATTERN) -> Column:
    """BPE-ish pre-tokenization (GPT-2-style coarse classes: letter
    runs, digit runs, single punctuation marks) — the token-budget
    estimator for LLM pipelines. Word-count proxies undercount code and
    punctuation-heavy text; this doesn't."""
    return F.regexp_extract_all(_col(c), F.lit(pattern), 0)


def regex_token_count(c, pattern: str = BPE_ISH_PATTERN) -> Column:
    return F.size(regex_tokens(c, pattern)).cast("long")


def char_count(c) -> Column:
    return F.length(_col(c)).cast("long")


def avg_word_len(c, round_to: int = 4) -> Column:
    """Mean token length, via aggregate over the token array (no explode,
    no shuffle). Empty/NULL text -> NULL (``try_divide``: ANSI mode
    otherwise makes ONE empty document crash the whole corpus scan with
    DIVIDE_BY_ZERO — DuckDB's x/0 is NULL, so this also keeps oracle
    parity on degenerate rows)."""
    toks = tokens(c)
    total = F.aggregate(toks, F.lit(0), lambda acc, x: acc + F.length(x))
    return F.round(F.try_divide(total, F.size(toks)), round_to)


def stopword_ratio(c, stopwords: list[str], round_to: int = 4) -> Column:
    """Fraction of tokens in a stopword list — the classic 'is this
    natural language' quality signal (Gopher/C4-style filters).
    Empty/NULL text -> NULL (see avg_word_len on the ANSI guard)."""
    toks = tokens(c)
    hits = F.size(F.filter(toks, lambda x: x.isin(*stopwords)))
    return F.round(F.try_divide(hits, F.size(toks)), round_to)


def non_alpha_ratio(c, round_to: int = 4) -> Column:
    """Fraction of characters outside [a-zA-Z ] — punctuation/digit/
    symbol density. Empty/NULL text -> NULL (see avg_word_len)."""
    s = _col(c)
    stripped = F.regexp_replace(s, "[a-zA-Z ]", "")
    return F.round(F.try_divide(F.length(stripped), F.length(s)), round_to)


EN_STOPWORDS = ["the", "a", "and", "of", "to", "in", "is", "it"]

_LANG_STOPWORDS = {
    "de": ["der", "die", "und", "das", "ist", "nicht", "ein", "mit"],
    "en": EN_STOPWORDS,
    "es": ["el", "los", "las", "una", "y", "que", "por", "con"],
    "fr": ["le", "les", "et", "des", "une", "est", "dans", "pour"],
}


def lang_scores(c, lang_stopwords: dict[str, list[str]] | None = None) -> dict[str, Column]:
    """Per-language stopword hit counts (n-gram-free heuristic language
    ID; word-level stopword evidence)."""
    lang_stopwords = lang_stopwords or _LANG_STOPWORDS
    toks = tokens(c)

    def in_set(sw):
        # single-arg lambda: F.filter treats 2-arg lambdas as (elem, idx)
        return lambda x: x.isin(*sw)

    return {lang: F.size(F.filter(toks, in_set(sw))) for lang, sw in lang_stopwords.items()}


def argmax_lang(scores: dict[str, Column]) -> Column:
    """First-k-wins argmax CASE chain over per-language score columns
    (ties to the alphabetically-first language) — the deterministic
    argmax both raters and their oracle CASE chains share.

    Pass MATERIALIZED columns when the scores are expensive: each score
    appears up to |langs|−1 times in the chain, and re-embedding an
    interpreted filter/replace expression re-evaluates it per
    appearance (0.65s → 0.45s measured on 5k docs from staging the
    scores as columns first — multi-referenced non-cheap aliases block
    CollapseProject, so a plain two-projection select sticks)."""
    langs = sorted(scores)  # tie-break: alphabetical priority
    # CASE WHEN s[i] >= s[j] for all j>i THEN langs[i] ... ELSE langs[-1]
    expr = None
    for i, lang in enumerate(langs[:-1]):
        cond = None
        for other in langs[i + 1:]:
            c2 = scores[lang] >= scores[other]
            cond = c2 if cond is None else (cond & c2)
        expr = F.when(cond, F.lit(lang)) if expr is None else expr.when(cond, F.lit(lang))
    return expr.otherwise(F.lit(langs[-1]))


def with_lang_id(df, text_col: str, out_col: str, method: str = "stopwords"):
    """``lang_id``/``lang_id_ngram`` as a two-projection pipeline: the
    per-language scores materialize as columns in their own projection,
    so the argmax CASE reads attributes instead of re-evaluating each
    interpreted score expression up to 3x (see :func:`argmax_lang`).
    Keeps every existing column and appends ``out_col``; same result
    as the Column-form raters."""
    base = F.col(text_col)
    scores = (
        lang_scores(base) if method == "stopwords" else lang_ngram_scores(base)
    )
    tags = {lang: f"__lid_{method}_{lang}" for lang in scores}
    staged = df.select("*", *[scores[lang].alias(tags[lang]) for lang in scores])
    cols = {lang: F.col(tags[lang]) for lang in scores}
    return staged.select(*df.columns, argmax_lang(cols).alias(out_col))


def lang_id(c, lang_stopwords: dict[str, list[str]] | None = None) -> Column:
    """Argmax of :func:`lang_scores` with a FIXED priority tie-break
    (alphabetical language order) so the result is deterministic and
    mirror-able in oracle SQL as a CASE chain. Column form — each score
    expression is re-evaluated per CASE appearance; prefer
    :func:`with_lang_id` on hot paths."""
    return argmax_lang(lang_scores(c, lang_stopwords))


_LANG_TRIGRAMS = {
    "de": ["der", "ein", "ich", "und", "sch"],
    "en": ["the", "and", "ing", "ion", "ent"],
    "es": ["que", "los", "por", "una", "con"],
    "fr": ["les", "des", "est", "une", "ans"],
}


def lang_ngram_scores(c, lang_trigrams: dict[str, list[str]] | None = None) -> dict[str, Column]:
    """Char-trigram occurrence counts per language — the n-gram
    heuristic twin of the stopword-based :func:`lang_scores`. Occurrence
    counting via the replace-length trick ((len - len(replace))/3),
    which is engine-identical (non-overlapping left-to-right in both
    Spark and DuckDB), so the oracle replays it exactly. Substring
    counts see morphology inside words ('ing', 'sch'), which
    whitespace-token stopwords cannot."""
    lang_trigrams = lang_trigrams or _LANG_TRIGRAMS
    s = F.lower(_col(c))
    out = {}
    for lang, grams in lang_trigrams.items():
        score = None
        for g in grams:
            cnt = (
                (F.length(s) - F.length(F.replace(s, F.lit(g), F.lit(""))))
                / F.lit(3)
            ).cast("long")
            score = cnt if score is None else score + cnt
        out[lang] = score
    return out


def lang_id_ngram(c, lang_trigrams: dict[str, list[str]] | None = None) -> Column:
    """Argmax of :func:`lang_ngram_scores` with the same FIXED
    alphabetical tie-break as :func:`lang_id`. Column form; prefer
    :func:`with_lang_id` (method="ngram") on hot paths."""
    return argmax_lang(lang_ngram_scores(c, lang_trigrams))


def quality_score(c, stopwords: list[str] | None = None, round_to: int = 4) -> Column:
    """Composite [0,1] quality score from length/stopword/charset
    signals — each component is a clamped linear ramp, all native:

    - length component: 1 inside [50, 1000] chars, ramping to 0 at 0/5000
    - stopword component: ratio clamped at 0.15 then scaled
    - alpha component: 1 - non_alpha_ratio
    """
    stopwords = stopwords or EN_STOPWORDS
    n = char_count(c)
    len_comp = F.when(n < 50, n / F.lit(50.0)).when(
        n > 1000, F.greatest(F.lit(0.0), 1 - (n - 1000) / F.lit(4000.0))
    ).otherwise(F.lit(1.0))
    sw_comp = F.least(stopword_ratio(c, stopwords, round_to=6) / F.lit(0.15), F.lit(1.0))
    alpha_comp = 1 - non_alpha_ratio(c, round_to=6)
    return F.round((len_comp + sw_comp + alpha_comp) / 3, round_to)


def readability(c, round_to: int = 4) -> Column:
    """Flesch reading-ease approximation, pure native expressions (the
    classic prose-difficulty quality signal): sentences = runs of
    [.!?] (floored at 1), syllables ~ vowel-group runs [aeiouy]+ with
    at least one per word — the standard cheap proxy; no dictionary,
    no Python. 206.835 - 1.015·(words/sentences) - 84.6·(syl/words);
    empty/NULL text -> NULL (0/0 via try_divide). Every regex count is
    one map-side pass; constants and op order are mirrored verbatim in
    the oracle so doubles agree bit-for-bit."""
    txt = _col(c)
    words = F.size(tokens(c))
    sentences = F.greatest(
        F.regexp_count(txt, F.lit(r"[.!?]+")), F.lit(1)
    )
    syllables = F.greatest(
        F.regexp_count(F.lower(txt), F.lit("[aeiouy]+")), words
    )
    score = (
        F.lit(206.835)
        - F.lit(1.015) * F.try_divide(words, sentences)
        - F.lit(84.6) * F.try_divide(syllables, words)
    )
    return F.round(score, round_to)


def fingerprint(c) -> Column:
    """Exact-dup fingerprint: md5 of the text (hex string — identical in
    any engine)."""
    return F.md5(_col(c))


# 28-class alphabet for char entropy: 26 case-folded letters + space;
# digits collapse to one class, everything else to a remainder class.
ENTROPY_CLASSES = [chr(o) for o in range(ord("a"), ord("z") + 1)] + [" "]


def add_char_entropy(
    df: DataFrame,
    text_col: str,
    out_col: str = "char_entropy",
    prefix: int = 1000,
    round_to: int = 4,
) -> DataFrame:
    """Shannon entropy (bits/char) of the character-class distribution —
    the CCNet/Gopher-family gibberish signal: natural English sits
    ~4.0-4.3 bits, base64/hex blobs and random noise push toward the
    ~4.8-bit uniform ceiling, and boilerplate/repeated-char runs fall
    well below 3.

    Built for the scan-side of a 100 TB gate, so every choice keeps it
    map-only whole-stage-codegen:

    - classes, not code points: 26 case-folded letters + space counted
      with the replace-length trick, digits as ONE class (one
      regexp_replace), remainder as one class — 28 fixed counters, no
      explode, no shuffle, and DuckDB can mirror every expression for
      the oracle.
    - counts over a ``prefix`` (default 1000 chars): entropy converges
      within a few hundred chars; clamping bounds the per-row cost on
      pathological documents.
    - the counts ARRAY and total are materialized in their own
      projection before the ``aggregate`` lambda (interpreted HOF
      lambdas re-evaluate embedded expression trees per element — the
      28 replaces would otherwise run 28x; see CLAUDE.md).
    - zero counts contribute exactly 0 via the multiply-by-zero guard
      ``(c/n)*log2(greatest(c,1)/n)`` — no per-element ``when``.

    NULL/empty text yields NULL entropy (gate on completeness
    separately). Round at 4: log2 is libm-dependent across engines.
    """
    lower = F.lower(F.substring(F.col(text_col), 1, prefix))
    staged = df.withColumn("__ent_s", lower)
    s = F.col("__ent_s")
    counts = [
        F.length(s) - F.length(F.replace(s, F.lit(ch), F.lit("")))
        for ch in ENTROPY_CLASSES
    ]
    digit = F.length(s) - F.length(F.regexp_replace(s, "[0-9]", ""))
    total = F.length(s)
    known = sum(counts[1:], counts[0]) + digit
    other = total - known
    staged = staged.select(
        "*",
        F.array(*counts, digit, other).alias("__ent_counts"),
        total.cast("double").alias("__ent_n"),
    )
    n = F.col("__ent_n")
    term = lambda c: (c / n) * F.log2(F.greatest(c, F.lit(1.0)) / n)  # noqa: E731
    # 0.0 - x, not -x: a pure-single-class doc sums to 0.0 and unary
    # negation would emit -0.0, which str-hashes differently than the
    # oracle's 0.0
    entropy = F.when(
        n > 0,
        F.round(
            F.lit(0.0)
            - F.aggregate(
                F.col("__ent_counts"),
                F.lit(0.0),
                lambda acc, c: acc + term(c.cast("double")),
            ),
            round_to,
        ),
    )
    return staged.withColumn(out_col, entropy).drop(
        "__ent_s", "__ent_counts", "__ent_n"
    )


def shingles(token_col, k: int = 3) -> Column:
    """k-token shingle array from a MATERIALIZED token array column.

    Takes a column reference, not raw text, on purpose: higher-order
    lambdas evaluate interpreted, and if the argument is a ``split(...)``
    expression tree each ``element_at`` re-runs the split — measured
    ~18x slower on real documents. Callers must project the token array
    into its own column first (see :func:`add_shingle_fingerprint`).
    """
    toks = _col(token_col)
    # Guard short docs: sequence(1, n) with n < 1 produces a DESCENDING
    # sequence ([1, 0, -1, ...]) and element_at(toks, 0) throws under
    # ANSI mode. Docs with fewer than k tokens get an empty shingle set.
    idx = F.when(
        F.size(toks) >= k, F.sequence(F.lit(1), F.size(toks) - (k - 1))
    ).otherwise(F.expr("array()").cast("array<int>"))
    return F.transform(
        idx,
        lambda i: F.concat_ws(" ", *[F.element_at(toks, i + j) for j in range(k)]),
    )


def add_shingle_fingerprint(
    df: DataFrame, text_col: str, out_col: str = "fp_shingle", k: int = 3
) -> DataFrame:
    """Near-dup-stable fingerprint: minimum md5 over the document's
    k-token shingles (1-hash MinHash). Two documents sharing their
    minimal shingle collide — the building block the MinHash-LSH dedup
    operator generalizes with many hash functions.
    Null for documents shorter than k tokens.

    Two-projection shape (tokens materialized first) — CollapseProject
    keeps the boundary because the token array is non-cheap and
    referenced many times, so ``split`` runs once per row.
    """
    staged = df.withColumn("__tk", tokens(text_col))
    fp = F.array_min(F.transform(shingles(F.col("__tk"), k), F.md5))
    return staged.withColumn(out_col, fp).drop("__tk")


def normalize_text(c) -> Column:
    """Canonical text normalization for dedup keys: lowercase, collapse
    whitespace runs, strip ASCII control chars, trim. Run BEFORE exact/
    near-dup fingerprinting so trivial formatting differences don't
    defeat dedup."""
    s = F.lower(_col(c))
    s = F.regexp_replace(s, r"[\x00-\x1f]", " ")
    s = F.regexp_replace(s, r"\s+", " ")
    return F.trim(s)


PII_PATTERNS = [
    # order matters: URLs before bare hostnames would; emails before words
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    (r"https?://[^\s]+", "<URL>"),
    (r"\b(?:\d{1,3}\.){3}\d{1,3}\b", "<IP>"),
    (r"\b\+?\d{1,2}[-. ]?\(?\d{3}\)?[-. ]?\d{3}[-. ]?\d{4}\b", "<PHONE>"),
]


def redact_pii(c, patterns: list[tuple[str, str]] | None = None) -> Column:
    """Training-data PII scrubbing: chained regexp_replace over email /
    URL / IP / phone patterns. Pure Catalyst expressions → runs at scan
    speed; the pattern list is data, extend per corpus. (Porting note:
    Spark's regexp_replace is global; DuckDB needs the 'g' flag.)"""
    out = _col(c)
    for pattern, token in patterns or PII_PATTERNS:
        out = F.regexp_replace(out, pattern, token)
    return out


def add_repetition_signals(
    df: DataFrame, text_col: str, k: int = 3, round_to: int = 4
) -> DataFrame:
    """Gopher-style repetition filters: fraction of duplicate k-token
    shingles and the most-frequent-token share. High values mark
    boilerplate/spam for LLM-corpus filtering. One projection pass,
    token array materialized once.

    Complexity note: top_token_ratio scans tokens once per DISTINCT
    token (O(d*n) per doc, in-row) — fine through ~1k distinct tokens;
    for book-length documents compute it via explode + groupBy(doc,
    token) instead (one shuffle, unbounded doc length)."""
    staged = df.withColumn("__tk", tokens(text_col))
    sh = shingles(F.col("__tk"), k)
    staged = staged.withColumn("__sh", sh)
    dup_ratio = F.when(
        F.size("__sh") > 0,
        1 - F.size(F.array_distinct("__sh")) / F.size("__sh"),
    ).otherwise(F.lit(None))
    top_tok = F.when(
        F.size("__tk") > 0,
        F.aggregate(
            F.transform(
                F.array_distinct("__tk"),
                lambda t: F.size(F.filter(F.col("__tk"), lambda x: x == t)),
            ),
            F.lit(0),
            lambda acc, x: F.greatest(acc, x),
        )
        / F.size("__tk"),
    ).otherwise(F.lit(None))
    return (
        staged.withColumn("dup_shingle_ratio", F.round(dup_ratio, round_to))
        .withColumn("top_token_ratio", F.round(top_tok, round_to))
        .drop("__tk", "__sh")
    )


def chunk_documents(
    df: DataFrame,
    text_col: str,
    id_col: str,
    width: int = 64,
    stride: int = 48,
) -> DataFrame:
    """RAG-style document chunking: overlapping ``width``-token windows
    every ``stride`` tokens, as one native explode (no Python UDTF —
    same result, scan-speed). Emits (id, chunk_id, chunk_text,
    n_chunk_tokens); the final partial window is kept (standard
    chunker behavior), docs shorter than one stride yield one chunk.
    """
    staged = df.withColumn("__tk", tokens(text_col))
    n = F.size("__tk")
    n_chunks = F.greatest(F.ceil((n - (width - stride)) / F.lit(stride)), F.lit(1))
    chunks = F.transform(
        F.sequence(F.lit(0), n_chunks.cast("int") - 1),
        lambda i: F.struct(
            i.cast("long").alias("chunk_id"),
            F.concat_ws(" ", F.slice(F.col("__tk"), i * stride + 1, width)).alias(
                "chunk_text"
            ),
        ),
    )
    return (
        staged.select(id_col, F.explode(chunks).alias("__c"))
        .select(
            id_col,
            F.col("__c.chunk_id").alias("chunk_id"),
            F.col("__c.chunk_text").alias("chunk_text"),
        )
        .withColumn("n_chunk_tokens", token_count("chunk_text"))
    )


def dedup_spans(
    df: DataFrame,
    text_col: str,
    id_col: str,
    width: int = 32,
) -> DataFrame:
    """C4/RefinedWeb-style exact span dedup at chunk granularity:
    repeated ``width``-token chunks are removed corpus-wide (the FIRST
    occurrence, ordered by (id, position), survives; every later
    occurrence is dropped), then each document is reassembled from its
    surviving chunks. Emits (id, n_chunks, n_kept, dedup_text);
    fully-duplicate docs come back with dedup_text = ''.

    Shuffle budget (the 100 TB concern — chunk text is the corpus):
    the keep/drop decision travels as (md5, id, pos) rows only — one
    map-combined groupBy on the hash picks min(struct(id, pos)) per
    chunk content, one tiny groupBy folds keeper positions to a
    per-doc array. Chunk TEXT crosses exactly ONE exchange: the id-join
    of exploded chunks with that keep-array (post-join partitioning is
    hash(id), so the reassembly groupBy(id) reuses it instead of adding
    a second exchange). The tokenize+explode runs twice (once per
    branch) — re-reading the scan is row-local and beats shipping the
    corpus through a second shuffle, and neither branch can be cached
    at target scale.
    """
    staged = df.withColumn("__tk", tokens(text_col))
    n_chunks = F.greatest(
        F.ceil(F.size("__tk") / F.lit(float(width))).cast("int"), F.lit(1)
    )
    chunk_arr = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.struct(
            i.cast("long").alias("pos"),
            F.concat_ws(" ", F.slice(F.col("__tk"), i * width + 1, width)).alias(
                "chunk"
            ),
        ),
    )
    exploded = staged.select(id_col, F.explode(chunk_arr).alias("__c")).select(
        F.col(id_col),
        F.col("__c.pos").alias("pos"),
        F.col("__c.chunk").alias("chunk"),
    )
    first = (
        exploded.select(id_col, "pos", F.md5("chunk").alias("h"))
        .groupBy("h")
        .agg(F.min(F.struct(F.col(id_col), F.col("pos"))).alias("k"))
    )
    keep_per_doc = (
        first.select(
            F.col(f"k.{id_col}").alias(id_col), F.col("k.pos").alias("pos")
        )
        .groupBy(id_col)
        .agg(F.collect_list("pos").alias("__keep"))
    )
    return (
        exploded.join(keep_per_doc, id_col, "left")
        .withColumn(
            "kept",
            F.coalesce(F.array_contains("__keep", F.col("pos")), F.lit(False)),
        )
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_chunks"),
            F.coalesce(F.sum(F.col("kept").cast("long")), F.lit(0)).alias("n_kept"),
            F.concat_ws(
                " ",
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(
                                F.col("kept"),
                                F.struct(F.col("pos"), F.col("chunk")),
                            )
                        )
                    ),
                    lambda s: s["chunk"],
                ),
            ).alias("dedup_text"),
        )
    )


def boilerplate_scrub(
    df: DataFrame,
    text_col: str,
    id_col: str,
    domain_col: str,
    width: int = 16,
    min_docs: int = 2,
) -> DataFrame:
    """Per-domain boilerplate removal (the C4/RefinedWeb line rule,
    at ``width``-token chunk granularity since this corpus has no line
    structure): a chunk whose content recurs in >= ``min_docs`` DISTINCT
    documents of the SAME domain is boilerplate (nav bars, cookie
    banners, footers) and EVERY occurrence is dropped — unlike
    ``dedup_spans``, no first-occurrence survivor. Emits
    (id, n_chunks, n_kept, scrub_text).

    Shuffle budget at 100 TB: chunk content travels as (domain, md5)
    through the recurrence count (map-combined groupBy; count DISTINCT
    ids via two-level agg, no expensive exact-distinct over the raw
    stream), the boilerplate verdict returns as a per-doc keep-position
    array joined on id, and chunk TEXT crosses exactly ONE exchange —
    the id-join — whose hash(id) partitioning the reassembly
    groupBy(id) then reuses. Same skeleton as ``dedup_spans``.
    """
    staged = df.withColumn("__tk", tokens(text_col))
    n_chunks = F.greatest(
        F.ceil(F.size("__tk") / F.lit(float(width))).cast("int"), F.lit(1)
    )
    chunk_arr = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.struct(
            i.cast("long").alias("pos"),
            F.concat_ws(" ", F.slice(F.col("__tk"), i * width + 1, width)).alias(
                "chunk"
            ),
        ),
    )
    exploded = staged.select(
        id_col, domain_col, F.explode(chunk_arr).alias("__c")
    ).select(
        F.col(id_col),
        F.col(domain_col),
        F.col("__c.pos").alias("pos"),
        F.col("__c.chunk").alias("chunk"),
    )
    # distinct docs per (domain, chunk-hash): pre-distinct on the full
    # key THEN count — two map-combined hash aggregates, cheaper than
    # countDistinct's expand at scale
    hashed = exploded.select(
        id_col, "pos", F.col(domain_col), F.md5("chunk").alias("h")
    )
    doc_hits = hashed.select(id_col, domain_col, "h").dropDuplicates()
    bad = (
        doc_hits.groupBy(domain_col, "h")
        .agg(F.count(F.lit(1)).alias("__nd"))
        .filter(F.col("__nd") >= min_docs)
        .select(domain_col, "h")
    )
    keep_per_doc = (
        hashed.join(bad, [domain_col, "h"], "left_anti")
        .groupBy(id_col)
        .agg(F.collect_list("pos").alias("__keep"))
    )
    return (
        exploded.drop(domain_col)
        .join(keep_per_doc, id_col, "left")
        .withColumn(
            "kept",
            F.coalesce(F.array_contains("__keep", F.col("pos")), F.lit(False)),
        )
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_chunks"),
            F.coalesce(F.sum(F.col("kept").cast("long")), F.lit(0)).alias("n_kept"),
            F.concat_ws(
                " ",
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(
                                F.col("kept"),
                                F.struct(F.col("pos"), F.col("chunk")),
                            )
                        )
                    ),
                    lambda s: s["chunk"],
                ),
            ).alias("scrub_text"),
        )
    )


def word_count(df: DataFrame, c: str, token_col: str = "token") -> DataFrame:
    """A11 — the reference's RDD word count (Pyspark-WordCount-1.py:7-9
    ``map(lambda x:(x,1)).reduceByKey(add)``) as DataFrame ops:
    explode + groupBy. Catalyst gives the map-side combine reduceByKey
    had, plus AQE sizing."""
    return (
        df.select(F.explode(tokens(c)).alias(token_col))
        .groupBy(token_col)
        .agg(F.count(F.lit(1)).alias("count"))
        .orderBy(F.desc("count"), F.asc(token_col))
    )


def unigram_lm_score(
    df: DataFrame, text_col: str, id_col: str, round_to: int = 4
) -> DataFrame:
    """Corpus-self-trained unigram LM score per document: mean
    log p(token) under the corpus's own unigram distribution — the
    classic cheap fluency/perplexity proxy for LLM-data quality
    filtering (low score = tokens rare in this corpus = outlier doc).

    Dataflow (two shuffles, both map-combined):
      1. explode tokens -> groupBy(token) count  = the "model fit"
      2. token stream ⋈ vocab on token -> groupBy(doc) avg(log p)

    The corpus-total normalizer is a window over the AGGREGATED vocab
    frame — single-partition by construction, but over |vocab| rows,
    not |corpus| (fine until the vocab itself outgrows one executor, at
    which point: localCheckpoint the vocab and embed the total as a
    literal, the A6 scalar pattern).
    """
    from pyspark.sql import Window

    toks = df.select(F.col(id_col), F.explode(tokens(text_col)).alias("__tok"))
    vocab = toks.groupBy("__tok").agg(F.count(F.lit(1)).alias("__c"))
    vocab = vocab.withColumn(
        "__lp", F.log(F.col("__c") / F.sum("__c").over(Window.partitionBy()))
    ).select("__tok", "__lp")
    return (
        toks.join(vocab, "__tok")
        .groupBy(id_col)
        .agg(F.round(F.avg("__lp"), round_to).alias("lm_score"))
    )


def bigram_lm_score(
    df: DataFrame, text_col: str, id_col: str, round_to: int = 4
) -> DataFrame:
    """Corpus-self-trained bigram LM score per document: mean
    log p(w2 | w1) over the doc's bigram positions, with
    p(w2 | w1) = c(w1 w2) / c(w1 ·) from the corpus's own counts. The
    context-sensitive upgrade of ``unigram_lm_score`` — a word-salad
    doc whose tokens are individually common still scores low because
    its TRANSITIONS are rare. Every observed bigram has nonzero
    probability under its own fit, so no smoothing term is needed.
    Docs with < 2 tokens have no bigram evidence and are dropped.

    Dataflow mirrors the unigram op (two map-combined shuffles): bigram
    explode -> groupBy(w1, w2) fit; prefix totals are a window over the
    AGGREGATED counts frame partitioned by w1 (|bigram vocab| rows, not
    |corpus|); stream ⋈ fit -> groupBy(doc) avg.
    """
    from pyspark.sql import Window

    staged = df.withColumn("__tk", tokens(text_col)).filter(F.size("__tk") >= 2)
    n = F.size("__tk")
    bigrams = F.zip_with(
        F.slice(F.col("__tk"), 1, n - 1),
        F.slice(F.col("__tk"), 2, n - 1),
        lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
    )
    bg = staged.select(F.col(id_col), F.explode(bigrams).alias("__b")).select(
        id_col, F.col("__b.w1").alias("w1"), F.col("__b.w2").alias("w2")
    )
    counts = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("__c"))
    counts = counts.withColumn(
        "__lp",
        F.log(F.col("__c") / F.sum("__c").over(Window.partitionBy("w1"))),
    ).select("w1", "w2", "__lp")
    return (
        bg.join(counts, ["w1", "w2"])
        .groupBy(id_col)
        .agg(F.round(F.avg("__lp"), round_to).alias("bigram_lm"))
    )


def tf_idf(
    df: DataFrame,
    text_col: str,
    id_col: str,
    round_to: int = 4,
) -> DataFrame:
    """TF-IDF weights per (doc, token) — the retrieval/RAG workhorse,
    expressed as two map-combined shuffles, both keyed on token-ish
    keys that scale with the corpus, never with a single task:

      1. explode -> groupBy(doc, token) count      = tf
      2. tf frame -> groupBy(token) count docs     = df (document freq)
      3. tf ⋈ df on token -> tf * ln(N / df)       = weight

    N (corpus size) is a scalar aggregate embedded as a literal (the A6
    one-job pattern) — NOT a crossJoin(broadcast(agg)), which would
    re-execute the scan. Smoothing: plain ln(N/df) (df >= 1 always, no
    division guard needed).
    """
    n_docs = df.select(id_col).distinct().count()
    toks = df.select(F.col(id_col), F.explode(tokens(text_col)).alias("token"))
    tf = toks.groupBy(id_col, "token").agg(F.count(F.lit(1)).alias("tf"))
    # document frequency via a token-KEYED window over the tf frame
    # (high-cardinality key) instead of groupBy(token) + join-back —
    # one exchange of the tf frame, no sort-merge join, no reliance on
    # ReusedExchange to dedupe the tf subtree (r10, same rewrite as
    # prefix_jaccard_join; identical (df, token) values)
    from pyspark.sql.window import Window

    withdf = tf.withColumn(
        "df", F.count(F.lit(1)).over(Window.partitionBy("token"))
    )
    return (
        withdf
        .select(
            F.col(id_col),
            "token",
            F.col("tf").cast("long").alias("tf"),
            F.col("df").cast("long").alias("df"),
            F.round(
                F.col("tf") * F.log(F.lit(float(n_docs)) / F.col("df")), round_to
            ).alias("tfidf"),
        )
    )


def bm25_scores(
    df: DataFrame,
    text_col: str,
    id_col: str,
    query_terms: list[str],
    k1: float = 1.2,
    b: float = 0.75,
    round_to: int = 4,
) -> DataFrame:
    """BM25 relevance of every document to a fixed term set (Lucene's
    idf form: ln(1 + (N - df + 0.5)/(df + 0.5))). Scalars (N, avgdl)
    come from ONE fused aggregate job; per-term df from the tf frame
    restricted to the query terms (a few rows — broadcast join). The
    per-doc score is a single groupBy(doc) sum. Term list is a plan
    literal: scoring the corpus against a QUERY TABLE instead would
    make this a broadcast join on term — same shape, just unpinned.
    """
    toks = df.select(
        F.col(id_col), tokens(text_col).alias("__tk")
    ).select(F.col(id_col), F.size("__tk").alias("dl"), F.explode("__tk").alias("token"))
    corpus = df.select(
        F.count(F.lit(1)).alias("n"),
        F.avg(token_count(text_col)).alias("avgdl"),
    ).collect()[0]
    # avgdl rounded to 6dp: it's an embedded float threshold and engine
    # summation order differs at ~1e-12 (same convention as the oracle
    # side) — unrounded it could flip a score across a 4dp boundary
    n_docs, avgdl = float(corpus["n"]), round(float(corpus["avgdl"]), 6)

    tf = (
        toks.filter(F.col("token").isin(query_terms))
        .groupBy(id_col, "token")
        .agg(F.count(F.lit(1)).alias("tf"), F.first("dl").alias("dl"))
    )
    dfreq = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    idf = F.log(
        F.lit(1.0)
        + (F.lit(n_docs) - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    term_score = idf * (
        F.col("tf") * (k1 + 1)
        / (F.col("tf") + k1 * (1 - b + b * F.col("dl") / F.lit(avgdl)))
    )
    return (
        tf.join(F.broadcast(dfreq), "token")
        .withColumn("__s", term_score)
        .groupBy(id_col)
        .agg(F.round(F.sum("__s"), round_to).alias("bm25"))
    )


def inverted_index(
    df: DataFrame,
    text_col: str,
    id_col: str,
    max_postings: int = 100,
) -> DataFrame:
    """Token -> postings-list index (keyword search / contamination
    lookup side). One shuffle on token; postings are sorted doc ids,
    CAPPED at ``max_postings`` per token — high-df tokens (stopwords)
    otherwise concentrate a corpus-sized list in one group, the classic
    inverted-index hot key. df is kept alongside so the cap is visible
    (df > max_postings => truncated list). Postings ship as a
    comma-joined string: engine-portable, columnar-friendly.
    """
    toks = (
        df.select(F.col(id_col), F.explode(tokens(text_col)).alias("token"))
        .groupBy("token", id_col)
        .agg(F.count(F.lit(1)).alias("__tf"))
    )
    return (
        toks.groupBy("token")
        .agg(
            F.count(F.lit(1)).cast("long").alias("df"),
            F.array_join(
                F.slice(F.sort_array(F.collect_list(F.col(id_col))), 1, max_postings),
                ",",
            ).alias("postings"),
        )
    )


GOPHER_REQUIRED_STOPWORDS = ["the", "be", "to", "of", "and", "that", "have", "with"]


def gopher_quality_flags(
    df: DataFrame,
    c: str = "text",
    min_words: int = 50,
    max_words: int = 100_000,
    required_stopwords: list[str] | None = None,
    min_stop_hits: int = 2,
    round_to: int = 4,
) -> DataFrame:
    """Gopher-style document quality rules (Rae et al. 2021, public):
    word-count bounds, mean word length in [3,10], symbol-to-word ratio
    ('#' and '...') <= 0.1, bullet-line ratio <= 0.9, ellipsis-line
    ratio <= 0.3, >= 80% of words containing an alphabetic character,
    and >= ``min_stop_hits`` distinct required stopwords. Adds every
    signal column plus the conjunction as ``pass``.

    The stopword list is corpus/language CONFIGURATION (Gopher's own
    list is English-web-specific): pass the list that matches the
    corpus, or the rule degenerates into a constant reject.

    Pure native expressions, one projection pipeline, no shuffle — the
    rules run as a map over the scan at any scale. Token and line
    arrays are materialized in their OWN projection before any lambda
    touches them (interpreted HOFs re-evaluate embedded trees per
    element). Ratios are rounded THEN compared, so the oracle's
    threshold decisions replay bit-identically.
    """
    required_stopwords = required_stopwords or GOPHER_REQUIRED_STOPWORDS
    s = _col(c)
    staged = df.withColumn("__tk", tokens(c)).withColumn(
        "__ln", F.filter(F.split(s, "\n"), lambda x: F.trim(x) != "")
    )
    nw = F.size("__tk").cast("long")
    nl = F.size("__ln")
    hashes = F.length(s) - F.length(F.replace(s, F.lit("#"), F.lit("")))
    ellipses = (F.length(s) - F.length(F.replace(s, F.lit("..."), F.lit("")))) / 3
    staged = staged.select(
        "*",
        nw.alias("n_words"),
        F.when(
            nw > 0,
            F.round(
                F.aggregate("__tk", F.lit(0), lambda a, x: a + F.length(x)) / nw,
                round_to,
            ),
        ).alias("mean_word_len"),
        F.when(nw > 0, F.round((hashes + ellipses) / nw, round_to)).alias(
            "symbol_ratio"
        ),
        F.when(
            nl > 0,
            F.round(
                F.size(
                    F.filter(
                        "__ln",
                        lambda x: F.substring(F.ltrim(x), 1, 1).isin("-", "*", "•"),
                    )
                )
                / nl,
                round_to,
            ),
        ).otherwise(F.lit(0.0)).alias("bullet_ratio"),
        F.when(
            nl > 0,
            F.round(
                F.size(
                    F.filter(
                        "__ln",
                        lambda x: F.rtrim(x).endswith("...")
                        | F.rtrim(x).endswith("…"),
                    )
                )
                / nl,
                round_to,
            ),
        ).otherwise(F.lit(0.0)).alias("ellipsis_ratio"),
        F.when(
            nw > 0,
            F.round(
                F.size(F.filter("__tk", lambda x: x.rlike("[A-Za-z]"))) / nw,
                round_to,
            ),
        ).alias("alpha_ratio"),
        F.size(
            F.array_intersect(
                F.transform("__tk", F.lower),
                F.array(*[F.lit(w) for w in required_stopwords]),
            )
        ).cast("long").alias("stop_hits"),
    )
    gate = (
        (F.col("n_words") >= min_words)
        & (F.col("n_words") <= max_words)
        & (F.col("mean_word_len") >= 3)
        & (F.col("mean_word_len") <= 10)
        & (F.col("symbol_ratio") <= 0.1)
        & (F.col("bullet_ratio") <= 0.9)
        & (F.col("ellipsis_ratio") <= 0.3)
        & (F.col("alpha_ratio") >= 0.8)
        & (F.col("stop_hits") >= min_stop_hits)
    )
    return staged.withColumn("pass", F.coalesce(gate, F.lit(False))).drop(
        "__tk", "__ln"
    )


def pii_census(
    df: DataFrame, text_col: str, group_col: str, patterns: list[tuple[str, str]] | None = None
) -> DataFrame:
    """PII exposure audit — the census that justifies (and QA-checks)
    :func:`redact_pii`: per-group occurrence counts of each PII pattern
    plus how many documents carry any hit.

    Counts run INDEPENDENTLY on the raw text (one projection, one
    map-combined groupBy), not on the progressively-redacted stages: the
    chained form re-inlines every prior regexp_replace into every later
    count after projection collapse (O(k²) regex evals/row), and an
    audit wants "what's present", not "what the scrubber would see
    mid-chain". Patterns are data — pass the corpus's own list.
    """
    patterns = patterns or PII_PATTERNS
    names = [tok.strip("<>").lower() for _, tok in patterns]
    counted = df.select(
        F.col(group_col),
        *[
            F.regexp_count(F.col(text_col), F.lit(pat)).cast("long").alias(f"n_{name}")
            for (pat, _), name in zip(patterns, names)
        ],
    )
    any_hit = sum((F.col(f"n_{name}") > 0).cast("int") for name in names) > 0
    return (
        counted.withColumn("__hit", any_hit.cast("long"))
        .groupBy(group_col)
        .agg(
            *[F.sum(f"n_{name}").alias(f"n_{name}") for name in names],
            F.sum("__hit").alias("docs_with_pii"),
            F.count(F.lit(1)).alias("n_docs"),
        )
        .orderBy(group_col)
    )


def zipf_slope(df: DataFrame, text_col: str, top_n: int = 1000) -> DataFrame:
    """Corpus-health check via Zipf's law: regress ln(frequency) on
    ln(rank) over the ``top_n`` most frequent whitespace tokens. A
    natural corpus fits a slope near -1 with high r²; boilerplate
    floods, dedup failures, and synthetic/templated text bend or
    flatten the line long before a human reads a sample.

    One token-count groupBy (map-side combined), a TakeOrdered top-n
    cut (count desc, token asc — deterministic under ties), ranks from
    a window over the BOUNDED top-n frame only (never a global rank
    over the raw token stream), and one regr_slope/regr_r2 aggregate.
    """
    tokens = (
        df.select(F.explode(F.split(F.col(text_col), " ")).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    top = tokens.orderBy(F.desc("n"), F.asc("token")).limit(top_n)
    from pyspark.sql.window import Window

    w = Window.orderBy(F.desc("n"), F.asc("token"))
    ranked = top.select("n", F.row_number().over(w).alias("r"))
    return ranked.agg(
        F.count(F.lit(1)).cast("long").alias("n_tokens"),
        F.round(F.expr("regr_slope(ln(n), ln(r))"), 4).alias("zipf_slope"),
        F.round(F.expr("regr_r2(ln(n), ln(r))"), 4).alias("r2"),
    )


def vocab_coverage(
    df: DataFrame, text_col: str, ks: list[int] = (100, 500, 1000, 5000)
) -> DataFrame:
    """Vocabulary-sizing curve: for each candidate vocab size k, the
    fraction of ALL corpus token occurrences covered by the k most
    frequent tokens — the number that decides a tokenizer's vocab size
    and predicts the OOV rate before training one. One row per k:
    (k, vocab_tokens, coverage).

    One token-count groupBy (map-combined); the grand total reduces
    the SAME aggregated frame (AQE reuses the exchange) and broadcast-
    attaches; the top-max(k) cut is TakeOrdered (count desc, token asc
    — deterministic under ties); ranks and every k's covered mass come
    from the BOUNDED top frame, folded in ONE conditional-sum
    aggregate and exploded to rows. The raw token stream is never
    globally ranked.
    """
    ks = sorted(set(int(k) for k in ks))
    if not ks or ks[0] < 1:
        raise ValueError(f"ks must be positive ints, got {ks}")
    from pyspark.sql.window import Window

    counts = (
        df.select(F.explode(F.split(F.col(text_col), " ")).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    totals = counts.agg(F.sum("n").alias("__total"))
    top = counts.orderBy(F.desc("n"), F.asc("token")).limit(ks[-1])
    w = Window.orderBy(F.desc("n"), F.asc("token"))
    ranked = top.select("n", F.row_number().over(w).alias("__r"))
    folded = ranked.agg(
        *[
            F.sum(F.when(F.col("__r") <= k, F.col("n"))).alias(f"__cov_{k}")
            for k in ks
        ],
        *[
            F.sum(F.when(F.col("__r") <= k, 1).otherwise(0)).alias(
                f"__vt_{k}"
            )
            for k in ks
        ],
    )
    entries = F.array(
        *[
            F.struct(
                F.lit(k).cast("long").alias("k"),
                F.col(f"__vt_{k}").cast("long").alias("vocab_tokens"),
                F.col(f"__cov_{k}").alias("__covered"),
            )
            for k in ks
        ]
    )
    return (
        folded.join(F.broadcast(totals))
        .select(F.explode(entries).alias("e"), "__total")
        .select(
            "e.k",
            "e.vocab_tokens",
            F.round(
                F.try_divide(F.col("e.__covered"), F.col("__total")), 6
            ).alias("coverage"),
        )
    )


def blocklist_hits(
    df: DataFrame,
    text_col: str,
    id_col: str,
    terms: list[str],
    rate_threshold: float = 0.08,
    round_to: int = 4,
) -> DataFrame:
    """Safety/blocklist tagging via a BROADCAST term join — the
    filter-against-a-banned-word-list stage of a training-data pipeline.

    The term list is DATA (a broadcast hash join on the token), not a
    regex alternation: a 100k-term blocklist joins at scan speed and
    ships once per executor, where the equivalent ``(?:t1|t2|...)``
    pattern is quadratic to compile and re-evaluates per character.
    Exact lowercase-token match semantics; phrase/stemming policy
    belongs in the term generator, not the join.

    Per doc: total blocked-token occurrences, distinct blocked terms,
    hit rate over the doc's token count, and a flag at
    ``rate_threshold`` (rounded-then-compared so both engines cut at
    the same value). Zero-hit docs SURVIVE the join-back (left join +
    coalesce 0); an empty doc reports NULL hit_rate, flag false.
    """
    spark = df.sparkSession
    terms_df = spark.createDataFrame(
        [(x.lower(),) for x in sorted(set(terms))], "token string"
    )
    toks = df.select(
        F.col(id_col), F.explode(tokens(text_col)).alias("__tok")
    ).select(F.col(id_col), F.lower("__tok").alias("token"))
    hits = (
        toks.join(F.broadcast(terms_df), "token")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_hits"),
            F.count_distinct("token").alias("n_terms"),
        )
    )
    base = df.select(F.col(id_col), token_count(text_col).alias("n_tokens"))
    rate = F.round(
        F.try_divide(F.coalesce("n_hits", F.lit(0)), F.col("n_tokens")), round_to
    )
    return base.join(hits, id_col, "left").select(
        id_col,
        "n_tokens",
        F.coalesce("n_hits", F.lit(0)).cast("long").alias("n_hits"),
        F.coalesce("n_terms", F.lit(0)).cast("long").alias("n_terms"),
        rate.alias("hit_rate"),
        F.coalesce(rate >= F.lit(rate_threshold), F.lit(False)).alias("flagged"),
    )


def token_fertility(
    df: DataFrame, text_col: str, group_col: str, round_to: int = 4
) -> DataFrame:
    """Tokenizer-efficiency report per group (usually language):
    fertility = BPE-ish tokens per whitespace word, and characters per
    BPE-ish token. The numbers that decide whether a tokenizer (or a
    vocab size) taxes one language more than another — high fertility
    means more sequence positions per word, i.e. a more expensive
    language to train on at the same text volume.

    ONE map-combined aggregate over integer counts; the ratios divide
    two exact int64 sums, so both engines produce the identical double
    before rounding. try_divide: an all-empty group reports NULL, not
    a DIVIDE_BY_ZERO job kill.
    """
    staged = df.select(
        F.col(group_col),
        F.length(text_col).cast("long").alias("__chars"),
        regex_token_count(text_col).alias("__bpe"),
        token_count(text_col).alias("__words"),
    )
    return staged.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("__bpe").alias("n_tokens"),
        F.round(F.try_divide(F.sum("__bpe"), F.sum("__words")), round_to).alias(
            "fertility"
        ),
        F.round(F.try_divide(F.sum("__chars"), F.sum("__bpe")), round_to).alias(
            "chars_per_token"
        ),
    )


def chat_assemble(
    df: DataFrame,
    key_col: str,
    order_cols: list[str],
    msg_col: str,
    roles: tuple[str, str] = ("user", "assistant"),
    sep: str = "\n",
) -> DataFrame:
    """SFT conversation assembly: per key, order messages by
    ``order_cols`` and render one chat-template string with roles
    alternating from ``roles[0]`` (`<|role|>msg` turns joined by
    ``sep``). The grouped-map step every instruction-tuning pipeline
    needs between an event log and a trainable text column.

    Distributed shape: ONE groupBy collecting (order-key, msg) structs,
    then row-local sort_array + indexed transform — per-key cost is
    bounded by that key's message count (conversations, not corpora;
    the natural partitioning survives any scale-up because nothing
    crosses keys). NULL messages render as '' rather than being
    silently dropped by array_join's null-skip.

    Returns ``key_col``, ``n_turns`` (int), ``conversation`` (string).
    """
    packed = df.groupBy(key_col).agg(
        F.sort_array(
            F.collect_list(
                F.struct(
                    *[F.col(c) for c in order_cols],
                    F.coalesce(F.col(msg_col).cast("string"), F.lit("")).alias("_m"),
                )
            )
        ).alias("_msgs")
    )
    turn = lambda x, i: F.concat(  # noqa: E731
        F.lit("<|"),
        F.when(i % 2 == 0, F.lit(roles[0])).otherwise(F.lit(roles[1])),
        F.lit("|>"),
        x["_m"],
    )
    return packed.select(
        F.col(key_col),
        F.size("_msgs").alias("n_turns"),
        F.array_join(F.transform("_msgs", turn), sep).alias("conversation"),
    )


def token_js_divergence(
    df: DataFrame,
    text_col: str,
    cohort: Column,
    round_to: int = 4,
) -> DataFrame:
    """Jensen-Shannon divergence between the token distributions of two
    corpus slices (``cohort`` true vs false) — the vocabulary-level
    drift monitor between training snapshots / data sources that
    numeric-feature PSI (operators/expect) can't see. JS is symmetric
    and bounded by ln 2, so a single threshold works corpus-wide.

    Shape: ONE explode + ONE groupBy(token) with conditional per-side
    sums (map-side combined — the exchange carries one row per token
    per partition, not the token stream); totals come from windows over
    the AGGREGATED vocab-sized frame (the mutual_information
    convention). Cross-engine determinism: each p·ln(p/m) term is
    rounded at 6 and summed as DECIMAL(18,6) — libm ln differs in the
    last ulp between engines and double summation is order-dependent.

    Returns one row: js (0..ln2), vocab_a, vocab_b, vocab_shared.
    """
    from pyspark.sql.window import Window

    toks = df.select(
        cohort.alias("_side"), F.explode(tokens(text_col)).alias("_tok")
    )
    counts = toks.groupBy("_tok").agg(
        F.sum(F.when(F.col("_side"), 1).otherwise(0)).alias("na"),
        F.sum(F.when(~F.col("_side"), 1).otherwise(0)).alias("nb"),
    )
    w_all = Window.partitionBy()
    ta = F.sum("na").over(w_all).cast("double")
    tb = F.sum("nb").over(w_all).cast("double")
    # try_divide: an entirely-empty cohort (total 0) must yield NULL
    # terms, not an ANSI DIVIDE_BY_ZERO error (double / throws too)
    p = F.try_divide(F.col("na").cast("double"), ta)
    q = F.try_divide(F.col("nb").cast("double"), tb)
    m = (p + q) / 2

    def term(px):
        return F.round(
            F.when(px > 0, px * F.log(px / m)).otherwise(F.lit(0.0)), 6
        ).cast("decimal(18,6)")

    terms = counts.select(
        term(p).alias("__tp"),
        term(q).alias("__tq"),
        (F.col("na") > 0).cast("int").alias("__va"),
        (F.col("nb") > 0).cast("int").alias("__vb"),
        ((F.col("na") > 0) & (F.col("nb") > 0)).cast("int").alias("__vs"),
    )
    agg = terms.agg(
        F.sum("__tp").cast("double").alias("__sp"),
        F.sum("__tq").cast("double").alias("__sq"),
        F.sum("__va").cast("long").alias("vocab_a"),
        F.sum("__vb").cast("long").alias("vocab_b"),
        F.sum("__vs").cast("long").alias("vocab_shared"),
    )
    return agg.select(
        F.round((F.col("__sp") + F.col("__sq")) / 2, round_to).alias("js"),
        "vocab_a",
        "vocab_b",
        "vocab_shared",
    )
