"""Native-expression replacements for the reference's 7 Python row UDFs
(SURVEY.md §2.11 X1-X8 and §4: "rewrite all 7 UDFs as native expressions
... the single biggest perf win").

Each function documents the EXACT Python-UDF semantics it replaces —
``rstrip('%')`` strips all *trailing* '%' runs (X1) while
``replace('%','')`` strips '%' *anywhere* (X2); these are different
operators and we keep both. Everything here stays inside whole-stage
codegen: no BatchEvalPython node, no pushdown barrier.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _col(c) -> Column:
    return F.col(c) if isinstance(c, str) else c


def strip_trailing_percent(c) -> Column:
    """X1 — ``udf(lambda x: x.rstrip('%'))`` (loanStat.py:178-185).

    ``rstrip`` removes ALL trailing '%' chars, not just one — and the
    anchor must be ``\\z`` (absolute end of input), NOT ``$``: Java's
    ``$`` also matches BEFORE a final line terminator, so ``'%\\n'``
    would wrongly lose its ``%`` (hypothesis-found; Python's rstrip
    treats the newline as the last char and strips nothing).
    Null-safe (regexp_replace passes nulls through; the reference UDF
    would have thrown on None and relied on upstream dropna).
    """
    return F.regexp_replace(_col(c), "%+\\z", "")


def remove_all_percent(c) -> Column:
    """X2 — null-safe ``x.replace('%','')`` (bde4.ipynb#cell18-20
    ``py_replaceNull``): removes '%' anywhere in the string."""
    return F.regexp_replace(_col(c), "%", "")


def pct_to_double(c) -> Column:
    """X1 + cast pipeline: ``'12.74%' → 12.74`` (loanStat.py:218)."""
    return strip_trailing_percent(c).cast("double")


def month_token(c) -> Column:
    """X3 — ``udf(lambda x: x.split('-')[0])`` (loanStat.py:193-200):
    ``'Apr-2001' → 'Apr'``. ``substring_index`` returns the whole string
    when no '-' present, matching ``split()[0]``."""
    return F.substring_index(_col(c), "-", 1)


def remove_literal(c, literal: str) -> Column:
    """X4 — ``udf(lambda x: x.replace('months',''))`` (loanStat.py:206).
    Removes every occurrence of the literal (not a regex)."""
    escaped = "".join("\\" + ch if ch in r"\.[]{}()*+-?^$|" else ch for ch in literal)
    return F.regexp_replace(_col(c), escaped, "")


def term_to_double(c, literal: str = "months") -> Column:
    """X4 + cast: ``' 36 months' → 36.0`` — the double cast trims the
    leftover whitespace, exactly as the reference relied on
    (loanStat.py:218)."""
    return remove_literal(c, literal).cast("double")


def label_decode(c, one_label: str = "Charged Off", zero_label: str = "Fully Paid") -> Column:
    """X8 — ``udf(lambda x: 'Charged Off' if x == 1.0 else 'Fully Paid')``
    (mlpc.py:504). Note the reference returns ``zero_label`` for ANY
    non-1.0 value (including null) — we reproduce that."""
    col = _col(c)
    return F.when(col == 1.0, F.lit(one_label)).otherwise(F.lit(zero_label))


def ordered_join(rank_col, payload_col, sep: str = ",") -> Column:
    """Aggregate expression: ``string_agg(payload, sep ORDER BY rank)``
    without a second sort pass — collect (rank, payload) structs, sort
    the ARRAY row-locally (struct order = first-field order, so the
    rank must be a total order), project the payloads, join. Use inside
    ``groupBy(...).agg(...)`` wherever an ordered concatenation leaves
    the engine (sequence exports, top-k keyword lists); keeps the
    rank-sort semantics in one place."""
    ordered = F.transform(
        F.array_sort(
            F.collect_list(
                F.struct(_col(rank_col).alias("r"), _col(payload_col).alias("p"))
            )
        ),
        lambda s: s["p"],
    )
    return F.array_join(ordered, sep)


def canonical_url(c) -> Column:
    """Crawl-prep URL canonicalization, pure column expressions: strip
    fragment and scheme; lowercase the host, drop ``www.`` and default
    ports (:80/:443); drop a trailing ``/index.html`` and trailing
    slash; drop tracking params (utm_*, fbclid, gclid, ref) and SORT
    the survivors so param order can't split a dup group. The result is
    a JOIN/GROUP KEY for dedup and per-site rollups — not a fetchable
    URL (scheme is gone by design).

    Every regex is anchored/single-match, so Spark's replace-all and
    DuckDB's replace-first semantics agree; the param array is tiny, so
    the interpreted HOF filter/sort is immaterial.
    """
    u = F.regexp_replace(F.trim(_col(c)), r"#.*$", "")
    u = F.regexp_replace(u, r"(?i)^[a-z][a-z0-9+.-]*://", "")
    host = F.lower(F.regexp_extract(u, r"^([^/?]+)", 1))
    host = F.regexp_replace(host, r"^www\.", "")
    host = F.regexp_replace(host, r":(80|443)$", "")
    rest = F.regexp_replace(u, r"^[^/?]+", "")
    path = F.regexp_replace(rest, r"\?.*$", "")
    query = F.when(
        rest.rlike(r"\?"), F.regexp_replace(rest, r"^[^?]*\?", "")
    ).otherwise(F.lit(""))
    path = F.regexp_replace(path, r"/index\.html?$", "/")
    # /+ not /: a doubled trailing slash must land in the same group as
    # the single-slash spelling, and the canonical form must be a
    # FIXPOINT ('a//' -> 'a/' -> 'a' would change on re-application)
    path = F.regexp_replace(path, r"/+$", "")
    params = F.filter(
        F.split(query, "&"),
        lambda x: (x != "")
        & ~x.rlike(r"^(utm_[^=]*|fbclid|gclid|ref)="),
    )
    q2 = F.array_join(F.array_sort(params), "&")
    return F.concat(
        host,
        path,
        F.when(q2 != "", F.concat(F.lit("?"), q2)).otherwise(F.lit("")),
    )
