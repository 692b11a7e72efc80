"""Text column expressions — shared by the text-analysis and near-dup
plan families (north_star: text analysis, dedup).

All pure Catalyst expressions (split / transform / aggregate higher-order
functions): they run inside whole-stage codegen, scale linearly with
tokens, and never leave the JVM. Each has an exact DuckDB twin used by the
oracles (string_split_regex / list_transform / list_sum).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Whitespace tokenization — identical in DuckDB as
# string_split_regex(trim(x), '\s+').
_WS = r"\s+"


def tokens(text: Column) -> Column:
    """Whitespace tokens of trimmed text."""
    return F.split(F.trim(text), _WS)


def shingles(toks: Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles. Guarded for short docs: Spark's
    sequence(1, k) is *descending* when k < 1, so the k<1 case must return
    an empty array explicitly (DuckDB's generate_series just returns [])."""
    make = F.transform(
        F.sequence(F.lit(1), F.size(toks) - (n - 1)),
        lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
    )
    return F.array_distinct(
        F.when(F.size(toks) >= n, make).otherwise(F.array().cast("array<string>"))
    )


def char_count_no_ws(text: Column) -> Column:
    """Characters excluding whitespace."""
    return F.length(F.regexp_replace(text, _WS, ""))


def token_overlap_count(toks: Column, vocab: list[str]) -> Column:
    """How many tokens fall in a fixed vocabulary (stopword/marker hits)."""
    lits = F.array(*[F.lit(w) for w in vocab])
    return F.size(F.filter(toks, lambda t: F.array_contains(lits, t)))


def normalized_text(text: Column) -> Column:
    """Canonical form for exact-content fingerprints: lowercase, collapsed
    whitespace, trimmed."""
    return F.lower(F.regexp_replace(F.trim(text), _WS, " "))
