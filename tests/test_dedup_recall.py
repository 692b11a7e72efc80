"""Cross-detector consistency for the near-dup family.

dedup_minhash shares the *exact*-Jaccard oracle on the claim that LSH
recall is 100% on this corpus (verification already guarantees
precision). This test asserts that claim directly, and checks SimHash
finds the same planted near-dup pairs."""

from __future__ import annotations

from etl_cnpjs_spark.plans import QUERIES


def _pairs(df, cols=("i", "j")):
    return {tuple(int(r[c]) for c in cols) for r in df.collect()}


def test_minhash_recall_equals_exact(spark, sf_dir):
    exact = _pairs(QUERIES["dedup_ngram_jaccard"].fn(spark, sf_dir))
    lsh = _pairs(QUERIES["dedup_minhash"].fn(spark, sf_dir))
    assert exact, "corpus should contain planted near-dup pairs"
    assert lsh == exact, (
        f"LSH missed {exact - lsh} / invented {lsh - exact}"
    )


def test_simhash_covers_planted_pairs(spark, sf_dir):
    exact = _pairs(QUERIES["dedup_ngram_jaccard"].fn(spark, sf_dir))
    sim = _pairs(QUERIES["dedup_simhash"].fn(spark, sf_dir))
    # SimHash approximates cosine-on-token-sets, not shingle Jaccard —
    # demand coverage of the planted (very-high-overlap) pairs, allow
    # extra candidates at the margin.
    missed = exact - sim
    assert not missed, f"simhash missed planted near-dups: {missed}"
