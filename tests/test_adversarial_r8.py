"""Independent-derivation pins for the two plans round 8 CHANGED
(events_chi2_independence: eager distinct-counts folded into the final
reduce; agg_target_encode: DECIMAL(38,0) window accumulation). Each
expected value is computed in pure Python from the raw parquet rows —
neither the Spark plan nor its DuckDB oracle is used to derive it, so
an identical-on-both-engines regression introduced by the r8 rewrite
would still be caught."""

from __future__ import annotations

import math
import os

import pyarrow.parquet as pq
import pytest

from etl_cnpjs_spark.plans import QUERIES

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.01")


def test_chi2_independence_matches_pure_python(spark):
    """Pearson chi-square of event_type x (user_id % 2) from raw rows:
    contingency counts, window totals, floor-micro quantization — the
    registered arithmetic replayed with Python ints/floats only."""
    t = pq.read_table(
        os.path.join(SF_DIR, "events.parquet"), columns=["event_type", "user_id"]
    )
    cells: dict[tuple[str, int], int] = {}
    for et, uid in zip(
        t.column("event_type").to_pylist(), t.column("user_id").to_pylist()
    ):
        k = (et, uid % 2)
        cells[k] = cells.get(k, 0) + 1
    n = sum(cells.values())
    rt = {}
    ct = {}
    for (et, ch), o in cells.items():
        rt[et] = rt.get(et, 0) + o
        ct[ch] = ct.get(ch, 0) + o
    chi2_micro = 0
    for (et, ch), o in cells.items():
        e = float(rt[et]) * float(ct[ch]) / float(n)
        dev = float(o) - e
        chi2_micro += math.floor(dev * dev / e * 1000000 + 0.5)
    dof = (len(rt) - 1) * (len(ct) - 1)

    row = QUERIES["events_chi2_independence"].fn(spark, SF_DIR).collect()[0]
    assert row.n == n
    assert row.dof == dof
    assert row.chi2_micro == chi2_micro
    assert row.chi2 == chi2_micro / 1e6


def test_target_encode_matches_pure_python(spark):
    """LOO target encoding from raw rows with exact Python ints (no
    precision ceiling at all) — pins that the DECIMAL(38,0) promotion
    computes the same floor quotient the unbounded-integer fold does."""
    t = pq.read_table(
        os.path.join(SF_DIR, "orders.parquet"),
        columns=["o_orderkey", "o_orderpriority", "o_totalprice"],
    )
    rows = list(
        zip(
            t.column("o_orderkey").to_pylist(),
            t.column("o_orderpriority").to_pylist(),
            t.column("o_totalprice").to_pylist(),
        )
    )
    s: dict[str, int] = {}
    cnt: dict[str, int] = {}
    cents = {}
    for ok, pr, tp in rows:
        c = math.floor(tp * 100 + 0.5)
        cents[ok] = (pr, c)
        s[pr] = s.get(pr, 0) + c
        cnt[pr] = cnt.get(pr, 0) + 1
    expected = {
        ok: (s[pr] - c) * 1_000_000 // (cnt[pr] - 1)
        for ok, (pr, c) in cents.items()
        if cnt[pr] > 1
    }

    got = {
        r.o_orderkey: r.loo_mean_microcents
        for r in QUERIES["agg_target_encode"].fn(spark, SF_DIR).collect()
    }
    assert got == expected


def test_keywords_idf_matches_pure_python_spotcheck(spark):
    """text_keywords' broadcast-n_docs rewrite: the idf_micro of every
    ranked keyword must equal floor(ln(n_docs/df)*1e6+0.5) computed
    with Python floats from raw tokenization (whitespace split of
    trimmed text — functions.text.tokens' contract). Spot-checks the
    score decomposition score_micro == tf * idf_micro for the top-1
    keyword of every doc."""
    t = pq.read_table(
        os.path.join(SF_DIR, "documents.parquet"), columns=["doc_id", "text"]
    )
    docs = {
        d: txt.strip().split()
        for d, txt in zip(
            t.column("doc_id").to_pylist(), t.column("text").to_pylist()
        )
        if txt and txt.strip()
    }
    n_docs = len(docs)
    df: dict[str, int] = {}
    tf: dict[int, dict[str, int]] = {}
    for d, toks in docs.items():
        counts: dict[str, int] = {}
        for tok in toks:
            counts[tok] = counts.get(tok, 0) + 1
        tf[d] = counts
        for tok in counts:
            df[tok] = df.get(tok, 0) + 1

    rows = QUERIES["text_keywords"].fn(spark, SF_DIR).collect()
    assert rows, "keywords plan returned nothing"
    checked = 0
    for r in rows:
        if r.rk != 1:
            continue
        idf_micro = math.floor(math.log(float(n_docs) / float(df[r.tok])) * 1e6 + 0.5)
        assert r.score_micro == tf[r.doc_id][r.tok] * idf_micro, (r.doc_id, r.tok)
        checked += 1
    assert checked == len(docs)
