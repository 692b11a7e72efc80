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
    """SimHash measures frequency-weighted token cosine, not shingle
    Jaccard: a 64-bit signature puts a jaccard≈0.9 pair at expected
    hamming 64·θ/π ≈ 9, so full coverage of every planted pair is not a
    property the operator HAS — what it guarantees is exact equivalence
    with all-pairs hamming ≤ 5 (now pinned bit-exactly by the driver
    oracle: 6×10-bit banding is pigeonhole-complete). Against Jaccard
    ground truth, assert a recall floor robust to corpus regeneration
    (observed 23/25 at sf0.01)."""
    exact = _pairs(QUERIES["dedup_ngram_jaccard"].fn(spark, sf_dir))
    sim = _pairs(QUERIES["dedup_simhash"].fn(spark, sf_dir))
    assert exact, "corpus should contain planted near-dup pairs"
    recall = len(exact & sim) / len(exact)
    assert recall >= 0.75, (
        f"simhash recall {recall:.2f} on planted near-dups; missed {exact - sim}"
    )


def test_simhash_hash_swap_same_structure(spark):
    """The md5 token hash is the conformance choice (oracle-portable);
    xxhash64 is the swap for engines where the digest dominates (measured
    cost parity on this box — plan docstring). Pin that the swap changes
    ONLY the bit source, not the detector's structure:
    on planted near-identical docs in a random background, both hashes
    run the same vote loop → 6×10-bit banding → hamming ≤ 5 verify and
    must recover exactly the planted pair set (an unrelated pair needs
    hamming ≤ 5 out of 64 by chance ≈ 1e-14, so set equality is stable
    under any sane 64-bit hash)."""
    import random

    from pyspark.sql import functions as F

    from etl_cnpjs_spark.operators.dedup import (
        candidate_pairs,
        simhash,
        simhash_band_keys,
    )
    from etl_cnpjs_spark.plans.dedup import SIMHASH_MAX_HAMMING

    rng = random.Random(11)
    vocab = [f"w{k}" for k in range(500)]
    docs, planted = [], set()
    # 200-token docs: vote margins grow ~sqrt(len), so one substituted
    # token flips ~1 bit in expectation — comfortably under the ≤ 5
    # verify threshold for EITHER hash (40-token docs sit too close to
    # the threshold: observed 6-bit flips from a single substitution).
    for i in range(12):  # base docs
        docs.append((i, " ".join(rng.choice(vocab) for _ in range(200))))
    for i in range(12):  # near-dup: one token substituted
        toks = docs[i][1].split()
        toks[rng.randrange(len(toks))] = rng.choice(vocab)
        docs.append((100 + i, " ".join(toks)))
        planted.add((i, 100 + i))
    for i in range(24):  # unrelated background
        docs.append((200 + i, " ".join(rng.choice(vocab) for _ in range(200))))
    d = spark.createDataFrame(docs, "doc_id bigint, text string")

    def pairs(token_hash):
        sigs = d.select(
            "doc_id", F.split(F.trim("text"), r"\s+").alias("toks")
        ).select(
            "doc_id", simhash("toks", token_hash=token_hash).alias("sig")
        ).localCheckpoint()
        signed = sigs.select(
            "doc_id", "sig", simhash_band_keys(F.col("sig"), bands=6).alias("bk")
        )
        cands = candidate_pairs(signed, "doc_id", "bk")
        sa = sigs.select(F.col("doc_id").alias("i"), F.col("sig").alias("sa"))
        sb = sigs.select(F.col("doc_id").alias("j"), F.col("sig").alias("sb"))
        ham = F.bit_count(F.col("sa").bitwiseXOR(F.col("sb")))
        return _pairs(
            cands.join(sa, "i").join(sb, "j")
            .select("i", "j")
            .where(ham <= SIMHASH_MAX_HAMMING)
        )

    p_md5, p_xxh = pairs("md5"), pairs("xxhash64")
    assert p_md5 == planted, f"md5 structure drift: {p_md5 ^ planted}"
    assert p_xxh == planted, f"xxhash64 structure drift: {p_xxh ^ planted}"


def test_embedding_lsh_equals_exact(spark, sf_dir):
    """dedup_embedding_lsh carries the exact all-pairs oracle on the claim
    that 32×2 banding recall is 100% at the tested SFs (per-pair miss
    ≈ 9e-8 at τ=0.4). Assert the claim against the blocked exact scorer."""
    exact = _pairs(QUERIES["dedup_embedding_cosine"].fn(spark, sf_dir))
    lsh = _pairs(QUERIES["dedup_embedding_lsh"].fn(spark, sf_dir))
    assert exact, "corpus should contain pairs above the tau"
    assert lsh == exact, f"LSH missed {exact - lsh} / invented {lsh - exact}"


def test_embedding_lsh_planted_production_regime(spark):
    """The regime hyperplane LSH is FOR: planted near-identical vectors
    (cos ≳ 0.97) in a random background, τ=0.9, 16 bands × 8 bits.
    Full recall of every planted pair AND real pruning (<20% of all
    pairs become candidates) — the property the τ=0.4 corpus key can't
    exhibit because its similarity gap is too narrow (see plan
    docstring)."""
    import numpy as np

    from etl_cnpjs_spark.operators.dedup import candidate_pairs
    from etl_cnpjs_spark.operators.similarity import (
        embedding_lsh_pairs,
        hyperplane_signatures,
    )

    rng = np.random.RandomState(7)
    base = rng.standard_normal((120, 64))
    planted = []
    vecs = [(i, [float(x) for x in base[i]]) for i in range(120)]
    for k in range(10):  # 10 perturbed near-duplicates of vectors 0..9
        dup = base[k] + 0.12 * rng.standard_normal(64)
        cos = float(
            dup @ base[k] / (np.linalg.norm(dup) * np.linalg.norm(base[k]))
        )
        assert cos >= 0.9, f"fixture drift: planted cos {cos}"
        vecs.append((120 + k, [float(x) for x in dup]))
        planted.append((k, 120 + k))
    df = spark.createDataFrame(vecs, "vid bigint, v array<double>")

    found = {
        (int(r.i), int(r.j))
        for r in embedding_lsh_pairs(
            df, "vid", "v", tau=0.9, bands=16, rows=8
        ).collect()
    }
    assert set(planted) <= found, f"missed planted pairs: {set(planted) - found}"

    signed = hyperplane_signatures(df, "vid", "v", bands=16, rows=8)
    n_cand = candidate_pairs(signed, "__id", "__bk").count()
    n_all = 130 * 129 // 2
    assert n_cand < 0.2 * n_all, (
        f"banding should prune hard at tau=0.9: {n_cand}/{n_all} candidates"
    )


def test_stopshingle_recall_at_tested_sfs(spark, sf_dir):
    """At the tested corpora the df-64 stop-shingle cap loses NO pairs:
    every jaccard-0.8 pair shares at least one sub-threshold shingle,
    so dedup_stopshingle ≡ dedup_ngram_jaccard here. (The cap CAN drop
    boilerplate-only pairs on other corpora — that is its point; this
    test pins that the tested data is not silently in that regime, so
    the shared oracle stays an equality, not an upper bound.)"""
    from etl_cnpjs_spark.plans import QUERIES

    full = {
        (r.i, r.j) for r in QUERIES["dedup_ngram_jaccard"].fn(spark, sf_dir).collect()
    }
    capped = {
        (r.i, r.j) for r in QUERIES["dedup_stopshingle"].fn(spark, sf_dir).collect()
    }
    assert capped == full


def test_lsh_hot_bucket_cap(spark):
    """Planted hot bucket (r2 verdict item #4): a tight cluster of
    near-identical vectors collides in EVERY band, so each (band, key)
    bucket holds the whole cluster. With bucket_cap far below the
    cluster size, salted_buckets must split verification into bounded
    group-pair tasks — no task may collect an unbounded payload — while
    embedding_lsh_pairs still returns exactly the brute-force >= tau
    pair set (exact pair coverage across tasks, each pair scored in its
    one owning task)."""
    import itertools

    import numpy as np
    from pyspark.sql import functions as F

    from etl_cnpjs_spark.operators.similarity import (
        embedding_lsh_pairs,
        hyperplane_signatures,
        salted_buckets,
    )

    rng = np.random.RandomState(7)
    base = rng.standard_normal(16)
    cluster = base + 0.001 * rng.standard_normal((300, 16))
    background = rng.standard_normal((100, 16))
    V = np.vstack([cluster, background])
    df = spark.createDataFrame(
        [(i, [float(x) for x in V[i]]) for i in range(len(V))],
        "id bigint, v array<double>",
    )

    cap = 32
    signed = hyperplane_signatures(df, "id", "v", bands=4, rows=4).localCheckpoint()
    tasks = salted_buckets(signed, cap)
    stats = tasks.agg(
        F.max(F.size("vs")).alias("mx"), F.max("gb").alias("max_gb")
    ).collect()[0]
    # a task holds members of TWO hash groups of expected size <= cap;
    # 3*cap leaves headroom for hash imbalance while still proving the
    # 300-member bucket never lands in one task
    assert stats.mx <= 3 * cap, f"task collected {stats.mx} vectors"
    assert stats.max_gb > 0, "hot-bucket salting was not exercised"

    got = {
        (r.i, r.j)
        for r in embedding_lsh_pairs(
            df, "id", "v", tau=0.9, bands=4, rows=4, bucket_cap=cap
        ).collect()
    }

    def cos(a, b):
        return float(np.dot(a, b) / (np.linalg.norm(a) * np.linalg.norm(b)))

    want = {
        (i, j)
        for i, j in itertools.combinations(range(len(V)), 2)
        if cos(V[i], V[j]) >= 0.9
    }
    # recall on a cos~1 cluster is certain (p(bit agree) ~ 1); verify
    # guarantees precision — so equality, not subset
    assert got == want, f"missed {want - got} / invented {got - want}"


def test_semantic_dedup_sound_and_measured_vs_exact(spark, sf_dir):
    """SemDeDup's accepted miss is cross-bucket pairs — hold the key to
    its contract against the exact cosine family: (a) SOUNDNESS: every
    dropped vector really has an exact near-dup partner with a lower id
    (intra-bucket pairs are a subset of all near-dup pairs, so no drop
    can be spurious); (b) the bucketing is load-bearing (vectors spread
    over >1 bucket); (c) measured intra-bucket recall over the exact
    pair set is reported in the assertion message so regressions are
    diagnosable."""
    from etl_cnpjs_spark.plans import QUERIES

    exact_pairs = {
        (r.i, r.j)
        for r in QUERIES["dedup_embedding_cosine"].fn(spark, sf_dir).collect()
    }
    sem = QUERIES["dedup_semantic"].fn(spark, sf_dir).collect()
    dropped = {r.vec_id for r in sem if not r.kept}
    droppable = {j for (i, j) in exact_pairs}  # i < j by construction
    assert dropped <= droppable, dropped - droppable
    assert len({r.cid for r in sem}) > 1
    if exact_pairs:
        covered = sum(1 for (i, j) in exact_pairs if j in dropped)
        recall = covered / len(exact_pairs)
        # random near-orthogonal vectors land in the same bucket ~1/k of
        # the time, so ~10% is the chance floor; measured ≈ 27% at
        # sf0.01 (label structure correlates with near-dups). On real
        # clustered corpora — SemDeDup's target — near-dups co-cluster
        # by construction and recall approaches 1.
        assert recall >= 0.10, f"semantic recall {recall:.2f} over exact pairs"


def test_lsh_scores_each_pair_exactly_once(spark):
    """Exactly-once emission pin (r10): a tight cluster collides in
    EVERY band, so before the first-colliding-band rule each near-dup
    pair was scored and emitted once per band (bands× duplicated work,
    collapsed only by the trailing distinct). The raw pre-distinct
    frame must already be duplicate-free — losing the mask would stay
    correct (distinct hides it) while silently multiplying verify work
    by the band-collision multiplicity."""
    import itertools

    import numpy as np

    from etl_cnpjs_spark.operators.similarity import (
        _score_salted_buckets_raw,
        hyperplane_signatures,
        salted_buckets,
    )

    rng = np.random.RandomState(11)
    base = rng.standard_normal(16)
    cluster = base + 0.001 * rng.standard_normal((40, 16))
    background = rng.standard_normal((60, 16))
    V = np.vstack([cluster, background])
    df = spark.createDataFrame(
        [(i, [float(x) for x in V[i]]) for i in range(len(V))],
        "id bigint, v array<double>",
    )

    signed = hyperplane_signatures(df, "id", "v", bands=8, rows=2).localCheckpoint()
    raw = _score_salted_buckets_raw(salted_buckets(signed, 1024), 0.9)
    rows = raw.collect()
    got = {(r.i, r.j) for r in rows}
    assert len(rows) == len(got), (
        f"{len(rows) - len(got)} duplicate emissions — first-band rule lost"
    )

    def cos(a, b):
        return float(np.dot(a, b) / (np.linalg.norm(a) * np.linalg.norm(b)))

    want = {
        (i, j)
        for i, j in itertools.combinations(range(len(V)), 2)
        if cos(V[i], V[j]) >= 0.9
    }
    assert len(want) >= 100, "planted cluster should produce many pairs"
    assert got == want, f"missed {want - got} / invented {got - want}"


def test_simhash_arrow_equals_sql_fold(spark, sf_dir):
    """The Arrow-batched signature (simhash_signatures — what
    dedup_simhash now runs) must be bit-equal to the simhash() SQL
    fold (what the DuckDB oracle recomputes) on the real corpus.
    Integer signatures make this an exact check; any divergence breaks
    the key's full all-pairs oracle."""
    from pyspark.sql import functions as F

    from etl_cnpjs_spark.catalog import table
    from etl_cnpjs_spark.functions.text import tokens
    from etl_cnpjs_spark.operators.dedup import simhash, simhash_signatures

    toks = table(spark, sf_dir, "documents").select(
        "doc_id", tokens(F.col("text")).alias("toks")
    )
    arrow = simhash_signatures(toks, "doc_id", "toks")
    sql = toks.select("doc_id", simhash("toks").alias("sig"))
    n = toks.count()
    assert arrow.count() == n
    same = (
        arrow.alias("a")
        .join(sql.alias("s"), "doc_id")
        .filter(F.col("a.sig").eqNullSafe(F.col("s.sig")))
        .count()
    )
    assert same == n, f"{n - same} signature mismatches vs the SQL fold"


def test_stopshingle_bound_verify(spark, tmp_path):
    """dedup_stopshingle's r11 count-based verify must equal the full
    DuckDB oracle on a corpus that actually HAS stop-shingles (df > 64),
    exercising all three paths: m=0 exact-from-counts, m>0 upper-bound
    drop (true J < τ, no array verify), and m>0 array verify (bound
    ambiguous, both above and below τ after exact scoring). The
    testdata corpora have no stop-shingles at small SF, so without this
    fixture the bound logic would be dead code under the driver."""
    import duckdb
    import pandas as pd

    from compare import assert_frames_match
    from etl_cnpjs_spark.plans import QUERIES

    boiler = " ".join(f"x{k}" for k in range(8))  # 6 boiler shingles
    texts = {}
    # 70 filler docs carrying the boilerplate -> df(boiler shingles)=74>64
    for d in range(70):
        texts[d] = f"f{d}a f{d}b f{d}c f{d}d " + boiler
    # identical near-dup pair sharing boiler: m>0, exact J=1 >= τ
    common = " ".join(f"c{k}" for k in range(10))
    texts[100] = common + " " + boiler
    texts[101] = common + " " + boiler
    # partial-overlap pair sharing boiler: bound ambiguous, exact J < τ
    half = " ".join(f"h{k}" for k in range(6))
    texts[110] = half + " p0 p1 p2 p3 " + boiler
    texts[111] = half + " q0 q1 q2 q3 " + boiler
    pd.DataFrame(
        {
            "doc_id": list(texts),
            "text": list(texts.values()),
            "lang": ["en"] * len(texts),
            "source": ["fix"] * len(texts),
            "n_chars": [len(t) for t in texts.values()],
        }
    ).to_parquet(tmp_path / "documents.parquet", index=False)

    q = QUERIES["dedup_stopshingle"]
    got = q.fn(spark, str(tmp_path)).toPandas()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{tmp_path}/documents.parquet')"
    )
    want = con.execute(q.oracle).fetchdf()
    con.close()
    assert_frames_match(got, want, "dedup_stopshingle synthetic")
    # the fixture must really exercise the stop regime and the verify
    ids = set(map(tuple, got[["i", "j"]].values.tolist()))
    assert (100, 101) in ids          # m>0 pair, exact J=1 kept
    assert (110, 111) not in ids      # m>0 pair, verified then dropped
    assert len(want) == len(got)


def test_containment_capped_bound_verify(spark, tmp_path):
    """dedup_containment_capped's r11 bound verify must equal the full
    DuckDB oracle on a stop-shingle-heavy corpus — the containment twin
    of test_stopshingle_bound_verify, including an asymmetric pair
    where only the SHORT doc's direction clears τ (the case the
    min(na, nb) upper bound exists for)."""
    import duckdb
    import pandas as pd

    from compare import assert_frames_match
    from etl_cnpjs_spark.plans import QUERIES

    boiler = " ".join(f"x{k}" for k in range(8))
    texts = {}
    for d in range(70):
        texts[d] = f"f{d}a f{d}b f{d}c f{d}d " + boiler
    # short doc fully contained in a long doc, both carrying boiler:
    # m>0 and only short->long clears τ after exact verify
    short = " ".join(f"c{k}" for k in range(8))
    texts[100] = short + " " + boiler
    texts[101] = short + " " + boiler + " extra0 extra1 extra2 extra3 extra4"
    # m>0 pair whose exact containment misses τ in both directions
    texts[110] = "h0 h1 h2 h3 h4 h5 p0 p1 p2 p3 " + boiler
    texts[111] = "h0 h1 h2 h3 h4 h5 q0 q1 q2 q3 " + boiler
    pd.DataFrame(
        {
            "doc_id": list(texts),
            "text": list(texts.values()),
            "lang": ["en"] * len(texts),
            "source": ["fix"] * len(texts),
            "n_chars": [len(t) for t in texts.values()],
        }
    ).to_parquet(tmp_path / "documents.parquet", index=False)

    q = QUERIES["dedup_containment_capped"]
    got = q.fn(spark, str(tmp_path)).toPandas()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{tmp_path}/documents.parquet')"
    )
    want = con.execute(q.oracle).fetchdf()
    con.close()
    assert_frames_match(got, want, "dedup_containment_capped synthetic")
    directed = set(map(tuple, got[["src", "dst"]].values.tolist()))
    assert (100, 101) in directed      # short contained in long
    assert (101, 100) not in directed  # long not contained in short
    assert (110, 111) not in directed  # verified then dropped


def test_simhash_memo_cap_invariant(spark, sf_dir, monkeypatch):
    """Signatures are invariant to the digest-memo cap (r10 ADVICE low
    #3): with the cap shrunk to 2 the memo clears on ~every token, so
    every digest recomputes — the output must stay bit-equal to the
    uncapped run. Guards the eviction branch from ever changing values
    (an eviction bug would silently corrupt signatures, not crash)."""
    from pyspark.sql import functions as F

    from etl_cnpjs_spark.catalog import table
    from etl_cnpjs_spark.functions.text import tokens
    from etl_cnpjs_spark.operators import dedup as D

    toks = (
        table(spark, sf_dir, "documents")
        .select("doc_id", tokens(F.col("text")).alias("toks"))
        .limit(50)
        .localCheckpoint()
    )
    base = {
        r["doc_id"]: r["sig"]
        for r in D.simhash_signatures(toks, "doc_id", "toks").collect()
    }
    monkeypatch.setattr(D, "SIMHASH_MEMO_CAP", 2)
    capped = {
        r["doc_id"]: r["sig"]
        for r in D.simhash_signatures(toks, "doc_id", "toks").collect()
    }
    assert capped == base and len(base) == 50
