"""Edge cases + blocking-transparency invariants for the blocked numpy
operators (all_pairs_cosine_blocked / knn_join_blocked): the block count
is a physical knob — changing it must NEVER change results. Also the
degenerate shapes: corpus smaller than k, two vectors, single vector."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_cnpjs_spark.operators.similarity import (
    all_pairs_cosine_blocked,
    knn_join_blocked,
)


@pytest.fixture(scope="module")
def vecs(spark):
    rows = [
        (0, [1.0, 0.0, 0.0]),
        (1, [0.9, 0.1, 0.0]),
        (2, [0.0, 1.0, 0.0]),
        (3, [0.0, 0.9, 0.2]),
        (4, [0.5, 0.5, 0.0]),
    ]
    return spark.createDataFrame(rows, "vec_id long, v array<double>")


def _pairs(df):
    return {(r.i, r.j): round(r.cos_sim, 12) for r in df.collect()}


def test_all_pairs_blocking_transparent(spark, vecs):
    one_block = _pairs(all_pairs_cosine_blocked(vecs, "vec_id", "v", 0.5, block_target=100))
    many_blocks = _pairs(all_pairs_cosine_blocked(vecs, "vec_id", "v", 0.5, block_target=1))
    assert one_block == many_blocks
    assert one_block, "fixture has similar vectors"
    assert all(i < j for (i, j) in one_block)


def test_knn_blocking_transparent_and_small_n(spark, vecs):
    k = 10  # > n-1: every vector must return all 4 others, ranked
    one = {(r.i, r.rn): r.j for r in knn_join_blocked(vecs, "vec_id", "v", k, block_target=100).collect()}
    many = {(r.i, r.rn): r.j for r in knn_join_blocked(vecs, "vec_id", "v", k, block_target=2).collect()}
    assert one == many
    per_query = {}
    for (i, _rn) in one:
        per_query[i] = per_query.get(i, 0) + 1
    assert per_query == {v: 4 for v in range(5)}  # n-1 neighbors each, no self


def test_all_pairs_single_vector(spark):
    df = spark.createDataFrame([(7, [1.0, 2.0])], "vec_id long, v array<double>")
    assert all_pairs_cosine_blocked(df, "vec_id", "v", 0.0).count() == 0


def test_brute_force_row_guard(spark, vecs):
    """The O(n²) exact baselines refuse corpora above max_rows with a
    message naming the LSH/IVF production twins (r3 verdict item #5 —
    the one remaining weak-at-scale key, made unmisusable). The guard is
    an explicit argument: max_rows=None opts back in."""
    with pytest.raises(ValueError, match="dedup_embedding_lsh"):
        all_pairs_cosine_blocked(vecs, "vec_id", "v", 0.5, max_rows=4)
    with pytest.raises(ValueError, match="sim_topk_ivf"):
        knn_join_blocked(vecs, "vec_id", "v", 2, max_rows=4)
    # opting out of the guard restores the exact baseline unchanged
    got = _pairs(all_pairs_cosine_blocked(vecs, "vec_id", "v", 0.5, max_rows=None))
    assert got == _pairs(all_pairs_cosine_blocked(vecs, "vec_id", "v", 0.5))


def test_kmeans_ivf_recall_vs_exact(spark, sf_dir):
    """Trained-quantizer ANN sanity: KMeans-IVF top-10 vs exact top-10,
    for BOTH the production trained path (pyspark.ml KMeans — no SQL
    oracle possible) and the registry's deterministic label-centroid
    form (oracle-exact). This corpus's embeddings are near-orthogonal
    random vectors (max pairwise cos ≈ 0.5), so cluster structure
    carries little neighbor signal and expected recall is ≈ nprobe/k —
    the bound asserts the mechanism works (non-trivial overlap, exact
    scoring inside probes), not clustered-data recall, which random
    data cannot show."""
    from etl_cnpjs_spark.plans import QUERIES
    from etl_cnpjs_spark.plans.similarity import sim_topk_kmeans_trained

    exact = [r.vec_id for r in QUERIES["sim_topk"].fn(spark, sf_dir).collect()]
    for fn in (QUERIES["sim_topk_kmeans"].fn, sim_topk_kmeans_trained):
        got = fn(spark, sf_dir).collect()
        assert len(got) == 10
        sims = [r.cos_sim for r in got]
        assert sims == sorted(sims, reverse=True)
        overlap = len(set(exact) & {r.vec_id for r in got})
        assert overlap >= 2, f"ANN recall below floor: {overlap}/10 ({fn})"


def test_wav_synth_parse_roundtrip_and_poison():
    """The WAV encoder/parser pair agree field-by-field through real
    bytes, and malformed blobs raise instead of silently zeroing."""
    import pytest

    from etl_cnpjs_spark.operators.multimodal import parse_wav, synth_wav

    for doc_id, n in [(0, 1), (1, 7), (5, 300), (123456, 4410)]:
        ch, rate, bits, ns = parse_wav(synth_wav(doc_id, n))
        assert ch == 1 + doc_id % 2
        assert rate == 8000 * (1 + doc_id % 3)
        assert bits == 16
        assert ns == n
    with pytest.raises(ValueError):
        parse_wav(b"not a wave file at all")
    with pytest.raises(ValueError):
        parse_wav(b"RIFF\x00\x00\x00\x00WAVE")  # no fmt/data chunks
    # contract holds for in-structure corruption too (ADVICE r2): a
    # zero block-align and a truncated fmt chunk are ValueError, not
    # ZeroDivisionError / struct.error
    import struct

    zero_block = struct.pack("<HHIIHH", 1, 1, 8000, 0, 0, 16)
    blob = (
        b"RIFF" + struct.pack("<I", 36) + b"WAVE"
        + b"fmt " + struct.pack("<I", len(zero_block)) + zero_block
        + b"data" + struct.pack("<I", 0)
    )
    with pytest.raises(ValueError, match="zero block"):
        parse_wav(blob)
    truncated = (
        b"RIFF" + struct.pack("<I", 20) + b"WAVE"
        + b"fmt " + struct.pack("<I", 4) + b"\x01\x00\x01\x00"
    )
    with pytest.raises(ValueError, match="truncated fmt"):
        parse_wav(truncated)


def test_wav_tone_pcm_roundtrip_and_poison():
    """synth_wav_tone → parse_wav_pcm16 must hand back the exact sample
    array the synthesizer computed (the feature math upstream of the
    oracle depends on it), and non-16-bit or data-less blobs must raise
    the documented ValueError."""
    import struct

    import numpy as np
    import pytest

    from etl_cnpjs_spark.operators.multimodal import (
        parse_wav_pcm16,
        synth_wav_tone,
    )

    for doc_id, n in [(0, 1), (3, 17), (12, 1280)]:
        s = parse_wav_pcm16(synth_wav_tone(doc_id, n))
        period = 16 + doc_id % 17
        i = np.arange(n, dtype=np.int64)
        expect = ((i % period) * 65536 // period - 32768).astype(np.int16)
        assert np.array_equal(s, expect)

    # 8-bit fmt header → documented error, not silent garbage
    fmt8 = struct.pack("<HHIIHH", 1, 1, 8000, 8000, 1, 8)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt8)) + fmt8
    body += b"data" + struct.pack("<I", 0)
    blob8 = b"RIFF" + struct.pack("<I", len(body)) + body
    with pytest.raises(ValueError, match="16-bit"):
        parse_wav_pcm16(blob8)


def test_bmp_synth_parse_roundtrip_and_poison():
    """The BMP encoder/parser pair agree pixel-by-pixel through real
    bytes (incl. the bottom-up flip and 4-byte row padding), and
    malformed or unsupported blobs raise instead of silently zeroing."""
    import struct

    import numpy as np
    import pytest

    from etl_cnpjs_spark.operators.multimodal import parse_bmp, synth_bmp

    for doc_id, w, h in [(0, 8, 8), (7, 13, 9), (123, 16, 14), (5, 9, 11)]:
        pw, ph, bpp, px = parse_bmp(synth_bmp(doc_id, w, h))
        assert (pw, ph, bpp) == (w, h, 24)
        x = np.arange(w, dtype=np.int64)[None, :]
        y = np.arange(h, dtype=np.int64)[:, None]
        assert (px[:, :, 0] == (x + 3 * y + doc_id) % 256).all()
        assert (px[:, :, 1] == (2 * x + y + doc_id) % 256).all()
        assert (px[:, :, 2] == (x + y + 3 * doc_id) % 256).all()

    with pytest.raises(ValueError, match="not a BMP"):
        parse_bmp(b"GIF89a totally not a bitmap")
    # 8-bit palette BMP: a real variant this decoder deliberately rejects
    info8 = struct.pack("<IiiHHIIiiII", 40, 4, 4, 1, 8, 0, 0, 0, 0, 0, 0)
    hdr8 = struct.pack("<2sIHHI", b"BM", 54, 0, 0, 54)
    with pytest.raises(ValueError, match="unsupported BMP variant"):
        parse_bmp(hdr8 + info8)
    # pixel array shorter than stride*height must surface
    good = bytearray(synth_bmp(1, 8, 8))
    with pytest.raises(ValueError, match="truncated BMP"):
        parse_bmp(bytes(good[:-10]))
    # degenerate dims
    info0 = struct.pack("<IiiHHIIiiII", 40, 0, 4, 1, 24, 0, 0, 0, 0, 0, 0)
    with pytest.raises(ValueError, match="degenerate"):
        parse_bmp(struct.pack("<2sIHHI", b"BM", 54, 0, 0, 54) + info0)


def test_vad_closed_form_matches_decode():
    """The mm_audio_vad oracle's closed-form frame/segment arithmetic
    must equal the REAL decode → frame → run-length path for the full
    edge grid: zero samples, sub-frame, sub-block, partial tails, and
    block-boundary-exact lengths."""
    import numpy as np

    from etl_cnpjs_spark.operators.multimodal import (
        VAD_FRAME,
        parse_wav_pcm16,
        synth_wav_gated,
    )

    def decode_counts(doc_id: int, n: int):
        s = parse_wav_pcm16(synth_wav_gated(doc_id, n)).astype(np.int64)
        nf = s.size // VAD_FRAME
        fr = s[: nf * VAD_FRAME].reshape(nf, VAD_FRAME)
        act = (fr * fr).sum(axis=1) > 0
        p = np.concatenate(([False], act, [False]))
        starts = np.flatnonzero(~p[:-1] & p[1:])
        ends = np.flatnonzero(p[:-1] & ~p[1:])
        L = ends - starts
        return nf, int(act.sum()), len(L), int(L.max()) if len(L) else 0

    def closed_form(n: int):
        frames = n // 80
        nb, r = frames // 5, frames % 5
        n_active = 5 * ((nb + 1) // 2) + (r if nb % 2 == 0 else 0)
        n_seg = (nb + 1) // 2 + (1 if (r > 0 and nb % 2 == 0) else 0)
        return frames, n_active, n_seg, 5 if nb >= 1 else r

    for doc_id in range(0, 24):
        for n in (0, 79, 80, 399, 400, 401, 480, 1234, 4800, 5530, 7999, 8001):
            assert decode_counts(doc_id, n) == closed_form(n), (doc_id, n)


def test_bucket_cosine_pairs_exact_with_hot_bucket_salting(spark):
    """bucket_cosine_pairs must emit exactly the brute-force intra-bucket
    pair set — including when a bucket exceeds bucket_cap and salts into
    group-pair tasks (each true pair scored in exactly one owning task,
    no loss, no duplicates)."""
    import itertools

    import numpy as np

    rng = np.random.RandomState(7)
    # bucket 0: 30 vectors (hot under cap=8); bucket 1: 5; bucket 2: 1
    rows = []
    for i in range(36):
        b = 0 if i < 30 else (1 if i < 35 else 2)
        v = rng.standard_normal(8)
        rows.append((i, int(b), [float(x) for x in v]))
    df = spark.createDataFrame(rows, "id long, b int, v array<double>")

    from etl_cnpjs_spark.operators.similarity import bucket_cosine_pairs

    tau = 0.2
    got = {
        (r.i, r.j)
        for r in bucket_cosine_pairs(df, "b", "id", "v", tau, bucket_cap=8).collect()
    }

    def cos(a, bb):
        a, bb = np.array(a), np.array(bb)
        return float(a @ bb / (np.linalg.norm(a) * np.linalg.norm(bb)))

    want = {
        (i, j)
        for (i, bi, vi), (j, bj, vj) in itertools.combinations(rows, 2)
        if bi == bj and cos(vi, vj) >= tau
    }
    assert want, "fixture must contain at least one qualifying pair"
    assert got == want
