"""Multimodal decode operators: opaque binary media columns → typed
features via Arrow-batched Python (mapInPandas).

Real media decoding (PIL / torchaudio / pyav) is NOT available in this
environment — the decoder seam is ``decode_media``, which raises
NotImplementedError, and ``_stub_decode`` stands in with a deterministic
fake so the entire Spark-side contract is real and testable:

- input: Arrow record batches with a ``binary`` column (zero-copy from
  the JVM),
- per-batch vectorized work (never per-row Python),
- output: typed columns declared in an explicit schema,
- executor-side execution: the decode runs where the data is; only
  features cross back.

At 100 TB: decode after partition pruning / frame sampling, keep batches
~64 MB (spark.sql.execution.arrow.maxRecordsPerBatch), and pin thread
pools inside the UDF to 1 (the task is the parallelism unit).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame

from etl_cnpjs_spark.serde import pickle_by_value

DECODE_SCHEMA = "doc_id long, n_bytes long, width long, height long, n_frames long"


def decode_media(blob: bytes) -> dict:
    """THE REAL-DECODER SEAM. Plug PIL/pyav/torchaudio here.

    Not implemented in this environment (no media libraries baked in).
    """
    raise NotImplementedError(
        "media decoding requires image/audio libraries not present in this "
        "environment; the pipeline uses the deterministic stub instead"
    )


def _stub_decode(n_bytes: pd.Series) -> pd.DataFrame:
    """Deterministic fake decode, derived from byte length only — keeps
    every downstream schema/partitioning decision testable and
    oracle-checkable."""
    return pd.DataFrame(
        {
            "n_bytes": n_bytes,
            "width": n_bytes % 640,
            "height": (n_bytes * 7) % 480,
            "n_frames": 1 + (n_bytes % 120),
        }
    )


def decode_features_map_in_pandas(df: DataFrame) -> DataFrame:
    """blob → features via mapInPandas (Arrow batches in and out)."""

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n_bytes = pdf["blob"].map(len).astype("int64")
            out = _stub_decode(n_bytes)
            out.insert(0, "doc_id", pdf["doc_id"].values)
            yield out

    return df.mapInPandas(decode_batches, schema=DECODE_SCHEMA)


# ship this module's functions by value inside serialized tasks — executors
# don't have the package installed (see serde.py)
pickle_by_value(__name__)


# --- real WAV encode/decode (pure stdlib — no codec libraries) -------------

WAV_SCHEMA = (
    "doc_id long, channels int, sample_rate int, bits int, "
    "n_samples long, duration_ms long"
)


def synth_wav(doc_id: int, n_samples: int) -> bytes:
    """Build a VALID RIFF/WAVE file (PCM, silence payload) with
    parameters derived from the doc key: channels = 1 + doc_id % 2,
    sample_rate = 8000 * (1 + doc_id % 3), 16-bit. Pure struct.pack —
    a real container format, no codec library."""
    import struct

    channels = 1 + doc_id % 2
    rate = 8000 * (1 + doc_id % 3)
    bits = 16
    block = channels * bits // 8
    data = b"\x00" * (n_samples * block)
    fmt = struct.pack("<HHIIHH", 1, channels, rate, rate * block, block, bits)
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def parse_wav(blob: bytes) -> tuple[int, int, int, int]:
    """REAL decode of the WAV container: walk the RIFF chunks, unpack
    the fmt header, size the data chunk. Returns (channels, rate, bits,
    n_samples). Raises on malformed input — poison blobs surface, not
    silently zero."""
    import struct

    if blob[:4] != b"RIFF" or blob[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE blob")
    pos, channels, rate, bits, block, data_len = 12, None, None, None, None, None
    while pos + 8 <= len(blob):
        cid, clen = blob[pos : pos + 4], struct.unpack("<I", blob[pos + 4 : pos + 8])[0]
        if cid == b"fmt ":
            # a truncated fmt chunk or a zero block size must surface as
            # the documented ValueError, not struct.error/ZeroDivisionError
            if len(blob) < pos + 24 or clen < 16:
                raise ValueError("truncated fmt chunk")
            _, channels, rate, _, block, bits = struct.unpack(
                "<HHIIHH", blob[pos + 8 : pos + 24]
            )
            if block == 0:
                raise ValueError("fmt chunk declares zero block align")
        elif cid == b"data":
            data_len = clen
        pos += 8 + clen + (clen % 2)
    if None in (channels, rate, bits, block, data_len):
        raise ValueError("missing fmt/data chunk")
    return channels, rate, bits, data_len // block


def wav_roundtrip_map_in_pandas(df: DataFrame) -> DataFrame:
    """(doc_id, n_samples) → synthesize a real WAV per row, then PARSE
    the bytes back — both halves executor-side over Arrow batches. The
    output features come from the parser reading actual bytes, so this
    is a true binary decode path (for an uncompressed container);
    decode_media stays the seam for codec-backed formats."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, n_samples in zip(pdf["doc_id"], pdf["n_samples"]):
                blob = synth_wav(int(doc_id), int(n_samples))
                ch, rate, bits, ns = parse_wav(blob)
                rows.append(
                    (int(doc_id), ch, rate, bits, ns, ns * 1000 // rate)
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "channels", "sample_rate", "bits",
                    "n_samples", "duration_ms",
                ],
            )

    return df.mapInPandas(run, schema=WAV_SCHEMA)


# --- real PCM feature extraction (decode → samples → features) -------------

AUDIO_FEATURES_SCHEMA = (
    "doc_id long, n_samples long, peak_abs long, energy long, zero_crossings long"
)


def synth_wav_tone(doc_id: int, n_samples: int) -> bytes:
    """Like synth_wav but with a NON-TRIVIAL payload: a mono 16-bit
    integer sawtooth whose period varies per doc
    (period = 16 + doc_id % 17, sample_i = (i % period)·65536 // period
    − 32768). Pure integer arithmetic, so downstream features have exact
    closed forms any engine can re-derive."""
    import struct

    import numpy as np

    rate = 8000 * (1 + doc_id % 3)
    period = 16 + doc_id % 17
    i = np.arange(n_samples, dtype=np.int64)
    vals = ((i % period) * 65536 // period - 32768).astype("<i2")
    data = vals.tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, rate, rate * 2, 2, 16)
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def parse_wav_pcm16(blob: bytes):
    """Decode a 16-bit PCM WAV payload to its sample array: header via
    parse_wav (same validation), then the data chunk located by a second
    chunk walk. Returns a numpy int16 array."""
    import struct

    import numpy as np

    channels, rate, bits, n_samples = parse_wav(blob)
    if bits != 16:
        raise ValueError(f"expected 16-bit PCM, got {bits}")
    pos = 12
    while pos + 8 <= len(blob):
        cid = blob[pos : pos + 4]
        clen = struct.unpack("<I", blob[pos + 4 : pos + 8])[0]
        if cid == b"data":
            return np.frombuffer(blob, dtype="<i2", count=clen // 2, offset=pos + 8)
        pos += 8 + clen + (clen % 2)
    raise ValueError("missing data chunk")


def audio_features_map_in_pandas(df: DataFrame) -> DataFrame:
    """(doc_id, n_samples) → synthesize a tone WAV, parse the BYTES back
    to samples, and compute integer features over the decoded PCM:
    peak_abs = max |s|, energy = Σ s² (exact bigint), zero_crossings =
    sign flips between consecutive samples (sign(0) = +1). All work is
    vectorized numpy over Arrow batches on executors — the feature
    extraction an audio curation pipeline runs after decode, proven
    through actual container bytes."""
    import numpy as np

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, n_samples in zip(pdf["doc_id"], pdf["n_samples"]):
                blob = synth_wav_tone(int(doc_id), int(n_samples))
                s = parse_wav_pcm16(blob).astype(np.int64)
                signs = np.where(s >= 0, 1, -1)
                rows.append(
                    (
                        int(doc_id),
                        int(s.size),
                        int(np.abs(s).max()) if s.size else 0,
                        int((s * s).sum()),
                        int((signs[1:] != signs[:-1]).sum()),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "n_samples", "peak_abs", "energy", "zero_crossings",
                ],
            )

    return df.mapInPandas(run, schema=AUDIO_FEATURES_SCHEMA)


# --- image resize / thumbnail (stub decode, REAL resize) -------------------

THUMB = 8  # target thumbnail edge

RESIZE_SCHEMA = (
    "doc_id long, width int, height int, thumb_sum long, thumb_hash long"
)


def _stub_image(doc_id: int, w: int, h: int):
    """Deterministic fake image decode (the image-codec seam is
    decode_media): pixel(y, x) = (doc_id·31 + y·w + x) mod 256 as a
    uint8-range int array. Stands in for PIL.Image.open → np.asarray."""
    import numpy as np

    y, x = np.mgrid[0:h, 0:w]
    return (doc_id * 31 + y * w + x) % 256


def resize_thumb_map_in_pandas(df: DataFrame) -> DataFrame:
    """(doc_id, width, height) → decode (stub) → REAL nearest-neighbor
    resize to THUMB×THUMB via numpy fancy indexing (the same gather a
    PIL/cv2 NN resize performs) → integer thumbnail features. Per-batch
    Arrow transfer; per-row work is vectorized numpy over the image
    array. Feature math is all-integer (sum and a position-weighted
    hash), so the oracle re-derives it in closed form from the stub
    pixel formula — proving decode → resize-gather → feature end to
    end. At 100 TB the image bytes never leave the task; only the
    5-number feature row crosses the wire (SCALE.md multimodal rule)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        t = np.arange(THUMB)
        wgt = 1 + t[None, :] + THUMB * t[:, None]  # 1 + x + 8·y
        for pdf in batches:
            rows = []
            for doc_id, w, h in zip(pdf["doc_id"], pdf["width"], pdf["height"]):
                doc_id, w, h = int(doc_id), int(w), int(h)
                img = _stub_image(doc_id, w, h)
                sx = (t * w) // THUMB  # floor NN source coords
                sy = (t * h) // THUMB
                thumb = img[np.ix_(sy, sx)]
                rows.append(
                    (
                        doc_id, w, h,
                        int(thumb.sum()),
                        int((thumb * wgt).sum()),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "width", "height", "thumb_sum", "thumb_hash"],
            )

    return df.mapInPandas(run, schema=RESIZE_SCHEMA)


# --- real BMP encode/decode (pure stdlib + numpy — no codec libraries) -----
#
# The image twin of the WAV path: BMP (BITMAPINFOHEADER, 24-bit BI_RGB)
# is an uncompressed container a few struct.packs wide, so the decode can
# be REAL — actual header parse, actual bottom-up padded pixel rows —
# without PIL/cv2. decode_media stays the seam for codec-backed formats
# (JPEG/PNG/video need real libraries); this proves the executor-side
# binary→array→features pipeline on genuine image bytes.

BMP_SCHEMA = (
    "doc_id long, width int, height int, bpp int, pixel_sum long, px_hash long"
)


def synth_bmp(doc_id: int, width: int, height: int) -> bytes:
    """Build a VALID 24-bit uncompressed BMP: BITMAPFILEHEADER +
    BITMAPINFOHEADER, rows stored BOTTOM-UP and padded to 4 bytes (the
    two details naive image code gets wrong — the position-weighted
    feature hash catches either mistake). Pixel (x, y) in image coords
    (y = 0 at the TOP):
        b = (x + 3·y + doc_id) mod 256
        g = (2·x + y + doc_id) mod 256
        r = (x + y + 3·doc_id) mod 256
    Pure integer pattern ⇒ every downstream feature has a closed form
    both engines re-derive independently of these bytes."""
    import struct

    import numpy as np

    x = np.arange(width, dtype=np.int64)[None, :]
    y = np.arange(height, dtype=np.int64)[:, None]
    b = (x + 3 * y + doc_id) % 256
    g = (2 * x + y + doc_id) % 256
    r = (x + y + 3 * doc_id) % 256
    px = np.stack(
        [np.broadcast_to(b, (height, width)),
         np.broadcast_to(g, (height, width)),
         np.broadcast_to(r, (height, width))],
        axis=2,
    ).astype(np.uint8)  # BGR byte order, top-down image coords
    row_bytes = width * 3
    pad = (4 - row_bytes % 4) % 4
    rows = b"".join(
        px[yy].tobytes() + b"\x00" * pad for yy in range(height - 1, -1, -1)
    )
    info = struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, 0, len(rows), 2835, 2835, 0, 0
    )
    off = 14 + 40
    file_hdr = struct.pack("<2sIHHI", b"BM", off + len(rows), 0, 0, off)
    return file_hdr + info + rows


def parse_bmp(blob: bytes):
    """REAL decode: validate the BM magic, unpack BITMAPINFOHEADER,
    reject compressed/≠24-bit variants, un-pad and un-flip the pixel
    rows. Returns (width, height, bpp, array[h, w, 3] BGR in TOP-DOWN
    image coords). Raises ValueError on malformed input — poison blobs
    surface, not silently zero (the WAV parser's contract)."""
    import struct

    import numpy as np

    if len(blob) < 54 or blob[:2] != b"BM":
        raise ValueError("not a BMP blob")
    off = struct.unpack("<I", blob[10:14])[0]
    hsz, width, height, planes, bpp, comp = struct.unpack("<IiiHHI", blob[14:34])
    if hsz < 40 or comp != 0 or bpp != 24 or planes != 1:
        raise ValueError("unsupported BMP variant (need uncompressed 24-bit)")
    if width <= 0 or height == 0:
        raise ValueError("degenerate BMP dimensions")
    bottom_up = height > 0
    height = abs(height)
    row_bytes = width * 3
    stride = row_bytes + (4 - row_bytes % 4) % 4
    if len(blob) < off + stride * height:
        raise ValueError("truncated BMP pixel array")
    raw = np.frombuffer(blob, dtype=np.uint8, count=stride * height, offset=off)
    rows = raw.reshape(height, stride)[:, :row_bytes].reshape(height, width, 3)
    if bottom_up:
        rows = rows[::-1]
    return width, height, bpp, rows


def _bmp_feature_row(px, pw: int, ph: int):
    """Reduce one decoded HxWx3 pixel array to its two integer features.
    SINGLE definition shared by the decode and fingerprint faces (and
    mirrored by both DuckDB oracle grids):

        pixel_sum = Σ (b + g + r)
        px_hash   = Σ (b + 2·g + 3·r) · (1 + x + width·y)   [top-down]
    """
    import numpy as np

    px64 = px.astype(np.int64)
    cw = px64[:, :, 0] + 2 * px64[:, :, 1] + 3 * px64[:, :, 2]
    x = np.arange(pw, dtype=np.int64)[None, :]
    y = np.arange(ph, dtype=np.int64)[:, None]
    return int(px64.sum()), int((cw * (1 + x + pw * y)).sum())


def bmp_features_map_in_pandas(df: DataFrame) -> DataFrame:
    """(doc_id, width, height) → synthesize a real BMP per row, PARSE
    the bytes back, and reduce the decoded array to integer features —
    both halves executor-side over Arrow batches:

        pixel_sum = Σ (b + g + r)
        px_hash   = Σ (b + 2·g + 3·r) · (1 + x + width·y)   [top-down]

    The position- and channel-weighted hash pins the full decode
    contract: BGR channel order, 4-byte row padding skipped, bottom-up
    storage un-flipped. Per-row work is vectorized numpy; only the
    6-number feature row crosses back to the JVM."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, w, h in zip(pdf["doc_id"], pdf["width"], pdf["height"]):
                doc_id, w, h = int(doc_id), int(w), int(h)
                blob = synth_bmp(doc_id, w, h)
                pw, ph, bpp, px = parse_bmp(blob)
                pixel_sum, px_hash = _bmp_feature_row(px, pw, ph)
                rows.append((doc_id, pw, ph, bpp, pixel_sum, px_hash))
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "width", "height", "bpp", "pixel_sum", "px_hash",
                ],
            )

    return df.mapInPandas(run, schema=BMP_SCHEMA)


BMP_FPRINT_SCHEMA = (
    "doc_id long, px_md5 string, width int, height int,"
    " pixel_sum long, px_hash long"
)


def bmp_fingerprint_map_in_pandas(df: DataFrame) -> DataFrame:
    """(doc_id, seed, width, height) → synthesize the seed's BMP, PARSE
    the bytes back, and fingerprint the DECODED pixel array: md5 of the
    raw array bytes (the exact-image-dedup key — content-addressed, like
    a CAS ingest dedup) plus the closed-form integer features that let a
    SQL oracle validate the grouping without ever seeing the bytes.
    Same executor-side discipline as bmp_features_map_in_pandas: bytes
    are born and die inside the task; only (hash, 4 ints) cross out."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            rows = []
            for doc_id, seed, w, h in zip(
                pdf["doc_id"], pdf["seed"], pdf["width"], pdf["height"]
            ):
                doc_id, seed, w, h = int(doc_id), int(seed), int(w), int(h)
                blob = synth_bmp(seed, w, h)
                pw, ph, bpp, px = parse_bmp(blob)
                md5 = hashlib.md5(px.tobytes()).hexdigest()
                pixel_sum, px_hash = _bmp_feature_row(px, pw, ph)
                rows.append((doc_id, md5, pw, ph, pixel_sum, px_hash))
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "px_md5", "width", "height",
                    "pixel_sum", "px_hash",
                ],
            )

    return df.mapInPandas(run, schema=BMP_FPRINT_SCHEMA)


# --- voice-activity detection over decoded PCM ------------------------------
#
# The curation step after decode + features: split an audio stream into
# voiced segments so only speech spans reach transcription. Synthesis gates
# the sawtooth with alternating silence blocks so segmentation has real
# structure to find; the gate (energy > 0) is exact because synthesized
# silence is digital zero — production sets the threshold at the noise
# floor, the segmentation logic is identical.

VAD_FRAME = 80  # samples per analysis frame (10 ms at 8 kHz)
VAD_BLOCK = 400  # gating block: alternating voice / silence, 5 frames each

VAD_SCHEMA = (
    "doc_id long, n_frames long, n_active long, n_segments long, longest_seg long"
)


def synth_wav_gated(doc_id: int, n_samples: int) -> bytes:
    """synth_wav_tone's sawtooth, force-muted on odd VAD_BLOCK blocks
    (samples 400-799, 1200-1599, ... are exactly 0). Same container
    layout, so parse_wav_pcm16 decodes it unchanged."""
    import struct

    import numpy as np

    rate = 8000 * (1 + doc_id % 3)
    period = 16 + doc_id % 17
    i = np.arange(n_samples, dtype=np.int64)
    vals = (i % period) * 65536 // period - 32768
    vals = np.where((i // VAD_BLOCK) % 2 == 1, 0, vals).astype("<i2")
    data = vals.tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, rate, rate * 2, 2, 16)
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def vad_segments_map_in_pandas(df: DataFrame) -> DataFrame:
    """(doc_id, n_samples) → synthesize the gated WAV, parse the BYTES
    back to PCM, and run frame-energy voice-activity detection over the
    decoded samples: VAD_FRAME-sample frames (tail partial frame
    dropped), frame active iff Σ s² > 0, segments = maximal runs of
    consecutive active frames. Vectorized numpy per Arrow batch; only
    the 5-integer summary row leaves the task — media bytes never
    shuffle (SCALE.md multimodal rule)."""
    import numpy as np

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, n_samples in zip(pdf["doc_id"], pdf["n_samples"]):
                blob = synth_wav_gated(int(doc_id), int(n_samples))
                s = parse_wav_pcm16(blob).astype(np.int64)
                n_frames = s.size // VAD_FRAME
                frames = s[: n_frames * VAD_FRAME].reshape(n_frames, VAD_FRAME)
                active = (frames * frames).sum(axis=1) > 0
                # run-length segmentation: starts where active rises
                padded = np.concatenate(([False], active, [False]))
                starts = np.flatnonzero(~padded[:-1] & padded[1:])
                ends = np.flatnonzero(padded[:-1] & ~padded[1:])
                lengths = ends - starts
                rows.append(
                    (
                        int(doc_id),
                        int(n_frames),
                        int(active.sum()),
                        int(lengths.size),
                        int(lengths.max()) if lengths.size else 0,
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "n_frames", "n_active", "n_segments", "longest_seg",
                ],
            )

    return df.mapInPandas(run, schema=VAD_SCHEMA)


BMP_AHASH_SCHEMA = "doc_id long, width int, height int, phash long"

# Average-hash window: widths are always >= 8 and heights >= 8 in the
# seeded corpus (mm_image_dedup's derivation), so an 8x7 top-left
# region is fully populated for every image and packs into 56 bits —
# safely inside a signed int64.
AHASH_W, AHASH_H = 8, 7


def bmp_ahash_map_in_pandas(df: DataFrame) -> DataFrame:
    """(doc_id, seed, width, height) → synthesize the seed's BMP, PARSE
    the bytes back, and compute a perceptual AVERAGE HASH over the
    decoded pixels: for each of the 8×7 top-left pixels, bit = (channel
    sum strictly above the region mean), packed bit (y·8+x). The
    classic aHash recipe with the downsample step degenerate (these
    images are already thumbnail-sized); mean comparison is done as
    s·npix > Σs — pure integers, so a SQL oracle re-derives every bit
    from the generator pattern without seeing bytes. Same task
    discipline as the other BMP faces: bytes never leave the task; two
    numbers cross out."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            rows = []
            for doc_id, seed, w, h in zip(
                pdf["doc_id"], pdf["seed"], pdf["width"], pdf["height"]
            ):
                doc_id, seed, w, h = int(doc_id), int(seed), int(w), int(h)
                blob = synth_bmp(seed, w, h)
                pw, ph, _bpp, px = parse_bmp(blob)
                region = px[:AHASH_H, :AHASH_W].astype(np.int64).sum(axis=2)
                npix = AHASH_W * AHASH_H
                total = int(region.sum())
                bits = (region * npix) > total
                yy, xx = np.nonzero(bits)
                phash = int(np.sum(1 << (yy * 8 + xx))) if len(yy) else 0
                rows.append((doc_id, pw, ph, phash))
            yield pd.DataFrame(rows, columns=["doc_id", "width", "height", "phash"])

    return df.mapInPandas(run, schema=BMP_AHASH_SCHEMA)


BMP_CHANNEL_SCHEMA = (
    "doc_id long, width int, height int,"
    " sum_b long, sum_g long, sum_r long,"
    " min_b int, max_b int, min_g int, max_g int, min_r int, max_r int"
)


def bmp_channel_stats_map_in_pandas(df: DataFrame) -> DataFrame:
    """(doc_id, width, height) → synthesize the doc's BMP, PARSE the
    bytes back, and reduce the DECODED array to per-channel statistics
    (sum/min/max for B, G, R) — the normalization profile a vision
    preprocessing pipeline computes before mean/std scaling. Same
    executor-side discipline as bmp_features_map_in_pandas: bytes are
    born and die inside the task, vectorized numpy per image, only the
    12-integer stats row crosses back to the JVM. Channel separation
    (vs the summed features of the decode face) pins BGR ordering on
    its own: swapping any two channels changes the per-channel sums
    while leaving pixel_sum invariant."""
    import numpy as np

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, w, h in zip(pdf["doc_id"], pdf["width"], pdf["height"]):
                doc_id, w, h = int(doc_id), int(w), int(h)
                pw, ph, _bpp, px = parse_bmp(synth_bmp(doc_id, w, h))
                a = px.astype(np.int64)
                b, g, r = a[:, :, 0], a[:, :, 1], a[:, :, 2]
                rows.append(
                    (
                        doc_id, pw, ph,
                        int(b.sum()), int(g.sum()), int(r.sum()),
                        int(b.min()), int(b.max()),
                        int(g.min()), int(g.max()),
                        int(r.min()), int(r.max()),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "width", "height",
                    "sum_b", "sum_g", "sum_r",
                    "min_b", "max_b", "min_g", "max_g", "min_r", "max_r",
                ],
            )

    return df.mapInPandas(run, schema=BMP_CHANNEL_SCHEMA)


BMP_TILE_SCHEMA = (
    "doc_id long, tx int, ty int, n_pixels long,"
    " sum_b long, sum_g long, sum_r long"
)


def bmp_tile_stats_map_in_pandas(df: DataFrame) -> DataFrame:
    """(doc_id, width, height) → synthesize + parse the doc's BMP and
    reduce each cell of a 2×2 tile grid to per-channel sums — the
    patch-extraction plumbing under ViT-style preprocessing (image →
    grid of patches → per-patch features). Tile assignment is pure
    integer math (tx = 2x DIV w, ty = 2y DIV h), mirrored textually in
    the oracle. Executor-side discipline as the other BMP faces: bytes
    are born and die inside the task; 4 rows × 7 integers per image
    cross to the JVM."""
    import numpy as np

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, w, h in zip(pdf["doc_id"], pdf["width"], pdf["height"]):
                doc_id, w, h = int(doc_id), int(w), int(h)
                pw, ph, _bpp, px = parse_bmp(synth_bmp(doc_id, w, h))
                a = px.astype(np.int64)
                txs = (np.arange(pw) * 2) // pw  # per-column tile x
                tys = (np.arange(ph) * 2) // ph  # per-row tile y
                for ty in (0, 1):
                    for tx in (0, 1):
                        sel = a[np.ix_(tys == ty, txs == tx)]
                        rows.append(
                            (
                                doc_id, tx, ty,
                                int(sel.shape[0] * sel.shape[1]),
                                int(sel[:, :, 0].sum()),
                                int(sel[:, :, 1].sum()),
                                int(sel[:, :, 2].sum()),
                            )
                        )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "tx", "ty", "n_pixels", "sum_b", "sum_g", "sum_r",
                ],
            )

    return df.mapInPandas(run, schema=BMP_TILE_SCHEMA)
