"""Dependency-free baseline JPEG codec (ITU-T T.81 / ISO 10918-1).

The last real-format gap in the multimodal tier (VERDICT r5 item 1):
JPEG is the dominant image format of any web-scale multimodal corpus, so
``decode_image`` needs a real baseline decoder, not a PIL stub. Both
halves here are stdlib+numpy only:

* :func:`jpeg_bytes` — baseline sequential encoder: grayscale or RGB,
  4:4:4 or 4:2:0 chroma subsampling, Annex K quantization + Huffman
  tables by default (custom tables accepted), optional restart
  intervals.
* :func:`decode_jpeg` — baseline decoder: marker walk (APPn/COM/DQT/
  SOF0/SOF1/DHT/DRI/SOS), canonical Huffman entropy decode with byte
  unstuffing + RSTn handling, dequantization, batched vectorized IDCT,
  nearest-neighbor chroma upsampling, JFIF YCbCr→RGB. Progressive
  (SOF2) and arithmetic-coded streams raise the marked
  ``NotImplementedError`` — the same honest stub boundary as the other
  codecs (they need libjpeg in deployment).

Spec constants (zigzag order, Annex K quantization and Huffman tables,
JFIF color transform) are public ITU-T T.81 values.

Reference parity note: the reference repo (UMassCDS/IHOP-Reddit) has no
image path at all — this module belongs to the training-data-pipeline
tier the brief adds on top (multimodal columns: decode / feature-extract
as real, tested plumbing).

Scale shape: the codec is row-local Python invoked only inside
Arrow-batched ``mapInPandas`` stages (see ``datapipe/multimodal.py``) —
embarrassingly parallel per asset, no shuffle, no driver involvement.
"""

from __future__ import annotations

import struct

import numpy as np

# --------------------------------------------------------------------------
# Spec constants (ITU-T T.81)
# --------------------------------------------------------------------------

#: zigzag position -> natural (row-major) index
ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10,
        17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34,
        27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36,
        29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46,
        53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)

#: Annex K Table K.1 — luminance quantization (quality 50)
QUANT_LUMA = np.array(
    [
        [16, 11, 10, 16, 24, 40, 51, 61],
        [12, 12, 14, 19, 26, 58, 60, 55],
        [14, 13, 16, 24, 40, 57, 69, 56],
        [14, 17, 22, 29, 51, 87, 80, 62],
        [18, 22, 37, 56, 68, 109, 103, 77],
        [24, 35, 55, 64, 81, 104, 113, 92],
        [49, 64, 78, 87, 103, 121, 120, 101],
        [72, 92, 95, 98, 112, 100, 103, 99],
    ],
    dtype=np.int64,
)

#: Annex K Table K.2 — chrominance quantization
QUANT_CHROMA = np.array(
    [
        [17, 18, 24, 47, 99, 99, 99, 99],
        [18, 21, 26, 66, 99, 99, 99, 99],
        [24, 26, 56, 99, 99, 99, 99, 99],
        [47, 66, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
    ],
    dtype=np.int64,
)

#: a DC-lossless table for planted-pixel oracle gates: DC step 8 makes a
#: constant 8×8 block round-trip bit-exactly (DC coefficient of a constant
#: block is 8·(v−128), an exact multiple of 8); AC entries are Annex K.
QUANT_DC8 = QUANT_LUMA.copy()
QUANT_DC8[0, 0] = 8

# Annex K Huffman specs: (BITS[1..16], HUFFVAL)
_DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_DC_LUMA_VALS = list(range(12))
_DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
_DC_CHROMA_VALS = list(range(12))
_AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
_AC_LUMA_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
    0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
    0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
    0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]
_AC_CHROMA_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
_AC_CHROMA_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
    0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
    0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
    0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
    0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
    0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
    0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
    0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
    0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
    0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
    0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]

#: orthonormal 8-point DCT-II matrix: D[u, x] = c(u)·cos((2x+1)uπ/16)
_DCT = np.array(
    [
        [
            (np.sqrt(1 / 8) if u == 0 else np.sqrt(2 / 8))
            * np.cos((2 * x + 1) * u * np.pi / 16)
            for x in range(8)
        ]
        for u in range(8)
    ]
)


def _canonical_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """value -> (code, length) via the canonical assignment of T.81 C.2."""
    out: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


def _decode_table(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    """(length, code) -> value, for the walk-one-bit-at-a-time decoder."""
    enc = _canonical_codes(bits, vals)
    return {(length, code): v for v, (code, length) in enc.items()}


class _BitWriter:
    """MSB-first bit accumulator with 0xFF byte stuffing (T.81 B.1.1.5)."""

    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            byte = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> None:
        """Pad the final partial byte with 1-bits (spec padding)."""
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)


def _magnitude(v: int) -> tuple[int, int]:
    """DC/AC coefficient -> (category s, s-bit amplitude code)."""
    if v == 0:
        return 0, 0
    s = int(abs(v)).bit_length()
    return (s, v) if v > 0 else (s, v + (1 << s) - 1)


def _encode_blocks(
    writer: _BitWriter,
    coeffs: np.ndarray,
    dc_codes: dict[int, tuple[int, int]],
    ac_codes: dict[int, tuple[int, int]],
    pred: int,
) -> int:
    """Entropy-encode one quantized block (64 zigzag ints); returns new DC
    predictor."""
    zz = coeffs
    diff = int(zz[0]) - pred
    s, amp = _magnitude(diff)
    code, length = dc_codes[s]
    writer.write(code, length)
    if s:
        writer.write(amp, s)
    _encode_ac_band(writer, zz, ac_codes)
    return int(zz[0])


def _encode_ac_band(writer, zz, ac_codes, ss: int = 1, se: int = 63) -> None:
    """AC run-length encoding of one band (shared by the baseline scan
    and the progressive first AC scans; the 0x00 symbol is EOB in
    baseline and EOBRUN=1 in progressive — the same bits either way)."""
    run = 0
    for k in range(ss, se + 1):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            zc, zl = ac_codes[0xF0]  # ZRL
            writer.write(zc, zl)
            run -= 16
        s, amp = _magnitude(v)
        code, length = ac_codes[(run << 4) | s]
        writer.write(code, length)
        writer.write(amp, s)
        run = 0
    if run:
        code, length = ac_codes[0x00]
        writer.write(code, length)


def _plane_blocks(plane: np.ndarray, quant: np.ndarray) -> np.ndarray:
    """Plane (padded to 8-multiples) -> (n_by, n_bx, 64) quantized zigzag
    coefficients, vectorized: batched DCT then round-divide."""
    h, w = plane.shape
    blocks = (
        plane.reshape(h // 8, 8, w // 8, 8).transpose(0, 2, 1, 3).astype(np.float64)
        - 128.0
    )
    coeffs = np.einsum("ux,ijxy,vy->ijuv", _DCT, blocks, _DCT)
    q = np.round(coeffs / quant.astype(np.float64)).astype(np.int64)
    return q.reshape(h // 8, w // 8, 64)[..., ZIGZAG]


def _pad_to8(plane: np.ndarray, mult_y: int = 8, mult_x: int = 8) -> np.ndarray:
    """Edge-replicate pad to multiples of (mult_y, mult_x)."""
    h, w = plane.shape
    ph = (-h) % mult_y
    pw = (-w) % mult_x
    return np.pad(plane, ((0, ph), (0, pw)), mode="edge")


def _rgb_to_ycbcr(px: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    r = px[..., 0].astype(np.float64)
    g = px[..., 1].astype(np.float64)
    b = px[..., 2].astype(np.float64)
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
    cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
    clip = lambda a: np.clip(np.round(a), 0, 255).astype(np.uint8)  # noqa: E731
    return clip(y), clip(cb), clip(cr)


def jpeg_bytes(
    pixels,
    *,
    quant_luma: np.ndarray | None = None,
    quant_chroma: np.ndarray | None = None,
    subsampling: str = "444",
    restart_interval: int = 0,
    progressive: bool = False,
) -> bytes:
    """Baseline sequential (default) or PROGRESSIVE JPEG encoder.

    ``pixels``: H×W uint8 (grayscale, 1-component stream) or H×W×3 uint8
    RGB. ``subsampling``: "444" (no chroma subsampling) or "420" (2×2 —
    the dominant web layout; chroma planes are 2×2 box-averaged).
    ``restart_interval``: emit DRI + RSTn every N MCUs (0 = none;
    baseline only).

    ``progressive=True`` emits SOF2 with a genuine multi-scan script:
    an interleaved DC-first scan at Al=1, a DC successive-approximation
    REFINEMENT scan (raw bits), then one non-interleaved full-band AC
    scan per component (EOBRUN form) — the same quantized coefficients
    as the baseline stream, so a progressive encode and a baseline
    encode of the same pixels decode IDENTICALLY (pinned in tests).
    """
    px = np.asarray(pixels, dtype=np.uint8)
    if progressive and restart_interval:
        raise ValueError("restart_interval unsupported with progressive")
    gray = px.ndim == 2
    if not gray and (px.ndim != 3 or px.shape[2] != 3):
        raise ValueError("jpeg_bytes expects H×W grayscale or H×W×3 RGB")
    h, w = px.shape[:2]
    ql = (quant_luma if quant_luma is not None else QUANT_LUMA).astype(np.int64)
    qc = (quant_chroma if quant_chroma is not None else QUANT_CHROMA).astype(
        np.int64
    )
    if subsampling not in ("444", "420"):
        raise ValueError("subsampling must be '444' or '420'")
    sub = 2 if (subsampling == "420" and not gray) else 1

    if gray:
        planes = [px.astype(np.float64)]
        samp = [(1, 1)]
        quants = [ql]
    else:
        y, cb, cr = _rgb_to_ycbcr(px)
        if sub == 2:
            cbp = _pad_to8(cb, 2, 2).astype(np.float64)
            crp = _pad_to8(cr, 2, 2).astype(np.float64)
            # 2×2 box average, rounded — the standard downsample
            cb = np.round(
                cbp.reshape(cbp.shape[0] // 2, 2, cbp.shape[1] // 2, 2).mean(
                    axis=(1, 3)
                )
            )
            cr = np.round(
                crp.reshape(crp.shape[0] // 2, 2, crp.shape[1] // 2, 2).mean(
                    axis=(1, 3)
                )
            )
            samp = [(2, 2), (1, 1), (1, 1)]
        else:
            samp = [(1, 1), (1, 1), (1, 1)]
        planes = [y.astype(np.float64), cb.astype(np.float64), cr.astype(np.float64)]
        quants = [ql, qc, qc]

    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    # edge-pad every plane to exactly its MCU-covered size
    final = []
    for plane, (hi, vi) in zip(planes, samp):
        th, tw = mcuy * 8 * vi, mcux * 8 * hi
        ph, pw = plane.shape
        if ph < th or pw < tw:
            plane = np.pad(plane, ((0, th - ph), (0, tw - pw)), mode="edge")
        final.append(plane[:th, :tw])

    blocks = [
        _plane_blocks(plane, q) for plane, q in zip(final, quants)
    ]  # (nby, nbx, 64) each

    ncomp = len(planes)
    # table id 0 = luma, 1 = chroma (emitted only for color streams)
    dc_specs = [(_DC_LUMA_BITS, _DC_LUMA_VALS), (_DC_CHROMA_BITS, _DC_CHROMA_VALS)]
    ac_specs = [(_AC_LUMA_BITS, _AC_LUMA_VALS), (_AC_CHROMA_BITS, _AC_CHROMA_VALS)]
    n_tables = 2 if ncomp > 1 else 1
    dc_codes = [_canonical_codes(*s) for s in dc_specs[:n_tables]]
    ac_codes = [_canonical_codes(*s) for s in ac_specs[:n_tables]]

    out = bytearray(b"\xff\xd8")  # SOI
    # APP0 JFIF
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00"
    out += struct.pack(">HH", 1, 1) + b"\x00\x00"
    # DQT (zigzag order)
    for tid, q in enumerate([ql] + ([qc] if ncomp > 1 else [])):
        out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([tid])
        out += bytes(int(v) for v in q.reshape(64)[ZIGZAG])
    # SOF0 baseline / SOF2 progressive
    out += (b"\xff\xc2" if progressive else b"\xff\xc0") + struct.pack(
        ">HBHHB", 8 + 3 * ncomp, 8, h, w, ncomp
    )
    for ci in range(ncomp):
        hi, vi = samp[ci]
        out += bytes([ci + 1, (hi << 4) | vi, 0 if ci == 0 else 1])
    # DHT
    for cls, specs in ((0, dc_specs), (1, ac_specs)):
        for tid, (bits, vals) in enumerate(specs[:n_tables]):
            out += b"\xff\xc4" + struct.pack(">H", 3 + 16 + len(vals))
            out += bytes([(cls << 4) | tid]) + bytes(bits) + bytes(vals)
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)

    if progressive:
        def sos(ids_tables, ss, se, ah, al) -> bytes:
            b = b"\xff\xda" + struct.pack(
                ">HB", 6 + 2 * len(ids_tables), len(ids_tables)
            )
            for cid, tbyte in ids_tables:
                b += bytes([cid, tbyte])
            return b + bytes([ss, se, (ah << 4) | al])

        all_ids = [
            (ci + 1, ((0 if ci == 0 else 1) << 4)) for ci in range(ncomp)
        ]
        # scan 1: DC first, interleaved, successive approximation Al=1
        out += sos(all_ids, 0, 0, 0, 1)
        writer = _BitWriter()
        preds = [0] * ncomp
        for my in range(mcuy):
            for mx in range(mcux):
                for ci in range(ncomp):
                    hi, vi = samp[ci]
                    tsel = 0 if ci == 0 else 1
                    for by in range(vi):
                        for bx in range(hi):
                            dc = int(
                                blocks[ci][my * vi + by, mx * hi + bx][0]
                            ) >> 1  # DC point transform (arith shift)
                            diff = dc - preds[ci]
                            preds[ci] = dc
                            s, amp = _magnitude(diff)
                            code, length = dc_codes[tsel][s]
                            writer.write(code, length)
                            if s:
                                writer.write(amp, s)
        writer.flush()
        out += writer.out
        # scan 2: DC refinement — one raw bit per block (Ah=1, Al=0)
        out += sos(all_ids, 0, 0, 1, 0)
        writer = _BitWriter()
        for my in range(mcuy):
            for mx in range(mcux):
                for ci in range(ncomp):
                    hi, vi = samp[ci]
                    for by in range(vi):
                        for bx in range(hi):
                            writer.write(
                                int(
                                    blocks[ci][my * vi + by, mx * hi + bx][0]
                                )
                                & 1,
                                1,
                            )
        writer.flush()
        out += writer.out
        # one full-band AC scan per component, non-interleaved
        for ci in range(ncomp):
            hi, vi = samp[ci]
            tsel = 0 if ci == 0 else 1
            cw = -(-w * hi // hmax)
            ch = -(-h * vi // vmax)
            bw_, bh_ = -(-cw // 8), -(-ch // 8)
            out += sos([(ci + 1, tsel)], 1, 63, 0, 0)
            writer = _BitWriter()
            for by in range(bh_):
                for bx in range(bw_):
                    _encode_ac_band(writer, blocks[ci][by, bx], ac_codes[tsel])
            writer.flush()
            out += writer.out
        out += b"\xff\xd9"  # EOI
        return bytes(out)

    # SOS (baseline single scan)
    out += b"\xff\xda" + struct.pack(">HB", 6 + 2 * ncomp, ncomp)
    for ci in range(ncomp):
        t = 0 if ci == 0 else 1
        out += bytes([ci + 1, (t << 4) | t])
    out += b"\x00\x3f\x00"

    writer = _BitWriter()
    preds = [0] * ncomp
    rst = 0
    for my in range(mcuy):
        for mx in range(mcux):
            mcu_i = my * mcux + mx
            if restart_interval and mcu_i and mcu_i % restart_interval == 0:
                writer.flush()
                out += writer.out
                writer = _BitWriter()
                out += bytes([0xFF, 0xD0 + (rst % 8)])
                rst += 1
                preds = [0] * ncomp
            for ci in range(ncomp):
                hi, vi = samp[ci]
                tsel = 0 if ci == 0 else 1
                for by in range(vi):
                    for bx in range(hi):
                        blk = blocks[ci][my * vi + by, mx * hi + bx]
                        preds[ci] = _encode_blocks(
                            writer, blk, dc_codes[tsel], ac_codes[tsel], preds[ci]
                        )
    writer.flush()
    out += writer.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# --------------------------------------------------------------------------
# Decoder
# --------------------------------------------------------------------------


class _BitReader:
    """MSB-first reader over an UNSTUFFED entropy segment."""

    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0  # bit position

    def read_bit(self) -> int:
        byte = self.pos >> 3
        if byte >= len(self.data):
            raise ValueError("JPEG entropy data truncated")
        bit = (self.data[byte] >> (7 - (self.pos & 7))) & 1
        self.pos += 1
        return bit

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v


def _huff_decode(reader: _BitReader, table: dict[tuple[int, int], int]) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | reader.read_bit()
        v = table.get((length, code))
        if v is not None:
            return v
    raise ValueError("invalid JPEG Huffman code")


def _extend(v: int, s: int) -> int:
    """T.81 F.12 sign extension of an s-bit amplitude."""
    if s == 0:
        return 0
    return v if v >= (1 << (s - 1)) else v - (1 << s) + 1


# decode-table cache keyed by the raw DHT payload — thousands of assets
# share identical tables, so each worker builds them once
_DHT_CACHE: dict[bytes, dict[tuple[int, int], int]] = {}


def _split_entropy(payload: bytes, start: int) -> tuple[list[bytes], int]:
    """Collect entropy-coded segments from ``start``, split on RSTn and
    unstuffed, until the next real marker; returns (segments, marker_pos)."""
    segments: list[bytes] = []
    cur = bytearray()
    i = start
    n = len(payload)
    while i < n:
        b = payload[i]
        if b != 0xFF:
            cur.append(b)
            i += 1
            continue
        if i + 1 >= n:
            break
        nxt = payload[i + 1]
        if nxt == 0x00:  # stuffed 0xFF data byte
            cur.append(0xFF)
            i += 2
        elif 0xD0 <= nxt <= 0xD7:  # restart marker
            segments.append(bytes(cur))
            cur = bytearray()
            i += 2
        else:  # a real marker ends the scan
            break
    segments.append(bytes(cur))
    return segments, i


def decode_jpeg(payload: bytes) -> np.ndarray:
    """Baseline or progressive JPEG → H×W×3 uint8 RGB (grayscale
    replicated). Progressive (SOF2) accumulates coefficients across its
    scans — spectral selection, successive approximation (DC and AC
    refinement), EOBRUN — then reconstructs once; hierarchical and
    arithmetic-coded streams keep the marked stub. An EXIF APP1
    orientation (r10, via the TIFF IFD walker) is applied so camera-
    rotated copies canonicalize to their upright twins' pixels."""
    payload = bytes(payload)
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload")
    exif_orient = 1
    quant: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict[tuple[int, int], int]] = {}
    restart_interval = 0
    frame = None  # (h, w, comps) where comps = [(cid, hi, vi, tq)]
    progressive = False
    coeff: dict[int, np.ndarray] | None = None
    i = 2
    n = len(payload)
    planes: dict[int, np.ndarray] = {}
    comps: list[tuple[int, int, int, int]] = []
    while i + 4 <= n:
        if payload[i] != 0xFF:
            raise ValueError("JPEG marker expected")
        marker = payload[i + 1]
        if marker == 0xD9:  # EOI
            break
        (seglen,) = struct.unpack(">H", payload[i + 2 : i + 4])
        seg = payload[i + 4 : i + 2 + seglen]
        if marker == 0xDB:  # DQT (may hold several tables)
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 0x0F
                p += 1
                if pq == 0:
                    vals = np.frombuffer(seg[p : p + 64], dtype=np.uint8).astype(
                        np.int64
                    )
                    p += 64
                else:  # 16-bit precision
                    vals = np.frombuffer(
                        seg[p : p + 128], dtype=">u2"
                    ).astype(np.int64)
                    p += 128
                table = np.zeros(64, dtype=np.int64)
                table[ZIGZAG] = vals
                quant[tq] = table.reshape(8, 8)
        elif marker in (0xC0, 0xC1, 0xC2):  # baseline / ext.seq / progressive
            _prec, fh, fw, nc = struct.unpack(">BHHB", seg[:6])
            comps = []
            for c in range(nc):
                cid, hv, tq = seg[6 + 3 * c : 9 + 3 * c]
                comps.append((cid, hv >> 4, hv & 0x0F, tq))
            frame = (fh, fw, comps)
            progressive = marker == 0xC2
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            # STUB boundary — hierarchical/lossless/arithmetic JPEG
            # needs libjpeg in deployment
            raise NotImplementedError(
                f"only baseline/extended-sequential/progressive JPEG "
                f"supported (SOF marker 0xFF{marker:02X})"
            )
        elif marker == 0xC4:  # DHT (may hold several tables)
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 0x0F
                bits = list(seg[p + 1 : p + 17])
                nv = sum(bits)
                vals = list(seg[p + 17 : p + 17 + nv])
                key = bytes(seg[p : p + 17 + nv])
                if key not in _DHT_CACHE:
                    _DHT_CACHE[key] = _decode_table(bits, vals)
                huff[(tc, th)] = _DHT_CACHE[key]
                p += 17 + nv
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", seg[:2])
        elif marker == 0xDA:  # SOS — entropy-coded data follows
            if frame is None:
                raise ValueError("JPEG SOS before SOF")
            ns = seg[0]
            scan_tables = {}
            scan_comps = []
            for c in range(ns):
                cid, tsel = seg[1 + 2 * c], seg[2 + 2 * c]
                scan_tables[cid] = (tsel >> 4, tsel & 0x0F)
                scan_comps.append((cid, tsel >> 4, tsel & 0x0F))
            ss, se, ahal = seg[1 + 2 * ns : 4 + 2 * ns]
            segments, i = _split_entropy(payload, i + 2 + seglen)
            if progressive:
                if coeff is None:
                    fh, fw, fcomps = frame
                    hmax = max(c[1] for c in fcomps)
                    vmax = max(c[2] for c in fcomps)
                    mcux = -(-fw // (8 * hmax))
                    mcuy = -(-fh // (8 * vmax))
                    coeff = {
                        cid: np.zeros(
                            (mcuy * vi, mcux * hi, 64), dtype=np.int64
                        )
                        for cid, hi, vi, _tq in fcomps
                    }
                _progressive_scan(
                    frame, huff, scan_comps, ss, se, ahal >> 4,
                    ahal & 0x0F, segments, restart_interval, coeff,
                )
            else:
                planes = _decode_scan(
                    frame, quant, huff, scan_tables, segments,
                    restart_interval,
                )
            continue  # i already advanced past the scan
        elif marker == 0xE1 and seg[:6] == b"Exif\x00\x00":
            # EXIF rides a TIFF IFD — reuse the TIFF walker; camera-
            # rotated copies must canonicalize to the same pixels (and
            # so the same aHash) as their upright twins
            from .tiff import exif_orientation

            exif_orient = exif_orientation(seg[6:])
        # APPn / COM / unknown: skip
        i += 2 + seglen
    if progressive and coeff is not None:
        planes = _reconstruct(frame, quant, coeff)
    if frame is None or not planes:
        raise ValueError("JPEG missing SOF/SOS")
    rgb = _compose_rgb(frame, planes)
    if exif_orient != 1:
        from .tiff import apply_orientation

        rgb = apply_orientation(rgb, exif_orient)
    return rgb


def _decode_scan(frame, quant, huff, scan_tables, segments, restart_interval):
    fh, fw, comps = frame
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = -(-fw // (8 * hmax))
    mcuy = -(-fh // (8 * vmax))
    n_mcus = mcux * mcuy
    # coefficient store per component: (nby, nbx, 64) natural order later
    coeff = {
        cid: np.zeros((mcuy * vi, mcux * hi, 64), dtype=np.int64)
        for cid, hi, vi, _tq in comps
    }
    seg_idx = 0
    reader = _BitReader(segments[0])
    preds = {cid: 0 for cid, *_ in comps}
    for m in range(n_mcus):
        if restart_interval and m and m % restart_interval == 0:
            seg_idx += 1
            if seg_idx >= len(segments):
                raise ValueError("JPEG missing restart segment")
            reader = _BitReader(segments[seg_idx])
            preds = {cid: 0 for cid, *_ in comps}
        my, mx = divmod(m, mcux)
        for cid, hi, vi, _tq in comps:
            tdc, tac = scan_tables[cid]
            dc_tab = huff[(0, tdc)]
            ac_tab = huff[(1, tac)]
            for by in range(vi):
                for bx in range(hi):
                    zz = np.zeros(64, dtype=np.int64)
                    s = _huff_decode(reader, dc_tab)
                    diff = _extend(reader.read_bits(s), s)
                    preds[cid] += diff
                    zz[0] = preds[cid]
                    k = 1
                    while k < 64:
                        rs = _huff_decode(reader, ac_tab)
                        r, s = rs >> 4, rs & 0x0F
                        if s == 0:
                            if r == 15:  # ZRL
                                k += 16
                                continue
                            break  # EOB
                        k += r
                        if k > 63:
                            raise ValueError("JPEG AC run past block end")
                        zz[k] = _extend(reader.read_bits(s), s)
                        k += 1
                    coeff[cid][my * vi + by, mx * hi + bx] = zz
    return _reconstruct(frame, quant, coeff)


def _reconstruct(frame, quant, coeff):
    """Accumulated zigzag coefficients → pixel planes: dequantize +
    batched vectorized IDCT per component (shared by the baseline
    single-scan path and the progressive multi-scan path)."""
    _fh, _fw, comps = frame
    planes = {}
    for cid, hi, vi, tq in comps:
        c = coeff[cid]
        nby, nbx, _ = c.shape
        nat = np.zeros((nby, nbx, 64), dtype=np.float64)
        nat[..., ZIGZAG] = c
        nat *= quant[tq].reshape(64)[np.newaxis, np.newaxis, :]
        blocks = nat.reshape(nby, nbx, 8, 8)
        spatial = np.einsum("xu,ijuv,yv->ijxy", _DCT.T, blocks, _DCT.T) + 128.0
        plane = spatial.transpose(0, 2, 1, 3).reshape(nby * 8, nbx * 8)
        planes[cid] = np.clip(np.round(plane), 0, 255).astype(np.uint8)
    return planes


# --------------------------------------------------------------------------
# Progressive (SOF2) scans — T.81 Annex G.1.2 (spectral selection +
# successive approximation), the semantics libjpeg's jdphuff implements.
# Coefficients accumulate across scans in a persistent store; the final
# dequant + IDCT runs once at EOI through the same _reconstruct.
# --------------------------------------------------------------------------


def _comp_block_dims(frame, cid) -> tuple[int, int]:
    """TRUE block dimensions of one component (non-interleaved scans
    cover exactly these, not the MCU-padded grid)."""
    fh, fw, comps = frame
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    for c, hi, vi, _tq in comps:
        if c == cid:
            cw = -(-fw * hi // hmax)
            ch = -(-fh * vi // vmax)
            return -(-ch // 8), -(-cw // 8)
    raise ValueError(f"unknown JPEG component {cid}")


def _ac_first(reader, zz, ss, se, al, ac_tab, state) -> None:
    """First AC scan of a band (Ah=0): runs/EOBRUN, values << Al."""
    if state["eobrun"] > 0:
        state["eobrun"] -= 1
        return
    k = ss
    while k <= se:
        rs = _huff_decode(reader, ac_tab)
        r, s = rs >> 4, rs & 0x0F
        if s == 0:
            if r != 15:
                state["eobrun"] = (1 << r) - 1
                if r:
                    state["eobrun"] += reader.read_bits(r)
                return
            k += 16  # ZRL
            continue
        k += r
        if k > se:
            raise ValueError("JPEG AC run past band end")
        zz[k] = _extend(reader.read_bits(s), s) << al
        k += 1


def _ac_refine(reader, zz, ss, se, al, ac_tab, state) -> None:
    """AC refinement scan (Ah = Al + 1): correction bits for history
    coefficients, new ±1<<Al insertions, EOBRUN covering the tail."""
    p1 = 1 << al
    m1 = -1 << al
    k = ss
    if state["eobrun"] == 0:
        while k <= se:
            rs = _huff_decode(reader, ac_tab)
            r, s = rs >> 4, rs & 0x0F
            val = 0
            if s == 0:
                if r != 15:
                    state["eobrun"] = 1 << r
                    if r:
                        state["eobrun"] += reader.read_bits(r)
                    break
                # r == 15: skip 16 zero-history coefficients
            else:
                if s != 1:
                    raise ValueError("bad JPEG refinement magnitude")
                val = p1 if reader.read_bit() else m1
            while k <= se:
                c = int(zz[k])
                if c != 0:
                    if reader.read_bit():
                        if (c & p1) == 0:
                            zz[k] = c + (p1 if c >= 0 else m1)
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if val and k <= se:
                zz[k] = val
            k += 1
    if state["eobrun"] > 0:
        while k <= se:
            c = int(zz[k])
            if c != 0:
                if reader.read_bit():
                    if (c & p1) == 0:
                        zz[k] = c + (p1 if c >= 0 else m1)
            k += 1
        state["eobrun"] -= 1


def _progressive_scan(
    frame, huff, scan_comps, ss, se, ah, al, segments, restart_interval,
    coeff,
) -> None:
    """Apply one progressive scan to the persistent coefficient store.
    ``scan_comps``: [(cid, tdc, tac)] in scan order; ns > 1 ⇒ MCU
    interleaved (DC scans only, per T.81), ns == 1 ⇒ raster over the
    component's true blocks."""
    fh, fw, comps = frame
    samp = {c: (hi, vi) for c, hi, vi, _tq in comps}
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = -(-fw // (8 * hmax))
    mcuy = -(-fh // (8 * vmax))
    seg_idx = 0
    reader = _BitReader(segments[0])
    state = {"eobrun": 0}
    preds = {cid: 0 for cid, _tdc, _tac in scan_comps}

    def _restart():
        nonlocal reader, seg_idx
        seg_idx += 1
        if seg_idx >= len(segments):
            raise ValueError("JPEG missing restart segment")
        reader = _BitReader(segments[seg_idx])
        state["eobrun"] = 0
        for c in preds:
            preds[c] = 0

    if ss == 0:  # DC scan
        if se != 0:
            raise ValueError("progressive DC scan must have Se = 0")
        if len(scan_comps) > 1:
            n_units = mcux * mcuy
            for m in range(n_units):
                if restart_interval and m and m % restart_interval == 0:
                    _restart()
                my, mx = divmod(m, mcux)
                for cid, tdc, _tac in scan_comps:
                    hi, vi = samp[cid]
                    for by in range(vi):
                        for bx in range(hi):
                            zz = coeff[cid][my * vi + by, mx * hi + bx]
                            if ah == 0:
                                s = _huff_decode(reader, huff[(0, tdc)])
                                diff = _extend(reader.read_bits(s), s)
                                preds[cid] += diff
                                zz[0] = preds[cid] << al
                            else:
                                zz[0] = int(zz[0]) | (
                                    reader.read_bit() << al
                                )
        else:
            cid, tdc, _tac = scan_comps[0]
            bh, bw = _comp_block_dims(frame, cid)
            for b in range(bh * bw):
                if restart_interval and b and b % restart_interval == 0:
                    _restart()
                by, bx = divmod(b, bw)
                zz = coeff[cid][by, bx]
                if ah == 0:
                    s = _huff_decode(reader, huff[(0, tdc)])
                    diff = _extend(reader.read_bits(s), s)
                    preds[cid] += diff
                    zz[0] = preds[cid] << al
                else:
                    zz[0] = int(zz[0]) | (reader.read_bit() << al)
        return
    # AC scan: single component, non-interleaved (T.81 G.1.1.1)
    if len(scan_comps) != 1:
        raise ValueError("progressive AC scan must be non-interleaved")
    cid, _tdc, tac = scan_comps[0]
    ac_tab = huff[(1, tac)]
    bh, bw = _comp_block_dims(frame, cid)
    for b in range(bh * bw):
        if restart_interval and b and b % restart_interval == 0:
            _restart()
        by, bx = divmod(b, bw)
        zz = coeff[cid][by, bx]
        if ah == 0:
            _ac_first(reader, zz, ss, se, al, ac_tab, state)
        else:
            _ac_refine(reader, zz, ss, se, al, ac_tab, state)


def _compose_rgb(frame, planes) -> np.ndarray:
    fh, fw, comps = frame
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    if len(comps) == 1:
        cid = comps[0][0]
        g = planes[cid][:fh, :fw]
        return np.ascontiguousarray(np.repeat(g[:, :, np.newaxis], 3, axis=2))
    ups = []
    for cid, hi, vi, _tq in comps:
        p = planes[cid]
        if hi != hmax or vi != vmax:
            p = np.repeat(np.repeat(p, vmax // vi, axis=0), hmax // hi, axis=1)
        ups.append(p[:fh, :fw].astype(np.float64))
    y, cb, cr = ups[0], ups[1], ups[2]
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    rgb = np.stack([r, g, b], axis=2)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)
