"""Dependency-free FLAC codec — the speech-corpus format (LibriSpeech,
Common Voice exports) the audio tier lacked; wav/G.711 covered the
telephony grain, this adds the archival one.

The in-tree decoder implements the real FLAC bitstream, stdlib + numpy
only: the ``fLaC`` marker and metadata-block walk (STREAMINFO parsed,
padding/comments/seektables skipped by length), frame sync with CRC-8
header and CRC-16 frame checks, the UTF-8-style coded frame/sample
number, all block-size/sample-rate/sample-size header codes, subframe
types CONSTANT / VERBATIM / FIXED (orders 0–4) / LPC (orders 1–32,
quantized-coefficient recurrence), Rice-coded residuals (both 4- and
5-bit parameter methods, partition orders, raw-bit escape partitions),
wasted-bits shifts, and all four channel assignments (independent,
left/side, right/side, mid/side). After a full-stream decode the
samples' MD5 is verified against STREAMINFO — a whole-pipeline
integrity check the format itself supplies.

The writer emits genuine rice-coded streams (CONSTANT for flat blocks,
best-of FIXED orders 0–2 otherwise, VERBATIM and explicit-coefficient
LPC on request; independent or lossless-decorrelated stereo), so
round-trips exercise the same entropy coder real encoders use. What
the writer cannot emit (escape partitions, deep partition orders) is
pinned by hand-built streams in the pytest tier — the same discipline
as VP8L/TIFF. No system libFLAC exists in this container, so unlike
TIFF/WebP there is no native conformance twin; the MD5 self-check and
hand-built streams carry that weight (documented boundary).

Scale shape: row-local Python invoked only inside Arrow-batched
``mapInPandas`` stages (see ``datapipe/multimodal.py``); zero shuffle,
zero driver hops.

The reference engine has no media path at all (extension-completeness
tier, per COVERAGE.md north-star section — not reference parity).
"""

from __future__ import annotations

import hashlib
import struct

__all__ = ["flac_bytes", "parse_flac", "decode_flac"]

_RATE_CODES = {
    1: 88200, 2: 176400, 3: 192000, 4: 8000, 5: 16000, 6: 22050,
    7: 24000, 8: 32000, 9: 44100, 10: 48000, 11: 96000,
}
_SIZE_CODES = {1: 8, 2: 12, 4: 16, 5: 20, 6: 24, 7: 32}


def _crc8(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b
        for _ in range(8):
            crc = ((crc << 1) ^ 0x07) & 0xFF if crc & 0x80 else (crc << 1) & 0xFF
    return crc


def _crc16(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b << 8
        for _ in range(8):
            crc = ((crc << 1) ^ 0x8005) & 0xFFFF if crc & 0x8000 \
                else (crc << 1) & 0xFFFF
    return crc


class _BitReader:
    """MSB-first reader over bytes; loud on exhaustion."""

    def __init__(self, data: bytes, pos_bits: int = 0):
        self.data = data
        self.pos = pos_bits

    def read(self, n: int) -> int:
        end = self.pos + n
        if end > len(self.data) * 8:
            raise ValueError("FLAC bitstream truncated")
        v = 0
        pos = self.pos
        while n > 0:
            byte = self.data[pos >> 3]
            avail = 8 - (pos & 7)
            take = min(avail, n)
            v = (v << take) | ((byte >> (avail - take)) & ((1 << take) - 1))
            pos += take
            n -= take
        self.pos = pos
        return v

    def read_signed(self, n: int) -> int:
        v = self.read(n)
        return v - (1 << n) if v >= (1 << (n - 1)) else v

    def read_unary(self) -> int:
        # n zero bits terminated by a one bit
        data, pos = self.data, self.pos
        total = len(data) * 8
        start = pos
        while True:
            if pos >= total:
                raise ValueError("FLAC bitstream truncated in unary code")
            byte = data[pos >> 3]
            rem = 8 - (pos & 7)
            window = byte & ((1 << rem) - 1)
            if window == 0:
                pos += rem
                continue
            pos += rem - window.bit_length()
            self.pos = pos + 1
            return pos - start

    def align(self):
        self.pos = (self.pos + 7) & ~7


class _BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.nacc = 0

    def write(self, v: int, n: int):
        self.acc = (self.acc << n) | (v & ((1 << n) - 1))
        self.nacc += n
        while self.nacc >= 8:
            self.nacc -= 8
            self.buf.append((self.acc >> self.nacc) & 0xFF)
        self.acc &= (1 << self.nacc) - 1

    def write_unary(self, q: int):
        while q >= 32:
            self.write(0, 32)
            q -= 32
        self.write(1, q + 1)

    def align(self):
        if self.nacc:
            self.write(0, 8 - self.nacc)

    def bytes(self) -> bytes:
        assert self.nacc == 0
        return bytes(self.buf)


def _utf8_number(w: _BitWriter, v: int):
    """FLAC's UTF-8-style coded number (frame/sample index, ≤ 36 bits)."""
    if v < 0x80:
        w.write(v, 8)
        return
    masks = [(0x7FF, 0xC0, 1), (0xFFFF, 0xE0, 2), (0x1FFFFF, 0xF0, 3),
             (0x3FFFFFF, 0xF8, 4), (0x7FFFFFFF, 0xFC, 5),
             ((1 << 36) - 1, 0xFE, 6)]
    for limit, lead, cont in masks:
        if v <= limit:
            w.write(lead | (v >> (6 * cont)), 8)
            for k in range(cont - 1, -1, -1):
                w.write(0x80 | ((v >> (6 * k)) & 0x3F), 8)
            return
    raise ValueError("FLAC coded number exceeds 36 bits")


def _read_utf8_number(r: _BitReader) -> int:
    b0 = r.read(8)
    if b0 < 0x80:
        return b0
    n = 0
    probe = b0
    while probe & 0x40:
        n += 1
        probe <<= 1
    if n == 0 or n > 6:
        raise ValueError(f"invalid FLAC coded-number lead byte {b0:#x}")
    v = b0 & (0x3F >> n)
    for _ in range(n):
        c = r.read(8)
        if c & 0xC0 != 0x80:
            raise ValueError("invalid FLAC coded-number continuation")
        v = (v << 6) | (c & 0x3F)
    return v


# ---------------------------------------------------------------------------
# Reader
# ---------------------------------------------------------------------------

def parse_flac(payload: bytes):
    """``fLaC`` marker + metadata walk → (streaminfo dict, frame-data
    offset). Loud ValueError diagnostics on structural damage."""
    buf = bytes(payload)
    if buf[:4] != b"fLaC":
        raise ValueError("not a FLAC payload (no fLaC marker)")
    pos = 4
    info = None
    while True:
        if pos + 4 > len(buf):
            raise ValueError("FLAC metadata truncated")
        head = buf[pos]
        last, btype = head >> 7, head & 0x7F
        (ln,) = struct.unpack(">I", b"\x00" + buf[pos + 1 : pos + 4])
        body = buf[pos + 4 : pos + 4 + ln]
        if len(body) != ln:
            raise ValueError("FLAC metadata block truncated")
        if btype == 0:  # STREAMINFO
            if ln != 34:
                raise ValueError(f"FLAC STREAMINFO length {ln} (want 34)")
            r = _BitReader(body)
            info = {
                "min_block": r.read(16), "max_block": r.read(16),
                "min_frame": r.read(24), "max_frame": r.read(24),
                "sample_rate": r.read(20),
                "channels": r.read(3) + 1,
                "bps": r.read(5) + 1,
                "total_samples": r.read(36),
                "md5": body[18:34],
            }
        elif btype == 127:
            raise ValueError("invalid FLAC metadata block type 127")
        pos += 4 + ln
        if last:
            break
    if info is None:
        raise ValueError("FLAC missing STREAMINFO")
    if info["sample_rate"] == 0:
        raise ValueError("FLAC STREAMINFO sample rate 0")
    return info, pos


def _read_residual(r: _BitReader, block_size: int, order: int) -> list[int]:
    method = r.read(2)
    if method > 1:
        raise ValueError(f"reserved FLAC residual method {method}")
    pbits = 4 if method == 0 else 5
    escape = (1 << pbits) - 1
    porder = r.read(4)
    n_part = 1 << porder
    if block_size % n_part:
        raise ValueError("FLAC partition order does not divide block size")
    out: list[int] = []
    for p in range(n_part):
        count = block_size >> porder
        if p == 0:
            count -= order
        if count < 0:
            raise ValueError("FLAC partition smaller than predictor order")
        k = r.read(pbits)
        if k == escape:
            raw = r.read(5)
            if raw == 0:
                out.extend([0] * count)
            else:
                out.extend(r.read_signed(raw) for _ in range(count))
        else:
            for _ in range(count):
                q = r.read_unary()
                u = (q << k) | r.read(k)
                out.append((u >> 1) ^ -(u & 1))
    return out


_FIXED_COEF = {0: [], 1: [1], 2: [2, -1], 3: [3, -3, 1], 4: [4, -6, 4, -1]}


def _read_subframe(r: _BitReader, block_size: int, bps: int) -> list[int]:
    if r.read(1):
        raise ValueError("FLAC subframe padding bit set")
    ftype = r.read(6)
    wasted = 0
    if r.read(1):
        wasted = r.read_unary() + 1
    eff = bps - wasted
    if eff <= 0:
        raise ValueError("FLAC wasted bits exceed sample size")
    if ftype == 0:  # CONSTANT
        v = r.read_signed(eff)
        out = [v] * block_size
    elif ftype == 1:  # VERBATIM
        out = [r.read_signed(eff) for _ in range(block_size)]
    elif 8 <= ftype <= 12:  # FIXED
        order = ftype - 8
        if order > block_size:
            raise ValueError("FLAC fixed order exceeds block size")
        warm = [r.read_signed(eff) for _ in range(order)]
        resid = _read_residual(r, block_size, order)
        coef = _FIXED_COEF[order]
        out = list(warm)
        for e in resid:
            pred = sum(c * out[-1 - j] for j, c in enumerate(coef))
            out.append(e + pred)
    elif ftype >= 32:  # LPC
        order = ftype - 31
        if order > block_size:
            raise ValueError("FLAC LPC order exceeds block size")
        warm = [r.read_signed(eff) for _ in range(order)]
        prec = r.read(4)
        if prec == 15:
            raise ValueError("invalid FLAC LPC precision code 15")
        prec += 1
        shift = r.read_signed(5)
        if shift < 0:
            raise ValueError("negative FLAC LPC shift")
        coef = [r.read_signed(prec) for _ in range(order)]
        resid = _read_residual(r, block_size, order)
        out = list(warm)
        for e in resid:
            pred = sum(c * out[-1 - j] for j, c in enumerate(coef)) >> shift
            out.append(e + pred)
    else:
        raise ValueError(f"reserved FLAC subframe type {ftype}")
    if wasted:
        out = [v << wasted for v in out]
    return out


def decode_flac(payload: bytes, verify_md5: bool = True):
    """Full decode → (sample_rate, bps, samples) with ``samples`` an
    (n, channels) int64 array of raw PCM integers (no float scaling —
    the hash-exact gate surface). When STREAMINFO carries a non-zero
    MD5, the decoded samples' little-endian interleaved digest must
    match — a format-supplied end-to-end integrity check."""
    import numpy as np

    buf = bytes(payload)
    info, pos = parse_flac(buf)
    channels_all: list[list[int]] = [[] for _ in range(info["channels"])]
    total_bits = len(buf) * 8
    r = _BitReader(buf, pos * 8)
    while r.pos < total_bits:
        # tolerate nothing but whole frames: sync must follow immediately
        frame_start = r.pos >> 3
        sync = r.read(14)
        if sync != 0x3FFE:
            raise ValueError(
                f"FLAC frame sync not found at byte {frame_start}"
            )
        if r.read(1):
            raise ValueError("FLAC frame reserved bit set")
        _variable = r.read(1)
        bs_code = r.read(4)
        sr_code = r.read(4)
        ch_code = r.read(4)
        ss_code = r.read(3)
        if r.read(1):
            raise ValueError("FLAC frame header reserved bit set")
        _num = _read_utf8_number(r)
        if bs_code == 0:
            raise ValueError("reserved FLAC block-size code 0")
        elif bs_code == 1:
            block_size = 192
        elif bs_code <= 5:
            block_size = 576 << (bs_code - 2)
        elif bs_code == 6:
            block_size = r.read(8) + 1
        elif bs_code == 7:
            block_size = r.read(16) + 1
        else:
            block_size = 256 << (bs_code - 8)
        if sr_code == 0:
            rate = info["sample_rate"]
        elif sr_code in _RATE_CODES:
            rate = _RATE_CODES[sr_code]
        elif sr_code == 12:
            rate = r.read(8) * 1000
        elif sr_code == 13:
            rate = r.read(16)
        elif sr_code == 14:
            rate = r.read(16) * 10
        else:
            raise ValueError("invalid FLAC sample-rate code 15")
        if rate != info["sample_rate"]:
            raise ValueError("FLAC frame sample rate differs from STREAMINFO")
        if ss_code == 0:
            bps = info["bps"]
        elif ss_code in _SIZE_CODES:
            bps = _SIZE_CODES[ss_code]
        else:
            raise ValueError(f"reserved FLAC sample-size code {ss_code}")
        if bps != info["bps"]:
            raise ValueError("FLAC frame sample size differs from STREAMINFO")
        header_end = (r.pos + 7) >> 3  # header is byte-aligned here
        if r.pos & 7:
            raise ValueError("FLAC frame header not byte-aligned")
        crc8 = r.read(8)
        if _crc8(buf[frame_start:header_end]) != crc8:
            raise ValueError("FLAC frame header CRC-8 mismatch")
        if ch_code < 8:
            n_ch = ch_code + 1
            if n_ch != info["channels"]:
                raise ValueError("FLAC frame channel count differs")
            chans = [
                _read_subframe(r, block_size, bps) for _ in range(n_ch)
            ]
        elif ch_code in (8, 9, 10):
            if info["channels"] != 2:
                raise ValueError("FLAC decorrelated frame in non-stereo stream")
            # the side (difference) channel carries one extra bit
            if ch_code == 8:  # left/side
                left = _read_subframe(r, block_size, bps)
                side = _read_subframe(r, block_size, bps + 1)
                chans = [left, [l - s for l, s in zip(left, side)]]
            elif ch_code == 9:  # right/side
                side = _read_subframe(r, block_size, bps + 1)
                right = _read_subframe(r, block_size, bps)
                chans = [[s + rr for s, rr in zip(side, right)], right]
            else:  # mid/side
                mid = _read_subframe(r, block_size, bps)
                side = _read_subframe(r, block_size, bps + 1)
                left, right = [], []
                for m, s in zip(mid, side):
                    m2 = (m << 1) | (s & 1)
                    left.append((m2 + s) >> 1)
                    right.append((m2 - s) >> 1)
                chans = [left, right]
        else:
            raise ValueError(f"reserved FLAC channel assignment {ch_code}")
        r.align()
        crc16 = r.read(16)
        if _crc16(buf[frame_start : (r.pos >> 3) - 2]) != crc16:
            raise ValueError("FLAC frame CRC-16 mismatch")
        for c, ch in enumerate(chans):
            channels_all[c].extend(ch)
    n = len(channels_all[0])
    if info["total_samples"] and n != info["total_samples"]:
        raise ValueError(
            f"FLAC decoded {n} samples, STREAMINFO promises"
            f" {info['total_samples']}"
        )
    samples = np.array(channels_all, dtype=np.int64).T.copy()
    lo, hi = -(1 << (info["bps"] - 1)), (1 << (info["bps"] - 1)) - 1
    if samples.size and (samples.min() < lo or samples.max() > hi):
        raise ValueError("FLAC decoded samples exceed the declared bps")
    if verify_md5 and info["md5"] != b"\x00" * 16:
        width = (info["bps"] + 7) // 8
        dt = {1: "<i1", 2: "<i2", 3: None, 4: "<i4"}[width]
        if dt is None:  # 24-bit: pack 3 little-endian bytes per sample
            flat = samples.reshape(-1)
            raw = (flat.astype("<i4").view("u1").reshape(-1, 4)[:, :3]).tobytes()
        else:
            raw = samples.reshape(-1).astype(dt).tobytes()
        if hashlib.md5(raw).digest() != info["md5"]:
            raise ValueError("FLAC MD5 signature mismatch on decoded samples")
    return info["sample_rate"], info["bps"], samples


# ---------------------------------------------------------------------------
# Writer
# ---------------------------------------------------------------------------

def _write_rice(w: _BitWriter, resid: list[int], pbits: int):
    """One partition, parameter chosen from the mean zigzag magnitude."""
    zz = [(v << 1) if v >= 0 else ((-v) << 1) - 1 for v in
          (int(x) for x in resid)]
    mean = (sum(zz) // max(1, len(zz))) or 1
    k = min(mean.bit_length() - 1 if mean > 1 else 0, (1 << pbits) - 2)
    w.write(k, pbits)
    for u in zz:
        w.write_unary(u >> k)
        if k:
            w.write(u & ((1 << k) - 1), k)


def _emit_subframe(w: _BitWriter, sig: list[int], bps: int, mode, lpc):
    """mode: 'auto' | 'constant' | 'verbatim' | 'fixed' | 'lpc'."""
    n = len(sig)
    if mode == "auto":
        if all(v == sig[0] for v in sig):
            mode = "constant"
        elif lpc is not None:
            mode = "lpc"
        else:
            mode = "fixed"
    if mode == "constant":
        if any(v != sig[0] for v in sig):
            raise ValueError("constant subframe over non-constant block")
        w.write(0, 1)
        w.write(0, 6)
        w.write(0, 1)
        w.write(sig[0], bps)
        return
    if mode == "verbatim":
        w.write(0, 1)
        w.write(1, 6)
        w.write(0, 1)
        for v in sig:
            w.write(v, bps)
        return
    if mode == "lpc":
        coef, shift = lpc
        order = len(coef)
        if order < 1 or order > 32 or not 0 <= shift <= 15 or n < order:
            raise ValueError("bad FLAC LPC spec")
        prec = max(2, max(abs(c) for c in coef).bit_length() + 1)
        if prec > 15:
            raise ValueError("FLAC LPC coefficients exceed 15-bit precision")
        resid = [
            sig[i] - (sum(c * sig[i - 1 - j] for j, c in enumerate(coef))
                      >> shift)
            for i in range(order, n)
        ]
        w.write(0, 1)
        w.write(31 + order, 6)
        w.write(0, 1)
        for v in sig[:order]:
            w.write(v, bps)
        w.write(prec - 1, 4)
        w.write(shift, 5)
        for c in coef:
            w.write(c, prec)
        w.write(0, 2)  # rice method 0
        w.write(0, 4)  # partition order 0
        _write_rice(w, resid, 4)
        return
    # fixed: pick the order 0-2 with the smallest residual magnitude
    # (the o-th difference of the signal IS the fixed-order-o residual)
    best = None
    for order in range(0, 3):
        if n < order + 1:
            continue
        diffs = list(sig)
        for _ in range(order):
            diffs = [diffs[i] - diffs[i - 1] for i in range(1, len(diffs))]
        cost = sum(abs(v) for v in diffs)
        if best is None or cost < best[0]:
            best = (cost, order, diffs)
    _cost, order, diffs = best
    w.write(0, 1)
    w.write(8 + order, 6)
    w.write(0, 1)
    for v in sig[:order]:
        w.write(v, bps)
    w.write(0, 2)
    w.write(0, 4)
    _write_rice(w, diffs, 4)


def flac_bytes(
    samples,
    sample_rate: int,
    bps: int = 16,
    block_size: int = 1024,
    subframe: str = "auto",
    lpc=None,
    stereo_mode: str = "independent",
) -> bytes:
    """Encode an (n,) mono or (n, 2) stereo int array as a real FLAC
    stream: STREAMINFO (with the samples' MD5), fixed-blocksize frames,
    CONSTANT/FIXED rice-coded subframes (VERBATIM / explicit LPC on
    request), and lossless stereo decorrelation (``stereo_mode`` in
    independent / left_side / right_side / mid_side). Deterministic
    bytes for identical input."""
    import numpy as np

    arr = np.asarray(samples, dtype=np.int64)
    if arr.ndim == 1:
        arr = arr[:, None]
    if arr.ndim != 2 or arr.shape[1] not in (1, 2):
        raise ValueError("flac_bytes wants (n,) mono or (n, 2) stereo")
    n, n_ch = arr.shape
    if n == 0:
        raise ValueError("flac_bytes: empty signal")
    if not 4 <= bps <= 32:
        raise ValueError(f"unsupported bps {bps}")
    lo, hi = -(1 << (bps - 1)), (1 << (bps - 1)) - 1
    if arr.min() < lo or arr.max() > hi:
        raise ValueError("samples exceed the declared bps")
    if not 16 <= block_size <= 65535:
        raise ValueError("block_size out of range")
    if stereo_mode != "independent" and n_ch != 2:
        raise ValueError("stereo decorrelation needs 2 channels")

    width = (bps + 7) // 8
    if width == 3:
        md5 = hashlib.md5(
            arr.reshape(-1).astype("<i4").view("u1").reshape(-1, 4)[:, :3]
            .tobytes()
        ).digest()
    else:
        md5 = hashlib.md5(
            arr.reshape(-1).astype(f"<i{width}").tobytes()
        ).digest()

    head = _BitWriter()
    head.write(block_size, 16)
    head.write(block_size, 16)
    head.write(0, 24)
    head.write(0, 24)
    head.write(sample_rate, 20)
    head.write(n_ch - 1, 3)
    head.write(bps - 1, 5)
    head.write(n, 36)
    streaminfo = head.bytes() + md5
    out = bytearray(b"fLaC")
    out += bytes([0x80]) + struct.pack(">I", 34)[1:] + streaminfo

    ch_code = {"independent": n_ch - 1, "left_side": 8,
               "right_side": 9, "mid_side": 10}[stereo_mode]
    # Frame-header sample-rate encoding: prefer the table code (no extra
    # field), else the 8-bit kHz code, else 16-bit raw, else 16-bit
    # decahertz. A fixed 16-bit raw code would silently truncate rates
    # > 65535 Hz (88.2k/96k/192k are all valid FLAC rates).
    _rate_to_code = {v: k for k, v in _RATE_CODES.items()}
    if sample_rate in _rate_to_code:
        sr_code, sr_field, sr_bits = _rate_to_code[sample_rate], None, 0
    elif sample_rate % 1000 == 0 and sample_rate <= 255000:
        sr_code, sr_field, sr_bits = 12, sample_rate // 1000, 8
    elif sample_rate <= 65535:
        sr_code, sr_field, sr_bits = 13, sample_rate, 16
    elif sample_rate % 10 == 0 and sample_rate <= 655350:
        sr_code, sr_field, sr_bits = 14, sample_rate // 10, 16
    else:
        raise ValueError(
            f"sample_rate {sample_rate} not expressible in a FLAC frame "
            "header (not in the rate table, not a multiple of 1000 <= "
            "255000, > 65535, and not a multiple of 10 <= 655350)")
    for frame_no, start in enumerate(range(0, n, block_size)):
        block = arr[start : start + block_size]
        bs = len(block)
        w = _BitWriter()
        w.write(0x3FFE, 14)
        w.write(0, 1)
        w.write(0, 1)  # fixed-blocksize strategy
        w.write(7, 4)  # explicit 16-bit block size (covers the tail)
        w.write(sr_code, 4)
        w.write(ch_code, 4)
        w.write({8: 1, 12: 2, 16: 4, 20: 5, 24: 6, 32: 7}[bps]
                if bps in (8, 12, 16, 20, 24, 32) else 0, 3)
        w.write(0, 1)
        _utf8_number(w, frame_no)
        w.write(bs - 1, 16)
        if sr_bits:
            w.write(sr_field, sr_bits)
        hdr = w.bytes() if w.nacc == 0 else None
        if hdr is None:
            raise AssertionError("frame header must be byte-aligned")
        w.write(_crc8(hdr), 8)
        cols = [list(map(int, block[:, c])) for c in range(n_ch)]
        if stereo_mode == "independent":
            subs = [(col, bps) for col in cols]
        elif stereo_mode == "left_side":
            subs = [(cols[0], bps),
                    ([l - r for l, r in zip(*cols)], bps + 1)]
        elif stereo_mode == "right_side":
            subs = [([l - r for l, r in zip(*cols)], bps + 1),
                    (cols[1], bps)]
        else:  # mid_side
            subs = [([(l + r) >> 1 for l, r in zip(*cols)], bps),
                    ([l - r for l, r in zip(*cols)], bps + 1)]
        for sig, ebps in subs:
            _emit_subframe(w, sig, ebps, subframe, lpc)
        w.align()
        frame_wo_crc = w.bytes()
        out += frame_wo_crc + struct.pack(">H", _crc16(frame_wo_crc))
    return bytes(out)
