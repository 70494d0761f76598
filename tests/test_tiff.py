"""Baseline TIFF codec (datapipe/tiff) — round-trips over every
writer-reachable combination, hand-built IFDs for the decode paths the
writer cannot emit (bilevel, sub-byte gray, palette, 16-bit, planar,
FillOrder 2, all 8 orientations), loud-failure strictness, the libtiff
ctypes conformance oracle (round-trips cannot catch self-consistent
spec deviations — the VP8L lesson), and the distributed planted-asset
shape the tiff_decode_gate oracle checks."""

import struct

import numpy as np
import pytest

from ihop_reddit_spark.datapipe import tiff_native
from ihop_reddit_spark.datapipe.tiff import (
    decode_tiff,
    lzw_decode,
    lzw_encode,
    packbits_decode,
    packbits_encode,
    parse_tiff,
    tiff_bytes,
)

HAVE_LIBTIFF = tiff_native.libtiff_available()


# ---------------------------------------------------------------------------
# Compression primitives
# ---------------------------------------------------------------------------

@pytest.mark.slow
def test_lzw_round_trip_fuzz_width_growth_and_clears():
    rng = np.random.default_rng(11)
    for n in (0, 1, 2, 255, 4093, 20000, 200000):
        data = rng.integers(0, 256, n, dtype=np.uint8).tobytes()
        assert lzw_decode(lzw_encode(data), n) == data
    # highly compressible: exercises long omega chains + KwKwK codes
    runs = (b"ab" * 64 + b"\x00" * 1009 + bytes(range(256))) * 300
    assert lzw_decode(lzw_encode(runs), len(runs)) == runs


def test_lzw_decoder_is_strict():
    with pytest.raises(ValueError, match="begin with ClearCode"):
        # code 0 (9 bits) first instead of Clear
        lzw_decode(b"\x00\x00\x00", 1)
    with pytest.raises(ValueError, match="truncated"):
        lzw_decode(lzw_encode(b"abcabcabc")[:-2], 9)
    # declared size smaller than the stream decodes → overrun is loud
    # (expected=2 lands mid-entry; the 'aa' entry pushes output to 3)
    with pytest.raises(ValueError, match="overruns"):
        lzw_decode(lzw_encode(b"aaaaaaaa"), 2)


def test_packbits_round_trip_and_strictness():
    rng = np.random.default_rng(13)
    for row in (b"", b"x", b"xxx", b"abc", b"aabbbbbbcdeee" + bytes(300),
                rng.integers(0, 256, 513, dtype=np.uint8).tobytes()):
        assert packbits_decode(packbits_encode(row), len(row)) == row
    with pytest.raises(ValueError, match="truncated"):
        packbits_decode(b"\x05ab", 6)  # literal header promises 6 bytes
    with pytest.raises(ValueError, match="overruns"):
        packbits_decode(packbits_encode(b"aaaaaa"), 4)


# ---------------------------------------------------------------------------
# Writer round-trips (and the libtiff conformance sweep on the same grid)
# ---------------------------------------------------------------------------

_GRID = [
    (comp, bo, shape, rps, pred)
    for comp in ("none", "packbits", "lzw", "deflate")
    for bo in ("II", "MM")
    for shape in ((5, 7), (11, 13, 3))
    for rps in (None, 3)
    for pred in ((1, 2) if comp in ("lzw", "deflate") else (1,))
]


@pytest.mark.parametrize("comp,bo,shape,rps,pred", _GRID)
def test_writer_round_trips(comp, bo, shape, rps, pred):
    rng = np.random.default_rng(hash((comp, bo, shape, rps, pred)) % 2**32)
    px = rng.integers(0, 256, shape, dtype=np.uint8)
    buf = tiff_bytes(px, compression=comp, byte_order=bo,
                     predictor=pred, rows_per_strip=rps)
    want = px if px.ndim == 3 else np.repeat(px[:, :, None], 3, axis=2)
    got = decode_tiff(buf)
    assert got.shape == want.shape and (got == want).all()
    if HAVE_LIBTIFF:
        nat = tiff_native.decode_rgb(buf)
        assert (nat == want).all(), "libtiff disagrees with in-tree decode"


def test_writer_is_deterministic_and_validates_input():
    px = np.arange(48, dtype=np.uint8).reshape(4, 4, 3)
    assert tiff_bytes(px, "lzw") == tiff_bytes(px, "lzw")
    with pytest.raises(ValueError, match="gray or"):
        tiff_bytes(np.zeros((2, 2, 4), dtype=np.uint8))
    with pytest.raises(ValueError, match="empty"):
        tiff_bytes(np.zeros((0, 4), dtype=np.uint8))
    with pytest.raises(ValueError, match="predictor 2 pairs"):
        tiff_bytes(px, compression="none", predictor=2)
    with pytest.raises(ValueError, match="byte_order"):
        tiff_bytes(px, byte_order="XX")


def test_lzw_width_growth_pinned_by_libtiff():
    """64×64 random RGB pushes the LZW table past 512 and 1024 entries —
    the early-change off-by-one regime. libtiff must agree bit-exactly."""
    if not HAVE_LIBTIFF:
        pytest.skip("libtiff not installed")
    rng = np.random.default_rng(17)
    px = rng.integers(0, 256, (64, 64, 3), dtype=np.uint8)
    buf = tiff_bytes(px, compression="lzw")
    assert (tiff_native.decode_rgb(buf) == px).all()
    # and past 4094 → in-stream ClearCode reset
    big = np.repeat(np.repeat(rng.integers(0, 256, (64, 64, 3), dtype=np.uint8), 3, 0), 3, 1)
    buf = tiff_bytes(big, compression="lzw")
    assert (decode_tiff(buf) == big).all()
    assert (tiff_native.decode_rgb(buf) == big).all()


# ---------------------------------------------------------------------------
# Hand-built IFDs — decode paths the writer does not emit
# ---------------------------------------------------------------------------

def _build_tiff(en, entries, pixel_blobs):
    """Assemble header + pixel data + overflow values + IFD. ``entries``
    are (tag, typ, vals) with vals already final EXCEPT StripOffsets,
    which callers pass as indices into ``pixel_blobs`` via tag -273."""
    fmt = {3: "H", 4: "I"}
    off = 8
    blob_offsets = []
    for b in pixel_blobs:
        blob_offsets.append(off)
        off += len(b)
    resolved = []
    for tag, typ, vals in entries:
        if tag == -273:
            tag, vals = 273, [blob_offsets[i] for i in vals]
        resolved.append((tag, typ, list(vals)))
    resolved.sort(key=lambda t: t[0])
    overflow_off = off
    slots = []
    for tag, typ, vals in resolved:
        raw = struct.pack(f"{en}{len(vals)}{fmt[typ]}", *vals)
        if len(raw) > 4:
            slots.append(overflow_off)
            overflow_off += len(raw)
        else:
            slots.append(None)
    ifd_off = overflow_off
    out = bytearray()
    out += (b"II" if en == "<" else b"MM") + struct.pack(f"{en}HI", 42, ifd_off)
    for b in pixel_blobs:
        out += b
    for tag, typ, vals in resolved:
        raw = struct.pack(f"{en}{len(vals)}{fmt[typ]}", *vals)
        if len(raw) > 4:
            out += raw
    assert len(out) == ifd_off
    out += struct.pack(f"{en}H", len(resolved))
    for (tag, typ, vals), slot in zip(resolved, slots):
        out += struct.pack(f"{en}HHI", tag, typ, len(vals))
        if slot is None:
            out += struct.pack(f"{en}{len(vals)}{fmt[typ]}", *vals).ljust(4, b"\x00")
        else:
            out += struct.pack(f"{en}I", slot)
    out += struct.pack(f"{en}I", 0)
    return bytes(out)


def _base_entries(w, h, bits, photo, spp=1, n_strips=1, counts=None):
    return [
        (256, 4, [w]), (257, 4, [h]), (258, 3, [bits] * spp),
        (259, 3, [1]), (262, 3, [photo]), (277, 3, [spp]),
        (278, 4, [-(-h // n_strips)]),
        (279, 4, counts or []),
        (-273, 4, list(range(n_strips))),
    ]


def test_bilevel_both_photometrics_and_row_padding():
    # 10×3 so rows pad to 2 bytes; checkerboard-ish pattern
    bits_rows = [[1, 0, 1, 0, 1, 0, 1, 0, 1, 1],
                 [0] * 10,
                 [1] * 10]
    packed = bytearray()
    for r in bits_rows:
        row = np.packbits(np.array(r, dtype=np.uint8)).tobytes()
        packed += row
    for photo in (0, 1):
        entries = _base_entries(10, 3, 1, photo, counts=[len(packed)])
        buf = _build_tiff("<", entries, [bytes(packed)])
        got = decode_tiff(buf)
        v = np.array(bits_rows) * 255
        if photo == 0:  # WhiteIsZero: 0 → white
            v = 255 - v
        assert (got == v[:, :, None]).all()
        if HAVE_LIBTIFF:
            assert (tiff_native.decode_rgb(buf) == got).all()


def test_four_bit_grayscale_scales_exactly():
    # 5 wide → 3 bytes/row with a padded nibble
    rows = [[0, 15, 8, 3, 12], [1, 2, 4, 7, 11]]
    packed = bytearray()
    for r in rows:
        b = bytearray()
        for i in range(0, len(r), 2):
            hi = r[i] << 4
            lo = r[i + 1] if i + 1 < len(r) else 0
            b.append(hi | lo)
        packed += b
    entries = _base_entries(5, 2, 4, 1, counts=[len(packed)])
    buf = _build_tiff("<", entries, [bytes(packed)])
    got = decode_tiff(buf)
    want = (np.array(rows) * (255 // 15)).astype(np.uint8)
    assert (got == want[:, :, None]).all()
    if HAVE_LIBTIFF:
        assert (tiff_native.decode_rgb(buf) == got).all()


def test_fillorder2_reverses_bits_within_bytes():
    rows = [[1, 0, 1, 1, 0, 0, 1, 0]]
    msb = np.packbits(np.array(rows[0], dtype=np.uint8)).tobytes()
    lsb = np.packbits(
        np.array(rows[0], dtype=np.uint8), bitorder="little"
    ).tobytes()
    entries = _base_entries(8, 1, 1, 1, counts=[1]) + [(266, 3, [2])]
    buf = _build_tiff("<", entries, [lsb])
    got = decode_tiff(buf)
    want = np.array(rows) * 255
    assert (got == want[:, :, None]).all()
    # same bytes WITHOUT FillOrder 2 must decode differently (proves the
    # tag is honored, not ignored)
    entries1 = _base_entries(8, 1, 1, 1, counts=[1])
    assert not (decode_tiff(_build_tiff("<", entries1, [lsb])) == got).all()
    assert (decode_tiff(_build_tiff("<", entries1, [msb])) == got).all()


def test_palette_colormap_high_byte():
    idx = np.array([[0, 1], [2, 3]], dtype=np.uint8)
    # ColorMap: 3 planes of 256 SHORTs; planted v*257 (the common scale)
    reds = [10, 20, 30, 40] + [0] * 252
    greens = [50, 60, 70, 80] + [0] * 252
    blues = [90, 100, 110, 120] + [0] * 252
    cmap = [(v * 257) for v in reds + greens + blues]
    entries = _base_entries(2, 2, 8, 3, counts=[4]) + [(320, 3, cmap)]
    buf = _build_tiff("<", entries, [idx.tobytes()])
    got = decode_tiff(buf)
    want = np.array(
        [[[10, 50, 90], [20, 60, 100]], [[30, 70, 110], [40, 80, 120]]],
        dtype=np.uint8,
    )
    assert (got == want).all()
    if HAVE_LIBTIFF:
        assert (tiff_native.decode_rgb(buf) == want).all()


def test_sixteen_bit_high_byte_both_orders():
    vals = np.array([[0x1234, 0xFF00], [0x0080, 0xABCD]], dtype=np.uint16)
    for en, dt in (("<", "<u2"), (">", ">u2")):
        entries = _base_entries(2, 2, 16, 1, counts=[8])
        buf = _build_tiff(en, entries, [vals.astype(dt).tobytes()])
        got = decode_tiff(buf)
        want = (vals >> 8).astype(np.uint8)
        assert (got == want[:, :, None]).all()


def test_planar_rgb_reassembles_channels():
    r = np.array([[1, 2], [3, 4]], dtype=np.uint8)
    g = r + 100
    b = r + 200
    entries = [
        (256, 4, [2]), (257, 4, [2]), (258, 3, [8, 8, 8]),
        (259, 3, [1]), (262, 3, [2]), (277, 3, [3]), (278, 4, [2]),
        (279, 4, [4, 4, 4]), (-273, 4, [0, 1, 2]), (284, 3, [2]),
    ]
    buf = _build_tiff("<", entries, [r.tobytes(), g.tobytes(), b.tobytes()])
    got = decode_tiff(buf)
    want = np.stack([r, g, b], axis=2)
    assert (got == want).all()
    if HAVE_LIBTIFF:
        assert (tiff_native.decode_rgb(buf) == want).all()


def test_rgba_extra_samples_stripped():
    px = np.arange(2 * 2 * 4, dtype=np.uint8).reshape(2, 2, 4)
    entries = [
        (256, 4, [2]), (257, 4, [2]), (258, 3, [8] * 4), (259, 3, [1]),
        (262, 3, [2]), (277, 3, [4]), (278, 4, [2]), (279, 4, [16]),
        (-273, 4, [0]), (338, 3, [2]),
    ]
    buf = _build_tiff("<", entries, [px.tobytes()])
    assert (decode_tiff(buf) == px[:, :, :3]).all()


def test_all_eight_orientations_pinned_and_libtiff_on_1_to_4():
    """Stored 2×3 gray [[0,1,2],[3,4,5]]; displays derived by hand from
    the TIFF 6.0 orientation definitions (e.g. 6: '0th row is the
    visual right-hand side, 0th column is the visual top' →
    display[i][j] = stored[h−1−j][i]). libtiff conformance covers 1–4
    only — its RGBA reader is documented to treat 5–8 as their
    horizontal counterparts without transposing."""
    g = np.arange(6, dtype=np.uint8).reshape(2, 3)
    stored = np.repeat(g[:, :, None], 3, axis=2)
    displays = {
        1: g,
        2: g[:, ::-1],
        3: g[::-1, ::-1],
        4: g[::-1],
        5: np.array([[0, 3], [1, 4], [2, 5]]),
        6: np.array([[3, 0], [4, 1], [5, 2]]),
        7: np.array([[5, 2], [4, 1], [3, 0]]),
        8: np.array([[2, 5], [1, 4], [0, 3]]),
    }
    for orient, disp in displays.items():
        entries = _base_entries(3, 2, 8, 2, spp=3, counts=[18])
        entries += [(274, 3, [orient])]
        buf = _build_tiff("<", entries, [stored.tobytes()])
        got = decode_tiff(buf)
        assert (got == np.repeat(disp[:, :, None], 3, axis=2)).all(), orient
        if HAVE_LIBTIFF and orient <= 4:
            assert (tiff_native.decode_rgb(buf) == got).all(), orient


def test_multipage_decodes_first_ifd_only():
    px = np.full((2, 2, 3), 9, dtype=np.uint8)
    buf = bytearray(tiff_bytes(px))
    # graft a second IFD pointer loop: point next-IFD at the first IFD
    # (decoder must not follow it)
    (ifd_off,) = struct.unpack_from("<I", buf, 4)
    (n,) = struct.unpack_from("<H", buf, ifd_off)
    next_ptr = ifd_off + 2 + 12 * n
    struct.pack_into("<I", buf, next_ptr, ifd_off)
    assert (decode_tiff(bytes(buf)) == px).all()


# ---------------------------------------------------------------------------
# Strictness + deployment boundary
# ---------------------------------------------------------------------------

def test_structural_damage_is_loud():
    px = np.zeros((3, 3, 3), dtype=np.uint8)
    good = tiff_bytes(px)
    with pytest.raises(ValueError, match="byte-order"):
        parse_tiff(b"XX" + good[2:])
    with pytest.raises(ValueError, match="magic"):
        parse_tiff(good[:2] + b"\x29\x00" + good[4:])
    with pytest.raises(ValueError, match="shorter than"):
        parse_tiff(good[:6])
    with pytest.raises(ValueError, match="IFD"):
        parse_tiff(good[:2] + good[2:4] + struct.pack("<I", len(good) + 9))
    # strip beyond file end
    with pytest.raises(ValueError, match="beyond file"):
        decode_tiff(good[:-4], _native_fallback=False)


def test_bigtiff_and_nonbaseline_raise_marked_stub_without_fallback():
    with pytest.raises(NotImplementedError, match="BigTIFF"):
        parse_tiff(b"II+\x00" + b"\x00" * 12)
    # CCITT G4 compression code 4
    entries = _base_entries(8, 1, 1, 1, counts=[1])
    entries[3] = (259, 3, [4])
    buf = _build_tiff("<", entries, [b"\x00"])
    with pytest.raises(NotImplementedError, match="libtiff"):
        decode_tiff(buf, _native_fallback=False)
    # YCbCr photometric
    entries = _base_entries(2, 1, 8, 6, spp=3, counts=[6])
    buf = _build_tiff("<", entries, [b"\x00" * 6])
    with pytest.raises(NotImplementedError, match="libtiff"):
        decode_tiff(buf, _native_fallback=False)


def test_tiled_tiff_routes_to_libtiff_fallback():
    """A tiled uncompressed TIFF: in-tree raises the marked stub;
    decode_tiff's capability-gated fallback hands it to libtiff."""
    px = np.arange(16 * 16 * 3, dtype=np.uint8).reshape(16, 16, 3)
    entries = [
        (256, 4, [16]), (257, 4, [16]), (258, 3, [8, 8, 8]), (259, 3, [1]),
        (262, 3, [2]), (277, 3, [3]),
        (322, 4, [16]), (323, 4, [16]),  # TileWidth/TileLength
        (324, 4, [8]),  # TileOffsets: pixel blob sits right after header
        (325, 4, [16 * 16 * 3]),
    ]
    # _build_tiff resolves -273; tiles use explicit offset 8 instead
    buf = _build_tiff("<", entries, [px.tobytes()])
    with pytest.raises(NotImplementedError, match="tiled"):
        decode_tiff(buf, _native_fallback=False)
    if HAVE_LIBTIFF:
        assert (decode_tiff(buf) == px).all()


def test_strip_count_and_bytecount_mismatches_are_loud():
    px = np.zeros((4, 4), dtype=np.uint8)
    entries = _base_entries(4, 4, 8, 1, counts=[16, 16])  # counts≠offsets
    buf = _build_tiff("<", entries, [px.tobytes()])
    with pytest.raises(ValueError, match="length mismatch"):
        decode_tiff(buf, _native_fallback=False)
    entries = _base_entries(4, 5, 8, 1, counts=[16])  # height over data
    buf = _build_tiff("<", entries, [px.tobytes()])
    with pytest.raises(ValueError, match="shorter than expected"):
        decode_tiff(buf, _native_fallback=False)


# ---------------------------------------------------------------------------
# Distributed shape (the gate's contract)
# ---------------------------------------------------------------------------

def test_tiff_assets_distributed_planted_colors(spark):
    from ihop_reddit_spark.datapipe.multimodal import (
        decode_image,
        image_feature_stats,
        synthesize_tiff_assets,
    )

    ids = spark.range(0, 24).withColumnRenamed("id", "doc_id")
    assets = synthesize_tiff_assets(ids)
    rows = {r["asset_id"]: r for r in image_feature_stats(assets).collect()}
    assert len(rows) == 24
    for i, r in rows.items():
        assert r["width"] == 16 and r["height"] == 8 + i % 4
        assert r["mean_r"] == (61 * i) % 256
        assert r["mean_g"] == (97 * i) % 256
        assert r["mean_b"] == (113 * i) % 256
    # the compression/byte-order cycling is real: parse the payloads
    comps, orders = set(), set()
    for row in assets.collect():
        _, _, tags = parse_tiff(bytes(row["payload"]))
        comps.add(tags[259][0])
        orders.add(bytes(row["payload"])[:2])
        assert (decode_image(row["payload"])[0, 0] ==
                [(61 * row["asset_id"]) % 256,
                 (97 * row["asset_id"]) % 256,
                 (113 * row["asset_id"]) % 256]).all()
    assert comps == {1, 5, 8, 32773}
    assert orders == {b"II", b"MM"}


# ---------------------------------------------------------------------------
# EXIF orientation (r10) — the TIFF IFD walker applied to JPEG APP1
# ---------------------------------------------------------------------------

def _with_exif(jpeg: bytes, tiff_blob: bytes) -> bytes:
    app1 = b"Exif\x00\x00" + tiff_blob
    return (jpeg[:2] + b"\xff\xe1" + struct.pack(">H", len(app1) + 2)
            + app1 + jpeg[2:])


def test_exif_orientation_helper_parses_and_tolerates_damage():
    from ihop_reddit_spark.datapipe.tiff import exif_orientation

    for en in ("<", ">"):
        blob = _build_tiff(en, [(274, 3, [6])], [])
        assert exif_orientation(blob) == 6
    # absent tag / out-of-spec value / garbage → advisory default 1
    assert exif_orientation(_build_tiff("<", [(256, 4, [4])], [])) == 1
    assert exif_orientation(_build_tiff("<", [(274, 3, [9])], [])) == 1
    assert exif_orientation(b"garbage") == 1
    assert exif_orientation(b"II\x2a\x00\xff\xff\xff\xff") == 1


def test_jpeg_applies_exif_orientation_exactly():
    from ihop_reddit_spark.datapipe.jpeg_codec import QUANT_DC8, jpeg_bytes
    from ihop_reddit_spark.datapipe.multimodal import decode_image
    from ihop_reddit_spark.datapipe.tiff import apply_orientation

    # two solid 8×8 blocks (64 | 192) — lossless under the DC-step-8
    # table, so orientation moves exact pixels, not approximations
    stored = np.repeat(
        np.repeat(np.array([[64, 192]], dtype=np.uint8), 8, 0), 8, 1
    )
    plain = jpeg_bytes(stored, quant_luma=QUANT_DC8)
    upright = decode_image(plain)
    assert upright.shape == (8, 16, 3)
    for orient in range(1, 9):
        tagged = _with_exif(plain, _build_tiff("<", [(274, 3, [orient])], []))
        got = decode_image(tagged)
        assert (got == apply_orientation(upright, orient)).all(), orient
    # pin orientation 6 absolutely (display[i][j] = stored[h−1−j][i]):
    # display row i follows stored COLUMN i, so the 64-half (stored
    # cols 0–7) becomes the top 8 display rows
    got6 = decode_image(_with_exif(plain, _build_tiff("<", [(274, 3, [6])], [])))
    assert got6.shape == (16, 8, 3)
    assert (got6[:8] == 64).all() and (got6[8:] == 192).all()
    # a broken EXIF block must not fail the intact image
    got_b = decode_image(_with_exif(plain, b"II\x2a\x00\x99\x99\x99\x99"))
    assert (got_b == upright).all()
