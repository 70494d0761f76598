"""ctypes bindings to the SYSTEM libheif — REAL HEIC decode (HEVC in
the HEIF container: the default iPhone photo format, the most common
still format a web crawl hits after JPEG/PNG/WebP) plus HEIF-AV1, with
encode through the library's x265/aom plugins for in-tree conformance
fixtures. Closes the "HEIC remains the marked PIL stub" boundary named
by ``decode_image`` since r6; H.264/HEVC *video tracks* remain the
documented libav stub (libheif is the still/derived-image path only).

Unlike libavif (version-sensitive struct ABI, see ``avif_native``),
libheif's public C API is OPAQUE-POINTER based — the only struct
crossing the boundary is the tiny, ABI-stable ``heif_error`` returned
by value, so no layout validation dance is needed; the probe checks
symbols and the runtime plugin capability (``heif_have_decoder_for_
format``/``heif_have_encoder_for_format``) instead, because Debian
ships codec plugins separately (libde265 for HEVC decode, x265 for
encode) and a library without the HEVC plugin must report unavailable
rather than fail at first decode.

Lossless shape: x265 lossless + the default 4:2:0 pipeline keeps
GRAY content integer-exact (R=G=B ⇒ chroma-neutral, subsampling is
lossless on constant chroma) — the planted gate asserts exact means,
the same conformance-oracle double duty as the other native bindings.
Color content additionally passes ``chroma="444"`` to bound the
RGB↔YCbCr excursion to fixed-point rounding (±2), asserted by pytest.

Scale shape: row-local C calls inside Arrow-batched ``mapInPandas``
stages, same as every other codec (zero shuffle, zero driver hops).
"""

from __future__ import annotations

import ctypes as C
import ctypes.util
import os
import tempfile


class _Error(C.Structure):
    """``heif_error`` — returned BY VALUE by most libheif calls."""

    _fields_ = [
        ("code", C.c_int),
        ("subcode", C.c_int),
        ("message", C.c_char_p),
    ]


_P = C.c_void_p
_COLORSPACE_RGB = 1
_CHROMA_INTERLEAVED_RGB = 10
_CHANNEL_INTERLEAVED = 10
_COMPRESSION_HEVC = 1

_SIGNATURES = [
    ("heif_context_alloc", _P, []),
    ("heif_context_free", None, [_P]),
    (
        "heif_context_read_from_memory_without_copy",
        _Error,
        [_P, C.c_char_p, C.c_size_t, _P],
    ),
    ("heif_context_get_primary_image_handle", _Error, [_P, C.POINTER(_P)]),
    ("heif_image_handle_get_width", C.c_int, [_P]),
    ("heif_image_handle_get_height", C.c_int, [_P]),
    ("heif_image_handle_release", None, [_P]),
    ("heif_decode_image", _Error, [_P, C.POINTER(_P), C.c_int, C.c_int, _P]),
    (
        "heif_image_get_plane_readonly",
        C.POINTER(C.c_uint8),
        [_P, C.c_int, C.POINTER(C.c_int)],
    ),
    ("heif_image_release", None, [_P]),
    ("heif_have_decoder_for_format", C.c_int, [C.c_int]),
    ("heif_have_encoder_for_format", C.c_int, [C.c_int]),
]

_ENC_SIGNATURES = [
    ("heif_context_get_encoder_for_format", _Error, [_P, C.c_int, C.POINTER(_P)]),
    ("heif_encoder_set_lossless", _Error, [_P, C.c_int]),
    ("heif_encoder_set_lossy_quality", _Error, [_P, C.c_int]),
    (
        "heif_encoder_set_parameter",
        _Error,
        [_P, C.c_char_p, C.c_char_p],
    ),
    ("heif_encoder_release", None, [_P]),
    ("heif_image_create", _Error, [C.c_int, C.c_int, C.c_int, C.c_int, C.POINTER(_P)]),
    ("heif_image_add_plane", _Error, [_P, C.c_int, C.c_int, C.c_int, C.c_int]),
    (
        "heif_image_get_plane",
        C.POINTER(C.c_uint8),
        [_P, C.c_int, C.POINTER(C.c_int)],
    ),
    ("heif_context_encode_image", _Error, [_P, _P, _P, _P, C.POINTER(_P)]),
    ("heif_context_write_to_file", _Error, [_P, C.c_char_p]),
]

_LIB = None
_TRIED = False
_HAS_ENCODER = False


def _lib():
    global _LIB, _TRIED, _HAS_ENCODER
    if _TRIED:
        return _LIB
    _TRIED = True
    for cand in (
        ctypes.util.find_library("heif"),
        "libheif.so.1",
        "libheif.so",
    ):
        if not cand:
            continue
        try:
            lib = C.CDLL(cand)
        except OSError:
            continue
        try:
            for name, res, args in _SIGNATURES:
                fn = getattr(lib, name)
                fn.restype = res
                fn.argtypes = args
        except AttributeError:
            continue
        # the HEVC plugin (libde265) ships separately — a libheif
        # without it must report unavailable, not fail at first decode
        if not lib.heif_have_decoder_for_format(_COMPRESSION_HEVC):
            continue
        enc_ok = True
        try:
            for name, res, args in _ENC_SIGNATURES:
                fn = getattr(lib, name)
                fn.restype = res
                fn.argtypes = args
        except AttributeError:
            enc_ok = False
        _HAS_ENCODER = enc_ok and bool(
            lib.heif_have_encoder_for_format(_COMPRESSION_HEVC)
        )
        _LIB = lib
        break
    return _LIB


def libheif_available() -> bool:
    return _lib() is not None


def libheif_encoder_available() -> bool:
    return _lib() is not None and _HAS_ENCODER


def _check(err: _Error, what: str) -> None:
    if err.code != 0:
        msg = err.message or b""
        raise ValueError(
            f"libheif {what} failed ({err.code}/{err.subcode}):"
            f" {msg.decode('ascii', 'replace')}"
        )


def decode_rgb(payload: bytes):
    """Primary image of a HEIC/HEIF payload as H×W×3 uint8 RGB."""
    import numpy as np

    lib = _lib()
    if lib is None:
        raise NotImplementedError(
            "HEIC decode requires the system libheif (+ libde265),"
            " which is not installed"
        )
    data = bytes(payload)
    ctx = lib.heif_context_alloc()
    handle = _P()
    img = _P()
    try:
        _check(
            lib.heif_context_read_from_memory_without_copy(
                ctx, data, len(data), None
            ),
            "read",
        )
        _check(
            lib.heif_context_get_primary_image_handle(
                ctx, C.byref(handle)
            ),
            "primary_image_handle",
        )
        w = lib.heif_image_handle_get_width(handle)
        h = lib.heif_image_handle_get_height(handle)
        _check(
            lib.heif_decode_image(
                handle,
                C.byref(img),
                _COLORSPACE_RGB,
                _CHROMA_INTERLEAVED_RGB,
                None,
            ),
            "decode",
        )
        stride = C.c_int()
        ptr = lib.heif_image_get_plane_readonly(
            img, _CHANNEL_INTERLEAVED, C.byref(stride)
        )
        if not ptr:
            raise ValueError("libheif returned no interleaved plane")
        st = stride.value
        base = C.addressof(ptr.contents)
        out = np.empty((h, w, 3), dtype=np.uint8)
        for row in range(h):
            out[row] = np.frombuffer(
                C.string_at(base + row * st, w * 3), np.uint8
            ).reshape(w, 3)
        return out
    finally:
        if img:
            lib.heif_image_release(img)
        if handle:
            lib.heif_image_handle_release(handle)
        lib.heif_context_free(ctx)


def get_info(payload: bytes) -> tuple[int, int]:
    """(width, height) of the primary image, no pixel decode."""
    lib = _lib()
    if lib is None:
        raise NotImplementedError("HEIC info requires the system libheif")
    data = bytes(payload)
    ctx = lib.heif_context_alloc()
    handle = _P()
    try:
        _check(
            lib.heif_context_read_from_memory_without_copy(
                ctx, data, len(data), None
            ),
            "read",
        )
        _check(
            lib.heif_context_get_primary_image_handle(
                ctx, C.byref(handle)
            ),
            "primary_image_handle",
        )
        return (
            lib.heif_image_handle_get_width(handle),
            lib.heif_image_handle_get_height(handle),
        )
    finally:
        if handle:
            lib.heif_image_handle_release(handle)
        lib.heif_context_free(ctx)


def encode_rgb(
    px,
    *,
    lossless: bool = True,
    quality: int = 75,
    chroma444: bool = True,
) -> bytes:
    """Encode one H×W×3 uint8 array as HEIC (HEVC through the x265
    plugin). Lossless + gray content roundtrips integer-exactly;
    lossless color stays within YCbCr fixed-point rounding when
    ``chroma444`` (±2, pytest-pinned). The container write goes through
    a temp file — libheif's in-memory writer callback returns a struct
    by value, which ctypes callbacks cannot express; fixture generation
    is not a hot path."""
    import numpy as np

    lib = _lib()
    if lib is None or not _HAS_ENCODER:
        raise NotImplementedError(
            "HEIC encode requires the system libheif built with an HEVC"
            " encoder (x265), which is not installed"
        )
    px = np.ascontiguousarray(px, dtype=np.uint8)
    h, w = px.shape[:2]
    ctx = lib.heif_context_alloc()
    img = _P()
    enc = _P()
    handle = _P()
    try:
        _check(
            lib.heif_image_create(
                w, h, _COLORSPACE_RGB, _CHROMA_INTERLEAVED_RGB, C.byref(img)
            ),
            "image_create",
        )
        _check(
            lib.heif_image_add_plane(img, _CHANNEL_INTERLEAVED, w, h, 8),
            "add_plane",
        )
        stride = C.c_int()
        ptr = lib.heif_image_get_plane(
            img, _CHANNEL_INTERLEAVED, C.byref(stride)
        )
        st = stride.value
        base = C.addressof(ptr.contents)
        rgb = px if px.ndim == 3 else np.repeat(px[..., None], 3, axis=2)
        for row in range(h):
            C.memmove(base + row * st, rgb[row].tobytes(), w * 3)
        _check(
            lib.heif_context_get_encoder_for_format(
                ctx, _COMPRESSION_HEVC, C.byref(enc)
            ),
            "get_encoder",
        )
        if lossless:
            _check(lib.heif_encoder_set_lossless(enc, 1), "set_lossless")
        else:
            _check(
                lib.heif_encoder_set_lossy_quality(
                    enc, max(0, min(100, int(quality)))
                ),
                "set_quality",
            )
        if chroma444:
            _check(
                lib.heif_encoder_set_parameter(enc, b"chroma", b"444"),
                "set_chroma",
            )
        _check(
            lib.heif_context_encode_image(
                ctx, img, enc, None, C.byref(handle)
            ),
            "encode",
        )
        fd, tmp = tempfile.mkstemp(suffix=".heic")
        os.close(fd)
        try:
            _check(
                lib.heif_context_write_to_file(ctx, tmp.encode()), "write"
            )
            with open(tmp, "rb") as fh:
                return fh.read()
        finally:
            os.unlink(tmp)
    finally:
        if handle:
            lib.heif_image_handle_release(handle)
        if enc:
            lib.heif_encoder_release(enc)
        if img:
            lib.heif_image_release(img)
        lib.heif_context_free(ctx)
