"""A/B harness for arithmetic-coded JPEG (T.81 Annex D / SOF9).

Encodes the SAME image twice with the system libjpeg — once Huffman
(SOF0), once arithmetic (SOF9), identical quality/sampling — so the
two files carry the IDENTICAL quantized-coefficient stream and differ
only in the entropy layer.  The repo's own Huffman decoder then
becomes the conformance oracle for the new arithmetic decoder: both
decodes must produce byte-identical pixels (same coefficients through
the same IDCT).  Development/debug tool; the permanent pin lives in
tests/ against embedded fixtures.

libjpeg is driven via ctypes with offset-poked structs; every poked
offset is sanity-checked against values jpeg_set_defaults is known to
write (data_precision=8, jpeg_color_space), and jpeg_CreateCompress
validates the struct size itself — a wrong layout fails loudly, not
silently.
"""

from __future__ import annotations

import ctypes
import sys

import numpy as np

sys.path.insert(0, ".")

LJ = ctypes.CDLL("/usr/lib/x86_64-linux-gnu/libjpeg.so.62")
LJ.jpeg_std_error.restype = ctypes.c_void_p

_CSIZE = 520  # sizeof(jpeg_compress_struct), ABI-checked by CreateCompress
# jpeg_compress_struct offsets (JPEG_LIB_VERSION 62, x86_64 LP64):
_O_ERR = 0
_O_WIDTH, _O_HEIGHT, _O_NCOMP, _O_CSPACE = 48, 52, 56, 60
_O_DATA_PRECISION, _O_JPEG_CSPACE, _O_COMP_INFO = 72, 80, 88
_O_ARITH_CODE = 260
_O_NEXT_SCANLINE = 304
# jpeg_component_info offsets:
_CI_H_SAMP, _CI_V_SAMP = 8, 12
_JCS_GRAYSCALE, _JCS_RGB, _JCS_YCBCR = 1, 2, 3


def encode_jpeg_libjpeg(
    img: np.ndarray,
    quality: int = 75,
    arith: bool = False,
    progressive: bool = False,
) -> bytes:
    """Encode RGB/grayscale ndarray as baseline (SOF0) or arithmetic
    (SOF9) JPEG at 4:4:4 / 8-bit, no restarts — the feature envelope
    the repo's decoders support."""
    if img.ndim == 2:
        img = img[:, :, None]
    h, w, comps = img.shape
    errmgr = ctypes.create_string_buffer(1024)
    perr = LJ.jpeg_std_error(errmgr)
    cinfo = ctypes.create_string_buffer(_CSIZE)
    base = ctypes.addressof(cinfo)
    ctypes.c_void_p.from_address(base + _O_ERR).value = perr
    LJ.jpeg_CreateCompress(ctypes.byref(cinfo), 62, _CSIZE)
    out_ptr = ctypes.POINTER(ctypes.c_uint8)()
    out_size = ctypes.c_ulong(0)
    LJ.jpeg_mem_dest(
        ctypes.byref(cinfo), ctypes.byref(out_ptr), ctypes.byref(out_size)
    )
    ctypes.c_uint32.from_address(base + _O_WIDTH).value = w
    ctypes.c_uint32.from_address(base + _O_HEIGHT).value = h
    ctypes.c_int.from_address(base + _O_NCOMP).value = comps
    ctypes.c_int.from_address(base + _O_CSPACE).value = (
        _JCS_RGB if comps == 3 else _JCS_GRAYSCALE
    )
    LJ.jpeg_set_defaults(ctypes.byref(cinfo))
    # offset sanity: set_defaults wrote these through the real layout
    assert ctypes.c_int.from_address(base + _O_DATA_PRECISION).value == 8
    assert ctypes.c_int.from_address(base + _O_JPEG_CSPACE).value == (
        _JCS_YCBCR if comps == 3 else _JCS_GRAYSCALE
    )
    LJ.jpeg_set_quality(ctypes.byref(cinfo), quality, 1)
    ctypes.c_int.from_address(base + _O_ARITH_CODE).value = 1 if arith else 0
    if progressive:
        LJ.jpeg_simple_progression(ctypes.byref(cinfo))
    # force 4:4:4: luma defaults to 2x2 for YCbCr
    ci = ctypes.c_void_p.from_address(base + _O_COMP_INFO).value
    ctypes.c_int.from_address(ci + _CI_H_SAMP).value = 1
    ctypes.c_int.from_address(ci + _CI_V_SAMP).value = 1
    LJ.jpeg_start_compress(ctypes.byref(cinfo), 1)
    stride = w * comps
    buf = np.ascontiguousarray(img).tobytes()
    scanline = ctypes.c_uint32.from_address(base + _O_NEXT_SCANLINE)
    while scanline.value < h:
        y = scanline.value
        rb = ctypes.create_string_buffer(buf[y * stride : (y + 1) * stride], stride)
        ptrs = (ctypes.c_void_p * 1)(ctypes.addressof(rb))
        assert LJ.jpeg_write_scanlines(ctypes.byref(cinfo), ptrs, 1) == 1
    LJ.jpeg_finish_compress(ctypes.byref(cinfo))
    data = ctypes.string_at(out_ptr, out_size.value)
    LJ.jpeg_destroy_compress(ctypes.byref(cinfo))
    return data


def main() -> None:
    from setup_harvest_action_spark.functions.multimodal import decode_jpeg

    yy, xx = np.mgrid[0:48, 0:64]
    img = np.dstack([(xx * 4) % 256, (yy * 5) % 256, (xx + yy) % 256]).astype(
        np.uint8
    )
    huf = encode_jpeg_libjpeg(img, 75, arith=False)
    ari = encode_jpeg_libjpeg(img, 75, arith=True)
    print(f"huffman {len(huf)} B, arith {len(ari)} B")
    ref = decode_jpeg(huf)
    print("huffman twin decodes:", ref.shape, ref.dtype)
    try:
        got = decode_jpeg(ari)
    except Exception as exc:  # noqa: BLE001 — debug harness
        print("arith decode:", repr(exc))
        return
    diff = int(np.abs(ref.astype(int) - got.astype(int)).max())
    print("OK" if diff == 0 else f"DIFF maxdiff={diff}")


if __name__ == "__main__":
    main()


# --- libjpeg decode (reference oracle for subsampled layouts) --------------------

_DSIZE = 632  # sizeof(jpeg_decompress_struct), ABI-checked by CreateDecompress
_OD_OUT_CSPACE = 64
_OD_FANCY = 100
_OD_OUT_WIDTH, _OD_OUT_HEIGHT = 136, 140
_OD_OUT_COMPONENTS = 148
_OD_OUT_SCANLINE = 168


def decode_jpeg_libjpeg(data: bytes, fancy_upsampling: bool = False):
    """Decode via libjpeg to RGB ndarray.  With fancy_upsampling=False
    libjpeg replicates chroma pixels — the same non-normative
    upsampling choice the repo's decoder makes, so the two outputs are
    comparable to IDCT rounding."""
    h_buf = ctypes.create_string_buffer(1024)
    perr = LJ.jpeg_std_error(h_buf)
    cinfo = ctypes.create_string_buffer(_DSIZE)
    base = ctypes.addressof(cinfo)
    ctypes.c_void_p.from_address(base + _O_ERR).value = perr
    LJ.jpeg_CreateDecompress(ctypes.byref(cinfo), 62, _DSIZE)
    buf = ctypes.create_string_buffer(data, len(data))
    LJ.jpeg_mem_src(ctypes.byref(cinfo), buf, len(data))
    assert LJ.jpeg_read_header(ctypes.byref(cinfo), 1) == 1
    ctypes.c_int.from_address(base + _OD_FANCY).value = (
        1 if fancy_upsampling else 0
    )
    assert LJ.jpeg_start_decompress(ctypes.byref(cinfo))
    w = ctypes.c_uint32.from_address(base + _OD_OUT_WIDTH).value
    h = ctypes.c_uint32.from_address(base + _OD_OUT_HEIGHT).value
    comps = ctypes.c_int.from_address(base + _OD_OUT_COMPONENTS).value
    stride = w * comps
    rows = []
    rb = ctypes.create_string_buffer(stride)
    ptrs = (ctypes.c_void_p * 1)(ctypes.addressof(rb))
    scanline = ctypes.c_uint32.from_address(base + _OD_OUT_SCANLINE)
    while scanline.value < h:
        assert LJ.jpeg_read_scanlines(ctypes.byref(cinfo), ptrs, 1) == 1
        rows.append(bytes(rb.raw[:stride]))
    LJ.jpeg_finish_decompress(ctypes.byref(cinfo))
    LJ.jpeg_destroy_decompress(ctypes.byref(cinfo))
    arr = np.frombuffer(b"".join(rows), np.uint8).reshape(h, w, comps)
    if comps == 1:
        arr = np.repeat(arr, 3, axis=2)
    return arr


def encode_jpeg_libjpeg_subsampled(
    img: np.ndarray,
    quality: int = 75,
    arith: bool = False,
    progressive: bool = False,
    hs: int = 2,
    vs: int = 2,
) -> bytes:
    """4:2:0 / 4:2:2 / 4:4:0 variant of ``encode_jpeg_libjpeg``: pokes
    luma to (hs, vs) instead of 1x1."""
    h, w, comps = img.shape
    errmgr = ctypes.create_string_buffer(1024)
    perr = LJ.jpeg_std_error(errmgr)
    cinfo = ctypes.create_string_buffer(_CSIZE)
    base = ctypes.addressof(cinfo)
    ctypes.c_void_p.from_address(base + _O_ERR).value = perr
    LJ.jpeg_CreateCompress(ctypes.byref(cinfo), 62, _CSIZE)
    out_ptr = ctypes.POINTER(ctypes.c_uint8)()
    out_size = ctypes.c_ulong(0)
    LJ.jpeg_mem_dest(
        ctypes.byref(cinfo), ctypes.byref(out_ptr), ctypes.byref(out_size)
    )
    ctypes.c_uint32.from_address(base + _O_WIDTH).value = w
    ctypes.c_uint32.from_address(base + _O_HEIGHT).value = h
    ctypes.c_int.from_address(base + _O_NCOMP).value = comps
    ctypes.c_int.from_address(base + _O_CSPACE).value = _JCS_RGB
    LJ.jpeg_set_defaults(ctypes.byref(cinfo))
    LJ.jpeg_set_quality(ctypes.byref(cinfo), quality, 1)
    ctypes.c_int.from_address(base + _O_ARITH_CODE).value = 1 if arith else 0
    if progressive:
        LJ.jpeg_simple_progression(ctypes.byref(cinfo))
    ci = ctypes.c_void_p.from_address(base + _O_COMP_INFO).value
    ctypes.c_int.from_address(ci + _CI_H_SAMP).value = hs
    ctypes.c_int.from_address(ci + _CI_V_SAMP).value = vs
    LJ.jpeg_start_compress(ctypes.byref(cinfo), 1)
    stride = w * comps
    buf = np.ascontiguousarray(img).tobytes()
    scanline = ctypes.c_uint32.from_address(base + _O_NEXT_SCANLINE)
    while scanline.value < h:
        y = scanline.value
        rb = ctypes.create_string_buffer(buf[y * stride : (y + 1) * stride], stride)
        ptrs = (ctypes.c_void_p * 1)(ctypes.addressof(rb))
        assert LJ.jpeg_write_scanlines(ctypes.byref(cinfo), ptrs, 1) == 1
    LJ.jpeg_finish_compress(ctypes.byref(cinfo))
    data = ctypes.string_at(out_ptr, out_size.value)
    LJ.jpeg_destroy_compress(ctypes.byref(cinfo))
    return data
