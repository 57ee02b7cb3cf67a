"""A/B harness: encode deterministic images with the system libwebp,
decode with BOTH libwebp and functions/vp8_codec.py, and diff the YUV
planes (the RFC 6386 bit-exact surface).  Development/debug tool for
the r12 VP8 decoder; the permanent pin lives in tests/."""

from __future__ import annotations

import ctypes
import sys

import numpy as np

sys.path.insert(0, ".")

LW = ctypes.CDLL("/usr/lib/x86_64-linux-gnu/libwebp.so.7")
LW.WebPEncodeRGB.restype = ctypes.c_size_t
LW.WebPEncodeRGB.argtypes = [
    ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
    ctypes.c_float, ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
]
LW.WebPDecodeYUV.restype = ctypes.POINTER(ctypes.c_uint8)
LW.WebPDecodeYUV.argtypes = [
    ctypes.c_char_p, ctypes.c_size_t,
    ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
    ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
    ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
    ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
]


def encode_rgb(arr: np.ndarray, quality: float) -> bytes:
    h, w, _ = arr.shape
    out = ctypes.POINTER(ctypes.c_uint8)()
    n = LW.WebPEncodeRGB(
        arr.tobytes(), w, h, w * 3, quality, ctypes.byref(out)
    )
    assert n > 0
    data = ctypes.string_at(out, n)
    LW.WebPFree(out)
    return data


def decode_yuv_ref(data: bytes):
    w = ctypes.c_int()
    h = ctypes.c_int()
    u = ctypes.POINTER(ctypes.c_uint8)()
    v = ctypes.POINTER(ctypes.c_uint8)()
    stride = ctypes.c_int()
    uv_stride = ctypes.c_int()
    y = LW.WebPDecodeYUV(
        data, len(data), ctypes.byref(w), ctypes.byref(h),
        ctypes.byref(u), ctypes.byref(v),
        ctypes.byref(stride), ctypes.byref(uv_stride),
    )
    assert y
    W, H, S, US = w.value, h.value, stride.value, uv_stride.value
    cw, ch = (W + 1) // 2, (H + 1) // 2
    ya = np.frombuffer(
        ctypes.string_at(y, S * H), np.uint8
    ).reshape(H, S)[:, :W].copy()
    ua = np.frombuffer(
        ctypes.string_at(u, US * ch), np.uint8
    ).reshape(ch, US)[:, :cw].copy()
    va = np.frombuffer(
        ctypes.string_at(v, US * ch), np.uint8
    ).reshape(ch, US)[:, :cw].copy()
    LW.WebPFree(y)
    return ya, ua, va


def test_image(kind: str, w: int, h: int) -> np.ndarray:
    yy, xx = np.mgrid[0:h, 0:w]
    if kind == "gradient":
        r = (xx * 255 // max(w - 1, 1)).astype(np.uint8)
        g = (yy * 255 // max(h - 1, 1)).astype(np.uint8)
        b = ((xx + yy) * 255 // max(w + h - 2, 1)).astype(np.uint8)
    elif kind == "blocks":
        r = ((xx // 8 + yy // 8) % 2 * 255).astype(np.uint8)
        g = ((xx // 4) % 2 * 200 + 20).astype(np.uint8)
        b = ((yy // 16) % 2 * 180 + 40).astype(np.uint8)
    elif kind == "noise":
        rng = np.random.RandomState(42)
        r = rng.randint(0, 256, (h, w)).astype(np.uint8)
        g = rng.randint(0, 256, (h, w)).astype(np.uint8)
        b = rng.randint(0, 256, (h, w)).astype(np.uint8)
    else:  # flat
        r = np.full((h, w), 120, np.uint8)
        g = np.full((h, w), 200, np.uint8)
        b = np.full((h, w), 60, np.uint8)
    return np.dstack([r, g, b])


def main() -> None:
    from setup_harvest_action_spark.functions.vp8_codec import (
        decode_webp_lossy,
    )

    cases = [
        ("flat", 32, 32, 75.0),
        ("gradient", 64, 48, 75.0),
        ("blocks", 64, 48, 75.0),
        ("noise", 48, 32, 50.0),
        ("gradient", 33, 17, 90.0),  # non-MB-aligned crop
        ("blocks", 80, 64, 20.0),    # low quality -> heavy quantization
    ]
    for kind, w, h, q in cases:
        img = test_image(kind, w, h)
        data = encode_rgb(img, q)
        ry, ru, rv = decode_yuv_ref(data)
        try:
            my, mu, mv = decode_webp_lossy(data)
        except Exception as exc:  # noqa: BLE001 — debug harness
            print(f"{kind} {w}x{h} q{q}: DECODE ERROR {exc!r}")
            continue
        dy = int(np.abs(ry.astype(int) - my.astype(int)).max())
        du = int(np.abs(ru.astype(int) - mu.astype(int)).max())
        dv = int(np.abs(rv.astype(int) - mv.astype(int)).max())
        ok = "OK " if dy == du == dv == 0 else "DIFF"
        print(
            f"{ok} {kind:9s} {w}x{h} q{q}: maxdiff y={dy} u={du} v={dv} "
            f"({len(data)} bytes)"
        )
        if dy or du or dv:
            bad = np.argwhere(ry.astype(int) != my.astype(int))
            print("   first y diffs:", bad[:5].tolist())


if __name__ == "__main__":
    main()


# --- advanced encoder (WebPEncode w/ explicit config) ---------------------------


class _WebPConfig(ctypes.Structure):
    _fields_ = [
        ("lossless", ctypes.c_int), ("quality", ctypes.c_float),
        ("method", ctypes.c_int), ("image_hint", ctypes.c_int),
        ("target_size", ctypes.c_int), ("target_PSNR", ctypes.c_float),
        ("segments", ctypes.c_int), ("sns_strength", ctypes.c_int),
        ("filter_strength", ctypes.c_int), ("filter_sharpness", ctypes.c_int),
        ("filter_type", ctypes.c_int), ("autofilter", ctypes.c_int),
        ("alpha_compression", ctypes.c_int), ("alpha_filtering", ctypes.c_int),
        ("alpha_quality", ctypes.c_int), ("pass_", ctypes.c_int),
        ("show_compressed", ctypes.c_int), ("preprocessing", ctypes.c_int),
        ("partitions", ctypes.c_int), ("partition_limit", ctypes.c_int),
        ("emulate_jpeg_size", ctypes.c_int), ("thread_level", ctypes.c_int),
        ("low_memory", ctypes.c_int), ("near_lossless", ctypes.c_int),
        ("exact", ctypes.c_int), ("use_delta_palette", ctypes.c_int),
        ("use_sharp_yuv", ctypes.c_int), ("qmin", ctypes.c_int),
        ("qmax", ctypes.c_int),
    ]


class _MemoryWriter(ctypes.Structure):
    _fields_ = [
        ("mem", ctypes.POINTER(ctypes.c_uint8)),
        ("size", ctypes.c_size_t), ("max_size", ctypes.c_size_t),
        ("pad", ctypes.c_uint32 * 1),
    ]


class _WebPPicture(ctypes.Structure):
    _fields_ = [
        ("use_argb", ctypes.c_int), ("colorspace", ctypes.c_int),
        ("width", ctypes.c_int), ("height", ctypes.c_int),
        ("y", ctypes.POINTER(ctypes.c_uint8)),
        ("u", ctypes.POINTER(ctypes.c_uint8)),
        ("v", ctypes.POINTER(ctypes.c_uint8)),
        ("y_stride", ctypes.c_int), ("uv_stride", ctypes.c_int),
        ("a", ctypes.POINTER(ctypes.c_uint8)), ("a_stride", ctypes.c_int),
        ("pad1", ctypes.c_uint32 * 2),
        ("argb", ctypes.POINTER(ctypes.c_uint32)),
        ("argb_stride", ctypes.c_int), ("pad2", ctypes.c_uint32 * 3),
        ("writer", ctypes.c_void_p), ("custom_ptr", ctypes.c_void_p),
        ("extra_info_type", ctypes.c_int),
        ("extra_info", ctypes.POINTER(ctypes.c_uint8)),
        ("stats", ctypes.c_void_p), ("error_code", ctypes.c_int),
        ("progress_hook", ctypes.c_void_p), ("user_data", ctypes.c_void_p),
        ("pad3", ctypes.c_uint32 * 3),
        ("pad4", ctypes.POINTER(ctypes.c_uint8)),
        ("pad5", ctypes.POINTER(ctypes.c_uint8)),
        ("pad6", ctypes.c_uint32 * 8),
        ("memory_", ctypes.c_void_p), ("memory_argb_", ctypes.c_void_p),
        ("pad7", ctypes.c_void_p * 2),
    ]


def encode_adv(arr: np.ndarray, quality: float = 75.0, **cfg_over) -> bytes:
    """Encode with explicit WebPConfig fields (filter_type, partitions,
    segments, filter_sharpness, ...) to reach header paths the simple
    WebPEncodeRGB call never emits."""
    h, w, _ = arr.shape
    cfg = _WebPConfig()
    assert LW.WebPConfigInitInternal(
        ctypes.byref(cfg), 0, ctypes.c_float(quality), 0x020F
    )
    for k, v in cfg_over.items():
        setattr(cfg, k, v)
    assert LW.WebPValidateConfig(ctypes.byref(cfg))
    pic = _WebPPicture()
    assert LW.WebPPictureInitInternal(ctypes.byref(pic), 0x020F)
    pic.width, pic.height = w, h
    assert LW.WebPPictureImportRGB(ctypes.byref(pic), arr.tobytes(), w * 3)
    wr = _MemoryWriter()
    LW.WebPMemoryWriterInit(ctypes.byref(wr))
    pic.writer = ctypes.cast(LW.WebPMemoryWrite, ctypes.c_void_p)
    pic.custom_ptr = ctypes.cast(ctypes.byref(wr), ctypes.c_void_p)
    ok = LW.WebPEncode(ctypes.byref(cfg), ctypes.byref(pic))
    assert ok, pic.error_code
    data = ctypes.string_at(wr.mem, wr.size)
    LW.WebPMemoryWriterClear(ctypes.byref(wr))
    LW.WebPPictureFree(ctypes.byref(pic))
    return data
