"""A/B harness: GIF decode conformance against system giflib
(DGifOpenFileName + DGifSlurp via ctypes), covering the r13 surface
widening — interlaced images, local color tables, and GCE
transparency.

Direction: OUR emitter (encode_gif_adv) authors files across the
surface; giflib must recover the SOURCE index raster (DGifSlurp
deinterlaces, so for interlaced files giflib independently validates
our four-pass row reorder, not just the LZW layer), the color tables
must match entry-for-entry, and our decoder's RGB/RGBA must equal the
palette expansion of giflib's raster.  The
classic single-image grayscale path (encode_gif) is A/B'd too.

Development/debug tool; the permanent pin lives in tests/.
"""

from __future__ import annotations

import ctypes
import os
import sys
import tempfile

import numpy as np

sys.path.insert(0, ".")

LG = ctypes.CDLL("/usr/lib/x86_64-linux-gnu/libgif.so.7")


class _GifColor(ctypes.Structure):
    _fields_ = [
        ("Red", ctypes.c_ubyte),
        ("Green", ctypes.c_ubyte),
        ("Blue", ctypes.c_ubyte),
    ]


class _ColorMap(ctypes.Structure):
    _fields_ = [
        ("ColorCount", ctypes.c_int),
        ("BitsPerPixel", ctypes.c_int),
        ("SortFlag", ctypes.c_bool),
        ("Colors", ctypes.POINTER(_GifColor)),
    ]


class _ImageDesc(ctypes.Structure):
    _fields_ = [
        ("Left", ctypes.c_int),
        ("Top", ctypes.c_int),
        ("Width", ctypes.c_int),
        ("Height", ctypes.c_int),
        ("Interlace", ctypes.c_bool),
        ("ColorMap", ctypes.POINTER(_ColorMap)),
    ]


class _SavedImage(ctypes.Structure):
    _fields_ = [
        ("ImageDesc", _ImageDesc),
        ("RasterBits", ctypes.POINTER(ctypes.c_ubyte)),
        ("ExtensionBlockCount", ctypes.c_int),
        ("ExtensionBlocks", ctypes.c_void_p),
    ]


class _GifFile(ctypes.Structure):
    _fields_ = [
        ("SWidth", ctypes.c_int),
        ("SHeight", ctypes.c_int),
        ("SColorResolution", ctypes.c_int),
        ("SBackGroundColor", ctypes.c_int),
        ("AspectByte", ctypes.c_ubyte),
        ("SColorMap", ctypes.POINTER(_ColorMap)),
        ("ImageCount", ctypes.c_int),
        ("Image", _ImageDesc),
        ("SavedImages", ctypes.POINTER(_SavedImage)),
        ("ExtensionBlockCount", ctypes.c_int),
        ("ExtensionBlocks", ctypes.c_void_p),
        ("Error", ctypes.c_int),
        ("UserData", ctypes.c_void_p),
        ("Private", ctypes.c_void_p),
    ]


LG.DGifOpenFileName.restype = ctypes.POINTER(_GifFile)
LG.DGifOpenFileName.argtypes = [ctypes.c_char_p, ctypes.POINTER(ctypes.c_int)]
LG.DGifSlurp.restype = ctypes.c_int
LG.DGifSlurp.argtypes = [ctypes.POINTER(_GifFile)]
LG.DGifCloseFile.restype = ctypes.c_int
LG.DGifCloseFile.argtypes = [
    ctypes.POINTER(_GifFile), ctypes.POINTER(ctypes.c_int),
]


def decode_ref(data: bytes):
    """giflib reference decode of the FIRST image: returns (raster in
    ROW order — DGifSlurp deinterlaces — [h, w] uint8, palette
    [n, 3] uint8, interlaced flag)."""
    fd, path = tempfile.mkstemp(suffix=".gif")
    try:
        os.write(fd, data)
        os.close(fd)
        err = ctypes.c_int(0)
        gf = LG.DGifOpenFileName(path.encode(), ctypes.byref(err))
        assert gf, f"DGifOpenFileName error {err.value}"
        ok = LG.DGifSlurp(gf)
        assert ok == 1, f"DGifSlurp error {gf.contents.Error}"
        f = gf.contents
        assert f.ImageCount >= 1
        img = f.SavedImages[0]
        d = img.ImageDesc
        w, h = d.Width, d.Height
        raster = (
            np.frombuffer(
                ctypes.string_at(img.RasterBits, w * h), np.uint8
            )
            .reshape(h, w)
            .copy()
        )
        cmap = d.ColorMap if d.ColorMap else f.SColorMap
        assert cmap
        n = cmap.contents.ColorCount
        pal = np.array(
            [
                (
                    cmap.contents.Colors[i].Red,
                    cmap.contents.Colors[i].Green,
                    cmap.contents.Colors[i].Blue,
                )
                for i in range(n)
            ],
            np.uint8,
        )
        interlaced = bool(d.Interlace)
        LG.DGifCloseFile(gf, ctypes.byref(err))
        return raster, pal, interlaced
    finally:
        os.unlink(path)


def run_case(
    data: bytes,
    label: str,
    want_idx: np.ndarray,
    want_pal: np.ndarray,
    transparent: int | None,
) -> list:
    from setup_harvest_action_spark.functions.multimodal import decode_gif

    problems = []
    raster, pal, interlaced = decode_ref(data)
    # giflib's DGifSlurp DEINTERLACES into row order — which makes it a
    # true external oracle for our four-pass reorder as well as for LZW
    if not np.array_equal(raster, want_idx):
        problems.append(f"{label}: giflib raster != source indices")
    if not np.array_equal(pal[: len(want_pal)], want_pal):
        problems.append(f"{label}: giflib palette != source palette")
    ours = decode_gif(data)
    want_rgb = want_pal[want_idx]
    if transparent is None:
        if ours.shape[2] != 3 or not np.array_equal(ours, want_rgb):
            problems.append(f"{label}: our RGB != palette[indices]")
    else:
        if ours.shape[2] != 4:
            problems.append(f"{label}: expected RGBA out")
        elif not np.array_equal(ours[:, :, :3], want_rgb):
            problems.append(f"{label}: our RGB != palette[indices]")
        elif not np.array_equal(
            ours[:, :, 3],
            np.where(want_idx == transparent, 0, 255).astype(np.uint8),
        ):
            problems.append(f"{label}: alpha mask wrong")
    return problems


def main() -> None:
    from setup_harvest_action_spark.functions.multimodal import (
        decode_gif,
        encode_gif,
        encode_gif_adv,
    )

    rng = np.random.default_rng(55)
    fails = []
    n = 0
    for (w, h) in ((23, 14), (64, 48), (9, 31)):
        for n_colors in (4, 16, 200):
            pal = rng.integers(0, 256, (n_colors, 3), np.uint8)
            idx = rng.integers(0, n_colors, (h, w)).astype(np.uint8)
            for interlace in (False, True):
                for local in (False, True):
                    for transparent in (None, 1):
                        data = encode_gif_adv(
                            w, h, idx, pal,
                            interlace=interlace, local=local,
                            transparent=transparent,
                        )
                        fails += run_case(
                            data,
                            f"{w}x{h}c{n_colors}i{int(interlace)}"
                            f"l{int(local)}t{transparent}",
                            idx, pal, transparent,
                        )
                        n += 1
        # classic grayscale emitter path
        gray = rng.integers(0, 256, (h, w), np.uint8)
        raster, pal, _ = decode_ref(encode_gif(w, h, gray))
        ours = decode_gif(encode_gif(w, h, gray))
        if not np.array_equal(raster, gray):
            fails.append(f"gray{w}x{h}: giflib raster != source")
        if not np.array_equal(ours[:, :, 0], gray):
            fails.append(f"gray{w}x{h}: our decode != source")
        n += 1
    print(f"{n} cases, {len(fails)} failures")
    for f in fails[:40]:
        print("  " + f)
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
