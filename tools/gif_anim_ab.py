"""A/B harness: ANIMATED GIF conformance against system giflib
(DGifSlurp multi-image via ctypes) — the r14 frame-decode widening.

Three independent checks per fixture:

1. **giflib recovers the source** — per-frame raster (DGifSlurp
   deinterlaces, so interlaced frames validate the four-pass reorder),
   per-frame geometry (Left/Top/Width/Height), color tables, and the
   Graphic Control Extension fields (disposal / delay / transparent
   index) parsed from giflib's ExtensionBlocks must all equal what
   ``encode_gif_animation`` was asked to write.  This pins the emitter
   AND giflib agreement on the wire format.
2. **Independent compositor equality** — this tool composites
   giflib's slurped rasters + GCE blocks with its OWN implementation
   of the GIF89a disposal model (transparent canvas; disposal 2
   clears the frame rect; disposal 3 restores the pre-render canvas)
   and the engine's ``decode_gif_animation`` (which never touches
   giflib — its own parser + LZW + compositor) must produce
   byte-identical RGBA frames.  Two implementations of the spec
   written against the prose, matching byte-exact.
3. **Delays** round-trip through both paths.

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


class _ExtBlock(ctypes.Structure):
    _fields_ = [
        ("ByteCount", ctypes.c_int),
        ("Bytes", ctypes.POINTER(ctypes.c_ubyte)),
        ("Function", ctypes.c_int),
    ]


class _SavedImage(ctypes.Structure):
    _fields_ = [
        ("ImageDesc", _ImageDesc),
        ("RasterBits", ctypes.POINTER(ctypes.c_ubyte)),
        ("ExtensionBlockCount", ctypes.c_int),
        ("ExtensionBlocks", ctypes.POINTER(_ExtBlock)),
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
        ("ExtensionBlocks", ctypes.POINTER(_ExtBlock)),
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


def slurp_ref(data: bytes):
    """giflib reference slurp of ALL images: returns (screen (W, H),
    [per-frame dict raster/left/top/palette/interlace/gce])."""
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
        frames = []
        for i in range(f.ImageCount):
            img = f.SavedImages[i]
            d = img.ImageDesc
            raster = (
                np.frombuffer(
                    ctypes.string_at(img.RasterBits, d.Width * d.Height),
                    np.uint8,
                )
                .reshape(d.Height, d.Width)
                .copy()
            )
            cmap = d.ColorMap if d.ColorMap else f.SColorMap
            assert cmap
            n = cmap.contents.ColorCount
            pal = np.array(
                [
                    (
                        cmap.contents.Colors[j].Red,
                        cmap.contents.Colors[j].Green,
                        cmap.contents.Colors[j].Blue,
                    )
                    for j in range(n)
                ],
                np.uint8,
            )
            gce = None
            for b in range(img.ExtensionBlockCount):
                eb = img.ExtensionBlocks[b]
                if eb.Function == 0xF9 and eb.ByteCount >= 4:
                    raw = ctypes.string_at(eb.Bytes, eb.ByteCount)
                    gce = {
                        "disposal": (raw[0] >> 2) & 0x07,
                        "transparent": raw[3] if raw[0] & 0x01 else None,
                        "delay": raw[1] | raw[2] << 8,
                    }
            frames.append(
                {
                    "raster": raster,
                    "left": d.Left,
                    "top": d.Top,
                    "palette": pal,
                    "interlace": bool(d.Interlace),
                    "gce": gce,
                }
            )
        screen = (f.SWidth, f.SHeight)
        LG.DGifCloseFile(gf, ctypes.byref(err))
        return screen, frames
    finally:
        os.unlink(path)


def composite_ref(screen, frames):
    """INDEPENDENT GIF89a disposal-model compositor over giflib's
    slurped data — written against the spec prose, sharing no code
    with the engine's decode_gif_animation."""
    w, h = screen
    canvas = np.zeros((h, w, 4), np.uint8)
    out = []
    for fr in frames:
        gce = fr["gce"] or {"disposal": 0, "transparent": None, "delay": 0}
        saved = canvas.copy() if gce["disposal"] == 3 else None
        idx, pal = fr["raster"], fr["palette"]
        fh, fw = idx.shape
        x, y = fr["left"], fr["top"]
        opaque = (
            np.ones_like(idx, bool)
            if gce["transparent"] is None
            else idx != gce["transparent"]
        )
        sub = canvas[y : y + fh, x : x + fw]
        rgb = pal[idx]
        sub[..., :3][opaque] = rgb[opaque]
        sub[..., 3][opaque] = 255
        out.append(canvas.copy())
        if gce["disposal"] == 2:
            canvas[y : y + fh, x : x + fw] = 0
        elif gce["disposal"] == 3:
            canvas = saved
    return out


def run_case(data, label, want) -> list:
    from setup_harvest_action_spark.functions.multimodal import (
        decode_gif_animation,
    )

    problems = []
    screen, ref = slurp_ref(data)
    if len(ref) != len(want["frames"]):
        return [f"{label}: giflib frame count {len(ref)}"]
    for i, fr in enumerate(ref):
        if not np.array_equal(fr["raster"], want["frames"][i]):
            problems.append(f"{label}[{i}]: giflib raster != source")
        if (fr["left"], fr["top"]) != want["offsets"][i]:
            problems.append(f"{label}[{i}]: geometry mismatch")
        want_pal = want["local_palettes"][i]
        want_pal = want["palette"] if want_pal is None else want_pal
        if not np.array_equal(fr["palette"][: len(want_pal)], want_pal):
            problems.append(f"{label}[{i}]: palette mismatch")
        if fr["interlace"] != want["interlaces"][i]:
            problems.append(f"{label}[{i}]: interlace flag")
        gce = fr["gce"]
        if gce is None:
            problems.append(f"{label}[{i}]: GCE missing")
        else:
            if gce["disposal"] != want["disposals"][i]:
                problems.append(f"{label}[{i}]: disposal mismatch")
            if gce["transparent"] != want["transparents"][i]:
                problems.append(f"{label}[{i}]: transparent mismatch")
            if gce["delay"] != want["delays"][i]:
                problems.append(f"{label}[{i}]: delay mismatch")
    ref_frames = composite_ref(screen, ref)
    ours, our_delays = decode_gif_animation(data)
    if len(ours) != len(ref_frames):
        problems.append(f"{label}: engine frame count {len(ours)}")
    else:
        for i, (a, b) in enumerate(zip(ours, ref_frames)):
            if not np.array_equal(a, b):
                problems.append(
                    f"{label}[{i}]: engine composite != independent composite"
                )
    if our_delays != list(want["delays"]):
        problems.append(f"{label}: engine delays {our_delays}")
    return problems


def main() -> None:
    from setup_harvest_action_spark.functions.multimodal import (
        encode_gif_animation,
    )

    rng = np.random.default_rng(77)
    fails: list = []
    n = 0
    for (w, h) in ((21, 13), (48, 32)):
        for n_colors in (8, 64):
            pal = rng.integers(0, 256, (n_colors, 3), np.uint8)
            for disposal_plan in (
                [0, 0, 0],
                [1, 1, 1],
                [2, 2, 2],
                [3, 3, 3],
                [1, 2, 3, 1],
                [0, 3, 2, 1, 3],
            ):
                for transparent in (None, 1):
                    for use_local in (False, True):
                        for use_interlace in (False, True):
                            k = len(disposal_plan)
                            frames, offs, lps, ils = [], [], [], []
                            for i in range(k):
                                if i == 0:
                                    fw, fh, x, y = w, h, 0, 0
                                else:
                                    fw = max(2, w // (i + 1))
                                    fh = max(2, h // (i + 1))
                                    x = min(w - fw, 2 * i + 1)
                                    y = min(h - fh, i)
                                frames.append(
                                    rng.integers(
                                        0, n_colors, (fh, fw)
                                    ).astype(np.uint8)
                                )
                                offs.append((x, y))
                                lps.append(
                                    rng.integers(
                                        0, 256, (n_colors, 3), np.uint8
                                    )
                                    if use_local and i % 2
                                    else None
                                )
                                ils.append(use_interlace and i % 2 == 0)
                            want = {
                                "frames": frames,
                                "palette": pal,
                                "delays": [3 * (i + 1) for i in range(k)],
                                "disposals": disposal_plan,
                                "transparents": [transparent] * k,
                                "offsets": offs,
                                "local_palettes": lps,
                                "interlaces": ils,
                            }
                            data = encode_gif_animation(
                                frames,
                                pal,
                                delays=want["delays"],
                                disposals=disposal_plan,
                                transparents=want["transparents"],
                                offsets=offs,
                                screen=(w, h),
                                local_palettes=lps,
                                interlaces=ils,
                            )
                            fails += run_case(
                                data,
                                f"{w}x{h}c{n_colors}d{disposal_plan}"
                                f"t{transparent}l{int(use_local)}"
                                f"i{int(use_interlace)}",
                                want,
                            )
                            n += 1
    print(f"{n} cases, {len(fails)} failures")
    for f in fails[:40]:
        print("  " + f)
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
