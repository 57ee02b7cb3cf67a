"""A/B harness: ANIMATED WebP (VP8X + ANIM/ANMF) — the r14 frame-loop
widening over the r12/r13 VP8/VP8L/ALPH decoders.

Oracle situation, stated honestly: libwebpdemux (WebPAnimDecoder, the
library that composites animations) is NOT on this box — only
libwebp.so.7.  The harness therefore gates in two independent layers:

1. **Per-frame PIXELS vs system libwebp.**  Every frame still is
   encoded by SYSTEM libwebp (lossless RGBA and lossy+alpha configs —
   tools/webp_alpha_ab.py machinery), wrapped into ANMF by the
   engine's ``encode_webp_animation``, and the engine's per-frame
   decode (``_decode_anmf_image`` — the exact code the animation path
   runs) must byte-match ``WebPDecodeRGBA`` of the standalone still.
   Frame pixels are thus fully conformance-anchored; only the
   compositing layer lacks a system oracle.
2. **Independent compositor equality.**  This tool implements the
   container spec's compositing model (transparent canvas; blend
   method 0 = the non-premultiplied integer formula, method 1 =
   overwrite; dispose-to-background clears the frame rect) its own
   way over the libwebp-decoded frame pixels, and the engine's
   ``decode_webp_animation`` (own parser + own decoders + own
   compositor) must produce byte-identical RGBA canvas frames —
   including fractional-alpha blends, where the round-half-up integer
   arithmetic is the contract.

Development/debug tool; the permanent pin lives in tests/.
"""

from __future__ import annotations

import struct
import sys

import numpy as np

sys.path.insert(0, ".")

from tools.webp_alpha_ab import (  # noqa: E402  (system-libwebp helpers)
    alpha_image,
    decode_rgba_ref,
    decode_yuv_ref,
    encode_rgba_adv,
    encode_rgba_lossless,
)


def composite_ref(canvas_wh, frame_descs):
    """Independent spec compositor: frame_descs carry
    (rgba ndarray, x, y, blend bool, dispose bool)."""
    w, h = canvas_wh
    canvas = np.zeros((h, w, 4), np.uint8)
    out = []
    for rgba, x, y, blend, dispose in frame_descs:
        fh, fw = rgba.shape[:2]
        region = canvas[y : y + fh, x : x + fw]
        if not blend:
            region[...] = rgba
        else:
            sa = rgba[..., 3].astype(np.int64)
            da = region[..., 3].astype(np.int64)
            a_num = 255 * sa + da * (255 - sa)
            src = rgba[..., :3].astype(np.int64)
            dst = region[..., :3].astype(np.int64)
            num = (
                255 * sa[..., None] * src
                + (da * (255 - sa))[..., None] * dst
            )
            rgb = np.where(
                a_num[..., None] > 0,
                (num + a_num[..., None] // 2)
                // np.maximum(a_num[..., None], 1),
                0,
            )
            region[..., :3] = rgb.astype(np.uint8)
            region[..., 3] = ((a_num + 127) // 255).astype(np.uint8)
        out.append(canvas.copy())
        if dispose:
            canvas[y : y + fh, x : x + fw] = 0
    return out


def _frame_chunks(anim: bytes):
    """Yield each ANMF's frame-data bytes (post-header sub-chunks)."""
    pos = 30  # skip RIFF + VP8X
    while pos + 8 <= len(anim):
        cc = anim[pos : pos + 4]
        (size,) = struct.unpack_from("<I", anim, pos + 4)
        if cc == b"ANMF":
            yield anim[pos + 8 + 16 : pos + 8 + size]
        pos += 8 + size + (size & 1)


def run_case(label, stills, offsets, blends, disposals, canvas) -> list:
    from setup_harvest_action_spark.functions.webp_codec import (
        _decode_anmf_image,
        decode_webp_animation,
        encode_webp_animation,
    )

    problems = []
    anim = encode_webp_animation(
        stills,
        offsets=offsets,
        durations=[10 * (i + 1) for i in range(len(stills))],
        blends=blends,
        disposals=disposals,
        canvas=canvas,
    )
    # layer 1: every frame's pixels gate against system libwebp's
    # decode of the standalone still, with the SAME contract the r13
    # still harness (tools/webp_alpha_ab.py) proved on this decode
    # path: lossless = full RGBA byte-exact via WebPDecodeRGBA; lossy
    # = alpha plane byte-exact + Y/U/V planes byte-exact via
    # WebPDecodeYUV (WebPDecodeRGBA's own YUV->RGB differs from the
    # ecosystem BT.601 table by <=2 — the documented r12 decision).
    our_frames = []
    for i, sub in enumerate(_frame_chunks(anim)):
        ours = _decode_anmf_image(sub)
        our_frames.append(ours)
        lossless = b"VP8L" in sub[:8]
        ref = decode_rgba_ref(stills[i])
        if ours.shape != ref.shape:
            problems.append(f"{label}[{i}]: shape {ours.shape}")
            continue
        if lossless:
            if not np.array_equal(ours, ref):
                problems.append(f"{label}[{i}]: frame RGBA != libwebp")
            continue
        if not np.array_equal(ours[..., 3], ref[..., 3]):
            problems.append(f"{label}[{i}]: alpha plane != libwebp")
        y1, u1, v1 = decode_yuv_ref(stills[i])
        # the ANMF frame's VP8 chunk, decoded by the engine's VP8 path
        from setup_harvest_action_spark.functions.vp8_codec import (
            decode_vp8,
        )

        pos = 0
        vp8 = None
        while pos + 8 <= len(sub):
            cc = sub[pos : pos + 4]
            (size,) = struct.unpack_from("<I", sub, pos + 4)
            if cc == b"VP8 ":
                vp8 = sub[pos + 8 : pos + 8 + size]
            pos += 8 + size + (size & 1)
        y2, u2, v2 = decode_vp8(vp8)
        for a, b, pl in ((y1, y2, "Y"), (u1, u2, "U"), (v1, v2, "V")):
            if not np.array_equal(a, b):
                problems.append(f"{label}[{i}]: {pl} plane != libwebp")
    # layer 2: engine composite == independent spec compositor over
    # the same per-frame pixels (compositing is the contract here;
    # frame pixels were gated above)
    want = composite_ref(
        canvas,
        [
            (our_frames[i], offsets[i][0], offsets[i][1], blends[i],
             disposals[i])
            for i in range(len(stills))
        ],
    )
    ours, durs = decode_webp_animation(anim)
    if len(ours) != len(want):
        problems.append(f"{label}: frame count {len(ours)} != {len(want)}")
    else:
        for i, (a, b) in enumerate(zip(ours, want)):
            if not np.array_equal(a, b):
                problems.append(f"{label}[{i}]: composite mismatch")
    if durs != [10 * (i + 1) for i in range(len(stills))]:
        problems.append(f"{label}: durations {durs}")
    return problems


def main() -> None:
    rng = np.random.default_rng(99)
    fails: list = []
    n = 0
    base_w, base_h = 48, 32
    for kind in ("shapes", "gradient", "noise"):
        full = alpha_image(kind, base_w, base_h)
        for frame_mode in ("lossless", "lossy_alpha", "mixed"):
            for blend_plan, dispose_plan in (
                ([True, True, True], [False, False, False]),
                ([True, False, True], [False, True, False]),
                ([False, False, False], [True, True, True]),
                ([True, True, True, True], [False, True, False, True]),
            ):
                k = len(blend_plan)
                stills, offs = [], []
                for i in range(k):
                    if i == 0:
                        arr, x, y = full, 0, 0
                    else:
                        fw = max(4, base_w // (i + 1))
                        fh = max(4, base_h // (i + 1))
                        arr = alpha_image(kind, fw, fh)
                        # vary alpha so blending is fractional
                        arr = arr.copy()
                        arr[..., 3] = (
                            arr[..., 3].astype(np.int32) * (2 + i) // 4
                        ).astype(np.uint8)
                        x = min(base_w - fw, 2 * i + 2)
                        y = min(base_h - fh, 2 * i)
                        x -= x % 2
                        y -= y % 2
                    if frame_mode == "lossless" or (
                        frame_mode == "mixed" and i % 2 == 0
                    ):
                        stills.append(encode_rgba_lossless(arr))
                    else:
                        stills.append(
                            encode_rgba_adv(arr, 75.0, alpha_quality=100)
                        )
                    offs.append((x, y))
                fails += run_case(
                    f"{kind}-{frame_mode}-b{blend_plan}-d{dispose_plan}",
                    stills, offs, blend_plan, dispose_plan,
                    (base_w, base_h),
                )
                n += 1
    # degenerate extras: single frame, full-canvas overwrite chain
    full = alpha_image("shapes", 20, 14)
    fails += run_case(
        "single", [encode_rgba_lossless(full)], [(0, 0)], [True], [False],
        (20, 14),
    )
    n += 1
    print(f"{n} cases, {len(fails)} failures")
    for f in fails[:40]:
        print("  " + f)
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
