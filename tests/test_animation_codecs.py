"""Animated GIF + animated WebP (r14): compositing semantics, frame
sampling, still-decoder refusals, pipeline invariants, and the fuzz
contract (truncation/bitflip never hangs or crashes uncleanly).

External conformance lives in tools/gif_anim_ab.py (192 giflib
DGifSlurp multi-image configs, byte-exact incl. an independent
compositor) and tools/webp_anim_ab.py (37 configs: frame pixels vs
system libwebp, compositor vs independent spec implementation); these
tests pin the semantics without needing the system libraries."""

from __future__ import annotations

import random
import struct
import zlib

import numpy as np
import pytest

from setup_harvest_action_spark.functions.multimodal import (
    decode_gif,
    decode_gif_animation,
    encode_gif_animation,
    synthesize_gif_animation,
    synthesize_webp_animation,
)
from setup_harvest_action_spark.functions.webp_codec import (
    decode_webp,
    decode_webp_animation,
    encode_webp_animation,
    encode_webp_lossless,
)

CLEAN_FAILURES = (
    ValueError,
    IndexError,
    KeyError,
    EOFError,
    OverflowError,
    struct.error,
    zlib.error,
)


def _gif_case():
    rng = np.random.default_rng(7)
    pal = rng.integers(0, 256, (8, 3), np.uint8)
    f0 = rng.integers(0, 8, (10, 12)).astype(np.uint8)
    f1 = rng.integers(0, 8, (5, 6)).astype(np.uint8)
    f2 = rng.integers(0, 8, (10, 12)).astype(np.uint8)
    data = encode_gif_animation(
        [f0, f1, f2],
        pal,
        delays=[10, 20, 30],
        disposals=[1, 2, 3],
        transparents=[None, 2, None],
        offsets=[(0, 0), (3, 2), (0, 0)],
    )
    return data, pal, (f0, f1, f2)


def test_gif_disposal_and_transparency_compositing():
    """Hand-computed disposal-model goldens: keep(1) then
    restore-background(2) then restore-previous(3), with a transparent
    index punching through to the prior canvas."""
    data, pal, (f0, f1, f2) = _gif_case()
    frames, delays = decode_gif_animation(data)
    assert delays == [10, 20, 30]
    c0 = np.dstack([pal[f0], np.full((10, 12), 255, np.uint8)])
    assert np.array_equal(frames[0], c0)
    c1 = c0.copy()
    sub = c1[2:7, 3:9]
    m = f1 != 2  # transparent index leaves the base frame visible
    sub[m] = np.dstack([pal[f1], np.full((5, 6), 255, np.uint8)])[m]
    assert np.array_equal(frames[1], c1)
    # disposal 2 cleared frame 1's rectangle before frame 2 rendered
    c2 = np.dstack([pal[f2], np.full((10, 12), 255, np.uint8)])
    assert np.array_equal(frames[2], c2)


def test_gif_restore_previous_disposal():
    """Disposal 3: the frame's effect vanishes for its successor."""
    pal = np.array([[255, 0, 0], [0, 255, 0], [0, 0, 255]], np.uint8)
    base = np.zeros((4, 4), np.uint8)
    overlay = np.ones((2, 2), np.uint8)
    tail = np.full((1, 1), 2, np.uint8)
    data = encode_gif_animation(
        [base, overlay, tail],
        pal,
        disposals=[1, 3, 0],
        offsets=[(0, 0), (1, 1), (0, 0)],
    )
    frames, _ = decode_gif_animation(data)
    assert np.array_equal(frames[1][1:3, 1:3, :3], pal[overlay])
    # frame 2: overlay restored away, only the 1x1 tail differs from base
    want = frames[0].copy()
    want[0, 0, :3] = pal[2]
    assert np.array_equal(frames[2], want)


def test_gif_every_n_sampling_includes_frame_zero():
    data, _, _ = _gif_case()
    all_frames, _ = decode_gif_animation(data)
    sampled, delays = decode_gif_animation(data, every_n=2)
    assert len(delays) == 3  # delays always full-length
    assert len(sampled) == 2
    assert np.array_equal(sampled[0], all_frames[0])
    assert np.array_equal(sampled[1], all_frames[2])


def test_still_decoders_refuse_animations_by_name():
    gif_anim = synthesize_gif_animation(1)
    with pytest.raises(ValueError, match="animation"):
        decode_gif(gif_anim)
    webp_anim = synthesize_webp_animation(1)
    with pytest.raises(ValueError, match="animation"):
        decode_webp(webp_anim)


def test_webp_blend_dispose_and_overwrite():
    rng = np.random.default_rng(3)
    f0 = rng.integers(0, 256, (24, 32, 3), np.uint8)
    f1 = rng.integers(0, 256, (12, 16, 3), np.uint8)
    f2 = rng.integers(0, 256, (24, 32, 3), np.uint8)
    stills = [encode_webp_lossless(a.shape[1], a.shape[0], a) for a in (f0, f1, f2)]
    anim = encode_webp_animation(
        stills,
        offsets=[(0, 0), (4, 6), (0, 0)],
        durations=[40, 80, 120],
        blends=[True, True, False],
        disposals=[False, True, False],
    )
    frames, durs = decode_webp_animation(anim)
    assert durs == [40, 80, 120]
    c0 = np.dstack([f0, np.full((24, 32), 255, np.uint8)])
    assert np.array_equal(frames[0], c0)
    c1 = c0.copy()
    c1[6:18, 4:20, :3] = f1  # opaque blend == overwrite
    assert np.array_equal(frames[1], c1)
    c2 = np.dstack([f2, np.full((24, 32), 255, np.uint8)])
    assert np.array_equal(frames[2], c2)


def test_webp_fractional_alpha_blend_integer_formula():
    """The exact integer blend contract (round-half-up on the spec's
    non-premultiplied formula) — verified against an independent
    elementwise evaluation."""
    from setup_harvest_action_spark.functions.webp_codec import (
        _blend_frame,
    )

    rng = np.random.default_rng(11)
    dst = rng.integers(0, 256, (5, 7, 4), np.uint8)
    src = rng.integers(0, 256, (5, 7, 4), np.uint8)
    canvas = dst.copy()
    _blend_frame(canvas, src)
    for yy in range(5):
        for xx in range(7):
            sa, da = int(src[yy, xx, 3]), int(dst[yy, xx, 3])
            a_num = 255 * sa + da * (255 - sa)
            assert canvas[yy, xx, 3] == (a_num + 127) // 255
            for c in range(3):
                num = 255 * sa * int(src[yy, xx, c]) + da * (255 - sa) * int(
                    dst[yy, xx, c]
                )
                want = (num + a_num // 2) // a_num if a_num else 0
                assert canvas[yy, xx, c] == want, (yy, xx, c)


def test_synthesized_pipeline_payload_invariants():
    """The catalog pipelines' synthesizers: deterministic payloads,
    stable composited output across calls, expected frame counts."""
    g1, d1 = decode_gif_animation(synthesize_gif_animation(5))
    g2, d2 = decode_gif_animation(synthesize_gif_animation(5))
    assert d1 == d2 and len(g1) == 5
    assert all(np.array_equal(a, b) for a, b in zip(g1, g2))
    w1, u1 = decode_webp_animation(synthesize_webp_animation(5))
    w2, u2 = decode_webp_animation(synthesize_webp_animation(5))
    assert u1 == u2 and len(w1) == 4
    assert all(np.array_equal(a, b) for a, b in zip(w1, w2))
    # distinct docs decode to distinct composites
    other, _ = decode_gif_animation(synthesize_gif_animation(6))
    assert not np.array_equal(g1[0], other[0])


@pytest.mark.parametrize("fmt", ["gif_anim", "webp_anim"])
def test_animation_truncations_fail_cleanly_or_consistently(fmt):
    blob = (
        synthesize_gif_animation(3)
        if fmt == "gif_anim"
        else synthesize_webp_animation(3)
    )
    decode = (
        decode_gif_animation if fmt == "gif_anim" else decode_webp_animation
    )
    baseline, _ = decode(blob)
    for cut in range(12, len(blob), max(1, len(blob) // 200)):
        try:
            out, _ = decode(blob[:cut])
        except CLEAN_FAILURES:
            continue
        except Exception as exc:  # pragma: no cover — the bug class
            raise AssertionError(
                f"{fmt} truncated at {cut}: unclean {type(exc).__name__}: {exc}"
            )
        # a successful prefix decode (e.g. trailer cut) must emit
        # canvas-shaped frames, never more than the full animation
        assert out and out[0].shape == baseline[0].shape
        assert len(out) <= len(baseline)


@pytest.mark.parametrize("fmt", ["gif_anim", "webp_anim"])
def test_animation_bitflips_never_hang_or_crash_uncleanly(fmt):
    blob = bytearray(
        synthesize_gif_animation(3)
        if fmt == "gif_anim"
        else synthesize_webp_animation(3)
    )
    decode = (
        decode_gif_animation if fmt == "gif_anim" else decode_webp_animation
    )
    rng = random.Random(4242)
    for _ in range(150):
        i = rng.randrange(len(blob))
        bit = 1 << rng.randrange(8)
        blob[i] ^= bit
        try:
            frames, delays = decode(bytes(blob))
            assert frames and all(
                isinstance(f, np.ndarray) and f.ndim == 3 for f in frames
            )
        except CLEAN_FAILURES:
            pass
        finally:
            blob[i] ^= bit


def _anim_pair(plan):
    """Encode one frame PLAN as BOTH an animated GIF and an animated
    WebP (lossless stills) and return both composited sequences.
    ``plan`` = (palette, [(indices, offset, dispose_clear)])."""
    pal, frames = plan
    gif = encode_gif_animation(
        [f for f, _, _ in frames],
        pal,
        delays=[7 * (i + 1) for i in range(len(frames))],
        # GIF: 1 = keep, 2 = restore-background (clear rect)
        disposals=[2 if clear else 1 for _, _, clear in frames],
        offsets=[off for _, off, _ in frames],
        screen=(12, 10),
    )
    stills = [
        encode_webp_lossless(
            f.shape[1], f.shape[0], pal[f], palette=True
        )
        for f, _, _ in frames
    ]
    webp = encode_webp_animation(
        stills,
        offsets=[off for _, off, _ in frames],
        durations=[70 * (i + 1) for i in range(len(frames))],
        blends=[False] * len(frames),  # overwrite = GIF opaque render
        disposals=[clear for _, _, clear in frames],
        canvas=(12, 10),
    )
    g_frames, g_delays = decode_gif_animation(gif)
    w_frames, w_durs = decode_webp_animation(webp)
    return (g_frames, g_delays), (w_frames, w_durs)


def test_cross_format_composite_equality_full_frames():
    """The r14 verdict's #6: where the GIF89a and WebP animation
    models coincide (opaque frames, overwrite render, keep disposal),
    the two compositors must produce IDENTICAL full-canvas RGBA
    sequences from the same frame plan — each format's compositor
    cross-oracles the other, covering the gap libwebpdemux's absence
    leaves in the system A/B."""
    rng = np.random.default_rng(31)
    pal = rng.integers(0, 256, (8, 3), np.uint8)
    frames = [
        (rng.integers(0, 8, (10, 12)).astype(np.uint8), (0, 0), False)
        for _ in range(3)
    ]
    (gf, gd), (wf, wd) = _anim_pair((pal, frames))
    assert len(gf) == len(wf) == 3
    for a, b in zip(gf, wf):
        assert a.shape == b.shape == (10, 12, 4)
        assert (a == b).all()
        assert (a[..., 3] == 255).all()
    # timebases: GIF centiseconds vs WebP milliseconds, same plan
    assert [d * 10 for d in gd] == wd


def test_cross_format_composite_equality_partial_and_dispose():
    """Same cross-oracle over the harder shared subset: partial
    frames at (even) offsets and clear-to-background disposal — the
    transparent regions outside painted rectangles and the cleared
    rectangles must agree byte-for-byte too."""
    rng = np.random.default_rng(32)
    pal = rng.integers(0, 256, (8, 3), np.uint8)
    plan = (
        pal,
        [
            (rng.integers(0, 8, (10, 12)).astype(np.uint8), (0, 0), False),
            # partial frame, cleared back to transparent after emit
            (rng.integers(0, 8, (4, 6)).astype(np.uint8), (4, 2), True),
            # partial frame painted over the hole the clear left
            (rng.integers(0, 8, (2, 4)).astype(np.uint8), (0, 0), False),
        ],
    )
    (gf, _), (wf, _) = _anim_pair(plan)
    assert len(gf) == len(wf) == 3
    for i, (a, b) in enumerate(zip(gf, wf)):
        assert (a == b).all(), i
    # the disposal hole is visible in frame 2 of both formats
    assert (gf[2][2:6, 4:10, 3] == 0).any()
