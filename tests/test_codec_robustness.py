"""Decoder robustness on malformed inputs — a crawl-facing decoder's
second contract after correctness: truncated or bit-flipped payloads
must raise cleanly (never hang, never loop, never return a wrong
image silently for structural corruption).  Deterministic fuzz:
seeded corruption of valid fixtures, every byte-truncation prefix."""

from __future__ import annotations

import random
import struct
import zlib

import numpy as np
import pytest

from setup_harvest_action_spark.functions.multimodal import (
    decode_image_auto,
    synthesize_jpeg,
    synthesize_jpeg_progressive,
    synthesize_png,
    synthesize_png_palette,
    synthesize_tiff,
    synthesize_webp,
)

# exception classes a malformed payload may legitimately raise: the
# decoders' own ValueError, plus index/struct/zlib errors from
# truncation mid-structure.  Anything else (hang, SystemError,
# RecursionError) is a bug.
CLEAN_FAILURES = (
    ValueError,  # the decoders' own refusals (struct.error subclasses it)
    IndexError,
    KeyError,
    EOFError,
    OverflowError,
    struct.error,
    zlib.error,
    # a corrupted MAGIC makes the dispatcher fall through to the
    # honest PIL stub — also a clean, named failure
    NotImplementedError,
)


def _blobs():
    from setup_harvest_action_spark.functions.jpeg_arith_fixtures import (
        fixture_pair,
    )
    from setup_harvest_action_spark.functions.vp8_fixtures import (
        fixture_payload,
    )

    return {
        "jpeg": synthesize_jpeg(3),
        "progressive": synthesize_jpeg_progressive(3),
        "png": synthesize_png(3),
        "webp": synthesize_webp(3),
        # lossy VP8: arithmetic coding means corruption often decodes
        # to garbage "successfully" (libwebp behaves the same) — the
        # contract under fuzz is bounded termination + clean failures,
        # and the truncation shape-stability assert below
        "webp_lossy": fixture_payload("crop_q75"),
        # arithmetic JPEG (sequential + progressive): same
        # bounded-termination contract
        "jpeg_arith": fixture_pair("photo_q75")[0],
        "jpeg_arith_prog": fixture_pair("prog_photo_q75")[0],
        # 4:2:0 (r12): MCU-tiled layout under the same fuzz contract
        "jpeg_420": fixture_pair("sub420_photo_q75")[1],
        # r13 surface: VP8X alpha still, palette/interlaced PNG with
        # tRNS, interlaced GIF with local palette + transparency, and
        # baseline TIFF (LZW + predictor, multi-strip)
        "webp_alpha": _webp_alpha_blob(),
        "png_palette": synthesize_png_palette(3),
        "gif_surface": _gif_surface_blob(),
        "tiff": synthesize_tiff(5),
    }


def _webp_alpha_blob():
    from setup_harvest_action_spark.functions.webp_alpha_fixtures import (
        fixture_payload as _wa,
    )

    return _wa("alpha_shapes_q75")


def _gif_surface_blob():
    from setup_harvest_action_spark.functions.multimodal import (
        encode_gif_adv,
    )

    rng = np.random.default_rng(9)
    pal = rng.integers(0, 256, (16, 3), np.uint8)
    idx = rng.integers(0, 16, (24, 33)).astype(np.uint8)
    return encode_gif_adv(
        33, 24, idx, pal, interlace=True, local=True, transparent=2
    )


@pytest.mark.parametrize(
    "fmt",
    ["jpeg", "progressive", "png", "webp", "webp_lossy", "jpeg_arith",
     "jpeg_arith_prog", "jpeg_420", "webp_alpha", "png_palette",
     "gif_surface", "tiff"],
)
def test_truncations_fail_cleanly_or_not_at_all(fmt):
    blob = _blobs()[fmt]
    baseline = decode_image_auto(blob)
    # every strict prefix long enough to carry the magic bytes
    for cut in range(12, len(blob), max(1, len(blob) // 200)):
        try:
            out = decode_image_auto(blob[:cut])
        except CLEAN_FAILURES:
            continue
        except Exception as exc:  # pragma: no cover — the bug class
            raise AssertionError(
                f"{fmt} truncated at {cut}: unclean {type(exc).__name__}: {exc}"
            )
        # decoding may legitimately succeed near the end (trailing
        # padding / EOI optional) — but then it must match
        assert out.shape == baseline.shape, f"{fmt} truncated at {cut}"


@pytest.mark.parametrize(
    "fmt",
    ["jpeg", "progressive", "png", "webp", "webp_lossy", "jpeg_arith",
     "jpeg_arith_prog", "jpeg_420", "webp_alpha", "png_palette",
     "gif_surface", "tiff"],
)
def test_bitflips_never_hang_or_crash_uncleanly(fmt):
    blob = bytearray(_blobs()[fmt])
    rng = random.Random(4242)
    for _ in range(150):
        i = rng.randrange(len(blob))
        bit = 1 << rng.randrange(8)
        blob[i] ^= bit
        try:
            out = decode_image_auto(bytes(blob))
            # a surviving decode must still be a well-formed image
            assert isinstance(out, np.ndarray) and out.ndim == 3
        except CLEAN_FAILURES:
            pass
        finally:
            blob[i] ^= bit  # restore
