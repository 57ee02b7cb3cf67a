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


# --- WAV compressed codecs: block-boundary fuzz + stereo ADPCM pin ----------
#
# The r13 verdict's #6 ask: ADPCM decoders break at block_align edges
# (mid-header cuts, partial nibble groups, last-block truncation), and
# stereo IMA interleave (4-byte groups alternating channels within a
# block) is where independent implementations diverge.  Pins below:
# stereo nibble-exact vs CPython's audioop (per-channel streams), and
# the truncation contract — trailing partial blocks are IGNORED
# (libsndfile behavior), so cuts inside the last block must shorten
# output by exactly one block, never corrupt or crash.


def _wav_container(codec, channels, block_align, bits, data):
    body = struct.pack(
        "<HHIIHH", codec, channels, 8000, 8000, block_align, bits
    )
    return (
        b"RIFF" + struct.pack("<I", 0) + b"WAVE"
        + b"fmt " + struct.pack("<I", len(body)) + body
        + b"data" + struct.pack("<I", len(data)) + data
    )


def _adpcm_blocks(channels: int, n_blocks: int, ba: int, seed: int):
    rng = np.random.default_rng(seed)
    blocks, hdrs = b"", []
    for _ in range(n_blocks):
        blk = b""
        states = []
        for _c in range(channels):
            pred = int(rng.integers(-30000, 30000))
            idx = int(rng.integers(0, 89))
            blk += struct.pack("<hBB", pred, idx, 0)
            states.append((pred, idx))
        body = bytes(
            rng.integers(0, 256, ba - 4 * channels, dtype=np.uint8)
        )
        blk += body
        blocks += blk
        hdrs.append((states, body))
    return blocks, hdrs


def test_stereo_ima_adpcm_nibble_exact_vs_audioop():
    """Stereo IMA ADPCM: data bytes alternate 4-byte groups per
    channel within each block.  De-interleave each channel's nibble
    stream and drive audioop.adpcm2lin per channel (nibble-swapped —
    audioop reads HIGH nibble first); the engine's interleaved output
    must match sample-for-sample, and decode_wav's mono downmix must
    equal the channel mean of that exact reference."""
    from setup_harvest_action_spark.functions.multimodal import (
        _ima_adpcm_decode,
        decode_wav,
    )

    channels, ba, n_blocks = 2, 72, 3  # 72 = 8 hdr + 64 data bytes
    blocks, hdrs = _adpcm_blocks(channels, n_blocks, ba, seed=909)
    ours = _ima_adpcm_decode(blocks, channels, ba)
    samples_per_block = 1 + (ba - 4 * channels) // (4 * channels) * 8
    assert ours.shape == (samples_per_block * n_blocks * channels,)

    try:
        import warnings

        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            import audioop
    except ImportError:
        audioop = None

    want_blocks = []
    for states, body in hdrs:
        per_chan = []
        for c in range(channels):
            # channel c's 4-byte groups, in block order
            stream = b"".join(
                body[g : g + 4]
                for g in range(4 * c, len(body), 4 * channels)
            )
            pred, idx = states[c]
            if audioop is not None:
                swapped = bytes(
                    ((x & 0xF) << 4) | (x >> 4) for x in stream
                )
                ref, _ = audioop.adpcm2lin(swapped, 2, (pred, idx))
                per_chan.append(
                    [pred] + list(np.frombuffer(ref, "<i2"))
                )
            else:  # pragma: no cover — audioop removed (3.13)
                per_chan.append(None)
        if audioop is not None:
            want_blocks.append(
                np.stack([np.array(c0) for c0 in per_chan], axis=1)
            )
    if audioop is not None:
        want = np.concatenate(want_blocks).reshape(-1)
        assert np.array_equal(ours, want)
        # decode_wav downmix = channel mean of the same reference
        wav = _wav_container(0x11, channels, ba, 4, blocks)
        _, mono = decode_wav(wav)
        ref_mono = np.clip(
            want.reshape(-1, channels).mean(axis=1).astype(np.int32),
            -32768, 32767,
        ).astype(np.int16)
        assert np.array_equal(mono, ref_mono)


@pytest.mark.parametrize("channels,ba", [(1, 36), (2, 72)])
def test_ima_adpcm_truncation_at_block_boundaries(channels, ba):
    """Cuts at and around block edges: a cut INSIDE block k drops
    blocks k.. entirely (trailing-partial-block rule) — output equals
    the full decode's prefix; a cut before one full block raises
    cleanly."""
    from setup_harvest_action_spark.functions.multimodal import (
        decode_wav,
    )

    n_blocks = 3
    blocks, _ = _adpcm_blocks(channels, n_blocks, ba, seed=311)
    spb = 1 + (ba - 4 * channels) // (4 * channels) * 8  # per channel
    full = decode_wav(_wav_container(0x11, channels, ba, 4, blocks))[1]
    for k in range(1, n_blocks + 1):
        for delta in (-4 * channels, -3, -1, 0):
            cut = k * ba + delta
            if cut <= 0:
                continue
            data = blocks[:cut]
            whole = cut // ba
            if whole == 0:
                with pytest.raises(CLEAN_FAILURES):
                    decode_wav(_wav_container(0x11, channels, ba, 4, data))
                continue
            out = decode_wav(
                _wav_container(0x11, channels, ba, 4, data)
            )[1]
            assert out.shape == (spb * whole,), (k, delta)
            assert np.array_equal(out, full[: spb * whole]), (k, delta)


@pytest.mark.parametrize(
    "codec,channels,ba,bits",
    [(0x11, 1, 36, 4), (0x11, 2, 72, 4), (7, 1, 1, 8), (6, 2, 2, 8)],
)
def test_wav_compressed_bitflips_never_crash_uncleanly(
    codec, channels, ba, bits
):
    """Bitflips anywhere in a compressed-WAV container (headers
    included) either decode to well-formed int16 mono or raise a clean
    failure — never hang, never crash uncleanly.  ADPCM flips land in
    predictors/step indexes/nibbles; G.711 flips are always decodable
    bytes, so corruption there must SUCCEED with the same shape."""
    from setup_harvest_action_spark.functions.multimodal import (
        decode_wav,
    )

    if codec == 0x11:
        data, _ = _adpcm_blocks(channels, 2, ba, seed=501)
    else:
        rng = np.random.default_rng(502)
        data = bytes(rng.integers(0, 256, 256 * channels, dtype=np.uint8))
    blob = bytearray(_wav_container(codec, channels, ba, bits, data))
    base = decode_wav(bytes(blob))[1]
    data_start = len(blob) - len(data)
    rng = random.Random(1717)
    for _ in range(200):
        i = rng.randrange(len(blob))
        bit = 1 << rng.randrange(8)
        blob[i] ^= bit
        try:
            _, out = decode_wav(bytes(blob))
            assert isinstance(out, np.ndarray) and out.dtype == np.int16
            if codec in (6, 7) and i >= data_start:
                # G.711: every byte decodes; a payload flip keeps shape
                assert out.shape == base.shape
        except CLEAN_FAILURES:
            pass
        finally:
            blob[i] ^= bit


def test_g711_truncation_every_prefix():
    """G.711 is byte-aligned: every data prefix decodes to exactly
    that many samples — no partial-block rule, no failure mode."""
    from setup_harvest_action_spark.functions.multimodal import (
        decode_wav,
    )

    allb = bytes(range(256))
    full = decode_wav(_wav_container(7, 1, 1, 8, allb))[1]
    for cut in (1, 2, 7, 100, 255):
        out = decode_wav(_wav_container(7, 1, 1, 8, allb[:cut]))[1]
        assert np.array_equal(out, full[:cut])
