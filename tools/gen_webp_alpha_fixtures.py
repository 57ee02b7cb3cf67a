"""Regenerate ``functions/webp_alpha_fixtures.py`` — REAL VP8X WebP
payloads (ALPH alpha plane over a lossy VP8 base, plus a
VP8L-with-alpha lossless case) for the decode pipeline and its tests.

Same provenance discipline as tools/gen_vp8_fixtures.py: fixtures are
encoded ONCE here with the system libwebp — real conformant
containers, not synthetic approximations — and embedded base64 so the
catalog query and pytest run without libwebp installed.  Two
hand-built raw-ALPH cases force the vertical and gradient row filters
the encoder rarely emits; libwebp itself decodes those same bytes in
tools/webp_alpha_ab.py, so they are conformance-pinned too, not
self-consistent.  Each fixture carries the md5 of the decoded RGBA
array; tools/webp_alpha_ab.py verified the decoder byte-exact against
libwebp (alpha plane + YUV planes + lossless RGBA) on 180
configurations before these hashes were recorded.

Run: python tools/gen_webp_alpha_fixtures.py   (needs libwebp.so)
"""

from __future__ import annotations

import base64
import hashlib
import sys

sys.path.insert(0, ".")

OUT = "setup_harvest_action_spark/functions/webp_alpha_fixtures.py"


def main() -> None:
    from setup_harvest_action_spark.functions.webp_codec import decode_webp
    from tools.webp_alpha_ab import (
        alpha_image,
        encode_rgba,
        encode_rgba_adv,
        encode_rgba_lossless,
        synth_vp8x_alpha,
    )

    cases = []
    shapes = alpha_image("shapes", 64, 48)
    grad = alpha_image("gradient", 48, 40)
    noise = alpha_image("noise", 37, 29)
    cases.append(("alpha_shapes_q75", encode_rgba(shapes, 75.0)))
    cases.append(("alpha_noise_q40", encode_rgba(noise, 40.0)))
    cases.append(
        (
            "alpha_raw_q80",
            encode_rgba_adv(grad, 80.0, alpha_compression=0),
        )
    )
    cases.append(
        (
            "alpha_lossyalpha_q75",
            encode_rgba_adv(shapes, 75.0, alpha_quality=40),
        )
    )
    cases.append(("alpha_lossless", encode_rgba_lossless(grad)))
    # hand-built ALPH chunks pin the vertical / gradient row filters
    cases.append(
        ("alpha_filter_v", synth_vp8x_alpha(grad[:, :, :3], grad[:, :, 3], 2))
    )
    cases.append(
        (
            "alpha_filter_grad",
            synth_vp8x_alpha(shapes[:, :, :3], shapes[:, :, 3], 3),
        )
    )

    rows = []
    for name, data in cases:
        arr = decode_webp(data)
        assert arr.ndim == 3 and arr.shape[2] == 4, (name, arr.shape)
        digest = hashlib.md5(arr.tobytes()).hexdigest()
        rows.append((name, data, arr.shape[1], arr.shape[0], digest))
        print(f"{name}: {len(data)} bytes, {arr.shape[1]}x{arr.shape[0]}, {digest}")

    with open(OUT, "w", encoding="utf-8") as fh:
        fh.write(
            '"""REAL VP8X (alpha) WebP fixtures (generated — see\n'
            "tools/gen_webp_alpha_fixtures.py for provenance/regeneration).\n"
            "\n"
            "Each entry: (payload base64, width, height, md5 of the decoded\n"
            'RGBA array — conformance-pinned, see generator)."""\n'
            "\n"
            "import base64\n"
            "\n"
            "WEBP_ALPHA_FIXTURES = {\n"
        )
        for name, data, w, h, digest in rows:
            b64 = base64.b64encode(data).decode()
            fh.write(f'    "{name}": (\n')
            for i in range(0, len(b64), 68):
                fh.write(f'        "{b64[i:i + 68]}"\n')
            fh.write(f'        , {w}, {h}, "{digest}"),\n')
        fh.write(
            "}\n"
            "\n"
            "\n"
            "def fixture_payload(name: str) -> bytes:\n"
            "    b64, _, _, _ = WEBP_ALPHA_FIXTURES[name]\n"
            "    return base64.b64decode(b64)\n"
        )
    print(f"wrote {OUT}")


if __name__ == "__main__":
    main()
