"""Regenerate ``functions/vp8_fixtures.py`` — REAL lossy-VP8 WebP
payloads for the decode pipeline and its tests.

The repo's VP8 *decoder* is pure Python (functions/vp8_codec.py); it
has no encoder twin (writing a rate-controlled lossy encoder is out of
scope — the corpus problem is reading the web's files, not writing
them).  Fixtures are therefore encoded ONCE here with the system
libwebp — real conformant bitstreams, not synthetic approximations —
and embedded base64 so the catalog query and pytest run without
libwebp installed.  Each fixture carries the md5 of its decoded
(y, u, v) planes; tools/vp8_ab.py verified the decoder byte-exact
against libwebp on 324 configurations, so these hashes pin conformant
output, not self-consistency.

Run: python tools/gen_vp8_fixtures.py   (needs libwebp.so)
"""

from __future__ import annotations

import base64
import hashlib
import sys

sys.path.insert(0, ".")

OUT = "setup_harvest_action_spark/functions/vp8_fixtures.py"


def main() -> None:
    import numpy as np

    from setup_harvest_action_spark.functions.vp8_codec import (
        decode_webp_lossy,
    )
    from tools.vp8_ab import encode_adv, encode_rgb, test_image

    def photo(w, h, seed):
        yy, xx = np.mgrid[0:h, 0:w]
        rng = np.random.RandomState(seed)
        base = (128 + 90 * np.sin(xx / 9.0) * np.cos(yy / 7.0)).astype(int)
        chan = lambda b: np.clip(  # noqa: E731
            b + rng.randint(-9, 10, (h, w)), 0, 255
        ).astype(np.uint8)
        return np.dstack([chan(base), chan(base[::-1]), chan(255 - base)])

    cases = [
        ("photo_q75", photo(64, 48, 1), dict(), 75.0),
        ("photo_q30", photo(64, 48, 2), dict(), 30.0),
        ("gradient_q90", test_image("gradient", 48, 48), dict(), 90.0),
        ("blocks_q50", test_image("blocks", 80, 48), dict(), 50.0),
        ("noise_q40", test_image("noise", 48, 32), dict(), 40.0),
        ("crop_q75", test_image("gradient", 33, 17), dict(), 75.0),
        (
            "simple_filter_q60",
            photo(64, 48, 3),
            dict(filter_type=0, filter_strength=80),
            60.0,
        ),
        (
            "parts8_seg1_q70",
            photo(96, 64, 4),
            dict(partitions=3, segments=1),
            70.0,
        ),
    ]
    rows = []
    for name, img, over, q in cases:
        data = encode_adv(img, q, **over) if over else encode_rgb(img, q)
        y, u, v = decode_webp_lossy(data)
        digest = hashlib.md5(
            y.tobytes() + u.tobytes() + v.tobytes()
        ).hexdigest()
        rows.append((name, data, y.shape[1], y.shape[0], digest))
        print(f"{name}: {len(data)} bytes, {y.shape[1]}x{y.shape[0]}, {digest}")

    with open(OUT, "w", encoding="utf-8") as fh:
        fh.write(
            '"""REAL lossy-VP8 WebP fixtures (generated — see\n'
            "tools/gen_vp8_fixtures.py for provenance/regeneration).\n"
            "\n"
            "Each entry: (payload base64, width, height, md5 of the\n"
            'decoded y+u+v planes — conformance-pinned, see generator)."""\n'
            "\n"
            "import base64\n"
            "\n"
            "VP8_FIXTURES = {\n"
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
            "    b64, _, _, _ = VP8_FIXTURES[name]\n"
            "    return base64.b64decode(b64)\n"
        )
    print(f"wrote {OUT} with {len(rows)} fixtures")


if __name__ == "__main__":
    main()
