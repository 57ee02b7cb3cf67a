"""Regenerate ``functions/jpeg_arith_fixtures.py`` — REAL
arithmetic-coded JPEG payloads (sequential SOF9 and progressive
SOF10) plus their Huffman twins (SOF0 / SOF2).

Each pair is the SAME image encoded by the system libjpeg at the same
quality/sampling — identical quantized-coefficient stream, different
entropy layer — so the repo's Huffman decoder is the conformance
oracle for the arithmetic decoder: both must decode to byte-identical
pixels.  Embedded base64 so the catalog query and pytest run without
libjpeg installed; each entry carries the md5 of the decoded pixels.

Run: python tools/gen_jpeg_arith_fixtures.py   (needs libjpeg.so)
"""

from __future__ import annotations

import base64
import hashlib
import sys

sys.path.insert(0, ".")

OUT = "setup_harvest_action_spark/functions/jpeg_arith_fixtures.py"


def main() -> None:
    import numpy as np

    from setup_harvest_action_spark.functions.multimodal import decode_jpeg
    from tools.jpeg_arith_ab import encode_jpeg_libjpeg

    def photo(w, h, seed):
        yy, xx = np.mgrid[0:h, 0:w]
        rng = np.random.RandomState(seed)
        base = (128 + 90 * np.sin(xx / 9.0) * np.cos(yy / 7.0)).astype(int)
        chan = lambda b: np.clip(  # noqa: E731
            b + rng.randint(-9, 10, (h, w)), 0, 255
        ).astype(np.uint8)
        return np.dstack([chan(base), chan(base[::-1]), chan(255 - base)])

    yy, xx = np.mgrid[0:48, 0:64]
    cases = [
        ("photo_q75", photo(64, 48, 1), 75),
        ("photo_q30", photo(64, 48, 2), 30),
        ("gradient_q90",
         np.dstack([(xx * 4) % 256, (yy * 5) % 256, (xx + yy) % 256])
         .astype(np.uint8), 90),
        ("noise_q40",
         np.random.RandomState(9).randint(0, 256, (32, 48, 3))
         .astype(np.uint8), 40),
        ("gray_q60",
         (128 + 100 * np.sin(xx / 4.0) * np.cos(yy / 5.0))
         .astype(np.uint8), 60),
        ("crop_q75", photo(33, 17, 4), 75),
    ]
    # progressive-arithmetic (SOF10) pairs: twin = progressive Huffman
    prog_cases = [
        ("prog_photo_q75", photo(64, 48, 5), 75),
        ("prog_gray_q60",
         (128 + 100 * np.sin(xx / 4.0) * np.cos(yy / 5.0))
         .astype(np.uint8), 60),
    ]
    # 4:2:0 pairs (r12): the layout virtually every camera/web JPEG
    # uses — sequential and progressive, twin-validated like the rest
    sub_cases = [
        ("sub420_photo_q75", photo(64, 48, 6), 75),
        ("sub420_prog_photo_q75", photo(70, 46, 7), 75),
    ]
    rows = []
    for name, img, q in cases + prog_cases + sub_cases:
        prog = "prog" in name
        if name.startswith("sub420_"):
            from tools.jpeg_arith_ab import encode_jpeg_libjpeg_subsampled

            ari = encode_jpeg_libjpeg_subsampled(
                img, q, arith=True, progressive=prog, hs=2, vs=2
            )
            huf = encode_jpeg_libjpeg_subsampled(
                img, q, arith=False, progressive=prog, hs=2, vs=2
            )
            a = decode_jpeg(ari)
            assert np.array_equal(a, decode_jpeg(huf)), name
            digest = hashlib.md5(a.tobytes()).hexdigest()
            rows.append((name, ari, huf, a.shape[1], a.shape[0], digest))
            print(f"{name}: arith {len(ari)} B vs huffman {len(huf)} B, {digest}")
            continue
        ari = encode_jpeg_libjpeg(img, q, arith=True, progressive=prog)
        huf = encode_jpeg_libjpeg(img, q, arith=False, progressive=prog)
        a = decode_jpeg(ari)
        h_ = decode_jpeg(huf)
        assert np.array_equal(a, h_), name  # entropy-layer conformance
        digest = hashlib.md5(a.tobytes()).hexdigest()
        rows.append((name, ari, huf, a.shape[1], a.shape[0], digest))
        print(f"{name}: arith {len(ari)} B vs huffman {len(huf)} B, {digest}")

    with open(OUT, "w", encoding="utf-8") as fh:
        fh.write(
            '"""REAL arithmetic-JPEG (SOF9) fixtures + Huffman twins\n'
            "(generated — see tools/gen_jpeg_arith_fixtures.py).\n"
            "\n"
            "Each entry: (arith b64, huffman-twin b64, width, height,\n"
            'md5 of the decoded RGB — twin-equality-pinned)."""\n'
            "\n"
            "import base64\n"
            "\n"
            "JPEG_ARITH_FIXTURES = {\n"
        )
        for name, ari, huf, w, h, digest in rows:
            fh.write(f'    "{name}": (\n')
            for blob in (ari, huf):
                b64 = base64.b64encode(blob).decode()
                for i in range(0, len(b64), 68):
                    fh.write(f'        "{b64[i:i + 68]}"\n')
                fh.write("        ,\n")
            fh.write(f'        {w}, {h}, "{digest}"),\n')
        fh.write(
            "}\n"
            "\n"
            "\n"
            "def fixture_pair(name: str) -> tuple[bytes, bytes]:\n"
            '    """(arithmetic payload, Huffman twin payload)."""\n'
            "    a64, h64, _, _, _ = JPEG_ARITH_FIXTURES[name]\n"
            "    return base64.b64decode(a64), base64.b64decode(h64)\n"
        )
    print(f"wrote {OUT} with {len(rows)} fixture pairs")


if __name__ == "__main__":
    main()
