"""Regenerate ``functions/vp8_tables.py`` — the RFC 6386 normative
constant tables the lossy-VP8 decoder needs.

The tables (default coefficient probabilities §13.5, coefficient-
update probabilities §13.4, key-frame intra-bmode probabilities
§11.5, dequantization lookups §14.1, coefficient bands §13.3, zigzag
§14.4) are fixed by the spec — every conforming codec carries them
verbatim.  Rather than hand-typing 3.4 KB of digits (one typo = a
desynced boolean decoder), this script reads them out of the system
libwebp (a conforming implementation, BSD-licensed) and emits them as
Python literals; the decoder's end-to-end byte-equality against
libwebp's own output (tests/test_llm_functions.py) then proves the
extraction AND the decode logic together.

Run: python tools/extract_vp8_tables.py [path-to-libwebp.so]
"""

from __future__ import annotations

import struct
import sys

SO = (
    sys.argv[1]
    if len(sys.argv) > 1
    else "/usr/lib/x86_64-linux-gnu/libwebp.so.7"
)
OUT = "setup_harvest_action_spark/functions/vp8_tables.py"

# Anchors: short normative prefixes (RFC 6386 text) that locate each
# table inside .rodata; lengths come from the spec's array shapes.
ZIGZAG = (0, 1, 4, 8, 5, 2, 3, 6, 9, 12, 13, 10, 7, 11, 14, 15)
BANDS_PREFIX = bytes((0, 1, 2, 3, 6, 4, 5, 6))  # §13.3 coeff bands
BMODE_PREFIX = bytes((231, 120, 48, 89, 115, 113, 120, 152, 112))
COEFF_ROW1 = bytes((253, 136, 254, 255, 228, 219, 128))


def main() -> None:
    with open(SO, "rb") as fh:
        blob = fh.read()

    bands_at = blob.find(BANDS_PREFIX)
    bands = list(blob[bands_at : bands_at + 16])
    assert bands[-1] == 7, bands

    # dequant lookups sit just before the bands in libwebp's quant unit:
    # kDcTable (u8[128], ends 157) directly precedes the bands,
    # kAcTable (u16[128], 4..284) precedes it.
    dc = list(blob[bands_at - 128 : bands_at])
    assert dc[0] == 4 and dc[-1] == 157 and all(
        dc[i] <= dc[i + 1] for i in range(127)
    ), dc
    ac_at = blob.find(struct.pack("<8H", 4, 5, 6, 7, 8, 9, 10, 11))
    ac = list(struct.unpack_from("<128H", blob, ac_at))
    assert ac[-1] == 284 and all(ac[i] <= ac[i + 1] for i in range(127))

    bmode_at = blob.find(BMODE_PREFIX)
    bmode = list(blob[bmode_at : bmode_at + 900])
    assert all(1 <= b <= 255 for b in bmode)

    # CoeffsProba0 [4][8][3][11]: starts with three all-128 rows (type
    # 0 / band 0), the anchor row is type 0 / band 1 / ctx 0
    row1_at = blob.find(COEFF_ROW1, bmode_at)
    coeffs_at = row1_at - 33
    coeffs = list(blob[coeffs_at : coeffs_at + 1056])
    assert coeffs[:33] == [128] * 33 and all(1 <= b <= 255 for b in coeffs)

    # CoeffsUpdateProba [4][8][3][11]: the mostly-255 block that ends
    # right where kBModesProba starts
    upd = list(blob[bmode_at - 1056 : bmode_at])
    assert upd.count(255) > 800 and all(b >= 128 for b in upd), (
        upd.count(255),
        min(upd),
    )

    def fmt(name: str, vals, per_line: int = 16) -> str:
        lines = [f"{name} = ("]
        for i in range(0, len(vals), per_line):
            lines.append(
                "    " + ", ".join(str(v) for v in vals[i : i + per_line]) + ","
            )
        lines.append(")")
        return "\n".join(lines)

    doc = (
        '"""RFC 6386 normative constant tables (generated — see\n'
        "tools/extract_vp8_tables.py for provenance and regeneration).\n"
        "\n"
        "Flat tuples; the decoder indexes them with the spec's array\n"
        "shapes: COEFF_PROBS/COEFF_UPDATE_PROBS are [4][8][3][11],\n"
        'KF_BMODE_PROBS is [10][10][9]."""'
    )
    body = "\n\n".join(
        [
            doc,
            fmt("DC_QLOOKUP", dc) + "  # §14.1, u8[128]",
            fmt("AC_QLOOKUP", ac) + "  # §14.1, u16[128]",
            fmt("COEFF_BANDS", bands) + "  # §13.3",
            fmt("ZIGZAG", list(ZIGZAG)) + "  # §14.4",
            fmt("COEFF_PROBS", coeffs, 11) + "  # §13.5 [4][8][3][11]",
            fmt("COEFF_UPDATE_PROBS", upd, 11) + "  # §13.4 [4][8][3][11]",
            fmt("KF_BMODE_PROBS", bmode, 9) + "  # §11.5 [10][10][9]",
            "",
        ]
    )
    with open(OUT, "w", encoding="utf-8") as fh:
        fh.write(body)
    print(f"wrote {OUT}: dc[{len(dc)}] ac[{len(ac)}] bands[{len(bands)}] "
          f"coeffs[{len(coeffs)}] upd[{len(upd)}] bmode[{len(bmode)}]")


if __name__ == "__main__":
    main()
