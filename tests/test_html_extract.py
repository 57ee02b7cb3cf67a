"""HTML → text extraction (functions/html_extract.py): the oracle
construction (main_text recovers the embedded article exactly), the
boilerplate rules one by one, metadata, parser robustness on malformed
input, and — where libxml2 is present — the parsing-layer A/B from
tools/html_ab.py inline on a sample."""

from __future__ import annotations

import random

import pytest

from setup_harvest_action_spark.functions.html_extract import (
    MAX_LINK_DENSITY,
    MIN_BLOCK_CHARS,
    _norm_ws,
    block_stats,
    html_metadata,
    html_to_text,
    main_text,
    parse_blocks,
    synthesize_page,
)


def test_main_text_recovers_embedded_article_exactly():
    """The q_text_html_extract oracle construction: for any article
    text, the synthesized page's extraction equals the normalized
    original — nav/ads/related/footer all removed, article intact."""
    texts = [
        "window merge spark batch table join line agg small stream " * 5,
        "short words " * 4 + "ending tail",
        "  leading and   irregular\t\twhitespace  collapses   fine  ",
        "special chars survive escaping: a & b < c > d 'quote' \"dq\"",
    ]
    for i, t in enumerate(texts):
        page = synthesize_page(i, t, lang="en")
        assert main_text(page) == _norm_ws(t), i


def test_metadata_extraction():
    page = synthesize_page(42, "some body text here that is long enough",
                           lang="de")
    meta = html_metadata(page)
    assert meta["title"] == "Document 42 — Corpus Viewer"
    assert meta["lang"] == "de"
    assert meta["canonical"] == "https://corpus.example/doc/42"
    assert meta["meta_description"] == "Synthetic crawl page for doc 42"


def test_boilerplate_rules_individually():
    # nav/header/footer/aside ancestors drop regardless of length
    page = (
        "<html><body>"
        "<nav><p>this navigation text is plenty long to pass the "
        "length gate but must drop anyway</p></nav>"
        "<p>genuine article content that is long enough to be kept "
        "by the length rule</p>"
        "<div><a href='/a'>pure link farm block with only anchor "
        "text inside it</a></div>"
        "<p>tiny</p>"
        "</body></html>"
    )
    out = main_text(page)
    assert "genuine article content" in out
    assert "navigation" not in out  # boiler ancestor
    assert "link farm" not in out  # link density 1.0
    assert "tiny" not in out  # under MIN_BLOCK_CHARS
    blocks, _ = parse_blocks(page)
    by_text = {b["text"][:10]: b for b in blocks}
    assert by_text["this navig"]["boiler_ancestor"]
    assert by_text["pure link "]["link_density"] >= MAX_LINK_DENSITY
    assert by_text["tiny"]["n_chars"] < MIN_BLOCK_CHARS


def test_mixed_link_density_block_survives():
    body = (
        "intro text before the anchor <a href='/x'>link</a> and a lot "
        "more prose after it so the density stays low"
    )
    page = f"<html><body><p>{body}</p></body></html>"
    assert "intro text" in main_text(page)
    blocks, _ = parse_blocks(page)
    assert 0 < blocks[0]["link_density"] < MAX_LINK_DENSITY


def test_heading_survives_beside_kept_block_only():
    keep = (
        "<html><body><h2>Short head</h2><p>long enough paragraph body "
        "to survive the extractor's length gate</p></body></html>"
    )
    assert main_text(keep).startswith("Short head")
    alone = "<html><body><h2>Short head</h2></body></html>"
    assert main_text(alone) == ""  # a heading alone is not an article


def test_html_to_text_includes_boilerplate():
    page = synthesize_page(1, "article body long enough to be kept here",
                           lang="en")
    full = html_to_text(page)
    assert "Terms of Service" in full  # footer present in the full text
    assert "article body" in full
    assert "color: red" not in full  # style stripped
    assert "tracker" not in full  # script stripped


def test_entity_and_script_handling():
    page = (
        "<html><body><script>var x = '<p>fake</p>';</script>"
        "<p>Fish &amp; chips &#64; caf&eacute; &#x41;1 long enough "
        "to keep</p></body></html>"
    )
    out = main_text(page)
    assert "Fish & chips @ café A1" in out
    assert "fake" not in out


def test_malformed_html_never_raises():
    """Crawl contract: html.parser error-recovers; every prefix and
    every bitflip yields a str (possibly empty), never an exception."""
    page = synthesize_page(7, "sturdy article body text repeated " * 8,
                           lang="en")
    for cut in range(0, len(page), max(1, len(page) // 150)):
        out = main_text(page[:cut])
        assert isinstance(out, str)
    rng = random.Random(99)
    blob = list(page)
    for _ in range(150):
        i = rng.randrange(len(blob))
        old = blob[i]
        blob[i] = chr(rng.randrange(32, 127))
        out = main_text("".join(blob))
        assert isinstance(out, str)
        blob[i] = old
    # pathological nesting depth stays linear (no recursion)
    deep = "<div>" * 5000 + "x" + "</div>" * 5000
    assert isinstance(html_to_text(deep), str)
    # valueless attributes (the r14 advice item): '<meta name content=x>'
    # parses name=None — must not raise, and must not claim metadata
    from setup_harvest_action_spark.functions.html_extract import parse_blocks

    _, meta = parse_blocks(
        "<html><head><meta name content='x'><link rel href='/c'>"
        "</head><body><p>body text</p></body></html>"
    )
    assert meta.meta_description is None
    assert meta.canonical is None
    _, meta2 = parse_blocks(
        "<meta name=description content='real'><link rel=canonical href='/c'>"
    )
    assert meta2.meta_description == "real"
    assert meta2.canonical == "/c"


def test_block_stats_shape():
    page = synthesize_page(3, "stats article body long enough " * 6,
                           lang="en")
    st = block_stats(page)
    assert st["n_kept"] >= 1
    assert 0 < st["kept_char_ratio"] <= 1
    assert st["boiler_char_ratio"] > 0  # nav/footer text measured
    assert st["linkheavy_char_ratio"] > 0  # the related-links farm


def test_parsing_layer_matches_libxml2_when_present():
    try:
        from tools.html_ab import libxml_text
    except OSError:  # pragma: no cover — libxml2 absent
        pytest.skip("libxml2 not available")
    for d in (0, 5):
        page = synthesize_page(d, "cross parser agreement body " * 10,
                               lang="en")
        assert html_to_text(page) == libxml_text(page)
