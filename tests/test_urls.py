"""URL canonicalization (functions/urls.py): golden pairs, the
idempotence property (canonical form is a fixed point), and variant
collapse — the engine side; cross-engine rule agreement is hash-gated
by q_text_url_canonicalize's DuckDB replay."""

from __future__ import annotations

import pytest

from setup_harvest_action_spark.functions.urls import canonicalize_url

GOLDEN = [
    ("HTTP://WWW.Example.COM:80/a/./b/?z=1&a=2#frag",
     "http://www.example.com/a/b/?a=2&z=1"),
    ("https://Example.com:443/", "https://example.com/"),
    ("https://example.com:8443/x", "https://example.com:8443/x"),
    ("http://example.com", "http://example.com/"),
    ("http://example.com/articles/.", "http://example.com/articles/"),
    ("http://User.Name@Example.COM/p", "http://User.Name@example.com/p"),
    ("http://example.com/p?", "http://example.com/p"),
    ("http://example.com/p?b=2&a=1&", "http://example.com/p?a=1&b=2"),
    ("http://example.com/a/././b", "http://example.com/a/b"),
    # /../ deliberately NOT resolved (documented conservative choice)
    ("http://example.com/a/../b", "http://example.com/a/../b"),
]


@pytest.fixture(scope="module")
def canon(spark):
    def run(urls):
        import pyspark.sql.functions as F

        df = spark.createDataFrame([(u,) for u in urls], "url string")
        return [
            r["c"]
            for r in df.select(
                canonicalize_url(F.col("url")).alias("c")
            ).collect()
        ]

    return run


def test_golden_pairs(canon):
    got = canon([u for u, _ in GOLDEN])
    for (src, want), out in zip(GOLDEN, got):
        assert out == want, src


def test_idempotent_fixed_point(canon):
    once = canon([u for u, _ in GOLDEN])
    twice = canon(once)
    assert once == twice


def test_variants_collapse_to_one(canon):
    variants = [
        "http://example.com/page?a=1&b=2",
        "HTTP://EXAMPLE.COM:80/page?b=2&a=1",
        "http://Example.com/page?b=2&a=1#top",
        "http://example.com:80/page/.?a=1&b=2",
    ]
    # the fourth differs in path ('/page/' vs '/page') — deliberate
    out = canon(variants)
    assert out[0] == out[1] == out[2] == "http://example.com/page?a=1&b=2"
    assert out[3] == "http://example.com/page/?a=1&b=2"


# --- RFC 3986 §5 relative-reference resolution --------------------------------


def test_rfc3986_54_examples_match_urljoin():
    """The RFC's own §5.4.1 normal and §5.4.2 abnormal example tables,
    base http://a/b/c/d;p?q — urllib.parse.urljoin implements these
    exactly, so the stdlib is the external anchor for the whole set."""
    from urllib.parse import urljoin

    from setup_harvest_action_spark.functions.urls import (
        resolve_reference,
    )

    base = "http://a/b/c/d;p?q"
    refs = [
        "g:h", "g", "./g", "g/", "/g", "//g", "?y", "g?y", "#s",
        "g#s", "g?y#s", ";x", "g;x", "g;x?y#s", "", ".", "./", "..",
        "../", "../g", "../..", "../../", "../../g", "../../../g",
        "../../../../g", "/./g", "/../g", "g.", ".g", "g..", "..g",
        "./../g", "./g/.", "g/./h", "g/../h", "g;x=1/./y",
        "g;x=1/../y", "g?y/./x", "g?y/../x", "g#s/./x", "g#s/../x",
    ]
    for r in refs:
        assert resolve_reference(base, r) == urljoin(base, r), r


def test_resolution_randomized_against_urljoin():
    """Randomized http(s) matrix over the reference classes urljoin
    is RFC-conformant for (no scheme in the ref, no dot segments in
    network-path refs — see the deviation golden below)."""
    import random
    from urllib.parse import urljoin

    from setup_harvest_action_spark.functions.urls import (
        resolve_reference,
    )

    rng = random.Random(1234)
    segs = ["a", "b", "doc", "x.y", ".", "..", "7", "img"]
    for _ in range(2000):
        b = (
            f"http{'s' if rng.random() < 0.5 else ''}://h{rng.randrange(3)}"
            ".example/"
            + "/".join(rng.choice(segs) for _ in range(rng.randrange(0, 4)))
        )
        if rng.random() < 0.3:
            b += "?q=1"
        kind = rng.random()
        if kind < 0.25:
            ref = "/" + "/".join(
                rng.choice(segs) for _ in range(rng.randrange(0, 4))
            )
        elif kind < 0.55:
            ref = "/".join(
                rng.choice(segs) for _ in range(rng.randrange(1, 4))
            )
        elif kind < 0.65:
            ref = "?a=2"
        elif kind < 0.75:
            ref = "#frag"
        elif kind < 0.85:
            ref = "//h9.example/" + rng.choice(["a", "b", "doc"])
        else:
            ref = "../" * rng.randrange(1, 4) + rng.choice(segs)
        if rng.random() < 0.2:
            ref += "#f"
        assert resolve_reference(b, ref) == urljoin(b, ref), (b, ref)


def test_resolution_removes_dot_segments_in_absolute_refs():
    """Documented stdlib DEVIATION: RFC 3986 §5.2.2 removes dot
    segments from ABSOLUTE and network-path references too; CPython's
    urljoin returns them verbatim (browsers and the WHATWG URL spec
    side with the RFC — crawl URL identity needs the RFC reading, or
    '/x/../doc/7' and '/doc/7' become different nodes)."""
    from urllib.parse import urljoin

    from setup_harvest_action_spark.functions.urls import (
        resolve_reference,
    )

    base = "http://h.example/p"
    assert (
        resolve_reference(base, "https://o.example/abs/./p/../q")
        == "https://o.example/abs/q"
    )
    assert (
        resolve_reference(base, "//cdn.example/a/../b")
        == "http://cdn.example/b"
    )
    # pin that the stdlib really does deviate here, so if a future
    # CPython fixes it this golden flags the matrix can widen
    assert (
        urljoin(base, "https://o.example/abs/./p/../q")
        == "https://o.example/abs/./p/../q"
    )


def test_remove_dot_segments_goldens():
    from setup_harvest_action_spark.functions.urls import (
        remove_dot_segments,
    )

    assert remove_dot_segments("/a/b/c/./../../g") == "/a/g"
    assert remove_dot_segments("mid/content=5/../6") == "mid/6"
    assert remove_dot_segments("/../g") == "/g"
    assert remove_dot_segments("..") == ""
    assert remove_dot_segments("/a/..") == "/"


def test_extract_links_document_order_and_valueless():
    from setup_harvest_action_spark.functions.html_extract import (
        extract_links,
        synthesize_page,
    )

    page = synthesize_page(9, "article body words " * 5, lang="en")
    links = extract_links(page)
    assert links[:6] == [f"/s{i}" for i in range(6)]  # nav, in order
    assert links[-3:] == ["/about", "/tos", "/privacy"]  # footer
    assert [x for x in links if x.startswith("/rel9-")]  # link farm
    # valueless href / anchor without href: skipped, no raise
    assert extract_links('<a href>x</a><a name=t>y</a><a href="/k">z</a>') == ["/k"]


def test_empty_segment_deviation_goldens():
    """Documented stdlib DEVIATION (r15 verdict #5): RFC 3986 §5.2.4
    and the WHATWG URL spec both PRESERVE empty path segments — '..'
    pops whatever the previous segment is, including an empty one —
    while CPython's urljoin silently collapses empty segments when
    dot-segment removal touches them.  Crawl URL identity follows the
    RFC/browser reading ('//h' and '/h' are different paths)."""
    from urllib.parse import urljoin

    from setup_harvest_action_spark.functions.urls import (
        resolve_reference,
    )

    base = "http://a/b/c/d;p?q"
    goldens = {
        # ref: (repo = RFC/WHATWG, stdlib's collapsed answer)
        "g/..//h": ("http://a/b/c//h", "http://a/b/c/h"),
        "..//g": ("http://a/b//g", "http://a/b/g"),
        ".//g": ("http://a/b/c//g", "http://a/b/c/g"),
        "a//../b": ("http://a/b/c/a/b", "http://a/b/c/b"),
        "g//": ("http://a/b/c/g//", "http://a/b/c/g/"),
        "a/..//": ("http://a/b/c//", "http://a/b/c/"),
    }
    for ref, (want_repo, want_stdlib) in goldens.items():
        assert resolve_reference(base, ref) == want_repo, ref
        # pin that the stdlib really does still collapse, so a future
        # CPython fix flags that the deviation class can be retired
        assert urljoin(base, ref) == want_stdlib, ref
    # the stdlib collapses empty segments even with NO dot segment
    # in sight — the deviation is the whole class, not just the
    # dot-adjacent corner
    assert resolve_reference(base, "x//y") == "http://a/b/c/x//y"
    assert urljoin(base, "x//y") == "http://a/b/c/x/y"


def _whatwg_path_model(merged: str) -> str:
    """Independent in-test model of RFC 3986 §5.2.4 / WHATWG path
    resolution — a segment STACK over split('/'), deliberately a
    different formulation than the repo's single-pass buffer, so the
    two implementations anchor each other."""
    segs = merged.split("/")
    out: list[str] = []
    for i, s in enumerate(segs[1:], 1):
        last = i == len(segs) - 1
        if s == "..":
            if out:
                out.pop()
            if last:
                out.append("")
        elif s == ".":
            if last:
                out.append("")
        else:
            out.append(s)
    return "/" + "/".join(out)


def test_resolution_randomized_with_empty_segments():
    """Randomized matrix over refs that DO contain empty segments
    (the class test_resolution_randomized_against_urljoin excludes
    because the stdlib collapses them): repo output must equal the
    independent RFC/WHATWG stack model."""
    import random

    from setup_harvest_action_spark.functions.urls import (
        resolve_reference,
    )

    rng = random.Random(4321)
    segs = ["a", "b", "doc", ".", "..", "", "x.y", "7"]
    for _ in range(2000):
        base_path = "/".join(
            rng.choice(["a", "b", "c", "d"])
            for _ in range(rng.randrange(0, 4))
        )
        base = f"http://h.example/{base_path}"
        ref = "/".join(
            rng.choice(segs) for _ in range(rng.randrange(1, 5))
        )
        if rng.random() < 0.3:
            ref = "/" + ref
        if ref == "" or ref.startswith("//"):
            # '' is the same-document reference; '//…' is a
            # network-path reference — both out of this matrix's
            # path-resolution scope
            continue
        got = resolve_reference(base, ref)
        if ref.startswith("/"):
            merged = ref
        else:
            bp = "/" + base_path
            merged = bp[: bp.rfind("/") + 1] + ref
        want = "http://h.example" + _whatwg_path_model(merged)
        assert got == want, (base, ref)
