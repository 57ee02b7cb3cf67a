"""A/B harness: HTML text-extraction PARSING layer against system
libxml2's HTML parser (htmlReadMemory + DOM walk via ctypes).

What is gated: ``html_to_text`` — tag walk, script/style/head subtree
exclusion, raw text recovery, character-reference decoding, whitespace
normalization — must equal the text content libxml2's DOM yields under
the SAME subtree-skip set and normalization.  Two independent HTML
parsers (CPython's html.parser tokenizer vs libxml2's) agreeing on the
extracted text is the conformance story; the boilerplate-removal layer
above it is deterministic rule arithmetic, hash-oracled end-to-end by
`q_text_html_extract` (DuckDB recovers the embedded article).

Fixture surface: the engine's own crawl-shaped pages over varied
texts, plus generated documents exercising entities (named/decimal/
hex), attributes containing '>' and quotes, uppercase tag names,
self-closing tags, comments, nested inline/block mixes, and
whitespace-heavy layouts.  Deliberately-broken markup is exercised in
tests/test_html_extract.py for the never-crash contract; parser error
RECOVERY strategies legitimately differ between implementations, so
the A/B pins the well-formed surface both parsers define identically.

Development/debug tool; the permanent pin lives in tests/.
"""

from __future__ import annotations

import ctypes
import sys

sys.path.insert(0, ".")

LX = ctypes.CDLL("libxml2.so.2")

_HTML_PARSE_RECOVER = 1 << 0
_HTML_PARSE_NOERROR = 1 << 5
_HTML_PARSE_NOWARNING = 1 << 6
_HTML_PARSE_NONET = 1 << 11

_XML_ELEMENT_NODE = 1
_XML_TEXT_NODE = 3
_XML_CDATA_SECTION_NODE = 4


class _XmlNode(ctypes.Structure):
    pass


_XmlNode._fields_ = [
    ("_private", ctypes.c_void_p),
    ("type", ctypes.c_int),
    ("name", ctypes.c_char_p),
    ("children", ctypes.POINTER(_XmlNode)),
    ("last", ctypes.POINTER(_XmlNode)),
    ("parent", ctypes.POINTER(_XmlNode)),
    ("next", ctypes.POINTER(_XmlNode)),
    ("prev", ctypes.POINTER(_XmlNode)),
    ("doc", ctypes.c_void_p),
    ("ns", ctypes.c_void_p),
    ("content", ctypes.c_char_p),
]

LX.htmlReadMemory.restype = ctypes.POINTER(_XmlNode)  # doc shares the head
LX.htmlReadMemory.argtypes = [
    ctypes.c_char_p, ctypes.c_int, ctypes.c_char_p, ctypes.c_char_p,
    ctypes.c_int,
]
LX.xmlFreeDoc.argtypes = [ctypes.POINTER(_XmlNode)]

_SKIP = {b"script", b"style", b"noscript", b"template", b"svg", b"head",
         b"iframe"}


def libxml_text(payload: str) -> str:
    """Reference extraction: libxml2 DOM text under the same
    subtree-skip set and whitespace normalization as html_to_text."""
    data = payload.encode()
    doc = LX.htmlReadMemory(
        data, len(data), None, b"utf-8",
        _HTML_PARSE_RECOVER | _HTML_PARSE_NOERROR | _HTML_PARSE_NOWARNING
        | _HTML_PARSE_NONET,
    )
    assert doc, "htmlReadMemory failed"
    chunks: list[str] = []

    def walk(node) -> None:
        while node:
            n = node.contents
            if n.type == _XML_ELEMENT_NODE:
                if (n.name or b"").lower() not in _SKIP and n.children:
                    walk(n.children)
            elif n.type in (_XML_TEXT_NODE, _XML_CDATA_SECTION_NODE):
                if n.content:
                    chunks.append(n.content.decode("utf-8", "replace"))
            node = n.next

    if doc.contents.children:
        walk(doc.contents.children)
    LX.xmlFreeDoc(doc)
    return " ".join(" ".join(chunks).split())


def _fixtures() -> list:
    from setup_harvest_action_spark.functions.html_extract import (
        synthesize_page,
    )

    import random

    rng = random.Random(2024)
    words = (
        "alpha beta gamma delta epsilon table spark merge window agg "
        "stream batch join customer vector corpus line small big slow"
    ).split()

    def sentence(n):
        return " ".join(rng.choice(words) for _ in range(n))

    fx = []
    for d in range(8):
        fx.append(("page", synthesize_page(d, sentence(60 + 10 * d),
                                           lang="en")))
    fx += [
        ("entities",
         "<html><body><p>Fish &amp; chips &lt;cheap&gt; &#64;home "
         "&#x41;BC &quot;quoted&quot; caf&eacute;</p></body></html>"),
        ("attr-gt",
         '<html><body><p title="a > b" data-x=\'c > d\'>attr text '
         "survives</p><div>tail</div></body></html>"),
        ("uppercase",
         "<HTML><BODY><P>Upper CASE tags</P><DIV>lower text</DIV>"
         "</BODY></HTML>"),
        ("selfclose",
         "<html><body><p>before<br/>after</p><img src='x'/>"
         "<p>next para</p></body></html>"),
        ("comments",
         "<html><body><!-- hidden --><p>visible <!-- mid --> text</p>"
         "</body></html>"),
        ("nested-inline",
         "<html><body><p>one <b>two <i>three</i> four</b> five</p>"
         "<ul><li>item <span>a</span></li><li>item b</li></ul>"
         "</body></html>"),
        ("script-style",
         "<html><head><style>p { color: red }</style></head><body>"
         "<script>if (1 < 2) { document.write('<p>no</p>'); }</script>"
         "<p>only this</p><noscript>not this</noscript></body></html>"),
        ("whitespace",
         "<html><body>\n\n  <p>  spaced \t out\n text  </p>\n"
         "<pre>  pre   text </pre>  </body></html>"),
        ("tables",
         "<html><body><table><tr><th>h1</th><th>h2</th></tr>"
         "<tr><td>c1</td><td>c2</td></tr></table></body></html>"),
        ("anchors",
         "<html><body><p>intro <a href='/x'>link one</a> middle "
         "<a href='/y'>link two</a> end</p></body></html>"),
    ]
    for i in range(10):  # generated nested block soup, well-formed
        parts = []
        for _ in range(rng.randrange(3, 9)):
            tag = rng.choice(["p", "div", "section", "blockquote", "li"])
            inner = sentence(rng.randrange(3, 15))
            if rng.random() < 0.4:
                inner += f" <em>{sentence(2)}</em> {sentence(2)}"
            if rng.random() < 0.3:
                inner += f' <a href="/l{i}">{sentence(3)}</a>'
            parts.append(f"<{tag}>{inner}</{tag}>")
        fx.append((f"gen{i}",
                   "<html><body>" + "".join(parts) + "</body></html>"))
    return fx


def main() -> None:
    from setup_harvest_action_spark.functions.html_extract import (
        html_to_text,
    )

    fails = []
    n = 0
    for label, payload in _fixtures():
        ours = html_to_text(payload)
        ref = libxml_text(payload)
        if ours != ref:
            fails.append(f"{label}: ours={ours[:80]!r} ref={ref[:80]!r}")
        n += 1
    print(f"{n} cases, {len(fails)} failures")
    for f in fails[:20]:
        print("  " + f)
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
