"""Property-based tests (SURVEY.md §5.3): constraint invariants over
randomized inputs.

Pure-Python properties (codecs, parsers) run at full Hypothesis volume;
the Spark harvest invariants run a bounded number of randomized batches
(each example is a real Spark job) and assert the reference's database
constraints — UNIQUE uri, composite term_fields key, FK integrity,
null/empty-concept exclusion, rerun idempotence (harvest.py:192, 210,
292-299)."""

from __future__ import annotations

import datetime as dt
import string

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

# ---------------------------------------------------------------- pure

_value = st.text(alphabet=string.printable.strip(), min_size=1, max_size=12)


@st.composite
def _binding(draw):
    b = {}
    if draw(st.booleans()):
        b["concept"] = {"type": "uri", "value": draw(_value)}
    for var in ("prefLabel", "altLabel", "definition"):
        if draw(st.booleans()):
            b[var] = {"type": "literal", "value": draw(_value)}
    return b


@given(st.lists(_binding(), max_size=20))
def test_bindings_to_rows_null_semantics(bindings):
    """Key absence becomes None in exactly the right positions, order
    is preserved, and no extra rows appear (harvest.py:360)."""
    from setup_harvest_action_spark.sources.sparql import bindings_to_rows

    rows = bindings_to_rows({"results": {"bindings": bindings}})
    assert len(rows) == len(bindings)
    for b, row in zip(bindings, rows):
        for i, var in enumerate(("concept", "prefLabel", "altLabel", "definition")):
            if var in b:
                assert row[i] == b[var]["value"]
            else:
                assert row[i] is None


@given(
    st.integers(min_value=1, max_value=16),
    st.integers(min_value=1, max_value=16),
    st.integers(min_value=0, max_value=2**32 - 1),
)
def test_ppm_codec_roundtrip(width, height, seed):
    """decode(encode(img)) is the identity for any image size, and the
    resize output always has the requested shape with pixels drawn from
    the input."""
    import numpy as np

    from setup_harvest_action_spark.functions.multimodal import (
        decode_ppm,
        encode_ppm,
        resize_nearest,
    )

    n = width * height * 3
    idx = np.arange(n, dtype=np.uint64)
    rgb = ((np.uint64(seed) + idx * np.uint64(2654435761)) % 256).astype(
        np.uint8
    ).reshape(height, width, 3)
    decoded = decode_ppm(encode_ppm(width, height, rgb))
    assert (decoded == rgb).all()
    thumb = resize_nearest(decoded, 3, 2)
    assert thumb.shape == (2, 3, 3)
    assert set(thumb.reshape(-1)) <= set(rgb.reshape(-1))


@given(
    st.integers(min_value=1, max_value=16),
    st.integers(min_value=1, max_value=16),
    st.integers(min_value=0, max_value=2**32 - 1),
)
def test_bmp_codec_roundtrip(width, height, seed):
    """decode(encode(img)) is the identity for any size — including
    widths whose 3-byte rows need 4-byte padding — and the sniffing
    dispatcher routes BMP bytes to the BMP decoder."""
    import numpy as np

    from setup_harvest_action_spark.functions.multimodal import (
        decode_bmp,
        decode_image_auto,
        encode_bmp,
    )

    n = width * height * 3
    idx = np.arange(n, dtype=np.uint64)
    rgb = ((np.uint64(seed) + idx * np.uint64(2654435761)) % 256).astype(
        np.uint8
    ).reshape(height, width, 3)
    payload = encode_bmp(width, height, rgb)
    assert (decode_bmp(payload) == rgb).all()
    assert (decode_image_auto(payload) == rgb).all()


@given(st.binary(min_size=0, max_size=512))
def test_fake_resize_bounds_and_determinism(payload):
    from setup_harvest_action_spark.functions.multimodal import (
        THUMB_BYTES,
        fake_resize,
    )

    out = fake_resize(payload)
    assert len(out) <= THUMB_BYTES
    assert out == fake_resize(payload)
    assert set(out) <= set(payload) or payload == b""


# --------------------------------------------------------------- spark

_uri = st.one_of(
    st.none(),
    st.just(""),
    st.sampled_from([f"http://v.example/c{i}" for i in range(6)]),
)
_label = st.one_of(st.none(), st.text(alphabet="abc xyz", max_size=6))
_row = st.tuples(_uri, _label, _label, _label)


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(st.lists(_row, min_size=1, max_size=25))
def test_harvest_invariants_hold_for_random_batches(spark, rows):
    """For ANY batch shape — duplicate uris, cross-product label rows,
    null/empty concepts, null fields — the load output satisfies the
    reference's constraints and the rerun is idempotent."""
    import pyspark.sql.functions as F

    from setup_harvest_action_spark.harvest.load import HarvestState, harvest_batch
    from setup_harvest_action_spark.schemas import SPARQL_BINDINGS

    # Other tests in the shared session may legitimately hold caches
    # (e.g. connected_components returns a cached frame its caller
    # releases later) — record them so the release-contract assertion
    # below checks only the caches THIS test created.
    jsc = spark.sparkContext._jsc.sc()
    preexisting = int(jsc.getPersistentRDDs().size())

    bindings = spark.createDataFrame(rows, SPARQL_BINDINGS)
    ts = dt.datetime(2026, 3, 1)
    state, stats = harvest_batch(HarvestState.empty(spark), bindings, ts)
    terms = state.terms.collect()
    fields = state.term_fields.collect()

    valid_uris = {r[0] for r in rows if r[0]}
    # UNIQUE(uri), and exactly the non-null/non-empty concepts load
    assert len({t.uri for t in terms}) == len(terms)
    assert {t.uri for t in terms} == valid_uris
    # composite UNIQUE(term_id, field_uri, original_value)
    keys = [(f.term_id, f.field_uri, f.original_value) for f in fields]
    assert len(set(keys)) == len(keys)
    # FK: every field hangs off an existing term; values never null
    term_ids = {t.id for t in terms}
    assert all(f.term_id in term_ids for f in fields)
    assert all(f.original_value is not None for f in fields)
    # rerun idempotence (harvest.py:292-299)
    state2, stats2 = harvest_batch(state, bindings, dt.datetime(2026, 3, 2))
    assert stats2.terms_inserted == 0
    assert stats2.fields_inserted == 0
    assert state2.terms.count() == len(terms)
    assert state2.term_fields.count() == len(fields)
    # the release contract: caches drop to zero once both states are
    # done (harvest_run does this per committed batch)
    state.release()
    state2.release()
    assert int(jsc.getPersistentRDDs().size()) == preexisting


@given(
    st.lists(
        st.integers(min_value=-32768, max_value=32767), min_size=1, max_size=400
    ),
    st.sampled_from([4000, 8000, 16000, 44100]),
)
def test_wav_codec_roundtrip_random(samples, rate):
    """RIFF/WAVE encode→decode is the identity for any mono int16
    signal at any standard rate — chunk walking, sizes, and alignment
    hold for odd lengths too."""
    import numpy as np

    from setup_harvest_action_spark.functions.multimodal import (
        decode_wav,
        encode_wav,
    )

    arr = np.array(samples, dtype=np.int16)
    got_rate, back = decode_wav(encode_wav(arr, rate))
    assert got_rate == rate
    assert back.dtype == np.int16
    assert (back == arr).all()


def _py_levenshtein(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
            )
        prev = cur
    return prev[-1]


def _py_components(n_nodes, edges):
    parent = list(range(n_nodes))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for u, v in edges:
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[max(ru, rv)] = min(ru, rv)
    # min reachable id per node = root under min-union
    return {i: find(i) for i in range(n_nodes)}


@settings(
    max_examples=4,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=14),
            st.integers(min_value=0, max_value=14),
        ),
        min_size=1,
        max_size=25,
    )
)
def test_connected_components_matches_union_find(spark, raw_edges):
    """Iterative min-label propagation must equal a pure-Python
    union-find on arbitrary random graphs (self-loops and duplicate
    edges included) — every vertex labeled with the minimum id
    reachable from it."""
    from setup_harvest_action_spark.functions.dedup import connected_components

    edges = [(u, v) for u, v in raw_edges]
    df = spark.createDataFrame(edges, "vec_a long, vec_b long")
    got = {
        r["id"]: r["label"] for r in connected_components(df).collect()
    }
    expected_all = _py_components(15, edges)
    seen = {u for e in edges for u in e}
    expected = {u: expected_all[u] for u in seen}
    # connected_components labels exactly the vertices that appear
    assert got == expected


@settings(
    max_examples=3,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    st.lists(
        st.tuples(
            st.text(alphabet="abc ", max_size=20),
            st.text(alphabet="abc ", max_size=20),
        ),
        min_size=1,
        max_size=12,
    )
)
def test_banded_levenshtein_matches_reference_dp(spark, string_pairs):
    """The 3-arg banded levenshtein the fuzzy family relies on must
    agree with a reference DP: exact distance whenever it is within
    the bound, -1 whenever it exceeds it."""
    import pyspark.sql.functions as F

    bound = 6
    df = spark.createDataFrame(string_pairs, "a string, b string")
    got = df.select(
        "a", "b", F.levenshtein("a", "b", bound).alias("d")
    ).collect()
    for r in got:
        expected = _py_levenshtein(r["a"], r["b"])
        if expected <= bound:
            assert r["d"] == expected, (r["a"], r["b"])
        else:
            assert r["d"] == -1, (r["a"], r["b"])
