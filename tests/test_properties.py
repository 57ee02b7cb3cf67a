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
