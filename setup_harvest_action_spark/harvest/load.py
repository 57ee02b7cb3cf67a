"""The harvest load path: upsert + anti-join append (O13/O14/O15).

The reference's per-row SQL loop (reference: harvest.py:292-380) is an
implementation artifact — O(rows) round-trips, 2 point lookups per row
(:327, :352).  Its *semantics* are set-oriented and collapse to exactly
one keyed merge on ``terms`` plus one anti-join append on
``term_fields`` (SURVEY.md §2.1 notes):

  * ``terms`` upsert (O13): new URIs are inserted with fresh surrogate
    ids and ``created_at = updated_at = batch_ts``; existing URIs keep
    id + created_at and only advance ``updated_at`` (harvest.py:326-349);
  * ``term_fields`` insert-if-absent (O14): composite key
    ``(term_id, field_uri, original_value)`` — INSERT OR IGNORE becomes
    dropDuplicates + left_anti against existing rows (harvest.py:363-372,
    constraint at :210);
  * FK resolution (O15): the reference's 2-per-row point lookups become
    ONE equi-join against ``terms`` (:327, :352-356);
  * intra-batch dedup (O16): ``terms_processed`` set → ``distinct()``
    before the merge (:318, :326, :349);
  * load statistics (O18): inserted/updated counters from the merge
    branches (:312-315, :377-380).

Surrogate ids replicate AUTOINCREMENT (harvest.py:191): stable across
reruns (ids are FK targets, :204), dense, assigned as
``max(existing id) + global_rank(sort key)`` over new rows.  The rank
is computed WITHOUT a global single-task window: rows rank within
prefix-aligned partitions in parallel, and a tiny per-partition count
aggregate supplies each partition's offset (``_dense_ids``), so a
large novel batch spreads across executors.  ``xxhash64(uri)`` remains
the fully parallel alternative where density isn't required
(SURVEY.md §1.3).

State is kept as plain DataFrames so the pipeline is storage-agnostic;
``HarvestState.write``/``read`` persist them as parquet.  On a Delta
deployment the same algebra is one ``MERGE INTO`` — the semantics here
are deliberately identical.  ``harvest_run`` below rewrites the whole
state per batch (fine for bounded vocabularies, the reference's
regime); for large-state continuous ingest use the bucket-pruned form
in ``harvest/bucketed.py``, which reads and rewrites only the buckets
a batch touches.
"""

from __future__ import annotations

import datetime as _dt
import os
from collections.abc import Callable, Iterable
from dataclasses import dataclass
from dataclasses import field as _dc_field

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from setup_harvest_action_spark.harvest.normalize import clean_bindings, unpivot_bindings
from setup_harvest_action_spark.schemas import TERM_FIELDS, TERMS


@dataclass
class LoadStats:
    """The reference's printed load summary (harvest.py:312-315, 377-380)."""

    terms_inserted: int
    terms_updated: int
    fields_inserted: int


@dataclass
class HarvestState:
    """The two tables the harvest writes (translations/appeals/users are
    downstream-only: the harvest never touches them — harvest.py:163-168).

    ``retained`` lists DataFrames cached on behalf of this state by
    ``harvest_batch``; ``release()`` unpersists them once the state has
    been durably written (or is otherwise done with).  Without this a
    multi-batch loop accumulates cached RDDs without bound.

    ``source_path`` records the parquet directory backing this state
    (set by ``read``); ``harvest_run`` consults it so it never
    overwrites the directory it is still scanning.
    """

    terms: DataFrame
    term_fields: DataFrame
    retained: list[DataFrame] = _dc_field(default_factory=list)
    source_path: str | None = None

    @classmethod
    def empty(cls, spark: SparkSession) -> "HarvestState":
        return cls(
            terms=spark.createDataFrame([], TERMS),
            term_fields=spark.createDataFrame([], TERM_FIELDS),
        )

    @classmethod
    def read(cls, spark: SparkSession, path: str) -> "HarvestState":
        return cls(
            terms=spark.read.schema(TERMS).parquet(os.path.join(path, "terms")),
            term_fields=spark.read.schema(TERM_FIELDS).parquet(
                os.path.join(path, "term_fields")
            ),
            source_path=path,
        )

    def write(self, path: str) -> None:
        # Atomic-per-table directory commit — the Spark analogue of the
        # reference's per-batch transaction (harvest.py:374).
        self.terms.write.mode("overwrite").parquet(os.path.join(path, "terms"))
        self.term_fields.write.mode("overwrite").parquet(
            os.path.join(path, "term_fields")
        )

    def release(self) -> None:
        """Unpersist every frame cached on behalf of this state."""
        for df in self.retained:
            df.unpersist()
        self.retained.clear()


def _next_id_base(df: DataFrame) -> int:
    row = df.agg(F.max("id").alias("m")).first()
    return int(row["m"] or 0)


# Fixed-length character prefix used to partition dense-id assignment.
# A fixed-length prefix of the sort key is order-compatible: sorting by
# (prefix, key) equals sorting by key, so per-partition ranks + per-
# partition offsets reproduce the global rank exactly.
DENSE_ID_PREFIX_LEN = 28


def _dense_ids(df: DataFrame, part: F.Column, order: list[str], base: int) -> DataFrame:
    """Assign ``id = base + global_rank(order)`` WITHOUT a global
    window: rank within ``part`` partitions (parallel), then add each
    partition's cumulative predecessor count, computed by one tiny
    count aggregate whose single-task window runs over |distinct
    partition keys| two-column rows — not the batch itself.  ``part``
    must be a monotone function of the leading ``order`` column (a
    fixed-length prefix / the column itself) so partition boundaries
    align with the global order.  Ids are identical to the serial
    ``row_number() OVER (ORDER BY order)`` form this replaces."""
    with_p = df.withColumn("__p", part)
    offsets = (
        with_p.groupBy("__p")
        .agg(F.count(F.lit(1)).alias("__n"))
        .withColumn(
            "__off",
            F.coalesce(
                F.sum("__n").over(
                    Window.orderBy("__p").rowsBetween(
                        Window.unboundedPreceding, -1
                    )
                ),
                F.lit(0),
            ),
        )
        .select("__p", "__off")
    )
    within = F.row_number().over(Window.partitionBy("__p").orderBy(*order))
    return (
        with_p.join(F.broadcast(offsets), "__p")
        .withColumn("id", (within + F.col("__off") + F.lit(base)).cast("long"))
        .drop("__p", "__off")
    )


def upsert_terms(
    terms: DataFrame,
    batch_concepts: DataFrame,
    batch_ts: _dt.datetime,
    id_strategy: str = "dense",
) -> tuple[DataFrame, int, int]:
    """Keyed merge on ``uri``: insert new concepts, touch updated_at on
    existing ones.  Returns (new_terms, n_inserted, n_updated).

    ``batch_ts`` is pinned per batch — SQLite's CURRENT_TIMESTAMP is
    per-statement, Spark's current_timestamp() per-query; an explicit
    literal keeps reruns deterministic (SURVEY.md §7 risk register).

    ``id_strategy``: ``"dense"`` replicates AUTOINCREMENT exactly
    (max id + row_number over new rows — a global window, serial but
    bounded by batch *novelty*, not table size); ``"hash"`` uses
    ``xxhash64(uri)`` — fully parallel, stable across reruns, the
    default choice at 100 TB when density isn't required (SURVEY §1.3).
    """
    untouched, updated, inserted = _terms_merge_branches(
        terms, batch_concepts, batch_ts, id_strategy
    )
    n_updated = updated.count()
    n_inserted = inserted.count()
    merged = untouched.unionByName(updated).unionByName(inserted)
    return merged, n_inserted, n_updated


def _terms_merge_branches(
    terms: DataFrame,
    batch_concepts: DataFrame,
    batch_ts: _dt.datetime,
    id_strategy: str = "dense",
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """The three branches of the terms merge — (untouched, updated,
    inserted) — shared by the eager (`upsert_terms`) and observed
    (`harvest_batch_observed`) forms."""
    concepts = batch_concepts.select(F.col("concept").alias("uri")).distinct()
    ts = F.lit(batch_ts).cast("timestamp")

    matched = terms.join(concepts, "uri", "left_semi")
    untouched = terms.join(concepts, "uri", "left_anti")
    updated = matched.withColumn("updated_at", ts)

    new_uris = concepts.join(terms.select("uri"), "uri", "left_anti")
    if id_strategy == "hash":
        with_id = new_uris.withColumn("id", F.xxhash64("uri"))
    else:
        # Dense AUTOINCREMENT semantics (uri order) without a global
        # single-task window: prefix-partitioned ranks + per-prefix
        # offsets — see _dense_ids.  Worst case (all uris share the
        # prefix) degrades to the old serial window, never worse.
        base = _next_id_base(terms)
        with_id = _dense_ids(
            new_uris, F.substring("uri", 1, DENSE_ID_PREFIX_LEN), ["uri"], base
        )
    inserted = with_id.select(
        F.col("id").cast("long").alias("id"),
        "uri",
        ts.alias("created_at"),
        ts.alias("updated_at"),
    )
    return untouched, updated, inserted


def append_term_fields(
    term_fields: DataFrame,
    terms: DataFrame,
    batch_long: DataFrame,
    batch_ts: _dt.datetime,
) -> tuple[DataFrame, int]:
    """INSERT OR IGNORE on composite key (term_id, field_uri,
    original_value): dedup + FK-resolve via ONE join + left_anti against
    existing.  Returns (new_term_fields, n_inserted)."""
    inserted = _fields_fresh_rows(term_fields, terms, batch_long, batch_ts)
    n_inserted = inserted.count()
    return term_fields.unionByName(inserted), n_inserted


def _fields_fresh_rows(
    term_fields: DataFrame,
    terms: DataFrame,
    batch_long: DataFrame,
    batch_ts: _dt.datetime,
) -> DataFrame:
    """The insert branch of the term_fields merge (FK-resolve +
    left_anti + dense ids) — shared by the eager and observed forms."""
    ts = F.lit(batch_ts).cast("timestamp")

    resolved = batch_long.join(
        terms.select(F.col("id").alias("term_id"), F.col("uri").alias("concept")),
        "concept",
    ).select("term_id", "field_uri", "field_term", "original_value")

    fresh = resolved.join(
        term_fields.select("term_id", "field_uri", "original_value"),
        ["term_id", "field_uri", "original_value"],
        "left_anti",
    )

    base = _next_id_base(term_fields)
    # Dense ids without a global window: partition the rank by the
    # leading sort column (term_id) — order-compatible by construction;
    # the offset frame is one (term_id, count) row per distinct term in
    # the fresh batch.  See _dense_ids.
    return _dense_ids(
        fresh,
        F.col("term_id"),
        ["term_id", "field_uri", "original_value"],
        base,
    ).select(
        "id",
        "term_id",
        "field_uri",
        "field_term",
        "original_value",
        ts.alias("created_at"),
        ts.alias("updated_at"),
    )


def harvest_batch(
    state: HarvestState,
    bindings: DataFrame,
    batch_ts: _dt.datetime | None = None,
) -> tuple[HarvestState, LoadStats]:
    """Load one page/batch of SPARQL bindings — the set-oriented form of
    the reference's ``insert_results`` (harvest.py:292-380).

    Idempotence contract (harvest.py:163-168, 292-299): re-running the
    same bindings inserts 0 terms and 0 term_fields; only
    ``terms.updated_at`` advances.  Proven by the golden double-run
    test (tests/test_harvest_load.py).
    """
    batch_ts = batch_ts or _dt.datetime.now(_dt.timezone.utc).replace(tzinfo=None)

    # Materialize inputs once: both merge branches and the FK join reuse
    # them, and the id bases must be computed against a frozen snapshot.
    cleaned = clean_bindings(bindings).cache()
    long = unpivot_bindings(bindings).cache()

    terms, n_ins_t, n_upd_t = upsert_terms(state.terms, cleaned, batch_ts)
    terms = terms.cache()
    term_fields, n_ins_f = append_term_fields(state.term_fields, terms, long, batch_ts)

    # The returned frames stay lazy; the caches above are registered on
    # the new state so a driver loop can release them after it durably
    # commits the state (see ``harvest_run``).  Everything here is
    # deterministic, so re-evaluation after release is safe.
    new_state = HarvestState(
        terms=terms, term_fields=term_fields, retained=[cleaned, long, terms]
    )
    return new_state, LoadStats(n_ins_t, n_upd_t, n_ins_f)


def harvest_batch_observed(
    state: HarvestState,
    bindings: DataFrame,
    batch_ts: _dt.datetime | None = None,
) -> tuple[HarvestState, Callable[[], LoadStats]]:
    """``harvest_batch`` with the load statistics PIGGYBACKED on the
    commit write instead of counted up front: the eager form runs three
    count jobs per batch (updated, inserted terms, inserted fields);
    here each merge branch is tagged with a transient marker column,
    an ``Observation`` sums the markers DURING the caller's write pass
    (CollectMetrics — exact, accumulated task-side), and the marker is
    dropped before anything lands on disk.  Over a 1000-page run that
    removes 3000 scheduler round-trips; the only remaining per-batch
    driver actions are the two max-id scalars the dense-id contract
    requires.

    Returns ``(state, resolve)``; call ``resolve()`` AFTER an action
    has materialized both tables (``state.write`` does) — it blocks
    until the metrics arrive, then returns the same LoadStats the
    eager form would have computed.  The reference prints these stats
    per page (harvest.py:312-315, 377-380); semantics are unchanged."""
    from pyspark.sql import Observation

    batch_ts = batch_ts or _dt.datetime.now(_dt.timezone.utc).replace(tzinfo=None)

    cleaned = clean_bindings(bindings).cache()
    long = unpivot_bindings(bindings).cache()

    untouched, updated, inserted = _terms_merge_branches(
        state.terms, cleaned, batch_ts
    )
    obs_terms = Observation()
    terms = (
        untouched.withColumn("__b", F.lit(0))
        .unionByName(updated.withColumn("__b", F.lit(1)))
        .unionByName(inserted.withColumn("__b", F.lit(2)))
        .observe(
            obs_terms,
            F.sum((F.col("__b") == 2).cast("long")).alias("ins"),
            F.sum((F.col("__b") == 1).cast("long")).alias("upd"),
        )
        .drop("__b")
        .cache()
    )
    fresh = _fields_fresh_rows(state.term_fields, terms, long, batch_ts)
    obs_fields = Observation()
    term_fields = (
        state.term_fields.withColumn("__new", F.lit(0))
        .unionByName(fresh.withColumn("__new", F.lit(1)))
        .observe(obs_fields, F.sum("__new").alias("ins"))
        .drop("__new")
    )

    new_state = HarvestState(
        terms=terms, term_fields=term_fields, retained=[cleaned, long, terms]
    )

    def resolve() -> LoadStats:
        t, f = obs_terms.get, obs_fields.get
        return LoadStats(
            int(t["ins"] or 0), int(t["upd"] or 0), int(f["ins"] or 0)
        )

    return new_state, resolve


def harvest_run(
    spark: SparkSession,
    batches: Iterable[DataFrame],
    state_path: str,
    state: HarvestState | None = None,
    batch_ts: _dt.datetime | None = None,
) -> tuple[HarvestState, LoadStats]:
    """Multi-batch driver loop — the Spark form of the reference's page
    loop (harvest.py:405-416): every batch is durably committed before
    the next is processed, so a mid-run crash leaves a prefix of
    batches loaded (the reference's per-page ``conn.commit()``,
    harvest.py:374).

    State ping-pongs between two subdirectories (``slot=0``/``slot=1``)
    because Spark cannot overwrite a parquet directory it is also
    reading from.  A resumed state (``state=`` from a previous run over
    the same ``state_path``) starts the ping-pong on the slot it is NOT
    backed by, for the same reason.  The per-batch parquet round-trip
    doubles as lineage truncation: without it the state plan grows as an
    unbounded chain of unions/joins over every batch ever loaded.
    Cached batch inputs are released as soon as each commit lands, so
    executor storage stays O(one batch) for the whole run.  Load
    statistics resolve from Observations AFTER each commit
    (``harvest_batch_observed``) — no count jobs in the loop.
    """
    state = state or HarvestState.empty(spark)
    next_slot = 1 if state.source_path == os.path.join(state_path, "slot=0") else 0
    totals = LoadStats(0, 0, 0)
    for bindings in batches:
        state, resolve = harvest_batch_observed(state, bindings, batch_ts)
        slot = os.path.join(state_path, f"slot={next_slot}")
        next_slot = 1 - next_slot
        state.write(slot)
        stats = resolve()
        state.release()
        state = HarvestState.read(spark, slot)
        totals = LoadStats(
            totals.terms_inserted + stats.terms_inserted,
            totals.terms_updated + stats.terms_updated,
            totals.fields_inserted + stats.fields_inserted,
        )
    return state, totals
