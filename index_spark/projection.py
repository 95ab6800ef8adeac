"""Materialized secondary indexes, maintained incrementally off the
change feed.

The reference answers "which keys have attribute = v?" through the datom
AVET ordering (DatomHelpers.scala; SURVEY §1.1) — a *second index* sorted
by (attribute, value). :class:`ProjectionIndex` is that idea as a store
feature: a SnapshotStore keyed ``(attr, base_key...)`` that mirrors one
column of a base store and is kept in sync by applying the base's change
feed (:meth:`SnapshotStore.diff`) — never by rescanning the base.

Scale contract:

- **build** is one column-pruned scan of the base (attr + key columns
  only), written range-partitioned on (attr, key) — lookups by attribute
  value are then manifest zone-map + parquet min/max prunes.
- **refresh** is O(changed keys), not O(base): the diff lists changed
  keys; mappings to retire are the PROJECTION'S OWN current rows for
  those keys (a projection-sized semi-join — no time-traveled base scan,
  and correct even if a previous refresh crashed mid-apply and the base
  advanced since), new mappings come from the new base version through a
  bounds-pruned ``read_range``; one transactional commit applies
  Remove+Insert together, so readers never see a half-applied sync.
- the applied base version rides in a CAS-committed catalog entry next
  to the projection's own manifest, so refresh is idempotent and
  crash-safe: re-running a completed refresh is a no-op, and a crash
  between the projection commit and the state commit just re-applies
  the diff — removes are pre-filtered to still-present mappings and
  inserts are upserts, so the apply is a pure function of the target
  state, safe to repeat.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from index_spark import catalog as catalog_io
from index_spark.commands import Insert, Remove
from index_spark.snapshots import SnapshotStore

_STATE = "_projection_state"


class ProjectionIndex:
    """Secondary index of ``attr`` over a base :class:`SnapshotStore`."""

    def __init__(self, spark: SparkSession, base: SnapshotStore, path: str, attr: str):
        self.spark = spark
        self.base = base
        self.attr = attr
        self.store = SnapshotStore(spark, path)
        self.path = path

    # ------------------------------------------------------------- state
    def _state(self) -> Optional[tuple[dict, int]]:
        return catalog_io.read_latest(self.path, _STATE)

    def applied_version(self) -> Optional[int]:
        got = self._state()
        return got[0]["base_version"] if got else None

    def _commit_state(self, base_version: int) -> None:
        got = self._state()
        catalog_io.commit(
            self.path,
            _STATE,
            {"base_version": base_version, "attr": self.attr},
            got[1] if got else None,
        )

    # ------------------------------------------------------------- build
    def build(self, rows_per_partition: int = 1_000_000) -> "ProjectionIndex":
        """Full build from the base's latest version: one column-pruned
        scan projecting (attr, base key), stored sorted on that composite
        key so attribute-value lookups prune files."""
        base_key = self.base._read_manifest()["key"]
        v = self.base.latest_version()
        rows = self.base.read(v).select(self.attr, *base_key)
        self.store.create([self.attr] + list(base_key), df=rows, rows_per_partition=rows_per_partition)
        self._commit_state(v)
        return self

    # ------------------------------------------------------------ refresh
    def refresh(self) -> int:
        """Apply every base commit since the last sync as ONE projection
        transaction. Returns the number of base versions applied."""
        v0 = self.applied_version()
        if v0 is None:
            raise ValueError("projection not built; call build() first")
        v1 = self.base.latest_version()
        if v1 <= v0:
            return 0
        base_key = self.base._read_manifest()["key"]
        d = self.base.diff(v0, v1).select(*base_key, "change")
        changed_keys = d.select(*base_key).distinct()
        added_keys = d.filter(F.col("change").isin("insert", "update")).select(*base_key)
        # Retire the projection's OWN current mappings for every changed
        # base key — NOT the time-traveled base-v0 rows. Matching on the
        # full (attr, key) from v0 breaks when a previous refresh crashed
        # after its store commit and the base advanced since: the mapping
        # actually present came from the partially-applied sync, not v0,
        # and would never be retired (a permanent stale lookup hit). The
        # current-state semi-join retires whatever is there, making the
        # (Remove, Insert) pair a true pure function of the target state —
        # idempotent under replay AND under crash-then-advance. It also
        # drops the full base-v0 scan: this join is projection-sized.
        h = self.store.latest()
        old_present = (
            h.df.select(self.attr, *base_key)
            .join(changed_keys, on=list(base_key), how="left_semi")
        )
        # New mappings from the new base version, zone-map-pruned to the
        # files that can contain the changed keys (O(changed keys) reads,
        # not O(base) — the same bounds trick as lookup_rows).
        hb = self.base.at_version(v1)
        b = added_keys.agg(
            F.min(F.struct(*base_key)).alias("lo"), F.max(F.struct(*base_key)).alias("hi")
        ).first()
        if b["lo"] is None:
            new_maps = hb.df.select(self.attr, *base_key).limit(0)
        else:
            new_maps = (
                hb.read_range(tuple(b["lo"]), tuple(b["hi"]))
                .join(added_keys, on=list(base_key), how="left_semi")
                .select(self.attr, *base_key)
            )
        h.execute([Remove(old_present), Insert(new_maps, upsert=True)])
        self._commit_state(v1)
        return v1 - v0

    # ------------------------------------------------------------- lookup
    def lookup(self, value) -> DataFrame:
        """Base keys whose ``attr`` equals ``value`` — a prefix scan on the
        (attr, key) ordering THROUGH the manifest zone maps
        (:meth:`~index_spark.snapshots.VersionedIndex.read_range` with the
        one-column prefix bound): only files whose [min, max] can contain
        this attribute value are opened; parquet min/max prunes row groups
        within them."""
        h = self.store.latest()
        out = h.read_range((value,), (value,))
        return out.select(*[c for c in out.columns if c not in (self.attr, "__version")])

    def lookup_rows(self, value) -> DataFrame:
        """Full base rows for an attribute value: index lookup, then a key
        semi-join into the base — scanning only the base files whose
        manifest [min, max] can contain the matched keys (one tiny bounds
        agg on the matched key set feeds :meth:`VersionedIndex.read_range`
        zone maps; the residual semi-join stays exact). When the matched
        keys cluster — the common case for correlated attributes — the
        base read opens a fraction of its files; worst case it degrades
        to the plain head scan, never worse."""
        base_key = self.base._read_manifest()["key"]
        # pin ONE index version for the whole call: bounds, the broadcast
        # decision, and the returned probe plan must all read the same
        # manifest snapshot — resolving store.latest() twice would let a
        # concurrent refresh() commit land in between, and the probe
        # would then carry keys whose base files lie outside the stale
        # zone-map bounds (rows silently dropped from the result).
        h_idx = self.store.latest()
        scan = h_idx.read_range((value,), (value,)).select(*base_key)
        # persist the matched key set only for the duration of this call:
        # the bounds agg and the size count below are actions over the
        # index range scan, and without caching the second would re-run
        # the scan. The cache is ALWAYS released before returning (a
        # leaked entry per lookup would accumulate executor storage for
        # the session's lifetime), so the returned plan must not
        # reference the persisted frame — both branches probe with a
        # FRESH lazy rebuild of the pinned scan (re-run once at consumer
        # action time; zone-map-pruned to the files containing `value`,
        # so the re-scan is proportional to the match, not the index).
        # Nothing crosses the driver as Python rows (no collect());
        # the broadcast branch still stages ≤ cap key rows in the
        # driver JVM, which is what the cap bounds.
        keys = scan.persist()
        h = self.base.latest()
        try:
            b = keys.agg(
                F.min(F.struct(*base_key)).alias("lo"), F.max(F.struct(*base_key)).alias("hi")
            ).first()
            if b["lo"] is None:
                return h.df.filter(F.lit(False)).drop("__version")
            pruned = h.read_range(tuple(b["lo"]), tuple(b["hi"]))
            cap = 100_000
            probe = h_idx.read_range((value,), (value,)).select(*base_key)
            if keys.count() <= cap:
                out = pruned.join(
                    F.broadcast(probe.distinct()), on=list(base_key), how="left_semi"
                )
            else:
                out = pruned.join(probe, on=list(base_key), how="left_semi")
            return out.drop("__version")
        finally:
            keys.unpersist()

    def lookup_range(self, lo, hi, lo_inclusive: bool = True, hi_inclusive: bool = True) -> DataFrame:
        """Base keys whose ``attr`` lies in [lo, hi] — a zone-map-pruned
        scan on the (attr, key) ordering (partial-tuple lexicographic
        bounds: inclusive ends cover every key under the boundary
        attribute): only files whose manifest [min, max] intersect the
        attribute band are opened."""
        h = self.store.latest()
        out = h.read_range((lo,), (hi,), from_inclusive=lo_inclusive, to_inclusive=hi_inclusive)
        return out.select(self.attr, *[c for c in out.columns if c not in (self.attr, "__version")])
