"""Sharded logical index: one ordered index over many physical snapshots.

The reference shards a logical index across independent physical trees with
index-level ``split()``/``merge()`` (QueryableIndex.scala:561-679) and
capacity predicates (QueryableIndex.scala:521-538), leaving the caller to
keep a catalog of which tree owns which key range. ``ShardedIndex`` is that
catalog made explicit — the "meta block" of a two-level distributed B+Tree
whose subtrees are :class:`~index_spark.snapshots.VersionedIndex` datasets:

- **Routing** is a driver-side comparison against the catalog's shard upper
  bounds (O(#shards), like ``Meta.findPath``'s binary search over last-keys,
  Meta.scala:55-63); each shard read then prunes further via parquet
  row-group min/max. A query touching one shard's range reads one shard.
- **Mutations** route rows to their owning shards and commit per-shard new
  versions, but the *logical* commit point is a single atomic catalog swap
  (os.replace) — exactly the reference's new-root-per-batch COW
  (Index.scala:137-160) lifted to shard granularity. A batch that fails in
  any shard leaves the catalog untouched: earlier shards' freshly-committed
  versions are unreachable orphans (reclaimable by vacuum), and the logical
  index still reads the old versions everywhere — all-or-nothing without a
  distributed transaction.
- **split/merge** replace one catalog entry with two (or two with one),
  re-using the per-index split/merge machinery (§2.4). With
  ``shard_capacity`` set, ``execute`` auto-splits full shards afterward —
  the reference's ``isFull → split`` dance (SplitAndMergeIndexSpec).

At 100 TB: the catalog is a few KB of JSON for thousands of multi-TB
shards; writers touch only owning shards (and within them, only touched
files via file-level COW); readers prune shard-then-file-then-row-group.
Single-writer per logical index, as in the reference (Index.scala:16).
"""

from __future__ import annotations

import glob as _glob_mod
import json
import os
import uuid
from typing import Any, Optional, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from index_spark.commands import Insert, Remove, Update
from index_spark.errors import (
    IndexAlreadyExistsError,
    IndexError_,
    IndexNotFoundError,
    KeyNotFoundError,
)
from index_spark import catalog as catalog_io
from index_spark.index import SortedIndex
from index_spark.keys import as_tuple, key_gt, key_lt, sort_cols
from index_spark.snapshots import (
    VERSION_COL,
    SnapshotStore,
    VersionedIndex,
    _now_ns,
    stat_row_to_file,
)

_CATALOG_NAME = "_catalog"


def _nrank(t: tuple) -> tuple:
    """NULL-aware total-order rank for a driver-side key tuple: NULL sorts
    FIRST, matching the engine's comparator order (keys.py) — a plain
    Python tuple compare raises TypeError on None vs str/float."""
    return tuple((v is not None, v) for v in t)


class ShardedIndex:
    """Logical ordered index over range-disjoint physical shards.

    Catalog schema (``<base>/_catalog.json``)::

        {"key": [...], "rows_per_partition": int, "shard_capacity": int|null,
         "next_shard_id": int,
         "shards": [{"id": int, "path": str, "version": int|null,
                      "upper": [key vals]|null}]}

    Shards are in key order; shard *i* owns keys ``upper[i-1] < k <=
    upper[i]`` (the last shard's ``upper`` is null = +inf). ``version`` pins
    the shard snapshot the logical index reads — the physical store may be
    ahead after a failed cross-shard batch.
    """

    def __init__(self, spark: SparkSession, base_path: str):
        self.spark = spark
        self.base_path = base_path

    # ------------------------------------------------------------- catalog
    # Same conditional-commit protocol as SnapshotStore's manifest
    # (index_spark.catalog): immutable stamped files + put-if-absent, so a
    # losing concurrent writer gets CommitConflictError, not a clobber.
    _MV = "__catalog_stamp"

    def exists(self) -> bool:
        return catalog_io.read_latest(self.base_path, _CATALOG_NAME) is not None

    def _read_catalog(self) -> dict:
        got = catalog_io.read_latest(self.base_path, _CATALOG_NAME)
        if got is None:
            raise IndexNotFoundError(f"no sharded index at {self.base_path}")
        cat, stamp = got
        cat[self._MV] = stamp
        return cat

    def _write_catalog(self, cat: dict) -> None:
        expected = cat.pop(self._MV, None)
        catalog_io.commit(self.base_path, _CATALOG_NAME, cat, expected)

    # -------------------------------------------------------------- create
    @classmethod
    def create(
        cls,
        spark: SparkSession,
        base_path: str,
        key: Sequence[str],
        df: DataFrame,
        n_shards: int = 4,
        rows_per_partition: int = 1_000_000,
        shard_capacity: Optional[int] = None,
        sample_size: int = 100_000,
    ) -> "ShardedIndex":
        """Bulk-load ``df`` into ``n_shards`` range-disjoint shards in ONE
        pass over the source.

        Boundaries come from a fixed-size seeded key sample (driver memory
        O(sample) regardless of data size — the RangePartitioner idea, but
        pinned so the catalog is deterministic). The data is written once:
        range-partitioned and key-sorted, split into per-shard directories
        by a computed shard column (``partitionBy``), then each shard store
        ADOPTS its files metadata-only (``create_from_files``). At 100 TB
        this is the difference between one scan of the source and
        ``n_shards`` scans of it."""
        self = cls(spark, base_path)
        if self.exists():
            raise IndexAlreadyExistsError(base_path)
        if "__shard" in df.columns:
            raise ValueError("'__shard' is reserved for the bulk-load layout")
        staging = os.path.join(base_path, "_bulk")
        if os.path.isdir(staging) or _glob_mod.glob(os.path.join(base_path, "shard_*")):
            # a previous create() died between the staging write and the
            # catalog write (no catalog ⇒ nothing references these files):
            # clear the partial attempt so retry succeeds
            import shutil as _shutil

            _shutil.rmtree(staging, ignore_errors=True)
            for p in _glob_mod.glob(os.path.join(base_path, "shard_*")):
                _shutil.rmtree(p, ignore_errors=True)
        key = list(key)
        # key uniqueness must hold at birth on the BULK path too — the
        # single-store create(df=...) gate is bypassed by file adoption.
        # Fused with the boundary-sample count: one aggregation pass yields
        # both the dup verdict and the total row count (the ≤20-key error
        # payload is recomputed only on the failure path).
        n, max_per_key = VersionedIndex._key_cardinality(df, key)
        if max_per_key > 1:
            from index_spark.errors import DuplicatedKeysError

            # payload re-evaluates the plan; keep the raise truthful if a
            # non-deterministic input recomputes to no dups (see create())
            raise DuplicatedKeysError(
                VersionedIndex._dup_keys_in_batch(df, key)
                or [("<unstable input: recompute found no dups>",)]
            )
        frac = min(1.0, sample_size / max(n, 1))
        sample = sorted(
            (tuple(r) for r in df.select(*key).sample(fraction=frac, seed=42).collect()),
            key=_nrank,  # NULL-bearing keys must not crash the boundary sort
        )
        try:  # boundaries live in the JSON catalog and are compared against
            # raw row-key tuples — both need the key type to round-trip
            json.dumps([list(t) for t in sample[:1]])
        except TypeError as e:
            raise ValueError(
                "ShardedIndex keys must be JSON-able (int/float/str/bool); "
                "cast date/decimal keys to epoch days / int first"
            ) from e
        uppers: list[Optional[tuple]] = []
        for i in range(1, n_shards):
            b = sample[min(len(sample) - 1, i * len(sample) // n_shards)] if sample else None
            if b is not None and (not uppers or uppers[-1] != b):
                uppers.append(b)
        uppers.append(None)  # last shard: +inf

        # interval assignment, first-match-wins (upper[i-1] < k <= upper[i])
        shard_expr = None
        for i, upper in enumerate(uppers[:-1]):
            cond = key_lt(key, upper, inclusive=True)
            shard_expr = F.when(cond, i) if shard_expr is None else shard_expr.when(cond, i)
        last_idx = len(uppers) - 1
        shard_expr = F.lit(last_idx) if shard_expr is None else shard_expr.otherwise(last_idx)

        files_by_shard: dict[int, list[dict]] = {}
        if n > 0:
            n_parts = max(1, -(-n // rows_per_partition))
            (
                df.withColumn("__shard", shard_expr)
                .repartitionByRange(n_parts, *[F.col(c) for c in key])
                .sortWithinPartitions(*key)
                .withColumn(VERSION_COL, F.lit(str(uuid.uuid4())))
                .write.mode("errorifexists")
                .partitionBy("__shard")
                .parquet(staging)
            )
            # ONE stats job for all shards: per-file key min/max + rows,
            # shard recovered from the partition column
            stat_rows = (
                spark.read.parquet(staging)
                .groupBy("__shard", F.input_file_name().alias("p"))
                .agg(
                    *[F.min(c).alias(f"min_{c}") for c in key],
                    *[F.max(c).alias(f"max_{c}") for c in key],
                    F.count(F.lit(1)).alias("n"),
                )
                .collect()
            )
            for r in stat_rows:
                files_by_shard.setdefault(int(r["__shard"]), []).append(stat_row_to_file(r, key))

        cat = {
            "key": key,
            "rows_per_partition": rows_per_partition,
            "shard_capacity": shard_capacity,
            "next_shard_id": len(uppers),
            "shards": [],
        }
        for sid, upper in enumerate(uppers):
            path = os.path.join(base_path, f"shard_{sid:04d}")
            store = SnapshotStore(spark, path)
            shard_files = files_by_shard.get(sid)
            shard_data = os.path.join(staging, f"__shard={sid}")
            if shard_files:
                h = store.create_from_files(
                    key, shard_data, rows_per_partition=rows_per_partition,
                    max_n_items=shard_capacity, files=shard_files,
                )
                version = h.version
            else:  # boundary produced an empty shard: store exists, no data
                store.create(key, rows_per_partition=rows_per_partition, max_n_items=shard_capacity)
                version = None
            cat["shards"].append(
                {"id": sid, "path": path, "version": version, "upper": list(upper) if upper else None}
            )
        self._write_catalog(cat)
        return self

    # ------------------------------------------------------------- handles
    def _handle(self, s: dict, cat: dict) -> Optional[VersionedIndex]:
        """Catalog-pinned read/write handle for one shard (None if the shard
        store doesn't exist). A null catalog version pins the EMPTY state
        even if the physical store has orphaned versions from a failed
        cross-shard batch — the catalog, not the store, is the truth."""
        store = SnapshotStore(self.spark, s["path"])
        if not store.exists():
            return None
        if s["version"] is None:
            return VersionedIndex(store, cat["key"], None, cat["rows_per_partition"])
        return store.at_version(s["version"])

    def _key(self) -> list[str]:
        return self._read_catalog()["key"]

    # ------------------------------------------------------------- routing
    @staticmethod
    def _owner(shards: list[dict], kt: tuple) -> dict:
        for s in shards:
            if s["upper"] is None or _nrank(kt) <= _nrank(tuple(s["upper"])):
                return s
        return shards[-1]

    @staticmethod
    def _lowers(shards: list[dict]) -> list[Optional[tuple]]:
        return [None] + [tuple(s["upper"]) if s["upper"] else None for s in shards[:-1]]

    def _prune(
        self,
        shards: list[dict],
        gt_term: Optional[tuple] = None,
        lt_term: Optional[tuple] = None,
    ) -> list[dict]:
        """Shards that can hold keys satisfying (prefix-)gt/lt bounds.

        Conservative prefix comparison: a shard is skipped for ``> term``
        only when its upper bound's leading ``len(term)`` fields already
        compare below ``term`` (then every key's prefix does too), and for
        ``< term`` when its lower bound's prefix compares above. Sound for
        both inclusivities and for terms covering only leading key columns.
        """
        out = []
        for s, lower in zip(shards, self._lowers(shards)):
            if gt_term is not None and s["upper"] is not None:
                if _nrank(tuple(s["upper"])[: len(gt_term)]) < _nrank(gt_term):
                    continue
            if lt_term is not None and lower is not None:
                if _nrank(lower[: len(lt_term)]) > _nrank(lt_term):
                    continue
            out.append(s)
        return out

    def _union(self, shards: list[dict], cat: dict) -> Optional[DataFrame]:
        dfs = []
        for s in shards:
            h = self._handle(s, cat)
            if h is not None and not h._empty:
                dfs.append(h.df)
        if not dfs:
            return None
        out = dfs[0]
        # allowMissingColumns: a schema-evolving insert may have touched
        # only SOME shards; un-evolved shards read NULL in the added
        # columns instead of making every multi-shard read throw
        for d in dfs[1:]:
            out = out.unionByName(d, allowMissingColumns=True)
        return out

    # --------------------------------------------------------------- reads
    def _as_index(self, shards: list[dict], cat: dict) -> Optional[SortedIndex]:
        df = self._union(shards, cat)
        return None if df is None else SortedIndex(df, cat["key"])

    def _empty_like(self, cat: dict) -> DataFrame:
        # schema-stable empty result when every candidate shard is empty
        for s in cat["shards"]:
            h = self._handle(s, cat)
            if h is not None and not h._empty:
                return h.df.limit(0)
        raise IndexNotFoundError("sharded index has no committed data")

    def get(self, k: Any) -> DataFrame:
        cat = self._read_catalog()
        s = self._owner(cat["shards"], as_tuple(k))
        h = self._handle(s, cat)
        if h is None or h._empty:
            return self._empty_like(cat)
        # manifest zone-map + bloom pruned point read: candidate files are
        # decided driver-side from the shard's manifest stats, so a point
        # get against a many-file shard opens a handful of files instead
        # of scanning the whole shard (falls back to the pushdown get for
        # stat-less versions)
        return h.read_point(k)

    def get_all(self, keys: Sequence[Any], must_find_all: bool = False) -> DataFrame:
        """Multi-get routed per owning shard (Index.scala:820-867 batches
        keys per leaf the same way); KEY_NOT_FOUND aggregates cross-shard."""
        cat = self._read_catalog()
        by_shard: dict[int, list[Any]] = {}
        for k in keys:
            sid = self._owner(cat["shards"], as_tuple(k))["id"]
            by_shard.setdefault(sid, []).append(k)
        parts, missing = [], []
        for s in cat["shards"]:
            ks = by_shard.get(s["id"])
            if not ks:
                continue
            h = self._handle(s, cat)
            if h is None or h._empty:
                missing += [as_tuple(k) for k in ks]
                continue
            if must_find_all:
                try:
                    parts.append(h.get_all(ks, must_find_all=True))
                except KeyNotFoundError as e:
                    missing += [as_tuple(x) for x in e.keys]
            elif len(ks) <= 10_000:
                # manifest-pruned multi-get (equals get_all; opens only
                # files whose stats/blooms can match a probe)
                parts.append(h.read_points(ks))
            else:
                parts.append(h.get_all(ks))
        if must_find_all and missing:
            raise KeyNotFoundError(missing)
        if not parts:
            return self._empty_like(cat)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p, allowMissingColumns=True)
        return out.orderBy(*sort_cols(cat["key"]))

    def in_order(self, reverse: bool = False, limit: Optional[int] = None) -> DataFrame:
        cat = self._read_catalog()
        idx = self._as_index(cat["shards"], cat)
        if idx is None:
            return self._empty_like(cat)
        return idx.in_order(reverse, limit)

    def gt(self, term: Any, **kw) -> DataFrame:
        cat = self._read_catalog()
        cand = self._prune(cat["shards"], gt_term=as_tuple(term))
        idx = self._as_index(cand, cat)
        if idx is None:
            return self._empty_like(cat)
        return idx.gt(term, **kw)

    def lt(self, term: Any, **kw) -> DataFrame:
        cat = self._read_catalog()
        cand = self._prune(cat["shards"], lt_term=as_tuple(term))
        idx = self._as_index(cand, cat)
        if idx is None:
            return self._empty_like(cat)
        return idx.lt(term, **kw)

    def range(self, frm: Any, to: Any, **kw) -> DataFrame:
        cat = self._read_catalog()
        cand = self._prune(cat["shards"], gt_term=as_tuple(frm), lt_term=as_tuple(to))
        idx = self._as_index(cand, cat)
        if idx is None:
            return self._empty_like(cat)
        return idx.range(frm, to, **kw)

    def count(self) -> int:
        cat = self._read_catalog()
        total = 0
        for s in cat["shards"]:
            if s["version"] is not None:
                total += SnapshotStore(self.spark, s["path"]).n_rows(s["version"])
        return total

    def n_shards(self) -> int:
        return len(self._read_catalog()["shards"])

    # -------------------------------------------------------------- writes
    def execute(self, commands: list, version: Optional[str] = None) -> "ShardedIndex":
        """Cross-shard transactional batch.

        Rows route to owning shards (intra-batch duplicate keys share a
        shard by construction, so per-shard validation still sees them);
        each touched shard commits a new physical version; ONE atomic
        catalog swap publishes them all. On any per-shard error the catalog
        is untouched and the logical index still reads every old version —
        the committed orphans are invisible (vacuum reclaims them).
        """
        cat = self._read_catalog()
        key = cat["key"]
        # Only a CALLER-supplied version string is treated as an explicit
        # transaction id (recorded + reuse-rejected per shard). Auto-minted
        # ids stay unrecorded, like the single-store path — otherwise every
        # routine batch would grow each shard's writer_versions list, and
        # the string is never visible to the caller anyway.

        per_shard: dict[int, list] = {}
        for cmd in commands:
            payload = cmd.rows if isinstance(cmd, (Insert, Update)) else getattr(cmd, "keys", None)
            if isinstance(payload, DataFrame):
                raise TypeError(
                    "sharded batches are driver-side row lists (routing "
                    "compares each row against the catalog); for DataFrame "
                    "bulk loads use ShardedIndex.create, or commit to a "
                    "single shard store directly"
                )
            if isinstance(cmd, Insert):
                rows, mk = cmd.rows, lambda rs, c=cmd: Insert(
                    rs, c.upsert, getattr(c, "allow_new_columns", False)
                )
            elif isinstance(cmd, Update):
                rows, mk = cmd.rows, lambda rs: Update(rs)
            elif isinstance(cmd, Remove):
                rows, mk = cmd.keys, lambda rs: Remove(rs)
            else:
                raise TypeError(f"unknown command {cmd!r}")
            routed: dict[int, list] = {}
            for r in rows:
                kt = tuple(r[c] for c in key)
                routed.setdefault(self._owner(cat["shards"], kt)["id"], []).append(r)
            for sid, rs in routed.items():
                per_shard.setdefault(sid, []).append(mk(rs))

        # Per-shard commits are independent (disjoint stores, disjoint key
        # ranges) until the single catalog swap below, so run them
        # CONCURRENTLY — a serial loop would make a wide transaction's
        # latency O(#touched shards) in fixed commit overhead. Spark's
        # driver is thread-safe for concurrent job submission; each thread
        # drives its own store's jobs. Any shard failure cancels nothing
        # already durable but the catalog stays put, so every orphan stays
        # invisible exactly as in the serial path (vacuum reclaims them).
        def _commit_one(s: dict) -> tuple[int, int]:
            h = self._handle(s, cat)
            if h is None:
                h = SnapshotStore(self.spark, s["path"]).create(
                    key, rows_per_partition=cat["rows_per_partition"],
                    max_n_items=cat["shard_capacity"],
                )
            try:
                return s["id"], h.execute(per_shard[s["id"]], version).version
            except ValueError as e:
                if version is not None and "already used" in str(e):
                    # an earlier FAILED cross-shard attempt committed this
                    # writer id on this shard before the catalog swap; the
                    # orphan is invisible (vacuum reclaims it) but the id is
                    # burned — surface the documented retry contract instead
                    # of a bare reuse error
                    raise ValueError(
                        f"writer version {version!r} was already used by "
                        f"shard {s['id']} (orphan of a failed cross-shard "
                        "attempt); retry the transaction with a FRESH "
                        "version string (NOTES.md: a retried cross-shard "
                        "transaction must mint a new id)"
                    ) from e
                raise

        touched = [s for s in cat["shards"] if per_shard.get(s["id"])]
        if not touched:
            # nothing routed anywhere (empty commands / all-empty batches):
            # do not burn a catalog stamp or run the auto-split scan
            return self
        new_versions: dict[int, int] = {}
        if len(touched) <= 1:
            new_versions.update(_commit_one(s) for s in touched)
        else:
            from concurrent.futures import ThreadPoolExecutor

            with ThreadPoolExecutor(max_workers=min(8, len(touched))) as pool:
                # list() propagates the FIRST shard error (raises → catalog
                # stays put), matching the serial path's contract
                new_versions.update(pool.map(_commit_one, touched))
        for s in cat["shards"]:
            if s["id"] in new_versions:
                s["version"] = new_versions[s["id"]]
        self._write_catalog(cat)
        if cat["shard_capacity"]:
            self._auto_split(cat)
        return self

    def insert(
        self,
        rows: list[dict[str, Any]],
        upsert: bool = False,
        version: Optional[str] = None,
        allow_new_columns: bool = False,
    ) -> "ShardedIndex":
        return self.execute([Insert(rows, upsert, allow_new_columns)], version)

    def update(self, rows: list[dict[str, Any]], version: Optional[str] = None) -> "ShardedIndex":
        return self.execute([Update(rows)], version)

    def remove(self, keys: list[dict[str, Any]], version: Optional[str] = None) -> "ShardedIndex":
        return self.execute([Remove(keys)], version)

    def compact(self, target_rows: Optional[int] = None) -> dict[int, int]:
        """Per-shard file compaction behind one catalog swap: each shard's
        :meth:`VersionedIndex.compact` bin-packs the small files its
        partial commits left behind; shards with nothing to pack stay at
        their pinned version. Returns {shard_id: new_version} for the
        shards that changed."""
        cat = self._read_catalog()
        changed: dict[int, int] = {}
        for s in cat["shards"]:
            h = self._handle(s, cat)
            if h is None or h._empty:
                continue
            new = h.compact(target_rows)
            if new.version != s["version"]:
                changed[s["id"]] = new.version
        if changed:
            for s in cat["shards"]:
                if s["id"] in changed:
                    s["version"] = changed[s["id"]]
            self._write_catalog(cat)
        return changed

    def delete_where(self, condition, mor: bool = False) -> dict[int, int]:
        """Logical predicate delete across every shard behind ONE catalog
        swap. The predicate is not key-bounded, so every non-empty shard
        evaluates it against its own snapshot; shards with no matching
        rows keep their pinned version (``delete_where_mor`` no-ops
        without a commit; the COW path probes with a limit(1) first for
        the same reason). ``mor=True`` uses merge-on-read tombstone
        sidecars per shard — zero data files rewritten anywhere. Shards
        are disjoint stores, so the per-shard deletes run concurrently
        like cross-shard commits. Returns {shard_id: new_version} for
        shards that changed."""
        cat = self._read_catalog()

        def _one(s: dict):
            h = self._handle(s, cat)
            if h is None or h._empty:
                return None
            if mor:
                new = h.delete_where_mor(condition)
                return (s["id"], new.version) if new is not h else None
            if h.df.filter(condition).limit(1).count() == 0:
                return None
            return s["id"], h.delete_where(condition).version

        shards = cat["shards"]
        if len(shards) <= 1:
            results = [_one(s) for s in shards]
        else:
            from concurrent.futures import ThreadPoolExecutor

            with ThreadPoolExecutor(max_workers=min(8, len(shards))) as pool:
                results = list(pool.map(_one, shards))
        changed = dict(r for r in results if r is not None)
        if changed:
            for s in cat["shards"]:
                if s["id"] in changed:
                    s["version"] = changed[s["id"]]
            self._write_catalog(cat)
        return changed

    def erase_keys(self, keys: "list[dict]") -> dict:
        """Hard key erasure across the whole LOGICAL index, including its
        pinned history: every shard store the catalog OR any history
        entry references is erased — a retired pre-split store pinned by
        history would otherwise keep the keys resurrectable via
        :meth:`as_of`. Each store receives the full key list (historical
        shard boundaries differ from current ones, so current-boundary
        routing would misroute; a store containing none of the keys
        early-exits on its file stats without writing anything). Shard
        version numbers never change, so no catalog swap is needed.
        Stores are disjoint — erased concurrently, like cross-shard
        commits. Returns {store_path: summary} for stores that erased
        at least one row."""
        if not keys:
            return {}
        cat = self._read_catalog()
        paths = {s["path"] for s in cat["shards"]}
        for h in cat.get("history", []):
            paths |= {s["path"] for s in h["shards"]}

        def _one(path: str):
            store = SnapshotStore(self.spark, path)
            if not store.exists():
                return path, None
            return path, store.erase_keys(keys)

        ordered = sorted(paths)
        if len(ordered) <= 1:
            results = [_one(p) for p in ordered]
        else:
            from concurrent.futures import ThreadPoolExecutor

            with ThreadPoolExecutor(max_workers=min(8, len(ordered))) as pool:
                results = list(pool.map(_one, ordered))
        return {
            p: r for p, r in results if r is not None and r["rows_erased"] > 0
        }

    # ------------------------------------------------------------ temporal
    def snapshot(self) -> int:
        """Pin the current logical state into the catalog history
        (TemporalIndex.snapshot() lifted to shard granularity: the history
        entry is the whole shard list — paths, versions, boundaries — since
        split/merge change the list itself, not just versions)."""
        cat = self._read_catalog()
        hist = cat.setdefault("history", [])
        ts = _now_ns(hist[-1]["ts"] if hist else 0)
        hist.append({"ts": ts, "shards": [dict(s) for s in cat["shards"]]})
        self._write_catalog(cat)
        return ts

    def find(self, t: int) -> Optional[int]:
        """Greatest history ts <= t (TemporalIndex.scala:31-38), or None."""
        best = None
        for h in self._read_catalog().get("history", []):
            if h["ts"] <= t:
                best = h["ts"]
        return best

    def as_of(self, t: int) -> Optional["ShardedIndex"]:
        """Read-only view of the logical index as of history time ``t``
        (greatest snapshot at-or-before t; None before the first)."""
        cat = self._read_catalog()
        best = None
        for h in cat.get("history", []):
            if h["ts"] <= t:
                best = h
        if best is None:
            return None
        frozen = dict(cat)
        frozen["shards"] = best["shards"]
        return _AsOfShardedView(self, frozen)

    # -------------------------------------------------------------- vacuum
    def vacuum(self) -> dict:
        """Reclaim physical state neither the catalog nor its history
        references: per-shard versions other than pinned ones (old commits
        and orphans from failed cross-shard batches) and whole shard
        stores replaced by split/merge that no history entry still reads.
        Single-writer contract applies."""
        import glob as _glob
        import shutil as _shutil

        cat = self._read_catalog()
        # path → pinned versions, across current shards and every history pin
        pins: dict[str, set[int]] = {}
        live_dirs: set[str] = set()
        shard_lists = [cat["shards"]] + [h["shards"] for h in cat.get("history", [])]
        for shards in shard_lists:
            for s in shards:
                live_dirs.add(os.path.abspath(s["path"]))  # empty shards too
                # null-version shards get an (empty) pin entry so their
                # STORE is still vacuumed: a failed cross-shard batch can
                # leave committed-but-unpublished versions in a shard the
                # catalog says is empty — exactly the orphans the module
                # docstring promises vacuum reclaims
                pin = pins.setdefault(os.path.abspath(s["path"]), set())
                if s["version"] is not None:
                    pin.add(s["version"])
        removed_versions: dict[str, list[int]] = {}
        for path, pin in pins.items():
            store = SnapshotStore(self.spark, path)
            if not store.exists():
                continue
            dropped = store.vacuum(keep_last=0, pin=pin)
            if dropped:
                removed_versions[path] = dropped
        # files any kept (pinned) version still references — adopted files
        # may live under _bulk, outside every store dir
        referenced: set[str] = set()
        for path, pin in pins.items():
            store = SnapshotStore(self.spark, path)
            if not store.exists():
                continue
            for row in store._read_manifest()["versions"]:
                if row["version"] in pin:
                    for f in row.get("files") or []:
                        referenced.add(os.path.abspath(f["path"]))
        removed_dirs = []
        for p in _glob.glob(os.path.join(self.base_path, "shard_*")):
            if os.path.abspath(p) in live_dirs:
                continue
            # a dead store's manifest may be the only reference to adopted
            # files living OUTSIDE its directory (bulk-load layout) — delete
            # the unreferenced ones before dropping the manifest itself
            dead = SnapshotStore(self.spark, p)
            if dead.exists():
                for row in dead._read_manifest()["versions"]:
                    for f in row.get("files") or []:
                        fp = os.path.abspath(f["path"])
                        if fp not in referenced and os.path.isfile(fp):
                            os.remove(fp)
            _shutil.rmtree(p, ignore_errors=True)
            removed_dirs.append(p)
        # bound the sharded catalog's own stamped-file tail (shard stores
        # prune theirs inside store.vacuum)
        catalog_io.prune(self.base_path, _CATALOG_NAME)
        return {"versions": removed_versions, "dirs": removed_dirs}

    # --------------------------------------------------------- split/merge
    def _auto_split(self, cat: dict) -> None:
        # fixpoint, not single pass: one big batch can leave a shard at
        # many multiples of capacity, and the two halves of a split may
        # each still exceed it. Bounded: each round halves an over-full
        # shard, and unsplittable shards (all-equal keys) return False
        # and are not retried within a call.
        refused: set[int] = set()
        for _ in range(32):
            split_any = False
            for s in list(cat["shards"]):
                if s["version"] is None or s["id"] in refused:
                    continue
                n = SnapshotStore(self.spark, s["path"]).n_rows(s["version"])
                if n >= cat["shard_capacity"]:
                    if self.split_shard(s["id"]):
                        split_any = True
                    else:
                        refused.add(s["id"])
                    cat.update(self._read_catalog())
            if not split_any:
                return

    def _clear_orphan_child(self, cat: dict, path: str) -> None:
        """Delete a child-store dir left by a split/merge that died before
        its catalog swap. Safe ONLY because the path is provably
        unreferenced: child paths derive from next_shard_id, which is
        advanced by the same catalog write that would have referenced
        them — if the catalog (current shards + every history pin) does
        not know the path, nothing can read it."""
        import shutil as _shutil

        if not os.path.isdir(path):
            return
        known = {os.path.abspath(s["path"]) for s in cat["shards"]}
        for hpin in cat.get("history", []):
            known |= {os.path.abspath(s["path"]) for s in hpin["shards"]}
        if os.path.abspath(path) not in known:
            _shutil.rmtree(path, ignore_errors=True)

    def split_shard(self, shard_id: int) -> bool:
        """Replace one shard with two at a sampled-median boundary
        (reference split(), QueryableIndex.scala:586-679: root's middle
        key). Returns False when the shard can't split (all keys equal /
        too small). The catalog swap is the commit; the old shard's data is
        untouched (still referenced by nothing → vacuumable)."""
        cat = self._read_catalog()
        pos = next(i for i, s in enumerate(cat["shards"]) if s["id"] == shard_id)
        s = cat["shards"][pos]
        h = self._handle(s, cat)
        if h is None or h._empty:
            return False
        left_sorted, right_sorted = h.split()
        lid, rid = cat["next_shard_id"], cat["next_shard_id"] + 1
        lpath = os.path.join(self.base_path, f"shard_{lid:04d}")
        rpath = os.path.join(self.base_path, f"shard_{rid:04d}")
        if left_sorted.df.isEmpty() or right_sorted.df.isEmpty():
            return False
        # a previous attempt may have died between child creation and the
        # catalog swap; next_shard_id was never advanced, so the retry
        # recomputes the same paths — clear the unreferenced orphans or
        # create() would raise INDEX_ALREADY_EXISTS forever
        self._clear_orphan_child(cat, lpath)
        self._clear_orphan_child(cat, rpath)
        lh = SnapshotStore(self.spark, lpath).create(
            cat["key"], df=left_sorted.df, rows_per_partition=cat["rows_per_partition"],
            max_n_items=cat["shard_capacity"],
        )
        rh = SnapshotStore(self.spark, rpath).create(
            cat["key"], df=right_sorted.df, rows_per_partition=cat["rows_per_partition"],
            max_n_items=cat["shard_capacity"],
        )
        boundary = [r for r in lh.max().collect()][0]
        l_upper = [boundary[c] for c in cat["key"]]
        cat["next_shard_id"] += 2
        cat["shards"][pos: pos + 1] = [
            {"id": lid, "path": lpath, "version": lh.version, "upper": l_upper},
            {"id": rid, "path": rpath, "version": rh.version, "upper": s["upper"]},
        ]
        self._write_catalog(cat)
        return True

    def merge_adjacent(self, left_shard_id: int) -> bool:
        """Merge a shard with its right neighbor into one new shard
        (reference merge(), QueryableIndex.scala:561-584: combined count
        must fit capacity; sources survive until vacuum)."""
        cat = self._read_catalog()
        pos = next(i for i, s in enumerate(cat["shards"]) if s["id"] == left_shard_id)
        if pos + 1 >= len(cat["shards"]):
            return False
        ls, rs = cat["shards"][pos], cat["shards"][pos + 1]
        lh, rh = self._handle(ls, cat), self._handle(rs, cat)
        lc = 0 if (lh is None or lh._empty) else lh.count()
        rc = 0 if (rh is None or rh._empty) else rh.count()
        if cat["shard_capacity"] and lc + rc > cat["shard_capacity"]:
            return False
        parts = [h.df for h in (lh, rh) if h is not None and not h._empty]
        if not parts:
            return False
        # allowMissingColumns: a schema-evolving insert may have touched
        # only one of the two shards (same contract as _union)
        merged = (
            parts[0]
            if len(parts) == 1
            else parts[0].unionByName(parts[1], allowMissingColumns=True)
        )
        mid = cat["next_shard_id"]
        mpath = os.path.join(self.base_path, f"shard_{mid:04d}")
        self._clear_orphan_child(cat, mpath)  # crashed-retry orphan (see split_shard)
        mh = SnapshotStore(self.spark, mpath).create(
            cat["key"], df=merged, rows_per_partition=cat["rows_per_partition"],
            max_n_items=cat["shard_capacity"],
        )
        cat["next_shard_id"] += 1
        cat["shards"][pos: pos + 2] = [
            {"id": mid, "path": mpath, "version": mh.version, "upper": rs["upper"]},
        ]
        self._write_catalog(cat)
        return True


class _AsOfShardedView(ShardedIndex):
    """Read-only logical index bound to one history entry's shard list.

    Reuses every routed read; writes and maintenance are refused — the
    reference likewise hands back a plain queryable index for a historical
    snapshot (TemporalIndex.scala:40-51)."""

    def __init__(self, parent: ShardedIndex, frozen_catalog: dict):
        super().__init__(parent.spark, parent.base_path)
        self._frozen = frozen_catalog

    def _read_catalog(self) -> dict:
        return self._frozen

    def _write_catalog(self, cat: dict) -> None:  # pragma: no cover - guard
        raise IndexError_("as-of view is read-only")

    def execute(self, commands: list, version: Optional[str] = None) -> "ShardedIndex":
        raise IndexError_("as-of view is read-only")

    def split_shard(self, shard_id: int) -> bool:
        raise IndexError_("as-of view is read-only")

    def merge_adjacent(self, left_shard_id: int) -> bool:
        raise IndexError_("as-of view is read-only")

    def snapshot(self) -> int:
        raise IndexError_("as-of view is read-only")

    def vacuum(self) -> dict:
        raise IndexError_("as-of view is read-only")

    def erase_keys(self, keys: "list[dict]") -> dict:
        raise IndexError_("as-of view is read-only")

    def delete_where(self, condition, mor: bool = False) -> dict[int, int]:
        raise IndexError_("as-of view is read-only")

    def compact(self, target_rows: Optional[int] = None) -> dict[int, int]:
        raise IndexError_("as-of view is read-only")
