"""Versioned snapshots, batch mutations, and time travel.

Maps the reference's COW machinery to dataset-granularity copy-on-write
(SURVEY.md §1.4, §3.1): one snapshot version = one immutable sorted parquet
dataset + a manifest row. Writers produce version N+1 from N; readers hold a
version and never see in-flight changes (snapshot isolation). The
``history`` list of ``(ts, version)`` pairs is the reference's temporal
B+Tree (``TemporalIndex.scala:6-53``) collapsed to a manifest — at 100 TB
the *data* is huge but the snapshot catalog is tiny, so a manifest lookup
replaces the history-tree descent at zero cost.

Write layout: ``repartitionByRange(N, key) + sortWithinPartitions(key)`` —
range-partitioned, key-sorted parquet. Point/range reads then prune on
parquet row-group min/max, the moral equivalent of the B+Tree descent.
"""

from __future__ import annotations

import json
import os
import time
import uuid
from typing import Any, Optional, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from index_spark.commands import BatchResult, Insert, Remove, Update
from index_spark.errors import (
    CommitConflictError,
    ContextUsedError,
    DuplicatedKeysError,
    IndexAlreadyExistsError,
    IndexNotFoundError,
    KeyNotFoundError,
    TemporalIndexNotFoundError,
    VersionChangedError,
)
from index_spark import catalog as catalog_io
from index_spark.index import SortedIndex

VERSION_COL = "__version"
_MANIFEST_NAME = "_manifest"


def _now_ns(prev: int) -> int:
    """Strictly-increasing nanotime stand-in (SURVEY.md §7 risk register:
    do not trust wall-clock monotonicity)."""
    return max(prev + 1, time.time_ns())


def _from_file_uri(p: str) -> str:
    """input_file_name() returns a percent-encoded file URI; invert BOTH
    steps (scheme strip + URL decoding) or a base path containing a space
    would be recorded as '%20' and never match the real file again —
    breaking read()/vacuum and, worst, letting erase_keys silently skip
    the bytes it promised to destroy."""
    from urllib.parse import unquote

    return os.path.abspath(unquote(p.replace("file://", "")))


def stat_row_to_file(r, key: Sequence[str]) -> dict:
    """Manifest file-stat entry from a grouped-by-input_file_name stats row
    (single producer of the {path,min,max,n_rows} shape — keep path
    normalization here)."""
    return {
        "path": _from_file_uri(r.p),
        "min": [r[f"min_{c}"] for c in key],
        "max": [r[f"max_{c}"] for c in key],
        "n_rows": r.n,
    }


_BLOOM_SAFE_DTYPES = {"tinyint", "smallint", "int", "bigint", "string"}


_BLOOM_NULL = "\x00null"


def _bloom_positions_expr(key_cols: Sequence[str], m_bits: int, k: int):
    """Spark-side bit positions for a row's key: k independent md5-based
    hashes of the canonical 'v1|v2#i' string. The SAME bytes hash on the
    driver side (:func:`_bloom_positions_py`) — parity holds because int
    and string casts render identically in both runtimes (why blooms are
    restricted to _BLOOM_SAFE_DTYPES). NULL key values get an explicit
    sentinel: ``concat_ws`` SKIPS nulls, so an unguarded (7, NULL) key
    would render '7' JVM-side but '7|…' driver-side — a silent bloom
    false negative."""
    s = F.concat_ws(
        "|",
        *[
            F.coalesce(F.col(c).cast("string"), F.lit(_BLOOM_NULL))
            for c in key_cols
        ],
    )
    return F.array(
        *[
            (
                F.conv(F.substring(F.md5(F.concat(s, F.lit(f"#{i}"))), 1, 8), 16, 10)
                .cast("long")
                % m_bits
            ).cast("int")
            for i in range(k)
        ]
    )


def _bloom_positions_py(vals: Sequence[Any], m_bits: int, k: int) -> list[int]:
    import hashlib

    s = "|".join(_BLOOM_NULL if v is None else str(v) for v in vals)
    return [
        int(hashlib.md5((s + f"#{i}").encode()).hexdigest()[:8], 16) % m_bits
        for i in range(k)
    ]


def _bloom_encode(positions: Sequence[int], m_bits: int) -> str:
    import base64

    bits = bytearray(m_bits // 8)
    for p in positions:
        bits[p // 8] |= 1 << (p % 8)
    return base64.b64encode(bytes(bits)).decode("ascii")


def _bloom_contains(b64: str, positions: Sequence[int]) -> bool:
    import base64

    bits = base64.b64decode(b64)
    return all(bits[p // 8] & (1 << (p % 8)) for p in positions)


class SnapshotStore:
    """Versioned parquet datasets + JSON manifest under ``base_path``.

    Manifest schema::

        {"index_id": str, "key": [...], "rows_per_partition": int,
         "versions": [{"version": int, "version_id": str, "ts": int,
                        "n_rows": int}],
         "history": [{"ts": int, "version": int}]}

    ``versions`` is every committed snapshot; ``history`` is the subset the
    user explicitly snapshot()-ed for time travel (reference distinction
    between save() and TemporalIndex.snapshot(), TemporalIndex.scala:21-27).
    Single-writer by contract (Index.scala:16) — manifest writes are
    last-writer-wins, like the reference's descriptor CAS under one writer.
    """

    def __init__(self, spark: SparkSession, base_path: str):
        self.spark = spark
        self.base_path = base_path

    # ------------------------------------------------------------- manifest
    # Commits go through index_spark.catalog: immutable version-stamped
    # manifest files + put-if-absent (the object-store-portable CAS; see
    # that module's docstring). A writer carries the stamp it READ inside
    # the manifest dict (_MV key, stripped on write); a concurrent commit
    # in between surfaces as CommitConflictError, never a silent clobber.
    _MV = "__manifest_stamp"

    def exists(self) -> bool:
        return catalog_io.read_latest(self.base_path, _MANIFEST_NAME) is not None

    def _read_manifest(self) -> dict:
        got = catalog_io.read_latest(self.base_path, _MANIFEST_NAME)
        if got is None:
            raise IndexNotFoundError(f"no index at {self.base_path}")
        m, stamp = got
        m[self._MV] = stamp
        return m

    def _write_manifest(self, m: dict) -> None:
        expected = m.pop(self._MV, None)
        catalog_io.commit(self.base_path, _MANIFEST_NAME, m, expected)

    # -------------------------------------------------------------- create
    def create(
        self,
        key: Sequence[str],
        df: Optional[DataFrame] = None,
        rows_per_partition: int = 1_000_000,
        index_id: Optional[str] = None,
        max_n_items: Optional[int] = None,
        n_partitions: Optional[int] = None,
    ) -> "VersionedIndex":
        """Create an index; optional initial data becomes version 0.
        ``max_n_items`` is the reference's capacity bound (``maxNItems``,
        ``IndexContext`` — index.proto:68-78) gating split/merge.
        ``n_partitions`` skips the layout-sizing count job when the caller
        already knows the cardinality bound (e.g. sharded bulk load)."""
        if self.exists():
            raise IndexAlreadyExistsError(self.base_path)
        m = {
            "index_id": index_id or str(uuid.uuid4()),
            "key": list(key),
            "rows_per_partition": rows_per_partition,
            "max_n_items": max_n_items,
            "versions": [],
            "history": [],
        }
        n_rows: Optional[int] = None
        if df is not None:
            # the key-uniqueness invariant every later mutation enforces
            # must hold at birth too — a dup-keyed version 0 silently
            # corrupts every join-based validation downstream. Gate BEFORE
            # writing the manifest: a manifest committed ahead of a failed
            # dup check would poison the path (every retry would hit
            # IndexAlreadyExistsError until manually deleted).
            # ONE pass serves both birth checks: the per-key counts the dup
            # gate needs already sum to the total row count the partition
            # layout needs, so the former separate ``df.count()`` scan is
            # folded into the dup-check aggregation (at 100 TB: one full
            # input pass removed from every bulk create). The ≤20-key error
            # payload is only recomputed on the (rare) failure path.
            n_rows, max_per_key = VersionedIndex._key_cardinality(df, list(key))
            if max_per_key > 1:
                # the ≤20-key payload re-evaluates the input plan; a
                # NON-DETERMINISTIC plan (e.g. rand()-derived keys) can
                # disagree with the verdict and find none — keep the raise
                # truthful rather than empty-handed
                raise DuplicatedKeysError(
                    VersionedIndex._dup_keys_in_batch(df, list(key))
                    or [("<unstable input: recompute found no dups>",)]
                )
        self._write_manifest(m)
        if df is not None:
            if VERSION_COL not in df.columns:
                df = df.withColumn(VERSION_COL, F.lit(str(uuid.uuid4())))
            n_parts = n_partitions or max(1, -(-n_rows // rows_per_partition))
            self.commit(df, list(key), rows_per_partition, n_partitions=n_parts)
        return self.latest()

    def create_from_files(
        self,
        key: Sequence[str],
        data_path: str,
        rows_per_partition: int = 1_000_000,
        index_id: Optional[str] = None,
        max_n_items: Optional[int] = None,
        files: Optional[list[dict]] = None,
    ) -> "VersionedIndex":
        """Adopt already-written parquet files as version 0 WITHOUT
        rewriting them (the CONVERT-style metadata-only commit). The caller
        guarantees the files are key-disjoint and internally key-sorted —
        e.g. one range-partitioned bulk write split across many stores
        (sharded bulk load: one pass over the source instead of one scan
        per shard). Only per-file stats are computed — or adopted verbatim
        via ``files`` when the caller already has them (one stats job for
        many stores); data is never moved."""
        if self.exists():
            raise IndexAlreadyExistsError(self.base_path)
        m = {
            "index_id": index_id or str(uuid.uuid4()),
            "key": list(key),
            "rows_per_partition": rows_per_partition,
            "max_n_items": max_n_items,
            "versions": [],
            "history": [],
        }
        if files is None:
            files = self._file_stats(data_path, list(key))
        try:  # adoption stores data OUTSIDE the version dir, so the file
            # list is load-bearing — unlike commit() there is no dir-level
            # fallback; non-JSON-able key stats must use create(df=...)
            json.dumps([f["min"] + f["max"] for f in files])
        except TypeError as e:
            raise ValueError(
                "create_from_files requires JSON-able key stats "
                "(date/decimal keys: use create(df=...) instead)"
            ) from e
        m["versions"].append(
            {
                "version": 0,
                "version_id": str(uuid.uuid4()),
                "ts": _now_ns(0),
                "n_rows": sum(f["n_rows"] for f in files),
                "files": files,
            }
        )
        self._write_manifest(m)
        return self.latest()

    def max_n_items(self) -> Optional[int]:
        return self._read_manifest().get("max_n_items")

    def _file_stats(self, path: str, key: Sequence[str]) -> list[dict]:
        """Per-file (path, key min/max, rows) for the files under ``path`` —
        the manifest-level analog of parquet row-group stats, enabling
        file-level COW (only files whose key range a batch touches get
        rewritten). Per-column independent min/max: for composite keys this
        is a conservative SUPERSET of the true lexicographic tuple range,
        so the overlap test may touch extra files but never misses one.

        Fast path: read the footers driver-side (zero Spark jobs — at any
        scale this beats re-scanning the data columns just written).
        Numeric key columns only: parquet truncates long binary/string
        stats, which would shrink the interval unsoundly — those fall back
        to a column-pruned Spark scan."""
        footer = self._file_stats_from_footers(path, key)
        if footer is not None:
            return footer
        df = self.spark.read.parquet(path)
        rows = (
            df.groupBy(F.input_file_name().alias("p"))
            .agg(
                *[F.min(c).alias(f"min_{c}") for c in key],
                *[F.max(c).alias(f"max_{c}") for c in key],
                F.count(F.lit(1)).alias("n"),
            )
            .collect()
        )
        return [stat_row_to_file(r, key) for r in rows]

    _FOOTER_SAFE_TYPES = {"INT32", "INT64", "FLOAT", "DOUBLE", "BOOLEAN"}

    def _file_stats_from_footers(self, path: str, key: Sequence[str]) -> Optional[list[dict]]:
        """Footer-based stats, or None when any key column's physical type
        is subject to statistics truncation (strings/binary) or stats are
        missing — callers then pay the Spark scan instead."""
        import glob as _glob

        try:
            import pyarrow.parquet as pq
        except ImportError:  # pragma: no cover - pyarrow is baked in
            return None
        paths = (
            sorted(_glob.glob(os.path.join(path, "*.parquet")))
            if os.path.isdir(path)
            else [path]
        )
        if not paths:
            return None
        out = []
        for p in paths:
            try:
                md = pq.ParquetFile(p).metadata
            except Exception:
                return None
            name_to_idx = {md.schema.column(i).name: i for i in range(md.num_columns)}
            mins: list[Any] = []
            maxs: list[Any] = []
            for c in key:
                i = name_to_idx.get(c)
                if i is None or md.schema.column(i).physical_type not in self._FOOTER_SAFE_TYPES:
                    return None
                cmin = cmax = None
                for rg in range(md.num_row_groups):
                    st = md.row_group(rg).column(i).statistics
                    if st is None or not st.has_min_max:
                        return None
                    cmin = st.min if cmin is None else min(cmin, st.min)
                    cmax = st.max if cmax is None else max(cmax, st.max)
                if cmin is None:  # zero row groups (empty file)
                    return None
                mins.append(cmin)
                maxs.append(cmax)
            # absolute paths only: the manifest must stay readable (and
            # vacuum's referenced-set correct) from any later CWD
            out.append({"path": os.path.abspath(p), "min": mins, "max": maxs, "n_rows": md.num_rows})
        return out

    def commit(
        self,
        df: DataFrame,
        key: Sequence[str],
        rows_per_partition: int,
        n_partitions: Optional[int] = None,
        carry_files: Optional[list[dict]] = None,
        expected_stamp: Optional[int] = None,
        writer_version: Optional[str] = None,
        tombstones: Optional[list[str]] = None,
        n_rows_override: Optional[int] = None,
    ) -> int:
        """Write ``df`` as the next snapshot version (sorted, range-partitioned).

        One evaluation of the staged plan: the write itself. Partition count
        comes from AQE (range exchange + advisory-size coalescing) unless
        ``n_partitions`` is given — counting first would evaluate the whole
        staged mutation plan (validation joins included) twice. The
        manifest's O(1) row count is read back from parquet footers
        (metadata-only job), and per-file key min/max stats are recorded to
        enable file-level COW. ``carry_files`` are untouched files from the
        base version referenced (not copied) into the new version.

        ``expected_stamp`` is the manifest stamp the writing handle was
        CREATED with: the final conditional put targets stamp+1, so a
        concurrent commit between handle creation and here loses with
        CommitConflictError instead of silently dropping the other
        writer's rows (snapshot-isolation CAS, the reference's descriptor
        LWT). Checked eagerly too, before the data files are written."""
        m = self._read_manifest()
        if expected_stamp is not None:
            if m[self._MV] != expected_stamp:
                raise CommitConflictError(
                    f"manifest advanced to stamp {m[self._MV]} past this "
                    f"handle's base {expected_stamp} — take a fresh handle"
                )
            m[self._MV] = expected_stamp
        if writer_version is not None:
            # A caller-supplied writer-version string is a transaction id
            # (the reference's ctx id — unique per transaction): reusing one
            # across commits would make diff()'s writer-version comparison
            # blind to genuine updates (__v_old == __v_new). Reject reuse
            # rather than suffix-uniquify, so expected-version CC keeps
            # comparing exactly the string the caller wrote. The used-id
            # set lives at MANIFEST level (not per version row) so vacuum
            # pruning old rows cannot forget an id whose rows may still be
            # carried (file-level COW) into live versions.
            used = m.setdefault("writer_versions", [])
            if writer_version in used or any(
                row.get("writer_version") == writer_version for row in m["versions"]
            ):
                raise ValueError(
                    f"writer version {writer_version!r} was already used by a "
                    "previous commit; version strings are per-transaction ids"
                )
            used.append(writer_version)
        version = (m["versions"][-1]["version"] + 1) if m["versions"] else 0
        # Unique per-commit data directory: two truly-concurrent writers from
        # the same base stamp both compute the same next version NUMBER; a
        # shared v{N} directory would let the loser's part-files land in the
        # winner's directory before _file_stats lists it (manifest CAS
        # correct, data silently wrong). With a uuid suffix, visibility is
        # decided SOLELY by the manifest put-if-absent; a losing writer's
        # directory is orphaned and reclaimed by vacuum().
        path = os.path.join(self.base_path, f"v{version:06d}-{uuid.uuid4().hex[:8]}")
        part_cols = [F.col(c) for c in key]
        ranged = (
            df.repartitionByRange(n_partitions, *part_cols)
            if n_partitions
            else df.repartitionByRange(*part_cols)
        )
        ranged.sortWithinPartitions(*key).write.mode("errorifexists").parquet(path)
        files = self._file_stats(path, key) + list(carry_files or [])
        try:  # key min/max must survive the JSON manifest round-trip
            json.dumps([f["min"] + f["max"] for f in files])
        except TypeError:
            # non-JSON-able key type → dir-level version only. carry_files
            # would be silently dropped — refuse (cannot happen via
            # upsert_partial, which requires a stats-bearing base).
            assert not carry_files, "file-level COW requires JSON-able key stats"
            files = None
        if n_rows_override is not None:
            # carried tombstones hide an unknown share of the carried files'
            # physical rows — the caller (compact on a MOR base) knows the
            # exact live count (unchanged by compaction) and supplies it
            n_rows = n_rows_override
        elif files is not None:
            n_rows = sum(f["n_rows"] for f in files)
        else:
            n_rows = self.spark.read.parquet(path).count()
        prev_ts = m["versions"][-1]["ts"] if m["versions"] else 0
        m["versions"].append(
            {
                "version": version,
                "version_id": str(uuid.uuid4()),
                "ts": _now_ns(prev_ts),
                "n_rows": n_rows,
                "files": files,
                "data_path": path,
                **({"tombstones": tombstones} if tombstones else {}),
                **({"writer_version": writer_version} if writer_version else {}),
            }
        )
        self._write_manifest(m)
        return version

    def versions_df(self) -> DataFrame:
        """Store introspection (DESCRIBE HISTORY): one row per committed
        version with its row count, file count, and writer-version string
        — straight from the manifest, zero data I/O. ``n_files`` NULL for
        dir-level (stat-less) versions."""
        m = self._read_manifest()
        rows = [
            (
                r["version"],
                r["n_rows"],
                len(r["files"]) if r.get("files") is not None else None,
                r.get("writer_version"),
            )
            for r in m["versions"]
        ]
        return self.spark.createDataFrame(
            rows, "version int, n_rows long, n_files int, writer_version string"
        )

    def build_blooms(
        self, version: Optional[int] = None, m_bits: int = 4096, k: int = 3
    ) -> int:
        """Per-file key Bloom filters into the manifest (the OPTIMIZE-style
        metadata step; Delta/Iceberg ship the same idea as file-skipping
        indexes). Zone maps prune point gets by key RANGE; once mutation
        history makes file ranges overlap, a point probe still opens every
        overlapping file. A ~4 KB bloom per file prunes by key CONTENT:
        :meth:`VersionedIndex.read_point` skips any file whose filter
        rejects the probe — the manifest-level analog of the reference's
        exact leaf descent (Index.scala:62-99). One column-pruned scan of
        the version's files; blooms live in the manifest row keyed by file
        path. Restricted to int/string key columns (cast-to-string parity
        between JVM and driver hashing). Returns the number of files
        fitted. Advances the manifest stamp — writers take a fresh handle
        afterwards (same contract as any metadata commit)."""
        if m_bits % 8 or m_bits <= 0:
            raise ValueError(
                f"m_bits must be a positive multiple of 8, got {m_bits} "
                "(the bitmap is byte-encoded)"
            )
        m = self._read_manifest()
        key = m["key"]
        if not m["versions"]:
            raise IndexNotFoundError("no committed version to bloom")
        want = version if version is not None else m["versions"][-1]["version"]
        row = next((r for r in m["versions"] if r["version"] == want), None)
        if row is None:
            raise IndexNotFoundError(f"version {want}")
        files = row.get("files")
        if not files:
            raise ValueError("build_blooms requires a stats-bearing (file-listed) version")
        df = self.spark.read.option("mergeSchema", "true").parquet(
            *[f["path"] for f in files]
        )
        bad = [
            (c, t) for c, t in df.select(*key).dtypes if t not in _BLOOM_SAFE_DTYPES
        ]
        if bad:
            raise ValueError(
                f"bloom filters need int/string key columns, got {bad}"
            )
        got = (
            df.select(
                F.input_file_name().alias("p"),
                F.explode(_bloom_positions_expr(key, m_bits, k)).alias("pos"),
            )
            .groupBy("p")
            .agg(F.collect_set("pos").alias("ps"))
            .collect()
        )
        blooms = {
            _from_file_uri(r.p): _bloom_encode(r.ps, m_bits) for r in got
        }
        row["blooms"] = blooms
        row["bloom_m"] = m_bits
        row["bloom_k"] = k
        self._write_manifest(m)
        return len(blooms)

    def change_feed(self, from_version: int, to_version: int) -> DataFrame:
        """Multi-version CDF (Delta's ``table_changes`` shape): one row per
        (key, version-step) whose state changed, ``change ∈ {insert,
        update, delete}`` stamped with the version that introduced it —
        what an incremental downstream consumer replays instead of
        re-diffing snapshots pairwise.

        Built as the union of per-step :meth:`diff` plans, each of which
        scans only the SYMMETRIC DIFFERENCE of the two versions' file
        lists (see :meth:`diff`) — so a step's I/O tracks the files its
        commit touched, not the table size (measured: 5M-row store, two
        single-key commits → the whole feed reads 4 small files, ~1 s per
        step locally)."""
        if from_version > to_version:
            raise ValueError(
                f"change_feed requires from_version <= to_version, got "
                f"{from_version} > {to_version}"
            )
        steps = [
            self.diff(v, v + 1).withColumn(
                "version", F.lit(v + 1).cast("int")
            )
            for v in range(from_version, to_version)
        ]
        if not steps:
            key = self._read_manifest()["key"]
            return (
                self.read(from_version)
                .select(*key)
                .filter(F.lit(False))
                .withColumn("change", F.lit(None).cast("string"))
                .withColumn("__v_old", F.lit(None).cast("string"))
                .withColumn("__v_new", F.lit(None).cast("string"))
                .withColumn("version", F.lit(None).cast("int"))
            )
        out = steps[0]
        for s in steps[1:]:
            out = out.unionByName(s)
        return out

    def rollback(self, to_version: int) -> int:
        """RESTORE: make the head a copy of ``to_version`` — a
        metadata-only commit (zero data I/O) whose version row carries the
        old version's file list by reference, exactly like file-level COW
        carries untouched files. History is preserved (the rolled-back
        versions remain readable until vacuumed); the change feed sees the
        restore as one ordinary version step, so ``diff(bad, restored)``
        reports precisely the undone rows."""
        row = self._version_row(to_version)
        files = row.get("files")
        m = self._read_manifest()
        version = (m["versions"][-1]["version"] + 1) if m["versions"] else 0
        prev_ts = m["versions"][-1]["ts"] if m["versions"] else 0
        m["versions"].append(
            {
                "version": version,
                "version_id": str(uuid.uuid4()),
                "ts": _now_ns(prev_ts),
                "n_rows": row["n_rows"],
                "files": files,
                "data_path": self._version_dir(row),
                # restoring a merge-on-read version must restore its
                # tombstones too, or the deleted rows would resurrect
                **(
                    {"tombstones": row["tombstones"]}
                    if row.get("tombstones")
                    else {}
                ),
            }
        )
        self._write_manifest(m)
        return version

    def commit_mor_delete(
        self,
        base_version: int,
        tombstone_paths: list[str],
        n_deleted: int,
        expected_stamp: Optional[int] = None,
        writer_version: Optional[str] = None,
    ) -> int:
        """Metadata-only commit of a merge-on-read delete: version N+1
        references the base version's data files UNCHANGED plus the new
        key-tombstone sidecar(s); reads subtract tombstoned keys with an
        anti-join (:meth:`_apply_tombstones`). No data file is rewritten —
        the Delta deletion-vector / Iceberg positional-delete shape at key
        granularity. Same manifest CAS + writer-version-reuse rules as
        :meth:`commit`."""
        m = self._read_manifest()
        if expected_stamp is not None:
            if m[self._MV] != expected_stamp:
                raise CommitConflictError(
                    f"manifest advanced to stamp {m[self._MV]} past this "
                    f"handle's base {expected_stamp} — take a fresh handle"
                )
            m[self._MV] = expected_stamp
        if writer_version is not None:
            used = m.setdefault("writer_versions", [])
            if writer_version in used or any(
                row.get("writer_version") == writer_version for row in m["versions"]
            ):
                raise ValueError(
                    f"writer version {writer_version!r} was already used by a "
                    "previous commit; version strings are per-transaction ids"
                )
            used.append(writer_version)
        base = next(
            (r for r in m["versions"] if r["version"] == base_version), None
        )
        if base is None:
            raise IndexNotFoundError(f"version {base_version}")
        version = m["versions"][-1]["version"] + 1
        prev_ts = m["versions"][-1]["ts"]
        m["versions"].append(
            {
                "version": version,
                "version_id": str(uuid.uuid4()),
                "ts": _now_ns(prev_ts),
                "n_rows": base["n_rows"] - n_deleted,
                "files": base.get("files"),
                "data_path": self._version_dir(base),
                "tombstones": (base.get("tombstones") or [])
                + [os.path.abspath(p) for p in tombstone_paths],
                **({"writer_version": writer_version} if writer_version else {}),
            }
        )
        self._write_manifest(m)
        return version

    def clone_to(self, dest_path: str, version: Optional[int] = None) -> "VersionedIndex":
        """Zero-copy (shallow) clone: a NEW store at ``dest_path`` whose
        version 0 references this store's files — no data moves (Delta's
        SHALLOW CLONE shape: fork a 100 TB table for an experiment in
        milliseconds). The clone then evolves independently via its own
        COW commits. Caveat shared with every shallow clone: vacuuming the
        SOURCE store can delete files the clone still references — deep-
        copy (create(df=...)) before reclaiming the source."""
        m = self._read_manifest()
        row = self._version_row(
            version if version is not None else m["versions"][-1]["version"]
        )
        files = row.get("files")
        if files is None:
            raise ValueError(
                "clone_to requires a stats-bearing (file-listed) source version"
            )
        if row.get("tombstones"):
            # create_from_files has no tombstone slot; a clone that dropped
            # them would resurrect deleted rows. Callers compact() first.
            raise ValueError(
                "clone_to of a merge-on-read version would drop its "
                "tombstones — compact() the source head first"
            )
        dest = SnapshotStore(self.spark, dest_path)
        return dest.create_from_files(
            m["key"],
            data_path=self._version_dir(row),
            rows_per_partition=m["rows_per_partition"],
            max_n_items=m.get("max_n_items"),
            files=files,
        )

    def _version_path(self, version: int) -> str:
        # legacy (pre data_path manifests) dir layout — readers prefer the
        # manifest-recorded data_path
        return os.path.join(self.base_path, f"v{version:06d}")

    def _version_dir(self, row: dict) -> str:
        return row.get("data_path") or self._version_path(row["version"])

    # --------------------------------------------------------------- reads
    def _version_row(self, version: int) -> dict:
        for row in self._read_manifest()["versions"]:
            if row["version"] == version:
                return row
        raise IndexNotFoundError(f"version {version}")

    def read(self, version: int) -> DataFrame:
        row = self._version_row(version)
        files = row.get("files")
        if files:
            # file-level COW: a version is a file LIST (possibly spanning
            # older version directories), not necessarily one directory.
            # mergeSchema: after a schema-evolving commit the list mixes
            # old- and new-schema files; merging is a footer-only metadata
            # step, and rows from pre-evolution files read NULL in the
            # added columns.
            df = self.spark.read.option("mergeSchema", "true").parquet(
                *[f["path"] for f in files]
            )
        else:
            df = self.spark.read.parquet(self._version_dir(row))
        return self._apply_tombstones(df, row)

    def _apply_tombstones(self, df: DataFrame, row: dict) -> DataFrame:
        """Merge-on-read deletes: a version may carry key-granularity
        tombstone sidecars (``delete_where_mor``); reads subtract them with
        one anti-join on the key. The Delta deletion-vector / Iceberg
        merge-on-read shape: at 100 TB, deleting 10 rows from a 1 GB file
        writes a 10-row sidecar, never the gigabyte."""
        tombs = row.get("tombstones")
        if not tombs:
            return df
        key = self._read_manifest()["key"]
        dead = self.spark.read.parquet(*tombs).select(*key)
        return df.join(dead, on=list(key), how="left_anti")

    def diff(self, from_version: int, to_version: int) -> DataFrame:
        """Change feed between two snapshot versions: one row per key whose
        state differs, with ``change ∈ {insert, update, delete}`` plus the
        old/new writer-version columns (the CDF a downstream incremental
        consumer reads instead of re-scanning the snapshot).

        Plan shape: full outer join of the two snapshots on the key —
        ONE shuffle on the key (or none, since both sides are the SAME
        range layout: identically-partitioned sorted parquet zips
        locality-friendly). Under file-level COW, carried files are
        byte-identical between versions, and the writer-version comparison
        (not value comparison) classifies rows, so wide values never need
        comparing. A key rewritten with the same writer version string in
        both snapshots reports nothing — correct, since COW carries, never
        rewrites-in-place (and :meth:`commit` rejects reuse of an explicit
        writer-version string across commits, so carry is the ONLY way two
        snapshots share one).

        **Churn-proportional I/O**: when both versions carry file lists
        (and neither has merge-on-read tombstones), only the SYMMETRIC
        DIFFERENCE of the two lists is scanned. Sound because a snapshot's
        files partition its rows and keys are unique per snapshot: a file
        present in both versions holds the identical row for every key in
        it on both sides — those keys cannot differ, so shared files never
        contribute a diff row. A small commit against a 100 TB table then
        diffs in time proportional to the files it touched, not the table.
        MOR-tombstoned versions fall back to the full scan (their deltas
        hide in shared files)."""
        if from_version > to_version:
            raise ValueError(
                f"diff requires from_version <= to_version, got "
                f"{from_version} > {to_version} (a swapped range would "
                "silently invert insert/delete semantics)"
            )
        ra = self._version_row(from_version)
        rb = self._version_row(to_version)
        key = self._read_manifest()["key"]
        fa, fb = ra.get("files"), rb.get("files")
        if (
            fa is not None
            and fb is not None
            and not ra.get("tombstones")
            and not rb.get("tombstones")
        ):
            pa = {f["path"] for f in fa}
            pb = {f["path"] for f in fb}
            ua = sorted(pa - pb)
            ub = sorted(pb - pa)

            def side(paths):
                if not paths:
                    # schema resolved lazily and only here: reading it via
                    # read() on the non-empty path would open every footer
                    # of the old version, defeating the pruning
                    return self.spark.createDataFrame(
                        [], self.read(from_version).schema
                    )
                return self.spark.read.option("mergeSchema", "true").parquet(*paths)

            a = side(ua).select(*key, F.col(VERSION_COL).alias("__v_old"))
            b = side(ub).select(*key, F.col(VERSION_COL).alias("__v_new"))
        else:
            a = self.read(from_version).select(
                *key, F.col(VERSION_COL).alias("__v_old")
            )
            b = self.read(to_version).select(
                *key, F.col(VERSION_COL).alias("__v_new")
            )
        j = a.join(b, on=list(key), how="full_outer")
        change = (
            F.when(F.col("__v_old").isNull(), F.lit("insert"))
            .when(F.col("__v_new").isNull(), F.lit("delete"))
            .when(F.col("__v_old") != F.col("__v_new"), F.lit("update"))
        )
        return (
            j.withColumn("change", change)
            .filter(F.col("change").isNotNull())
            .select(*key, "change", "__v_old", "__v_new")
        )

    def latest_version(self) -> int:
        m = self._read_manifest()
        if not m["versions"]:
            raise IndexNotFoundError(f"index at {self.base_path} has no committed version")
        return m["versions"][-1]["version"]

    def latest(self) -> "VersionedIndex":
        m = self._read_manifest()
        v = m["versions"][-1]["version"] if m["versions"] else None
        return VersionedIndex(self, m["key"], v, m["rows_per_partition"], base_stamp=m[self._MV])

    def at_version(self, version: int) -> "VersionedIndex":
        m = self._read_manifest()
        return VersionedIndex(self, m["key"], version, m["rows_per_partition"], base_stamp=m[self._MV])

    def n_rows(self, version: int) -> int:
        m = self._read_manifest()
        for row in m["versions"]:
            if row["version"] == version:
                return row["n_rows"]
        raise IndexNotFoundError(f"version {version}")

    # ------------------------------------------------------------ temporal
    def record_snapshot(self) -> int:
        """TemporalIndex.snapshot(): append (ts, latest version) to history."""
        m = self._read_manifest()
        if not m["versions"]:
            raise IndexNotFoundError("nothing to snapshot")
        prev_ts = m["history"][-1]["ts"] if m["history"] else 0
        ts = _now_ns(max(prev_ts, m["versions"][-1]["ts"]))
        m["history"].append({"ts": ts, "version": m["versions"][-1]["version"]})
        self._write_manifest(m)
        return ts

    def history(self) -> list[dict]:
        return self._read_manifest()["history"]

    def find_as_of(self, ts: int) -> Optional[int]:
        """Greatest history entry with entry.ts <= ts (TemporalIndex.scala:31-38)."""
        best = None
        for h in self._read_manifest()["history"]:
            if h["ts"] <= ts:
                best = h["version"]
        return best

    # -------------------------------------------------------------- vacuum
    def vacuum(
        self,
        keep_last: int = 1,
        pin: Optional[set[int]] = None,
        dry_run: bool = False,
    ) -> list[int]:
        """Garbage-collect snapshot data (SURVEY.md §7 risk register:
        one COW version per batch proliferates files).

        Keeps the last ``keep_last`` versions plus every version pinned by
        the time-travel ``history`` plus any explicitly ``pin``-ned
        versions (a sharded catalog pins the version it reads, which may
        be BEHIND orphaned commits from a failed cross-shard batch — pass
        ``keep_last=0, pin={catalog_version}`` to reclaim the orphans).
        With file-level COW a kept version may reference files living
        under a dropped version's directory, so deletion is per-FILE:
        only files referenced by no kept version are removed. Returns the
        removed version numbers. ``dry_run=True`` returns the versions
        that WOULD be dropped without touching manifest or disk (the
        Delta ``VACUUM DRY RUN`` shape — check the blast radius first).
        Single-writer contract applies — do not vacuum concurrently with
        a writer holding an older base version."""
        import glob as _glob
        import shutil as _shutil

        m = self._read_manifest()
        versions = [row["version"] for row in m["versions"]]
        pinned = set(versions[-keep_last:]) if keep_last > 0 else set()
        pinned |= {h["version"] for h in m["history"]}
        pinned |= set(pin or ()) & set(versions)
        removed = [v for v in versions if v not in pinned]
        if dry_run:
            return removed

        import re as _re

        referenced: set[str] = set()
        kept_dirs: set[str] = set()
        for row in m["versions"]:
            if row["version"] not in pinned:
                continue
            kept_dirs.add(os.path.abspath(self._version_dir(row)))
            for t in row.get("tombstones") or ():
                referenced.add(os.path.abspath(t))
                # sidecars live in their own ts-* dirs; keep the dir too
                referenced.add(os.path.abspath(os.path.dirname(t)))
            files = row.get("files")
            if files:
                referenced |= {os.path.abspath(f["path"]) for f in files}
            else:  # dir-level version (no file stats): everything under its dir
                referenced |= {
                    os.path.abspath(p)
                    for p in _glob.glob(os.path.join(self._version_dir(row), "*"))
                }
        removed_rows = [row for row in m["versions"] if row["version"] in set(removed)]
        # Sweep every version-pattern directory that is not a kept version's:
        # this covers both dropped versions' dirs AND orphaned dirs left by
        # losing concurrent writers (data written, manifest CAS lost). Safe
        # under the single-writer vacuum contract above — an IN-FLIGHT
        # commit's dir would look orphaned, which is exactly why concurrent
        # vacuum is excluded. Kept versions may reference files inside a
        # dropped/orphaned dir (file-level COW), so deletion stays per-FILE.
        vpat = _re.compile(r"v\d{6}(-[0-9a-f]{8})?$")
        for vdir in _glob.glob(os.path.join(self.base_path, "v*")):
            if not os.path.isdir(vdir) or not vpat.fullmatch(os.path.basename(vdir)):
                continue
            if os.path.abspath(vdir) in kept_dirs:
                continue
            for p in _glob.glob(os.path.join(vdir, "*")):
                if os.path.abspath(p) not in referenced:
                    os.remove(p) if os.path.isfile(p) else _shutil.rmtree(p, ignore_errors=True)
            if not any(os.path.abspath(p) in referenced for p in _glob.glob(os.path.join(vdir, "*"))):
                _shutil.rmtree(vdir, ignore_errors=True)
        # erase-* output dirs (key-erasure rewrites) hold kept versions'
        # relocated data AND possibly orphans from dropped versions or
        # crashed erasures — same per-file referenced-set sweep as above
        for edir in _glob.glob(os.path.join(self.base_path, "erase-*")):
            if not os.path.isdir(edir):
                continue
            for sub in _glob.glob(os.path.join(edir, "*")):
                for p in _glob.glob(os.path.join(sub, "*")):
                    if os.path.abspath(p) not in referenced and os.path.abspath(
                        sub
                    ) not in kept_dirs:
                        os.remove(p) if os.path.isfile(p) else _shutil.rmtree(
                            p, ignore_errors=True
                        )
                # hidden .crc droppings don't count as content
                if os.path.isdir(sub) and not _glob.glob(os.path.join(sub, "*")):
                    _shutil.rmtree(sub, ignore_errors=True)
            if not _glob.glob(os.path.join(edir, "*")):
                _shutil.rmtree(edir, ignore_errors=True)
        # tombstone sidecar dirs (merge-on-read deletes): same per-file
        # referenced-set sweep — sidecars of dropped versions go, sidecars
        # any kept version still reads stay
        for tdir in _glob.glob(os.path.join(self.base_path, "ts-*")):
            if not os.path.isdir(tdir):
                continue
            for p in _glob.glob(os.path.join(tdir, "*")):
                if os.path.abspath(p) not in referenced:
                    os.remove(p) if os.path.isfile(p) else _shutil.rmtree(
                        p, ignore_errors=True
                    )
            if not _glob.glob(os.path.join(tdir, "*")):
                _shutil.rmtree(tdir, ignore_errors=True)
        # adopted files (create_from_files) live outside version dirs — drop
        # the ones no kept version references, by manifest path
        for row in removed_rows:
            for f in row.get("files") or []:
                p = os.path.abspath(f["path"])
                if p not in referenced and os.path.isfile(p):
                    os.remove(p)
        m["versions"] = [row for row in m["versions"] if row["version"] in pinned]
        self._write_manifest(m)
        # the commit history also leaves one immutable stamped manifest file
        # per commit — prune the tail so LIST cost stays bounded over a long
        # mutation history (readers only ever resolve the highest stamp)
        catalog_io.prune(self.base_path, _MANIFEST_NAME)
        return removed


    def erase_keys(self, keys: "list[dict]") -> dict:
        """Hard key erasure across EVERY live snapshot version (the
        GDPR / right-to-be-forgotten path — the one documented exception
        to version immutability; the reference has no analog because its
        history is append-only).

        Time travel must not resurrect erased rows, so this rewrites
        history in place: for each version, only the files whose
        leading-key range covers an erased key are re-written without the
        matching rows (file-level targeting, same machinery as partial
        COW); untouched files — the overwhelming majority at scale — are
        carried by reference, byte-identical. A file shared by many
        versions via COW carry is rewritten ONCE and every referencing
        version is repointed. Dir-level versions (no per-file stats, e.g.
        binary keys) are first probed for matches and rewritten wholesale
        only when they contain one. The new manifest commits through the
        usual put-if-absent CAS, and only then are the original affected
        files (and unreferenced dir-level originals) physically deleted.
        If nothing matches, no manifest write happens and the probe dirs
        are swept by vacuum. Single-writer contract (as with vacuum).

        Returns {"files_rewritten", "versions_touched", "rows_erased"}
        (rows_erased counts occurrences across versions, not distinct
        keys; dir-level rewrites count as one file each)."""
        import glob as _glob
        import shutil as _shutil
        from functools import reduce as _reduce

        from index_spark.keys import key_eq

        m = self._read_manifest()
        key_cols = m["key"]
        if any(r.get("tombstones") for r in m["versions"]):
            # MOR sidecars hold raw key values and their versions count
            # live (not physical) rows — an in-place history rewrite here
            # would leave the erased key readable in a sidecar and corrupt
            # the n_rows bookkeeping. Refuse with the safe recipe instead
            # of guessing.
            raise ValueError(
                "erase_keys on a store with merge-on-read tombstone "
                "versions: compact() the head, then vacuum() the MOR "
                "versions, then erase"
            )
        tuples = [tuple(k[c] for c in key_cols) for k in keys]
        if not tuples:
            return {"files_rewritten": 0, "versions_touched": [], "rows_erased": 0}

        def covers(f: dict) -> bool:
            return any(f["min"][0] <= t[0] <= f["max"][0] for t in tuples)

        erase_pred = _reduce(
            lambda a, b: a | b, (key_eq(key_cols, t) for t in tuples)
        )

        out_root = os.path.join(self.base_path, f"erase-{uuid.uuid4().hex[:8]}")
        rewrite: dict[str, Optional[dict]] = {}  # old path -> new entry (None = now empty)
        rewrite_dir: dict[str, str] = {}
        dir_originals: list[str] = []  # rewritten dir-level versions' old dirs
        touched: set[int] = set()
        rows_erased = 0
        n_sub = n_dir = 0
        for row in m["versions"]:
            files = row.get("files")
            if files is None:
                # dir-level version (no per-file stats): probe before the
                # wholesale rewrite so absent keys cost one count job only
                d = self._version_dir(row)
                df = self.spark.read.parquet(d)
                if df.where(erase_pred).limit(1).count() == 0:
                    continue
                kept = df.where(~erase_pred)
                sub = os.path.join(out_root, f"d{n_sub:04d}")
                n_sub += 1
                n_dir += 1
                kept.repartitionByRange(*[F.col(c) for c in key_cols]).sortWithinPartitions(
                    *key_cols
                ).write.parquet(sub)
                new_files = self._file_stats(sub, key_cols)
                try:  # same guard as commit(): stats must survive JSON
                    json.dumps([f["min"] + f["max"] for f in new_files or []])
                except TypeError:
                    new_files = None
                # stats None = "no per-file stats", NOT an empty version:
                # count the rewritten data directly
                new_n = (
                    sum(f["n_rows"] for f in new_files)
                    if new_files
                    else self.spark.read.parquet(sub).count()
                )
                rows_erased += row["n_rows"] - new_n
                touched.add(row["version"])
                dir_originals.append(os.path.abspath(d))
                row["files"] = new_files
                row["data_path"] = sub
                row["n_rows"] = new_n
                continue
            for f in files:
                path = f["path"]
                if path in rewrite or not covers(f):
                    continue
                df = self.spark.read.parquet(path)
                kept = df.where(~erase_pred)
                sub = os.path.join(out_root, f"f{n_sub:04d}")
                n_sub += 1
                kept.coalesce(1).write.parquet(sub)
                stats = self._file_stats(sub, key_cols)
                rewrite[path] = stats[0] if stats else None
                rewrite_dir[path] = sub  # schema-bearing even when empty

        if not rewrite and not dir_originals:
            # nothing contained the keys: no manifest write, no deletions
            return {"files_rewritten": 0, "versions_touched": [], "rows_erased": 0}

        for row in m["versions"]:
            files = row.get("files")
            if not files:
                continue
            new_files = []
            changed = False
            for f in files:
                r = rewrite.get(f["path"], f) if f["path"] in rewrite else f
                if f["path"] in rewrite:
                    changed = True
                    rows_erased += f["n_rows"] - (r["n_rows"] if r else 0)
                    if r is None:
                        continue  # file emptied entirely
                new_files.append(r)
            if changed:
                touched.add(row["version"])
                if new_files:
                    row["files"] = new_files
                    row["n_rows"] = sum(f["n_rows"] for f in new_files)
                else:
                    # every file emptied: point the version at one of the
                    # rewritten (schema-bearing, zero-row) dirs — files=[]
                    # would fall back to the original (deleted) directory
                    some_old = next(p for p in rewrite if rewrite[p] is None)
                    row["files"] = None
                    row["data_path"] = rewrite_dir[some_old]
                    row["n_rows"] = 0
        self._write_manifest(m)
        # originals carry erased bytes — delete them only after the CAS.
        for path in rewrite:
            if os.path.isfile(path):
                os.remove(path)
        # dir-level originals: delete every file under the old dir that no
        # surviving version still references (file-level COW may point a
        # files-bearing version into another version's directory)
        referenced = {
            os.path.abspath(f["path"])
            for row in m["versions"]
            for f in row.get("files") or []
        }
        for d in dir_originals:
            for pth in _glob.glob(os.path.join(d, "*")):
                if os.path.abspath(pth) not in referenced:
                    os.remove(pth) if os.path.isfile(pth) else _shutil.rmtree(
                        pth, ignore_errors=True
                    )
            if not os.listdir(d):
                _shutil.rmtree(d, ignore_errors=True)
        return {
            "files_rewritten": len(rewrite) + n_dir,
            "versions_touched": sorted(touched),
            "rows_erased": rows_erased,
        }


class VersionedIndex(SortedIndex):
    """A read/write handle on one snapshot version.

    Reads inherit the full :class:`SortedIndex` surface. Writes validate
    with joins against the current snapshot, then commit version N+1 —
    all-or-nothing per :meth:`execute` batch, exactly the reference's
    transactional contract (Index.scala:1010-1036). A handle is single-use
    for writing (Index.scala:1012): a successful write returns a *new*
    handle and marks this one used.
    """

    def __init__(self, store: SnapshotStore, key: Sequence[str], version: Optional[int], rows_per_partition: int, base_stamp: Optional[int] = None):
        self.store = store
        self.version = version
        self.rows_per_partition = rows_per_partition
        self._base_stamp = base_stamp
        self._used = False
        if version is not None:
            self._empty = False
            super().__init__(store.read(version), key)
        else:
            # Empty index: no committed version yet; schema is unknown until
            # the first insert, so reads are invalid until then (the
            # reference's empty tree likewise has no root, Index.scala:162).
            self._empty = True
            super().__init__(None, key)  # type: ignore[arg-type]

    # ------------------------------------------------------------ internals
    def _check_usable(self) -> None:
        if self._used:
            raise ContextUsedError("write handle already used; take a fresh one")

    def _rows_to_df(self, rows: list[dict[str, Any]]) -> DataFrame:
        assert rows, "empty batch"
        # no coalesce(1) here: collapsing the batch to one partition measured
        # 3-5x slower end-to-end — it pins every evaluation of the staged
        # plan behind a single task and defeats AQE's broadcast re-planning
        # of the validation joins
        try:
            batch = self.store.spark.createDataFrame(rows)  # type: ignore[arg-type]
        except Exception:
            # a column that is None in EVERY row defeats type inference
            # (CANNOT_DETERMINE_TYPE) — NULL key/value cells are legal, so
            # type known columns from the head schema and fall back to a
            # sampled non-None value for batch-only internals
            from pyspark.sql import types as T

            head = (
                {}
                if self._empty
                else {f.name: f.dataType for f in self.df.schema.fields}
            )
            cols = sorted({k for r in rows for k in r})
            fields = []
            for c in cols:
                if c in head:
                    fields.append(T.StructField(c, head[c], True))
                else:
                    v = next((r[c] for r in rows if r.get(c) is not None), None)
                    if isinstance(v, bool):
                        dt: T.DataType = T.BooleanType()
                    elif isinstance(v, int):
                        dt = T.LongType()
                    elif isinstance(v, float):
                        dt = T.DoubleType()
                    else:
                        dt = T.StringType()
                    fields.append(T.StructField(c, dt, True))
            data = [tuple(r.get(c) for c in cols) for r in rows]
            batch = self.store.spark.createDataFrame(data, T.StructType(fields))
        return self._align_types(batch)

    def _batch_df(self, rows) -> DataFrame:
        """A mutation batch is either a driver list of dicts (small
        transactional batches — the reference's API shape) or a DataFrame
        (bulk/streaming ingestion — rows never funnel through the driver).
        Both land here as a type-aligned DataFrame."""
        if isinstance(rows, DataFrame):
            return self._align_types(rows)
        return self._rows_to_df(rows)

    def _dup_keys(self, rows) -> list[tuple]:
        if isinstance(rows, DataFrame):
            return self._dup_keys_in_batch(rows, self.key)
        return self._dup_keys_local(rows)

    @staticmethod
    def _head_keys(rows, key: list[str]) -> list[tuple]:
        """First ≤20 key tuples of a batch, for error payloads."""
        if isinstance(rows, DataFrame):
            return [tuple(r) for r in rows.select(*key).limit(20).collect()]
        return [tuple(r[k] for k in key) for r in rows[:20]]

    def _align_types(self, batch: DataFrame) -> DataFrame:
        """Cast batch columns to the current snapshot's types. Python ints
        infer as LongType; without the cast a union would silently widen
        the stored type — and under file-level COW the new files would
        disagree with carried files (parquet INT32 vs INT64 read error)."""
        if self._empty:
            return batch
        cur_types = dict(self.df.dtypes)
        return batch.select(
            *[
                F.col(c).cast(cur_types[c]).alias(c) if c in cur_types else F.col(c)
                for c in batch.columns
            ]
        )

    def _current(self) -> Optional[DataFrame]:
        return None if self._empty else self.df

    # ------------------------------------------------------ zone-map reads
    def read_range(
        self,
        frm: Any,
        to: Any,
        from_inclusive: bool = True,
        to_inclusive: bool = True,
        reverse: bool = False,
        limit: Optional[int] = None,
    ) -> DataFrame:
        """Range read with manifest zone-map file skipping.

        :meth:`SortedIndex.range` relies on parquet row-group pushdown —
        correct, but every file's footer is still opened. The manifest
        already carries per-file key min/max (the stats that drive
        write-side partial COW in :meth:`_partial_plan`); this is the
        READ-side use: files whose [min, max] cannot intersect [frm, to]
        are dropped from the scan's file list before Spark ever lists
        them. At 100 TB / O(10⁵) files a narrow range opens a handful of
        files instead of all of them — the file-level analog of the
        reference's root→leaf descent (Index.scala:62-99).

        Pruning is conservative: per-column min/max over composite keys is
        a superset interval, files lacking comparable stats are kept, and
        the residual :func:`key_between` predicate still applies exactly —
        so the result equals ``self.range(...)`` always.
        """
        from index_spark.keys import as_tuple

        if self._empty or self.version is None:
            raise ValueError("read_range on an empty index (no committed version)")
        vrow = self.store._version_row(self.version)
        files = vrow.get("files")
        if not files:
            return self.range(frm, to, from_inclusive, to_inclusive, reverse, limit)
        lo, hi = as_tuple(frm), as_tuple(to)

        def overlaps(f: dict) -> bool:
            try:
                fmin, fmax = tuple(f["min"]), tuple(f["max"])
                # Partial-tuple (prefix) bounds admit the whole prefix
                # equivalence class (keys.py semantics), so the exclusion
                # test must compare file stats TRUNCATED to each bound's
                # width: (700000, 3) is NOT above the inclusive prefix
                # bound (700000,). Inclusive exclusion stays sound for
                # exclusive bounds too (keeps extra files, never drops).
                return not (fmax[: len(lo)] < lo or fmin[: len(hi)] > hi)
            except TypeError:
                return True  # stats not comparable to the probe → keep

        touched = [f["path"] for f in files if overlaps(f)]
        if not touched:
            # empty LOCAL relation: self.df.filter(False) would still list
            # every file of the version in the plan
            empty = self.store.spark.createDataFrame([], self.df.schema)
            return SortedIndex(empty, self.key).range(
                frm, to, from_inclusive, to_inclusive, reverse, limit
            )
        # mergeSchema: the touched list can mix pre- and post-evolution
        # schemas, same as read() — without it the added columns would
        # nondeterministically vanish and the ``== self.range()`` invariant
        # would break
        pruned = self.store.spark.read.option("mergeSchema", "true").parquet(*touched)
        # merge-on-read base: the ``== self.range()`` invariant requires the
        # pruned scan to subtract tombstoned keys exactly like read() does
        pruned = self.store._apply_tombstones(pruned, vrow)
        pruned = self._align_to_head_schema(pruned)
        return SortedIndex(pruned, self.key).range(
            frm, to, from_inclusive, to_inclusive, reverse, limit
        )

    def _align_to_head_schema(self, pruned: DataFrame) -> DataFrame:
        """A pruned file SUBSET can predate schema evolution: if no
        touched file carries an added column, mergeSchema has nothing to
        merge and the column vanishes — breaking the documented
        'pruned read == full read' invariant (select('new_col') would
        raise on one path only). Re-align to the head's schema, NULL for
        columns the subset lacks (exactly what the full read returns for
        those rows)."""
        want = self.df.schema
        if [f.name for f in want.fields] == pruned.columns:
            return pruned
        have = set(pruned.columns)
        return pruned.select(
            *[
                F.col(f.name)
                if f.name in have
                else F.lit(None).cast(f.dataType).alias(f.name)
                for f in want.fields
            ]
        )

    def read_point(self, k: Any) -> DataFrame:
        """Point get with zone-map + Bloom file skipping: candidate files
        must cover the probe per-column (manifest min/max) AND pass the
        per-file key Bloom when :meth:`SnapshotStore.build_blooms` has
        fitted one — so overlapping-range files that merely straddle the
        key are skipped without opening a footer. Equals ``self.get(k)``
        always (blooms have no false negatives; the exact key-equality
        residual still applies). Falls back to the plain pushdown get for
        stat-less versions."""
        from index_spark.keys import as_tuple, key_eq

        vals = as_tuple(k)
        assert len(vals) == len(self.key), "read_point requires the full key"
        if self._empty or self.version is None:
            raise ValueError("read_point on an empty index (no committed version)")
        vrow = self.store._version_row(self.version)
        files = vrow.get("files")
        if not files:
            return self.get(vals)

        def may_contain(f: dict) -> bool:
            try:
                return all(
                    f["min"][i] <= vals[i] <= f["max"][i] for i in range(len(vals))
                )
            except TypeError:
                return True  # stats not comparable → keep

        cands = [f for f in files if may_contain(f)]
        blooms = vrow.get("blooms")
        if blooms:
            pos = _bloom_positions_py(vals, vrow["bloom_m"], vrow["bloom_k"])
            cands = [
                f
                for f in cands
                if f["path"] not in blooms
                or _bloom_contains(blooms[f["path"]], pos)
            ]
        if not cands:
            # empty LOCAL relation, not self.df.filter(False): the latter
            # still lists every file in the plan
            return self.store.spark.createDataFrame([], self.df.schema)
        pruned = self.store.spark.read.option("mergeSchema", "true").parquet(
            *[f["path"] for f in cands]
        )
        pruned = self.store._apply_tombstones(pruned, vrow)
        return self._align_to_head_schema(pruned).filter(key_eq(self.key, vals))

    def read_points(self, keys: Sequence[Any]) -> DataFrame:
        """Bloom/zone-map-pruned MULTI-get: the driver-side union of every
        probe's candidate files, opened once, filtered by an ``isin`` (or
        composite key-eq OR) residual. Equals ``get_all(keys)`` always;
        the win over it is the same as :meth:`read_point`'s — candidate
        files are decided from manifest stats + blooms without opening a
        single footer, so a 100-key probe against 10⁵ files lists only
        the handful that can match. Driver cost is O(|keys| · |files|)
        comparisons — fine for the ≤10⁴-key requests this path targets
        (larger requests belong in :meth:`SortedIndex.get_all`'s shuffle
        semi-join)."""
        from functools import reduce

        from index_spark.keys import as_tuple, key_eq

        if self._empty or self.version is None:
            raise ValueError("read_points on an empty index (no committed version)")
        tuples = [as_tuple(k) for k in keys]
        if not tuples:
            return self.store.spark.createDataFrame([], self.df.schema)
        for t in tuples:
            assert len(t) == len(self.key), "read_points requires full keys"
        vrow = self.store._version_row(self.version)
        files = vrow.get("files")
        residual = (
            F.col(self.key[0]).isin([t[0] for t in tuples])
            if len(self.key) == 1
            else reduce(lambda a, b: a | b, (key_eq(self.key, t) for t in tuples))
        )
        if not files:
            return self.df.filter(residual)
        blooms = vrow.get("blooms")
        # bloom positions depend only on the key tuple — precompute once
        # per tuple, not per (file, tuple) pair (10⁴ keys × 10⁵ files
        # would otherwise be billions of driver-side md5 calls)
        positions = (
            {t: _bloom_positions_py(t, vrow["bloom_m"], vrow["bloom_k"]) for t in tuples}
            if blooms
            else {}
        )
        cands: list[str] = []
        for f in files:
            def may(t):
                try:
                    return all(
                        f["min"][i] <= t[i] <= f["max"][i] for i in range(len(t))
                    )
                except TypeError:
                    return True
            hit = [t for t in tuples if may(t)]
            if hit and blooms and f["path"] in blooms:
                hit = [
                    t
                    for t in hit
                    if _bloom_contains(blooms[f["path"]], positions[t])
                ]
            if hit:
                cands.append(f["path"])
        if not cands:
            return self.store.spark.createDataFrame([], self.df.schema)
        pruned = self.store.spark.read.option("mergeSchema", "true").parquet(*cands)
        pruned = self.store._apply_tombstones(pruned, vrow)
        return self._align_to_head_schema(pruned).filter(residual)

    # ---------------------------------------------------------- MERGE INTO
    def merge_into(
        self,
        source: DataFrame,
        delete_condition=None,
        version: Optional[str] = None,
    ) -> "VersionedIndex":
        """Lakehouse ``MERGE INTO``: classify ``source`` rows against the
        current snapshot by key and apply everything as ONE transaction —

        - matched ∧ ``delete_condition`` → Remove,
        - matched otherwise → Update (full-row replacement),
        - not matched → Insert.

        This is the composite verb the reference expresses as an
        ``execute`` batch (Index.scala:1010-1036) and Delta/Iceberg spell
        MERGE; building it from semi/anti joins keeps every piece
        DataFrame-native (the source never funnels through the driver)
        and inherits the file-level COW path when the source is
        key-bounded. ``delete_condition`` is a Column evaluated on source
        rows."""
        from index_spark.commands import Insert, Remove, Update

        key = list(self.key)
        cur_keys = self._current().select(*key) if not self._empty else None
        if cur_keys is None:
            # empty head: deletes of absent keys are no-ops (same contract
            # as the non-empty path) — insert only the non-tombstone rows
            live0 = (
                source.filter(~F.coalesce(delete_condition, F.lit(False)))
                if delete_condition is not None
                else source
            )
            return self.execute([Insert(live0)], version=version)
        live = source
        if delete_condition is not None:
            doomed = source.filter(delete_condition)
            live = source.filter(~F.coalesce(delete_condition, F.lit(False)))
            removes = doomed.join(cur_keys, on=key, how="left_semi").select(*key)
        matched = live.join(cur_keys, on=key, how="left_semi")
        unmatched = live.join(cur_keys, on=key, how="left_anti")
        commands: list = [Update(matched), Insert(unmatched)]
        if delete_condition is not None:
            commands.insert(0, Remove(removes))
        return self.execute(commands, version=version)

    def delete_where(self, condition, version: Optional[str] = None) -> "VersionedIndex":
        """Predicate delete (retention/TTL sweeps): remove every current
        row matching ``condition``, as one transaction. The key set is
        computed DataFrame-side (a filtered key projection — with manifest
        stats this prunes to the files that can match) and fed to the
        standard Remove path, so file-level COW rewrites only touched
        files. Contrast :meth:`~SnapshotStore.erase_key`, which scrubs a
        key from ALL history; this only advances the head."""
        from index_spark.commands import Remove

        self._check_usable()
        if self._empty:
            raise KeyNotFoundError([])
        keys = self._current().filter(condition).select(*self.key)
        return self.execute([Remove(keys)], version=version)

    def delete_where_mor(self, condition, version: Optional[str] = None) -> "VersionedIndex":
        """Merge-on-read predicate delete: write the doomed KEYS as a
        tombstone sidecar and commit a metadata-only version that carries
        every base data file by reference — zero data files rewritten
        (contrast :meth:`delete_where`, which copy-on-writes the touched
        files). Reads of the new version subtract the tombstones with one
        key anti-join. At 100 TB this turns "delete 0.01% of rows" from a
        multi-TB rewrite into a KB-scale sidecar write; the debt is one
        anti-join per read until a later full-rewrite commit or
        :meth:`compact` folds the tombstones away. Returns the new head
        handle; no-ops (returning ``self``) when nothing matches."""
        self._check_usable()
        if self._empty or self.version is None:
            raise KeyNotFoundError([])
        path = os.path.join(self.store.base_path, f"ts-{uuid.uuid4().hex[:8]}")
        doomed = self._current().filter(condition).select(*self.key)
        doomed.write.mode("errorifexists").parquet(path)
        stats = self.store._file_stats(path, self.key)
        n_del = sum(f["n_rows"] for f in stats)
        if n_del == 0:
            import shutil as _shutil

            _shutil.rmtree(path, ignore_errors=True)
            return self
        new_version = self.store.commit_mor_delete(
            self.version,
            [f["path"] for f in stats],
            n_del,
            expected_stamp=self._base_stamp,
            writer_version=version,
        )
        self._used = True
        return self.store.at_version(new_version)

    @staticmethod
    def _maybe_broadcast(keys_df: DataFrame, rows) -> DataFrame:
        """Build side of the COW anti-join. Driver-list batches are known
        small (the reference's transactional API shape) — force broadcast.
        DataFrame batches can be arbitrary-size (bulk/streaming ingestion,
        whole micro-batches) — a forced broadcast would materialize the
        batch keys on the driver and in every executor (driver OOM at
        scale); leave it unhinted and AQE picks broadcast vs shuffle from
        runtime stats."""
        return keys_df if isinstance(rows, DataFrame) else F.broadcast(keys_df)

    @staticmethod
    def _dup_keys_in_batch(batch: DataFrame, key: list[str]) -> list[tuple]:
        dups = (
            batch.groupBy(*key).count().filter(F.col("count") > 1).select(*key).limit(20).collect()
        )
        return [tuple(r) for r in dups]

    @staticmethod
    def _key_cardinality(batch: DataFrame, key: list[str]) -> tuple[int, int]:
        """(total rows, max rows per key) in ONE aggregation job — the
        fused form of the dup-key gate plus the layout ``count()`` that
        bulk creates need: the per-key counts the dup check computes
        already sum to the total, so a second full-input pass just to
        count rows is pure waste at scale. ``max_per_key > 1`` ⇔ the
        batch has duplicate keys (callers then pay one extra job for the
        ≤20-key error payload, on the failure path only)."""
        row = (
            batch.groupBy(*key)
            .agg(F.count(F.lit(1)).alias("__c"))
            .agg(F.sum("__c").alias("__n"), F.max("__c").alias("__m"))
            .first()
        )
        return int(row["__n"] or 0), int(row["__m"] or 0)

    def _dup_keys_local(self, rows: list[dict[str, Any]]) -> list[tuple]:
        """Intra-batch duplicate check without a Spark job — the batch is a
        driver-resident list (exactly the reference's in-memory sort+scan,
        Index.scala:283-288). Validation jobs are the dominant cost of
        small transactional batches in local mode."""
        from collections import Counter

        cnt = Counter(tuple(r.get(k) for k in self.key) for r in rows)
        return [k for k, c in cnt.items() if c > 1][:20]

    def _check_exists_and_versions(self, batch: DataFrame, cur: DataFrame, has_expect: bool) -> None:
        """KEY_NOT_FOUND + VERSION_CHANGED in ONE job: left-join the batch
        to the current rows, then classify. Existence failures take
        precedence (reference checks presence before the version compare,
        Leaf.scala:82 vs 62-71)."""
        key = self.key
        cur_v = cur.select(*key, F.col(VERSION_COL).alias("__cur_version"))
        joined = batch.join(cur_v, on=key, how="left")
        bad = F.col("__cur_version").isNull()
        if has_expect:
            bad = bad | (
                F.col("__expected_version").isNotNull()
                & (F.col("__expected_version") != F.col("__cur_version"))
            )
        probs = (
            joined.filter(bad)
            .select(*key, "__cur_version")
            .limit(20)
            .collect()
        )
        missing = [tuple(r[k] for k in key) for r in probs if r["__cur_version"] is None]
        if missing:
            raise KeyNotFoundError(missing)
        conflicts = [tuple(r[k] for k in key) for r in probs]
        if conflicts:
            raise VersionChangedError(conflicts)

    # ------------------------------------------------------------- mutations
    def _staged_insert(
        self, cur: Optional[DataFrame], rows: list[dict[str, Any]], upsert: bool, version: str
    ) -> DataFrame:
        key = self.key
        if isinstance(rows, list) and not rows:
            return cur  # empty batch: no-op (the documented contract)
        # intra-batch duplicate keys → DUPLICATED_KEYS (Index.scala:283-288);
        # driver-side (no job) when the batch is a local list
        dups = self._dup_keys(rows)
        if dups:
            raise DuplicatedKeysError(dups)

        batch = self._batch_df(rows)
        has_row_upsert = "__upsert" in batch.columns
        if has_row_upsert:
            batch = batch.withColumn("__upsert", F.coalesce(F.col("__upsert"), F.lit(upsert)))
        else:
            batch = batch.withColumn("__upsert", F.lit(upsert))

        batch = batch.withColumn(VERSION_COL, F.lit(version))

        if cur is None:
            return batch.drop("__upsert")

        # non-upsert rows colliding with existing keys → DUPLICATED_KEYS
        # (leaf-level LEAF_DUPLICATE_KEY, Leaf.scala:31-53). Skipped without
        # a job when every row provably upserts.
        if isinstance(rows, DataFrame):
            all_upsert = upsert and not has_row_upsert
        else:
            all_upsert = (upsert and not any(r.get("__upsert") is False for r in rows)) or all(
                r.get("__upsert") is True for r in rows
            )
        if not all_upsert:
            existing_keys = cur.select(*key)
            collisions = (
                batch.filter(~F.col("__upsert"))
                .join(existing_keys, on=key, how="left_semi")
                .select(*key)
                .limit(20)
                .collect()
            )
            if collisions:
                raise DuplicatedKeysError([tuple(r) for r in collisions])

        # COW: keep current rows whose key is not overwritten, add the batch.
        # allowMissingColumns = schema evolution: a batch may ADD columns
        # (kept rows read back NULL — parquet mergeSchema on the read side),
        # and a batch may OMIT value columns present in the snapshot (its
        # rows get NULL there).
        batch_keys = batch.select(*key)
        kept = cur.join(self._maybe_broadcast(batch_keys, rows), on=key, how="left_anti")
        return kept.unionByName(batch.drop("__upsert"), allowMissingColumns=True)

    def _staged_update(self, cur: Optional[DataFrame], rows, version: str) -> Optional[DataFrame]:
        key = self.key
        if isinstance(rows, list) and not rows:
            return cur  # empty batch: no-op (the documented contract)
        dups = self._dup_keys(rows)
        if dups:
            raise DuplicatedKeysError(dups)
        batch = self._batch_df(rows)
        has_expect = "__expected_version" in batch.columns
        if cur is None:
            if self._batch_empty(rows, batch):
                return cur  # empty batch on an untouched base: no-op
            raise KeyNotFoundError(self._head_keys(rows, key))

        # KEY_NOT_FOUND (Leaf.scala:82) + VERSION_CHANGED (Leaf.scala:62-71)
        # in one job
        self._check_exists_and_versions(batch, cur, has_expect)
        if has_expect:
            batch = batch.drop("__expected_version")

        batch = batch.withColumn(VERSION_COL, F.lit(version))
        kept = cur.join(self._maybe_broadcast(batch.select(*key), rows), on=key, how="left_anti")
        # Full-row replacement must be LAYOUT-INVARIANT: kept.columns is
        # the merged schema of whichever physical files the batch keys
        # happened to land in, which may or may not carry columns added by
        # a later schema evolution — projecting the batch against it made
        # the same logical update raise UNRESOLVED_COLUMN or succeed
        # depending on file layout. Project against the HEAD schema
        # instead: a head column the batch omits gets a typed NULL
        # (full-row replacement semantics — an update without an evolved
        # column nulls it, matching the dict model in
        # tests/test_store_review2.py), identical whatever files were
        # touched. Unknown batch columns were already rejected by the
        # execute() gate; batch columns beyond the pre-transaction head
        # (possible only mid-transaction after an evolving Insert) are
        # carried through unchanged.
        head = cur.schema if self._empty else self.df.schema
        head_fields = {f.name: f.dataType for f in head.fields}
        if VERSION_COL not in head_fields:
            head_fields[VERSION_COL] = batch.schema[VERSION_COL].dataType
        batch_cols = set(batch.columns)
        proj = [
            F.col(name)
            if name in batch_cols
            else F.lit(None).cast(dtype).alias(name)
            for name, dtype in head_fields.items()
        ] + [F.col(c) for c in batch.columns if c not in head_fields]
        return kept.unionByName(batch.select(*proj), allowMissingColumns=True)

    @staticmethod
    def _batch_empty(rows, batch: DataFrame) -> bool:
        """True when a mutation batch has no rows. Driver lists answer
        free; DataFrame batches pay one limit(1) job — only consulted on
        the rare cur-is-None (no touched files) path, where an empty batch
        must be a no-op rather than a spurious KEY_NOT_FOUND."""
        if isinstance(rows, DataFrame):
            return batch.limit(1).count() == 0
        return len(rows) == 0

    def _staged_remove(self, cur: Optional[DataFrame], keys) -> Optional[DataFrame]:
        key = self.key
        if isinstance(keys, list) and not keys:
            return cur  # empty batch: no-op (the documented contract)
        dups = self._dup_keys(keys)
        if dups:
            raise DuplicatedKeysError(dups)
        batch = self._batch_df(keys)
        has_expect = "__expected_version" in batch.columns
        if cur is None:
            if self._batch_empty(keys, batch):
                return cur  # empty batch on an untouched base: no-op
            raise KeyNotFoundError(self._head_keys(keys, key))
        self._check_exists_and_versions(batch, cur, has_expect)
        return cur.join(self._maybe_broadcast(batch.select(*key), keys), on=key, how="left_anti")

    # ---------------------------------------------------------------- public
    def execute(self, commands: list, version: Optional[str] = None) -> "VersionedIndex":
        """Apply a sequential command batch as ONE transaction → version N+1.

        Stops at the first error (nothing committed — the staged DataFrame is
        discarded), and the whole batch shares one writer-version string:
        reference semantics at Index.scala:1010-1036 /
        QueriesRandomSpec.scala:211-239.

        When the base version carries per-file key stats and every command is
        key-bounded, the commit is file-level COW: only files whose key range
        the batch touches are read, validated against, and rewritten — the
        rest carry into version N+1 by reference. Sound because files
        partition the key space (a key can only live in a file whose
        [min, max] covers it), so every validation join (duplicate /
        existence / expected-version) over the touched subset sees exactly
        the rows it would see over the full snapshot.
        """
        self._check_usable()
        explicit_version = version is not None
        version = version or str(uuid.uuid4())
        # A DataFrame payload's plan is evaluated several times per
        # transaction: the _partial_plan bounds agg, the validation joins
        # (existence/version/collision), and the final commit write each
        # re-run it. For derived payloads that plan is itself expensive —
        # ProjectionIndex.refresh feeds change-feed joins, merge_into feeds
        # three classification joins over the head — so cache each payload
        # for the TRANSACTION's lifetime and release it right after the
        # commit materializes to parquet (guide §5: persist exactly what is
        # reused, unpersist when done; measured 11.3 → ~6 s on the
        # projection-refresh ladder, r12). Driver-list payloads are free
        # and stay untouched.
        payload_cache: list[DataFrame] = []
        seen_ids = set()
        for cmd in commands:
            payload = cmd.rows if isinstance(cmd, (Insert, Update)) else getattr(cmd, "keys", None)
            if isinstance(payload, DataFrame) and id(payload) not in seen_ids:
                seen_ids.add(id(payload))
                payload_cache.append(payload.persist())
        try:
            return self._execute_staged(commands, version, explicit_version)
        finally:
            for p in payload_cache:
                p.unpersist()

    def _execute_staged(
        self, commands: list, version: str, explicit_version: bool
    ) -> "VersionedIndex":
        plan = self._partial_plan(commands)
        n_parts: Optional[int] = None
        if plan is not None:
            touched, untouched = plan
            staged = (
                self.store.spark.read.option("mergeSchema", "true").parquet(
                    *[f["path"] for f in touched]
                )
                if touched
                else None
            )
            carry: Optional[list[dict]] = untouched
            # the rewrite size is known driver-side (manifest stats + batch
            # length), so size the write explicitly — otherwise the range
            # exchange samples the staged plan (re-running the validation
            # joins) to pick bounds for what is usually a single small file.
            # DataFrame batches have no driver-side length — leave n_parts
            # to AQE rather than paying a count() of the batch.
            payloads = [c.rows if isinstance(c, (Insert, Update)) else c.keys for c in commands]
            if not any(isinstance(p, DataFrame) for p in payloads):
                est = sum(f["n_rows"] for f in touched) + sum(len(p) for p in payloads)
                n_parts = max(1, -(-est // self.rows_per_partition))
        else:
            staged = self._current()
            carry = None
        for cmd in commands:
            if isinstance(cmd, Insert):
                # Schema evolution is opt-in: a batch column the head does
                # not have raises by default, catching the misspelled-column
                # bug (the typo would otherwise become a new column while
                # the intended column silently stays NULL for the batch rows
                # — the exact trap Delta/Iceberg gate behind mergeSchema).
                # Checked against the HEAD schema, not the staged subset:
                # on the file-level-COW path an all-new-keys batch stages
                # against no files at all, but the gate must still fire.
                if not getattr(cmd, "allow_new_columns", False) and not self._empty:
                    head_cols = set(self.df.columns)
                    batch_cols = (
                        cmd.rows.columns
                        if isinstance(cmd.rows, DataFrame)
                        else {k for r in cmd.rows for k in r}
                    )
                    unknown = sorted(
                        c
                        for c in batch_cols
                        if c not in head_cols and not c.startswith("__")
                    )
                    if unknown:
                        raise ValueError(
                            "insert batch has columns not in the snapshot "
                            f"schema: {unknown}; pass allow_new_columns=True "
                            "to add them (schema evolution) or fix the "
                            "column names"
                        )
                staged = self._staged_insert(staged, cmd.rows, cmd.upsert, version)
            elif isinstance(cmd, Update):
                # same misspelled-column protection as the Insert gate:
                # _staged_update's full-row replacement selects the head's
                # columns, so an unknown batch column would be DROPPED
                # silently. Updates never evolve schema — evolution goes
                # through insert(..., allow_new_columns=True).
                if not self._empty:
                    head_cols = set(self.df.columns)
                    batch_cols = (
                        cmd.rows.columns
                        if isinstance(cmd.rows, DataFrame)
                        else {k for r in cmd.rows for k in r}
                    )
                    unknown = sorted(
                        c
                        for c in batch_cols
                        if c not in head_cols and not c.startswith("__")
                    )
                    if unknown:
                        raise ValueError(
                            "update batch has columns not in the snapshot "
                            f"schema: {unknown}; updates cannot add columns "
                            "(use insert(..., allow_new_columns=True) to "
                            "evolve the schema)"
                        )
                staged = self._staged_update(staged, cmd.rows, version)
            elif isinstance(cmd, Remove):
                staged = self._staged_remove(staged, cmd.keys)
            else:
                raise TypeError(f"unknown command {cmd!r}")
        if staged is None:
            # every command was an empty batch against an untouched base:
            # a metadata-only commit — zero new rows written, every file
            # carried by reference (same shape as rollback()). On an EMPTY
            # index there is nothing to commit and no schema to commit an
            # empty frame with — the batch is a pure no-op; hand back this
            # (unconsumed) handle.
            cur = self._current()
            if cur is None:
                return self
            staged = cur.filter(F.lit(False))
            n_parts = 1
        new_version = self.store.commit(
            staged, self.key, self.rows_per_partition,
            n_partitions=n_parts, carry_files=carry,
            expected_stamp=self._base_stamp,
            # record caller-supplied transaction ids so commit() can reject
            # reuse (which would blind diff()'s writer-version comparison);
            # auto-generated uuids cannot collide, no need to record them
            writer_version=version if explicit_version else None,
        )
        self._used = True
        return self.store.at_version(new_version)

    def _partial_plan(self, commands: list) -> Optional[tuple[list[dict], list[dict]]]:
        """(touched_files, untouched_files) for a key-bounded batch against a
        stats-bearing base version, else None (→ full-rewrite path). The
        driver-side overlap test against manifest min/max is the file-level
        analog of the reference's root→leaf descent (Index.scala:62-99)."""
        if self._empty or self.version is None:
            return None
        row = self.store._version_row(self.version)
        if row.get("tombstones"):
            # merge-on-read base: touched files read raw would resurrect
            # tombstoned keys into the validation joins. Fall back to the
            # full path — staged = the tombstone-filtered head, and the
            # rewrite commit naturally compacts the tombstones away.
            return None
        files = row.get("files")
        if not files:
            return None
        batch_keys: list[tuple] = []
        bounds: list[tuple[tuple, tuple]] = []  # (lo, hi) from DataFrame batches
        exact = True  # per-key refinement possible only with driver-side keys
        for cmd in commands:
            if isinstance(cmd, (Insert, Update)):
                rows = cmd.rows
            elif isinstance(cmd, Remove):
                rows = cmd.keys
            else:
                return None
            if isinstance(rows, DataFrame):
                # one tiny agg job: the batch's lexicographic key bounds
                # (struct min/max = tuple ordering). Overlap is then tested
                # against [lo, hi] only — coarser than per-key, still sound
                # (it can only widen the touched set, never miss a file).
                exact = False
                r = rows.agg(
                    F.min(F.struct(*self.key)).alias("lo"),
                    F.max(F.struct(*self.key)).alias("hi"),
                ).first()
                if r["lo"] is None:
                    continue
                bounds.append((tuple(r["lo"]), tuple(r["hi"])))
                continue
            try:
                batch_keys += [tuple(r[k] for k in self.key) for r in rows]
            except (KeyError, TypeError):
                return None  # key-incomplete rows → let the full path report
        if not batch_keys and not bounds:
            # every batch was provably empty (empty lists / empty
            # DataFrames): nothing is touched — carry every file into a
            # metadata-only commit instead of rewriting the whole table
            return [], files
        try:
            los = [b[0] for b in bounds] + ([min(batch_keys)] if batch_keys else [])
            his = [b[1] for b in bounds] + ([max(batch_keys)] if batch_keys else [])
            lo, hi = min(los), max(his)

            def overlaps(f: dict) -> bool:
                fmin, fmax = tuple(f["min"]), tuple(f["max"])
                if fmax < lo or fmin > hi:
                    return False
                if exact:
                    return any(fmin <= bk <= fmax for bk in batch_keys)
                return True

            touched, untouched = [], []
            for f in files:
                (touched if overlaps(f) else untouched).append(f)
        except TypeError:  # keys not comparable to stored stats (exotic types)
            return None
        return touched, untouched

    def compact(self, target_rows: Optional[int] = None) -> "VersionedIndex":
        """Bin-pack small files into full-size ones (the OPTIMIZE step that
        file-level COW needs at scale).

        Every partial commit writes its touched rows as fresh — often tiny —
        files, so a long mutation history degrades scans into a
        many-small-files read. Compaction reads only the files below half
        the target row count, rewrites them range-partitioned at ~target
        rows per file, and carries every already-full file into the new
        version by reference. Returns ``self`` (no new version) when fewer
        than two files qualify. Rewritten files' key spans may overlap
        carried files'; that only widens (never misses) the overlap test in
        :meth:`_partial_plan`, so later partial mutations stay sound.
        """
        self._check_usable()
        if self._empty or self.version is None:
            return self
        files = self.store._version_row(self.version).get("files")
        if not files:
            return self
        target = target_rows or self.rows_per_partition
        threshold = max(1, target // 2)
        vrow0 = self.store._version_row(self.version)
        small = [f for f in files if f["n_rows"] < threshold]
        if len(small) < 2:
            if not vrow0.get("tombstones"):
                return self
            # MOR base with nothing to bin-pack: compaction is still the
            # documented way to FOLD the tombstones (erase_keys prescribes
            # it), so rewrite everything once rather than dead-ending
            small, full = list(files), []
        else:
            full = [f for f in files if f["n_rows"] >= threshold]
        staged = self.store.spark.read.option("mergeSchema", "true").parquet(
            *[f["path"] for f in small]
        )
        # merge-on-read base: rewritten small files drop their tombstoned
        # rows for good; carried full files still need the sidecar, so the
        # tombstone list rides into the new version (extra tombstone keys
        # pointing at rewritten files anti-join against nothing — harmless)
        vrow = vrow0
        staged = self.store._apply_tombstones(staged, vrow)
        n_rows = sum(f["n_rows"] for f in small)
        n_parts = max(1, -(-n_rows // target))
        new_version = self.store.commit(
            staged, self.key, self.rows_per_partition,
            n_partitions=n_parts, carry_files=full,
            expected_stamp=self._base_stamp,
            # tombstones ride along only while carried files still need
            # them; a full rewrite (no carried files) folds them for good
            tombstones=vrow.get("tombstones") if full else None,
            n_rows_override=(
                vrow["n_rows"] if (vrow.get("tombstones") and full) else None
            ),
        )
        self._used = True
        return self.store.at_version(new_version)

    def insert(
        self,
        rows: "list[dict[str, Any]] | DataFrame",
        upsert: bool = False,
        version: Optional[str] = None,
        allow_new_columns: bool = False,
    ) -> "VersionedIndex":
        return self.execute([Insert(rows, upsert, allow_new_columns)], version)

    def upsert_partial(self, rows: list[dict[str, Any]], version: Optional[str] = None) -> "VersionedIndex":
        """File-level COW upsert: rewrite ONLY the files whose key range the
        batch touches; carry every other file into the new version by
        reference (Delta-style, at manifest granularity).

        At 100 TB this is the difference between rewriting the dataset and
        rewriting the handful of range partitions a batch lands in. Touched
        files are found driver-side against the manifest's per-file min/max
        (the file-level analog of the reference's root→leaf descent).
        Falls back to a full :meth:`insert` when file stats are unavailable
        (legacy versions, non-JSON-able key types) or the index is empty."""
        return self._partial_mutate(rows, version, mode="upsert")

    def update_partial(self, rows: list[dict[str, Any]], version: Optional[str] = None) -> "VersionedIndex":
        """File-level COW update: same touched-files shape as
        :meth:`upsert_partial` with the reference's update semantics —
        every key must exist (KEY_NOT_FOUND) and optional per-row
        ``__expected_version`` is checked (VERSION_CHANGED). The existence
        check against only the touched files is sound because files
        partition the key space: a key can live only in a file whose
        [min, max] covers it."""
        return self._partial_mutate(rows, version, mode="update")

    def remove_partial(self, keys: list[dict[str, Any]], version: Optional[str] = None) -> "VersionedIndex":
        """File-level COW remove with existence + expected-version checks."""
        return self._partial_mutate(keys, version, mode="remove")

    def _partial_mutate(self, rows: list[dict[str, Any]], version: Optional[str], mode: str) -> "VersionedIndex":
        # execute() auto-detects the file-level path via _partial_plan and
        # falls back to full-rewrite semantics when stats are unavailable.
        if mode == "upsert":
            return self.execute([Insert(rows, upsert=True)], version)
        if mode == "update":
            return self.execute([Update(rows)], version)
        return self.execute([Remove(rows)], version)

    def update(self, rows: "list[dict[str, Any]] | DataFrame", version: Optional[str] = None) -> "VersionedIndex":
        return self.execute([Update(rows)], version)

    def remove(self, keys: "list[dict[str, Any]] | DataFrame", version: Optional[str] = None) -> "VersionedIndex":
        return self.execute([Remove(keys)], version)

    def try_execute(self, commands: list, version: Optional[str] = None) -> BatchResult:
        """Result-typed variant mirroring the reference's BatchResult."""
        try:
            nxt = self.execute(commands, version)
            return BatchResult(success=True, n=len(commands), version=str(nxt.version))
        except (DuplicatedKeysError, KeyNotFoundError, VersionChangedError) as e:
            return BatchResult(success=False, error=e.code, details=e.details)

    # ---------------------------------------------------------------- reads
    def count(self) -> int:
        """O(1) from the manifest (reference maintained counter, Index.scala:899)."""
        if self._empty:
            return 0
        return self.store.n_rows(self.version)  # type: ignore[arg-type]

    # -------------------------------------------- capacity predicates (§2.4)
    # Reference QueryableIndex.scala:521-538 — all O(1) via manifest counts.
    def is_full(self) -> bool:
        mx = self.store.max_n_items()
        return mx is not None and self.count() >= mx

    def has_minimum(self) -> bool:
        """At least half capacity (reference hasMinimum = n >= maxNItems/2)."""
        mx = self.store.max_n_items()
        return mx is None or self.count() >= mx // 2

    def has_enough(self) -> bool:
        """Strictly above the minimum — can lend without underflowing."""
        mx = self.store.max_n_items()
        return mx is None or self.count() > mx // 2

    # ----------------------------------------- persistent split/merge (§2.4)
    def split_into(self, left_path: str, right_path: str) -> tuple["VersionedIndex", "VersionedIndex"]:
        """Split this snapshot into TWO independent persisted indexes at a
        median key (reference ``split()``, QueryableIndex.scala:586-679 —
        there the split point is the root's middle key, likewise only an
        approximate median). The source index is untouched; both children
        inherit key/capacity config, each with a fresh index id."""
        left_idx, right_idx = self.split()
        mx = self.store.max_n_items()
        left = SnapshotStore(self.store.spark, left_path).create(
            self.key, df=left_idx.df, rows_per_partition=self.rows_per_partition, max_n_items=mx
        )
        right = SnapshotStore(self.store.spark, right_path).create(
            self.key, df=right_idx.df, rows_per_partition=self.rows_per_partition, max_n_items=mx
        )
        return left, right

    def merge_from(self, right: "VersionedIndex", dest_path: str) -> "VersionedIndex":
        """Merge a key-disjoint right index into a NEW persisted index
        (reference ``merge()``, QueryableIndex.scala:561-584: the combined
        count must fit maxNItems; both sources survive unchanged)."""
        mx = self.store.max_n_items()
        total = self.count() + right.count()
        if mx is not None and total > mx:
            raise ValueError(f"merge would exceed max_n_items: {total} > {mx}")
        # allowMissingColumns: either side may predate a schema evolution
        merged = self.df.unionByName(right.df, allowMissingColumns=True)
        return SnapshotStore(self.store.spark, dest_path).create(
            self.key, df=merged, rows_per_partition=self.rows_per_partition, max_n_items=mx
        )


class TemporalIndex:
    """Time-travel facade (reference ``TemporalIndex.scala``).

    ``execute`` mutates latest; ``snapshot()`` pins the current version into
    history; ``find_index(t)`` resolves the greatest snapshot at-or-before t
    and returns a full read surface on it.
    """

    def __init__(self, store: SnapshotStore):
        self.store = store

    def _check_exists(self) -> None:
        """Reference raises the temporal-specific not-found
        (``Errors.scala`` TEMPORAL_INDEX_NOT_FOUND) rather than the plain
        index error when the temporal surface is addressed."""
        if not self.store.exists():
            raise TemporalIndexNotFoundError(self.store.base_path)

    def latest(self) -> VersionedIndex:
        self._check_exists()
        return self.store.latest()

    def execute(self, commands: list, version: Optional[str] = None) -> VersionedIndex:
        self._check_exists()
        return self.store.latest().execute(commands, version)

    def snapshot(self) -> int:
        """Returns the history timestamp (reference returns (ts, result))."""
        self._check_exists()
        return self.store.record_snapshot()

    def find(self, t: int) -> Optional[int]:
        """Snapshot *version* as-of t, or None before the first snapshot."""
        self._check_exists()
        return self.store.find_as_of(t)

    def find_index(self, t: Optional[int] = None) -> Optional[VersionedIndex]:
        self._check_exists()
        if t is None:
            return self.store.latest()
        v = self.store.find_as_of(t)
        return None if v is None else self.store.at_version(v)
