"""SortedIndex — the ordered-query surface (reference §2.1/§2.3/§2.4).

Wraps any DataFrame plus a declared composite key and exposes the
reference's full read surface as lazy DataFrame transforms:

==============================  ==============================================
reference operator              here
==============================  ==============================================
``get(k)``                      :meth:`get`             (Index.scala:813)
``getAll(keys, mustFindAll)``   :meth:`get_all`         (Index.scala:820)
``inOrder`` / ``all``           :meth:`in_order`        (Index.scala:583)
``reverse``                     :meth:`in_order(reverse=True)` (Index.scala:632)
``head`` / ``tail``             :meth:`head` / :meth:`tail` (QueryableIndex.scala:85,126)
``asc`` / ``desc`` seeks        :meth:`gt` / :meth:`lt` (QueryableIndex.scala:167,210)
``gt`` / ``lt`` / ``range``     :meth:`gt` / :meth:`lt` / :meth:`range` (QueryableIndex.scala:253-271,432)
``prefix``                      :meth:`prefix`          (QueryableIndex.scala:422)
prefix-bounded ``gt``/``lt``    ``prefix=`` kwarg       (QueryableIndex.scala:273-368)
``previousKey`` / ``nextKey``   :meth:`previous_key` / :meth:`next_key` (QueryableIndex.scala:71)
``min`` / ``max`` / ``count``   :meth:`min` / :meth:`max` / :meth:`count` (Index.scala:885-900)
iterator ``limit`` / ``filter`` ``limit=`` kwarg / :meth:`where` (RichAsyncIndexIterator.scala:13-41)
``split`` / ``merge`` / ``copy`` :meth:`split` / :meth:`merge` / :meth:`copy` (QueryableIndex.scala:540-679)
==============================  ==============================================

Physical notes (SURVEY.md §4): the B+Tree descent is replaced by parquet
row-group min/max skipping + partition pruning — every predicate built here
is a conjunction/disjunction of simple comparisons, so Catalyst pushes it
into the scan. Top-k (`reverse seek + limit`) compiles to
``TakeOrderedAndProjectExec`` — no global sort. At 100 TB the win is the
same: a range query touches only the partitions whose min/max overlap.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from index_spark.errors import KeyNotFoundError
from index_spark.keys import as_tuple, key_between, key_eq, key_gt, key_lt, sort_cols


class SortedIndex:
    """Ordered read surface over ``df`` keyed by ``key`` (list of columns).

    Reads return *DataFrames* (lazy); ordering is applied so collected
    results arrive in key order like the reference's iterators. ``limit``
    composes with order into Spark's top-k physical operator.
    """

    def __init__(self, df: DataFrame, key: Sequence[str]):
        assert key, "key must name at least one column"
        self.df = df
        self.key = list(key)

    # ------------------------------------------------------------------ utils
    def _ordered(self, df: DataFrame, reverse: bool, limit: Optional[int]) -> DataFrame:
        out = df.orderBy(*sort_cols(self.key, reverse))
        if limit is not None:
            out = out.limit(limit)
        return out

    def where(self, predicate: Column) -> "SortedIndex":
        """Residual filter (reference per-iterator ``filter`` closure)."""
        return SortedIndex(self.df.filter(predicate), self.key)

    def copy(self) -> "SortedIndex":
        """Snapshots are immutable values; copy is free (QueryableIndex.scala:540)."""
        return SortedIndex(self.df, self.key)

    # ------------------------------------------------------------ point reads
    def get(self, k: Any) -> DataFrame:
        """Point lookup. Full-key equality → parquet predicate pushdown."""
        vals = as_tuple(k)
        assert len(vals) == len(self.key), "get() requires the full key"
        return self.df.filter(key_eq(self.key, vals))

    # Above this many requested keys, multi-get stops inlining the request
    # as a literal predicate / broadcast and shuffle-joins instead — the
    # reference's per-leaf batching (Index.scala:820-867) at file scale: a
    # million-key request neither fits an In() filter nor belongs in every
    # task's memory as a broadcast.
    GET_ALL_BROADCAST_LIMIT = 10_000

    def get_all(self, keys: Sequence[Any], must_find_all: bool = False) -> DataFrame:
        """Sorted multi-get (semi-join semantics, Index.scala:820-867).

        Size-dispatched: small single-column requests use ``isin`` (an
        ``In`` pushdown filter), small composite requests broadcast-semi-
        join a literal DataFrame, and requests past
        ``GET_ALL_BROADCAST_LIMIT`` become a shuffle semi-join — the
        request set is data then, not a predicate. ``must_find_all``
        performs the reference's KEY_NOT_FOUND check via an anti-join on
        the requested keys.
        """
        tuples = [as_tuple(k) for k in keys]
        if not tuples:
            # empty request: nothing found, nothing missing (the composite
            # branch's createDataFrame cannot infer types from no rows)
            return self.df.limit(0)
        if len(self.key) == 1 and len(tuples) <= self.GET_ALL_BROADCAST_LIMIT:
            flat = [t[0] for t in tuples]
            out = self.df.filter(F.col(self.key[0]).isin(flat))
            if must_find_all:
                found = {r[0] for r in out.select(self.key[0]).distinct().collect()}
                missing = [v for v in flat if v not in found]
                if missing:
                    raise KeyNotFoundError(missing)
            return self._ordered(out, reverse=False, limit=None)
        spark = self.df.sparkSession
        keys_df = spark.createDataFrame(tuples, schema=self.key)
        if len(tuples) > self.GET_ALL_BROADCAST_LIMIT:
            # huge request: keep it distributed — dedup then shuffle
            # semi-join on the key (sort-merge/hash picked by AQE)
            keys_df = keys_df.distinct()
            out = self.df.join(keys_df, on=self.key, how="left_semi")
            if must_find_all:
                found = self.df.select(*self.key).join(
                    keys_df, on=self.key, how="left_semi"
                ).distinct()
                # cap the collected evidence at the broadcast limit (the
                # missing set can be as large as the request); callers that
                # repair from .keys can detect the cap by its exact size
                cap = self.GET_ALL_BROADCAST_LIMIT
                missing = keys_df.join(found, on=self.key, how="left_anti").limit(cap).collect()
                if missing:
                    raise KeyNotFoundError([tuple(r) for r in missing])
            return self._ordered(out, reverse=False, limit=None)
        out = self.df.join(F.broadcast(keys_df), on=self.key, how="left_semi")
        if must_find_all:
            # scale shape: broadcast the (small) request set into the big
            # scan, then anti-join the (small) found set back — never
            # broadcast the index's own key set.
            found = (
                self.df.select(*self.key)
                .join(F.broadcast(keys_df), on=self.key, how="left_semi")
                .distinct()
            )
            missing = keys_df.join(F.broadcast(found), on=self.key, how="left_anti").collect()
            if missing:
                raise KeyNotFoundError([tuple(r) for r in missing])
        return self._ordered(out, reverse=False, limit=None)

    # ---------------------------------------------------------------- scans
    def in_order(self, reverse: bool = False, limit: Optional[int] = None) -> DataFrame:
        """Full scan in key order (``inOrder``/``reverse``)."""
        return self._ordered(self.df, reverse, limit)

    def _page_query(
        self, seek_cols: list[str], last: Optional[tuple], page_size: int, reverse: bool
    ) -> DataFrame:
        """One seek-pagination page: rows strictly past ``last`` in
        ``seek_cols`` order, limited to ``page_size`` (an indexed top-k
        continuation — ``TakeOrderedAndProject`` above a scan whose pushed
        bound prunes already-read partitions)."""
        df = self.df
        if last is not None:
            df = df.filter((key_lt if reverse else key_gt)(seek_cols, last, False))
        return df.orderBy(*sort_cols(seek_cols, reverse)).limit(page_size)

    def pages(self, page_size: int, reverse: bool = False, tiebreaker: Optional[str] = None):
        """Seek-paginated iteration: yield key-ordered pages of
        ``page_size`` rows, each fetched as ``gt(last_key_of_previous_page,
        limit=page_size)`` — the reference's async-iterator protocol
        (``RichAsyncIndexIterator.scala:13-41``: hasNext/next pulls one
        block at a time, resuming from the last key).

        Seek pagination beats OFFSET pagination structurally: every page is
        an indexed top-k continuation, where OFFSET N re-reads and discards
        N rows per page. Pagination is inherently driver-paced, so each
        yielded page is the COLLECTED row list (like the reference
        iterator's block of tuples); iteration stops at the first short
        page.

        The seek resume assumes the seek key is UNIQUE per row: if the
        declared key has duplicates and a page boundary lands inside a tie
        group, the remaining tied rows would be silently skipped (and tie
        order within a page is nondeterministic). For non-unique keys pass
        ``tiebreaker`` — a column name making (key..., tiebreaker) unique —
        and it joins both the ordering and the seek bound."""
        seek_cols = self.key + ([tiebreaker] if tiebreaker else [])
        last: Optional[tuple] = None
        while True:
            rows = self._page_query(seek_cols, last, page_size, reverse).collect()
            if not rows:
                return
            yield rows
            if len(rows) < page_size:
                return
            last = tuple(rows[-1][c] for c in seek_cols)

    def pages_df(self, page_size: int, reverse: bool = False, tiebreaker: Optional[str] = None):
        """Distributed seek pagination: like :meth:`pages` but each yielded
        page is a DataFrame (same pushed seek bound), so consumers can feed
        pages into further Spark stages without funneling row data through
        the driver. Per page it pays one column-pruned boundary probe — a
        collect of the page's SEEK COLUMNS only (≤ page_size narrow rows) —
        which also detects the final short page. Same uniqueness contract
        and ``tiebreaker`` escape hatch as :meth:`pages`."""
        seek_cols = self.key + ([tiebreaker] if tiebreaker else [])
        last: Optional[tuple] = None
        while True:
            page = self._page_query(seek_cols, last, page_size, reverse)
            boundary = page.select(*seek_cols).collect()
            if not boundary:
                return
            yield page
            if len(boundary) < page_size:
                return
            last = tuple(boundary[-1][c] for c in seek_cols)

    def head(self, n: int = 1) -> DataFrame:
        """First n tuples in key order (QueryableIndex.scala:85)."""
        return self._ordered(self.df, reverse=False, limit=n)

    def tail(self, n: int = 1) -> DataFrame:
        """Last n tuples, returned in reverse key order (QueryableIndex.scala:126)."""
        return self._ordered(self.df, reverse=True, limit=n)

    # ---------------------------------------------------------------- seeks
    def gt(
        self,
        term: Any,
        inclusive: bool = False,
        reverse: bool = False,
        prefix: Any = None,
        limit: Optional[int] = None,
    ) -> DataFrame:
        """Keys > term (≥ if inclusive). ``term`` may cover only leading key
        columns (reference custom ``termComp``). ``prefix`` bounds the scan to
        one equivalence class (prefix-bounded gt, QueryableIndex.scala:335)."""
        cond = key_gt(self.key, as_tuple(term), inclusive)
        if prefix is not None:
            cond = key_eq(self.key, as_tuple(prefix)) & cond
        return self._ordered(self.df.filter(cond), reverse, limit)

    def lt(
        self,
        term: Any,
        inclusive: bool = False,
        reverse: bool = False,
        prefix: Any = None,
        limit: Optional[int] = None,
    ) -> DataFrame:
        """Keys < term (≤ if inclusive); prefix-bounded variant as in gt."""
        cond = key_lt(self.key, as_tuple(term), inclusive)
        if prefix is not None:
            cond = key_eq(self.key, as_tuple(prefix)) & cond
        return self._ordered(self.df.filter(cond), reverse, limit)

    def range(
        self,
        frm: Any,
        to: Any,
        from_inclusive: bool = True,
        to_inclusive: bool = True,
        reverse: bool = False,
        limit: Optional[int] = None,
    ) -> DataFrame:
        """Two-sided interval (QueryableIndex.scala:432-454)."""
        cond = key_between(self.key, as_tuple(frm), as_tuple(to), from_inclusive, to_inclusive)
        return self._ordered(self.df.filter(cond), reverse, limit)

    def prefix(self, p: Any, reverse: bool = False, limit: Optional[int] = None) -> DataFrame:
        """All keys in the equivalence class of ``p`` under the prefix
        comparator = equality on leading columns (QueryableIndex.scala:422)."""
        return self._ordered(self.df.filter(key_eq(self.key, as_tuple(p))), reverse, limit)

    # ------------------------------------------------------ predecessor etc.
    def previous_key(self, k: Any) -> DataFrame:
        """Strict predecessor of k — k itself need not exist
        (QueryableIndex.scala:71-83). One row (or empty)."""
        return self.lt(k, inclusive=False, reverse=True, limit=1)

    def next_key(self, k: Any) -> DataFrame:
        """Strict successor of k."""
        return self.gt(k, inclusive=False, limit=1)

    def min(self) -> DataFrame:
        """Smallest tuple (Index.scala:885)."""
        return self.head(1)

    def max(self) -> DataFrame:
        """Largest tuple (Index.scala:891)."""
        return self.tail(1)

    def count(self) -> int:
        return self.df.count()

    def is_empty(self) -> bool:
        return self.df.isEmpty()

    # ------------------------------------------------------------ reorg ops
    def split(self, sample_size: int = 100_000) -> tuple["SortedIndex", "SortedIndex"]:
        """Split into two indexes of ~equal cardinality at a median key
        (QueryableIndex.scala:586-679).

        Scale path: the boundary comes from a *fixed-size key sample*
        (seeded, key columns only), so driver memory is O(sample) no matter
        the data size — the same sampling idea RangePartitioner uses, but
        pinned to one deterministic boundary so both halves are consistent
        across jobs. The reference likewise splits at the root's middle key,
        which is only approximately the median.
        """
        n = self.df.count()
        if n == 0:
            return SortedIndex(self.df, self.key), SortedIndex(self.df, self.key)
        frac = min(1.0, sample_size / n)
        sample = self.df.select(*self.key).sample(fraction=frac, seed=42).collect()
        if not sample:
            sample = self.df.select(*self.key).limit(sample_size).collect()
        # NULL-aware sort key (None is not orderable against str/float in
        # Python): NULL sorts first, matching the engine's key order
        keys_sorted = sorted(
            (tuple(r) for r in sample),
            key=lambda t: tuple((v is not None, v) for v in t),
        )
        boundary = keys_sorted[len(keys_sorted) // 2]
        left = self.df.filter(key_lt(self.key, boundary))
        right = self.df.filter(key_gt(self.key, boundary, inclusive=True))
        return SortedIndex(left, self.key), SortedIndex(right, self.key)

    def merge(self, right: "SortedIndex") -> "SortedIndex":
        """Merge a (key-disjoint) right index (QueryableIndex.scala:561-584).
        Disjointness is by construction after :meth:`split`; union is enough —
        the physical re-sort happens lazily at the next ordered read/write."""
        return SortedIndex(self.df.unionByName(right.df), self.key)
