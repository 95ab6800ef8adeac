"""index_spark — a PySpark-native ordered-index analytics engine.

Re-expresses the capabilities of the reference COW B+Tree index library
(`scalable-services/index`, see SURVEY.md) on idiomatic Spark primitives:

- ordered-query surface (point get, multi-get, range/gt/lt/prefix seeks,
  predecessor/successor, top-k, reverse scans)  -> ``index_spark.index.SortedIndex``
- versioned batch mutations with the reference's atomicity + error taxonomy
  (DUPLICATED_KEYS / KEY_NOT_FOUND / VERSION_CHANGED)
  -> ``index_spark.snapshots.VersionedIndex``
- snapshot isolation + time travel (history table, as-of resolution)
  -> ``index_spark.snapshots.SnapshotStore`` / ``TemporalIndex``
- index split/merge (sharding)  -> ``SortedIndex.split`` / ``merge``
- EAVT datom layer (Datomic-style covering orders)  -> ``index_spark.datoms``
- large-scale training-data pipeline operators (dedup, similarity search,
  text analysis, multimodal plumbing)  -> ``index_spark.operators`` /
  ``index_spark.functions``

Design stance (SURVEY.md §7): the B+Tree *physics* (blocks, splits,
borrow/merge, COW path copying) is not ported — Spark's range partitioning,
parquet min/max pruning and immutable dataset writes replace it wholesale.
What is ported is the *semantic surface*.
"""

from index_spark.errors import (
    DuplicatedKeysError,
    IndexAlreadyExistsError,
    IndexError_,
    IndexNotFoundError,
    KeyNotFoundError,
    VersionChangedError,
)
from index_spark.index import SortedIndex
from index_spark.sharded import ShardedIndex
from index_spark.snapshots import SnapshotStore, TemporalIndex, VersionedIndex

__all__ = [
    "SortedIndex",
    "ShardedIndex",
    "SnapshotStore",
    "TemporalIndex",
    "VersionedIndex",
    "IndexError_",
    "DuplicatedKeysError",
    "KeyNotFoundError",
    "VersionChangedError",
    "IndexAlreadyExistsError",
    "IndexNotFoundError",
]
