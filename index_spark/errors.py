"""Engine-visible error taxonomy.

Ports the reference's error surface (SURVEY.md §2.7; reference
``src/main/scala/services/scalable/index/Errors.scala:3-42``). Only the
*engine-visible* errors are reproduced — the block-level ones
(LEAF_BLOCK_FULL, META_DUPLICATE_KEY, ...) are artifacts of the B+Tree
physical design that Spark's layout machinery replaces.

Each error carries a stable ``code`` string so callers (and tests) can match
on semantics rather than message text, mirroring the reference's sealed
trait of case objects.
"""

from __future__ import annotations

from typing import Any, Sequence


class IndexError_(Exception):
    """Base class for engine errors. Underscore avoids the builtin clash."""

    code = "INDEX_ERROR"

    def __init__(self, message: str = "", details: Any = None):
        super().__init__(message or self.code)
        self.details = details


class DuplicatedKeysError(IndexError_):
    """Batch insert contained duplicate keys (intra-batch, or non-upsert
    collision with existing keys). Reference: ``Errors.scala`` DUPLICATED_KEYS
    / LEAF_DUPLICATE_KEY."""

    code = "DUPLICATED_KEYS"

    def __init__(self, keys: Sequence[Any] = ()):  # keys: offending key tuples
        super().__init__(f"DUPLICATED_KEYS: {list(keys)[:10]}", details=list(keys))
        self.keys = list(keys)


class KeyNotFoundError(IndexError_):
    """update/remove/getAll(mustFindAll) referenced an absent key.
    Reference: ``Errors.scala`` KEY_NOT_FOUND."""

    code = "KEY_NOT_FOUND"

    def __init__(self, keys: Sequence[Any] = ()):
        super().__init__(f"KEY_NOT_FOUND: {list(keys)[:10]}", details=list(keys))
        self.keys = list(keys)


class VersionChangedError(IndexError_):
    """Optimistic concurrency-control conflict: expected last-writer version
    does not match the stored one. Reference: ``Errors.scala`` VERSION_CHANGED,
    check at ``Leaf.scala:62-71``."""

    code = "VERSION_CHANGED"

    def __init__(self, conflicts: Sequence[Any] = ()):
        super().__init__(f"VERSION_CHANGED: {list(conflicts)[:10]}", details=list(conflicts))
        self.conflicts = list(conflicts)


class IndexAlreadyExistsError(IndexError_):
    code = "INDEX_ALREADY_EXISTS"


class CommitConflictError(IndexError_):
    """Catalog/manifest conditional-put lost a commit race: another writer
    advanced the catalog between this writer's read and its commit. The
    analog of the reference's descriptor CAS failing its Cassandra LWT
    (``impl/CassandraStorage.scala:142-171``). Retry = reread latest,
    re-stage, re-commit."""

    code = "COMMIT_CONFLICT"


class IndexNotFoundError(IndexError_):
    code = "INDEX_NOT_FOUND"


class TemporalIndexNotFoundError(IndexError_):
    code = "TEMPORAL_INDEX_NOT_FOUND"


class ContextUsedError(IndexError_):
    """A write handle is single-use (reference single-shot transaction
    contract, ``Index.scala:1012`` / ``Context.scala:32``)."""

    code = "TX_NOT_STARTED"
