"""Command batch types (reference ``Commands.scala:10-15`` / SURVEY.md §2.2).

A command references key/value *rows* either as plain Python dicts (small
transactional batches; tests build these cheaply) or as a ``DataFrame``
(bulk/streaming ingestion — the batch never funnels through the driver).
``VersionedIndex`` normalizes both once per execute.

- ``Insert``: rows ``{key cols..., value cols...}`` + per-row ``upsert``
  (dict batches only; a DataFrame batch uses the batch-level flag).
- ``Update``: rows + optional per-row ``__expected_version`` (optimistic CC).
- ``Remove``: key rows + optional per-row ``__expected_version``.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Optional


@dataclass
class Insert:
    rows: Any  # list[dict] | DataFrame
    upsert: bool = False  # batch default; a dict row may override with row["__upsert"]
    # Schema evolution is opt-in (Delta/Iceberg mergeSchema shape): by
    # default a batch column absent from the snapshot raises, catching the
    # misspelled-column bug where the intended column silently stays NULL.
    allow_new_columns: bool = False


@dataclass
class Update:
    rows: Any  # list[dict] | DataFrame; rows may carry "__expected_version"


@dataclass
class Remove:
    keys: Any  # list[dict] | DataFrame; key cols only, may carry "__expected_version"


Command = Any  # Insert | Update | Remove


@dataclass
class BatchResult:
    success: bool
    error: Optional[str] = None
    n: int = 0
    version: Optional[str] = None
    details: Any = field(default=None)
