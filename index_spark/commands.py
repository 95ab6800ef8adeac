"""Command batch types (reference ``Commands.scala:10-15`` / SURVEY.md §2.2).

A command references key/value *rows* as plain Python dicts (or tuples in
key order) so tests can build batches cheaply; ``VersionedIndex`` converts
them to DataFrames once per execute.

- ``Insert``: rows ``{key cols..., value cols...}`` + per-row ``upsert``.
- ``Update``: rows + optional per-row ``expected_version`` (optimistic CC).
- ``Remove``: key rows + optional per-row ``expected_version``.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Optional


@dataclass
class Insert:
    rows: list[dict[str, Any]]
    upsert: bool = False  # batch default; a row may override with row["__upsert"]


@dataclass
class Update:
    rows: list[dict[str, Any]]  # row may carry "__expected_version"


@dataclass
class Remove:
    keys: list[dict[str, Any]]  # key cols only; may carry "__expected_version"


Command = Any  # Insert | Update | Remove


@dataclass
class BatchResult:
    success: bool
    error: Optional[str] = None
    n: int = 0
    version: Optional[str] = None
    details: Any = field(default=None)
