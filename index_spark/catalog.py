"""Object-store-safe JSON catalog commits (snapshot manifest, shard catalog).

POSIX ``os.replace`` is atomic locally, but at 100 TB the manifest lives on
an object store (S3/GCS) where rename does not exist. What object stores DO
give is an atomic *conditional put* (S3 ``If-None-Match``, GCS
``x-goog-if-generation-match: 0``). The portable commit shape both support:

- catalog state is a sequence of IMMUTABLE, version-stamped files
  ``<name>.v{N}.json`` — never overwritten, never renamed over;
- commit N+1 is a create-if-absent of ``<name>.v{N+1}.json``; exactly one
  of two racing writers wins, the loser gets a structured
  :class:`~index_spark.errors.CommitConflictError` instead of silently
  clobbering the winner (the reference does the same CAS through Cassandra
  LWTs on the descriptor row, ``impl/CassandraStorage.scala:142-171``);
- readers resolve "latest" by listing and taking the highest stamp. Files
  appear atomically (hard-link publish locally, single PUT on a store), so
  a reader never observes a torn catalog.

Locally the create-if-absent primitive is ``os.link(tmp, final)`` — the
hard link either publishes the COMPLETE file or fails ``EEXIST``; an
``O_EXCL`` open would expose a partially-written file to concurrent
listers. Swapping this module's two primitives (list, put-if-absent) for
their S3/GCS equivalents is the entire porting surface.
"""

from __future__ import annotations

import json
import os
import re
import uuid
from typing import Optional

from index_spark.errors import CommitConflictError


def _stamp_re(name: str) -> "re.Pattern[str]":
    return re.compile(rf"^{re.escape(name)}\.v(\d+)\.json$")


def latest_stamp(base_path: str, name: str) -> Optional[int]:
    """Highest committed stamp for ``name`` in ``base_path`` (None if no
    commit yet). One directory listing — the object-store LIST analog."""
    try:
        entries = os.listdir(base_path)
    except FileNotFoundError:
        return None
    pat = _stamp_re(name)
    stamps = [int(m.group(1)) for e in entries if (m := pat.match(e))]
    return max(stamps) if stamps else None


def read_latest(base_path: str, name: str) -> Optional[tuple[dict, int]]:
    """(object, stamp) of the newest committed catalog, or None. Falls back
    to a legacy unstamped ``<name>.json`` (pre-CAS layout) as stamp 0."""
    # list-then-open races with prune(): the stamp we resolved can be
    # deleted before the open when aggressive retention (keep_latest=1)
    # runs concurrently — re-list and retry instead of surfacing a
    # FileNotFoundError for a catalog that is perfectly healthy.
    for _ in range(8):
        stamp = latest_stamp(base_path, name)
        if stamp is None:
            legacy = os.path.join(base_path, f"{name}.json")
            if os.path.exists(legacy):
                with open(legacy) as f:
                    return json.load(f), 0
            return None
        try:
            with open(os.path.join(base_path, f"{name}.v{stamp}.json")) as f:
                return json.load(f), stamp
        except FileNotFoundError:
            continue
    with open(os.path.join(base_path, f"{name}.v{stamp}.json")) as f:
        return json.load(f), stamp


def prune(base_path: str, name: str, keep_latest: int = 16) -> int:
    """Delete all but the newest ``keep_latest`` stamped catalog files.

    Every commit leaves one immutable file behind; a long mutation history
    would otherwise make the LIST step (and the directory itself) grow
    without bound. Readers only ever resolve the HIGHEST stamp, so deleting
    older stamps never changes what any reader sees — a reader that listed
    before the delete reads a file that still exists (deletes go oldest-
    first). The commit protocol is unaffected: put-if-absent targets a
    stamp above the highest, which is always kept. Returns #deleted."""
    stamps = []
    pat = _stamp_re(name)
    try:
        entries = os.listdir(base_path)
    except FileNotFoundError:
        return 0
    for e in entries:
        if (m := pat.match(e)):
            stamps.append(int(m.group(1)))
    stamps.sort()
    doomed = stamps[:-keep_latest] if keep_latest > 0 else stamps
    n = 0
    for s in doomed:
        try:
            os.unlink(os.path.join(base_path, f"{name}.v{s}.json"))
            n += 1
        except FileNotFoundError:
            pass
    return n


def commit(base_path: str, name: str, obj: dict, expected_stamp: Optional[int]) -> int:
    """Conditional put of the next catalog version.

    ``expected_stamp`` is the stamp the writer READ before staging its
    change (None = writer believes no catalog exists yet). The commit
    targets ``expected_stamp + 1``; if that file already exists — any
    concurrent writer got there first — raise
    :class:`CommitConflictError` and leave the winner untouched.
    """
    os.makedirs(base_path, exist_ok=True)
    # The put-if-absent alone is not enough once prune() has deleted old
    # stamps: a stale writer whose expected_stamp fell below the pruned
    # range would "successfully" create a gap-filling low stamp that no
    # reader (they resolve max) ever sees — a silently lost commit. Verify
    # the writer is commiting against the CURRENT head first; the racing
    # window left between this check and the link is then covered by the
    # EEXIST conflict, because the target stamp is above the retained head.
    cur = latest_stamp(base_path, name)
    if cur is not None and (expected_stamp is None or cur > expected_stamp):
        raise CommitConflictError(
            f"catalog {name} advanced to v{cur} past expected v{expected_stamp} — "
            "reread and retry the transaction"
        )
    nxt = 1 if expected_stamp is None else expected_stamp + 1
    final = os.path.join(base_path, f"{name}.v{nxt}.json")
    tmp = os.path.join(base_path, f".{name}.{uuid.uuid4().hex}.tmp")
    try:
        with open(tmp, "w") as f:
            json.dump(obj, f)
            f.flush()
            os.fsync(f.fileno())
        try:
            os.link(tmp, final)  # put-if-absent: publishes all-or-nothing
        except FileExistsError:
            raise CommitConflictError(
                f"catalog {name} advanced past v{expected_stamp} — "
                "reread and retry the transaction"
            ) from None
    finally:
        # also reached when json.dump/fsync fails: never leave orphaned
        # .tmp files behind (prune()'s regex would skip them forever)
        try:
            os.unlink(tmp)
        except FileNotFoundError:
            pass
    return nxt
