"""Table-level write lock + optimistic commit concurrency (VERDICT r4 next #5).

The icelet commit protocol (snapshot JSON -> atomic pointer rename) is safe
for a SINGLE writer; round 4 shipped maintenance (compaction, snapshot
expiry) on an *assumed* single-maintainer-per-table discipline that nothing
enforced. Two enforcement pieces close that:

- ``table_write_lock(root)`` — a lock FILE (``root/_lock``) created with
  O_CREAT|O_EXCL (atomic on POSIX), carrying the holder's pid + timestamp.
  A holder that died without unlocking is broken after ``stale_ttl_s``
  (crash-safe; the TTL is generous vs the milliseconds the metadata
  critical section actually takes). Held across every snapshot-metadata
  critical section: ``IceletTable.commit`` and the whole of
  ``maintenance.expire_snapshots``.
- ``expected_version`` CAS on ``commit`` — long-running work (an apply's
  Spark job, a compaction rewrite) must NOT hold the lock for its full
  duration, so writers instead record the snapshot version their work was
  based on and ``commit`` re-checks it under the lock: a concurrent commit
  in between raises ``CommitConflictError`` instead of silently building
  the new snapshot on a base the work never saw (lost update / colliding
  sequence numbers). The loser's already-written data files are orphans the
  grace-windowed sweep reclaims; callers retry the whole operation.

This mirrors Iceberg's optimistic-concurrency commit (metadata CAS +
retry), re-expressed for the file-pointer catalog.
"""

from __future__ import annotations

import json
import os
import time
from contextlib import contextmanager

LOCK_NAME = "_lock"


class CommitConflictError(RuntimeError):
    """The table advanced past the snapshot version this work was based on;
    retry the operation against the new current snapshot."""


@contextmanager
def table_write_lock(
    root: str,
    timeout_s: float = 60.0,
    stale_ttl_s: float = 600.0,
    poll_s: float = 0.05,
):
    path = os.path.join(root, LOCK_NAME)
    deadline = time.monotonic() + timeout_s
    while True:
        try:
            fd = os.open(path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
            try:
                os.write(fd, json.dumps(
                    {"pid": os.getpid(), "ts": time.time()}
                ).encode())
            finally:
                os.close(fd)
            break
        except FileExistsError:
            try:
                st = os.stat(path)
            except FileNotFoundError:
                continue  # holder released between open and stat; retry now
            if time.time() - st.st_mtime > stale_ttl_s:
                # stale holder (crashed without unlock): break the lock
                # under a breaker mutex — two naked breakers could race a
                # fresh acquirer (A removes + X recreates, then B's late
                # remove deletes X's LIVE lock; VERDICT r5 next #8). With
                # the O_EXCL breaker file, only one process may stat+remove
                # at a time, and it re-checks staleness under the mutex —
                # a lock recreated meanwhile is fresh and survives.
                _break_stale(path, stale_ttl_s)
                continue
            if time.monotonic() > deadline:
                raise TimeoutError(
                    f"could not acquire table write lock {path} "
                    f"within {timeout_s}s (holder: {st.st_mtime})"
                )
            time.sleep(poll_s)
    try:
        yield
    finally:
        try:
            os.remove(path)
        except FileNotFoundError:
            pass


def _break_stale(path: str, stale_ttl_s: float, breaker_ttl_s: float = 10.0) -> None:
    """Remove a stale lock file, serialized through ``path + '.breaker'``.

    The breaker critical section is a stat + conditional remove
    (microseconds), so its own staleness window is generous at 10s; a
    crashed breaker's file is aged out the same way. Callers re-poll
    after this returns regardless of who won."""
    b = path + ".breaker"
    try:
        fd = os.open(b, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        os.close(fd)
    except FileExistsError:
        # another breaker is (or crashed while) breaking; age out its
        # marker and let the caller's poll loop retry
        try:
            if time.time() - os.stat(b).st_mtime > breaker_ttl_s:
                os.remove(b)
        except FileNotFoundError:
            pass
        return
    try:
        try:
            st = os.stat(path)
        except FileNotFoundError:
            return
        if time.time() - st.st_mtime > stale_ttl_s:
            try:
                os.remove(path)
            except FileNotFoundError:
                pass
    finally:
        try:
            os.remove(b)
        except FileNotFoundError:
            pass
