"""CommitTracker — Solr's autocommit policy, ported deterministically.

Reference: ``solr/core/src/java/org/apache/solr/update/
CommitTracker.java`` (:46-223). Semantics kept rule-for-rule:

* maxDocs trigger (:157-166): ``addedDocument`` increments
  docsSinceCommit and fires exactly once ON THE WAY UP when the count
  reaches ``docsUpperBound + 1`` (the reference's ``==`` comparison),
  resetting the counter immediately (not in run()) so later adds are
  not missed; the fire schedules a commit DOC_COMMIT_DELAY_MS=1 ms
  out, not synchronously.
* maxTime / commitWithin trigger (:113-151): ``commitWithin > 0``
  overrides ``timeUpperBound``; a pending commit that would fire
  FIRST is left alone (the ``getDelay() <= commitMaxTime`` early
  return), otherwise the pending commit is cancelled and re-scheduled
  sooner. ``deletedDocument`` only arms the time trigger.
* run() (:196-222): clears pending BEFORE committing (so a new commit
  can be scheduled during the current one) and increments
  autoCommitCount before the commit call.
* didRollback (:183-191): cancels pending and zeroes the doc count.

The reference runs on a ScheduledExecutorService wall clock; here the
clock is LOGICAL and injected — callers pass ``now`` (ms) into the
mutators and drive ``tick(now)``, which fires the commit callback when
the pending deadline has passed. That makes autocommit behavior
replay-deterministic inside a foreachBatch sink (a wall clock would
break the NRT replay-idempotence contract the checkpoint relies on).
"""

from __future__ import annotations

from typing import Callable, Optional

__all__ = ["CommitTracker"]


class CommitTracker:
    DOC_COMMIT_DELAY_MS = 1

    def __init__(
        self,
        name: str = "",
        docs_upper_bound: int = -1,
        time_upper_bound: int = -1,
        open_searcher: bool = True,
        soft_commit: bool = False,
        on_commit: Optional[Callable[["CommitTracker"], None]] = None,
    ):
        self.name = name
        self.docs_upper_bound = docs_upper_bound
        self.time_upper_bound = time_upper_bound
        self.open_searcher = open_searcher
        self.soft_commit = soft_commit
        self.on_commit = on_commit
        self.docs_since_commit = 0
        self.auto_commit_count = 0
        self._pending: Optional[int] = None  # absolute deadline (ms)

    # -- scheduling rules (:113-151) ------------------------------------

    def _schedule_commit_within(self, commit_max_time: int, now: int):
        if commit_max_time <= 0:
            return
        if (self._pending is not None
                and self._pending - now <= commit_max_time):
            # a pending commit will happen first — nothing to do
            return
        self._pending = now + commit_max_time

    def _schedule_commit_within_if_needed(self, commit_within: int,
                                          now: int):
        ctime = (commit_within if commit_within > 0
                 else self.time_upper_bound)
        if ctime > 0:
            self._schedule_commit_within(ctime, now)

    def schedule_commit_within(self, commit_max_time: int, now: int = 0):
        self._schedule_commit_within(commit_max_time, now)

    def cancel_pending_commit(self):
        self._pending = None

    # -- update notifications (:154-172) --------------------------------

    def added_document(self, commit_within: int = 0, now: int = 0):
        if self.docs_upper_bound > 0:
            self.docs_since_commit += 1
            if self.docs_since_commit == self.docs_upper_bound + 1:
                # reset HERE, not in run() (:161-163)
                self.docs_since_commit = 0
                self._schedule_commit_within(
                    self.DOC_COMMIT_DELAY_MS, now)
        self._schedule_commit_within_if_needed(commit_within, now)

    def deleted_document(self, commit_within: int = 0, now: int = 0):
        self._schedule_commit_within_if_needed(commit_within, now)

    def did_rollback(self):
        self._pending = None
        self.docs_since_commit = 0

    # -- the scheduler worker (:196-222) --------------------------------

    def tick(self, now: int) -> bool:
        """Fire the pending commit if its deadline has passed. Returns
        True when a commit ran. pending clears BEFORE the callback and
        the count increments BEFORE it, per the reference ordering."""
        if self._pending is None or now < self._pending:
            return False
        self._pending = None
        self.auto_commit_count += 1
        if self.on_commit is not None:
            self.on_commit(self)
        return True

    @property
    def pending_deadline(self) -> Optional[int]:
        return self._pending

    def get_commit_count(self) -> int:
        return self.auto_commit_count

    def __str__(self):  # toString (:230-240)
        if self.time_upper_bound > 0 or self.docs_upper_bound > 0:
            return (
                (f"if uncommited for {self.time_upper_bound}ms; "
                 if self.time_upper_bound > 0 else "")
                + (f"if {self.docs_upper_bound} uncommited docs "
                   if self.docs_upper_bound > 0 else "")
            )
        return "disabled"
