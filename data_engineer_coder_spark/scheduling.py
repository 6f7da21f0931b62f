"""Operational run semantics (SURVEY.md §3.4 — the reference's Airflow
posture, re-expressed engine-side).

The reference wraps its three tasks in a daily DAG with retry-once-30s,
email-on-retry/failure, and ``catchup=False``
(``/root/reference/dags/airflow_dag.py:13-18,27-29,62``).  Scheduling
itself (the cron tick) stays out of engine scope — any orchestrator can
call :func:`run_chain` — but the RUN semantics are engine concerns and
live here:

- :class:`RetryPolicy` — bounded retries with a fixed delay (the
  reference: ``retries=1, retry_delay=30s``);
- retry/failure notifications through the same injectable transport as
  the report sink (``sinks.send_report``) — no smtplib literals;
- :class:`RunLedger` — at-most-once per logical date with
  ``catchup=False`` semantics: of the logical dates missed since the
  last run, only the LATEST is executed, the rest are skipped (exactly
  what Airflow's flag does for a daily batch: re-running 30 stale days
  of a snapshot feed is wasted work, the newest snapshot supersedes
  them).

At 100 TB these semantics matter more, not less: a blind catchup=True
replay of a month of missed daily runs is 30 full-scale jobs, and
non-idempotent retries double-ingest (the reference's append-mode bug —
see ``operators/dedup.py``).  Every task here is assumed idempotent per
logical date; the ledger enforces the once.
"""

from __future__ import annotations

import json
import os
import time
from collections.abc import Callable, Sequence
from dataclasses import dataclass


@dataclass(frozen=True)
class RetryPolicy:
    """Bounded-retry posture (reference: retries=1, retry_delay=30 s)."""

    retries: int = 1
    delay_s: float = 30.0


class TaskFailed(RuntimeError):
    """A task exhausted its retries; carries the last underlying error."""

    def __init__(self, task: str, attempts: int, cause: BaseException):
        super().__init__(f"task {task!r} failed after {attempts} attempt(s): {cause!r}")
        self.task = task
        self.attempts = attempts
        self.cause = cause


def run_task(
    name: str,
    fn: Callable[[], object],
    policy: RetryPolicy = RetryPolicy(),
    notify: Callable[[str, str], None] | None = None,
    sleep: Callable[[float], None] = time.sleep,
) -> object:
    """Run one task under the retry policy.

    ``notify(subject, body)`` fires on every retry and on terminal
    failure (the reference's email_on_retry/email_on_failure,
    airflow_dag.py:14-15) — inject ``sinks.file_transport``/smtplib the
    same way as ``send_report``.  ``sleep`` is injectable so tests don't
    wait wall-clock.
    """
    attempts = policy.retries + 1
    for attempt in range(1, attempts + 1):
        try:
            return fn()
        except Exception as e:  # noqa: BLE001 — the boundary must catch all
            if attempt < attempts:
                if notify:
                    notify(
                        f"retry: {name}",
                        f"task {name!r} attempt {attempt}/{attempts} failed "
                        f"({e!r}); retrying in {policy.delay_s:g}s",
                    )
                sleep(policy.delay_s)
            else:
                if notify:
                    notify(
                        f"FAILED: {name}",
                        f"task {name!r} failed on final attempt "
                        f"{attempt}/{attempts}: {e!r}",
                    )
                raise TaskFailed(name, attempts, e) from e
    raise AssertionError("unreachable")


def run_chain(
    tasks: Sequence[tuple[str, Callable[[], object]]],
    policy: RetryPolicy = RetryPolicy(),
    notify: Callable[[str, str], None] | None = None,
    sleep: Callable[[float], None] = time.sleep,
) -> list[object]:
    """Sequential task chain (the reference's ``task_1 >> task_2 >>
    send_email_task``, airflow_dag.py:62): downstream tasks do not run
    once an upstream one terminally fails."""
    return [run_task(name, fn, policy, notify, sleep) for name, fn in tasks]


class RunLedger:
    """At-most-once-per-logical-date guard with catchup=False semantics.

    A tiny JSON file (one per pipeline) records completed and skipped
    logical dates.  Two entry points (ADVICE r5: a query-shaped method
    must not have durable write side effects):

    - :meth:`due` — READ-ONLY preview of what a tick would run; safe for
      dry-run/monitoring callers, touches nothing on disk.
    - :meth:`claim` — the scheduler's run-now decision: durably settles
      the skips implied by ``catchup=False`` (one atomic write for the
      whole batch) and returns the dates to execute.

    Catchup semantics match Airflow: ``catchup=False`` runs only the
    latest missed candidate and skips the rest; flipping to
    ``catchup=True`` later backfills every interval that never actually
    ran — a previously *skipped* date is resurrected, only *done* dates
    stay settled.
    """

    def __init__(self, path: str, pipeline: str):
        self._file = os.path.join(path, f"{pipeline}.ledger.json")

    def _load(self) -> dict[str, set[str]]:
        try:
            with open(self._file) as fh:
                raw = json.load(fh)
        except (OSError, ValueError):
            return {"done": set(), "skipped": set()}
        if isinstance(raw, list):  # pre-skip ledger format: a bare done-list
            return {"done": set(raw), "skipped": set()}
        return {"done": set(raw.get("done", ())), "skipped": set(raw.get("skipped", ()))}

    def due(self, candidates: Sequence[str], catchup: bool = False) -> list[str]:
        """Dates a :meth:`claim` call would run NOW — read-only.

        ``catchup=False``: at most the single latest candidate that is
        neither done nor already skipped.  ``catchup=True``: every
        candidate not done (including previously skipped ones — enabling
        catchup backfills intervals that never ran), oldest first.
        """
        state = self._load()
        if catchup:
            return sorted(set(candidates) - state["done"])
        missed = sorted(set(candidates) - state["done"] - state["skipped"])
        return missed[-1:]

    def claim(self, candidates: Sequence[str], catchup: bool = False) -> list[str]:
        """Durable run-now decision for this tick.

        Returns :meth:`due`'s answer; with ``catchup=False`` the older
        missed candidates are first marked SKIPPED in one atomic write —
        without recording them, every later tick would backfill one more
        stale day.  With ``catchup=True`` nothing is skipped (and any
        resurrected date leaves ``skipped`` once it is marked done).
        """
        if catchup:
            return self.due(candidates, catchup=True)
        state = self._load()
        missed = sorted(set(candidates) - state["done"] - state["skipped"])
        if len(missed) > 1:
            self._mark_all("skipped", missed[:-1])
        return missed[-1:]

    def mark_done(self, logical_date: str) -> None:
        self._mark_all("done", [logical_date])

    def _mark_all(self, status: str, logical_dates: Sequence[str]) -> None:
        """One load + one atomic write for the whole batch (ADVICE r5:
        per-date rewrites were O(n) full-file writes per tick)."""
        state = self._load()
        state[status].update(logical_dates)
        if status == "done":
            # a backfilled (resurrected) date is no longer "skipped"
            state["skipped"] -= state["done"]
        os.makedirs(os.path.dirname(self._file), exist_ok=True)
        tmp = self._file + ".tmp"
        with open(tmp, "w") as fh:
            json.dump({k: sorted(v) for k, v in state.items()}, fh)
        os.replace(tmp, self._file)  # atomic: a crash never truncates the ledger
