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

    A tiny JSON file (one per pipeline) records completed logical dates.
    ``due(candidates)`` returns the dates to run NOW: with
    ``catchup=False`` (default, matching the reference) that is at most
    the single latest not-yet-run candidate; with ``catchup=True`` every
    missed candidate, oldest first.
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

    def _settled(self) -> set[str]:
        state = self._load()
        return state["done"] | state["skipped"]

    def due(self, candidates: Sequence[str], catchup: bool = False) -> list[str]:
        """Dates to run NOW; with ``catchup=False`` the older missed
        candidates are durably marked SKIPPED at this moment — that is
        the Airflow semantic ("the rest are skipped"), and it must be
        recorded or every later tick would backfill one more stale day.
        A skipped date is settled: it never becomes due again, even
        under a later ``catchup=True`` call."""
        missed = sorted(set(candidates) - self._settled())
        if not missed:
            return []
        if catchup:
            return missed
        for stale in missed[:-1]:
            self._mark("skipped", stale)
        return missed[-1:]

    def mark_done(self, logical_date: str) -> None:
        self._mark("done", logical_date)

    def _mark(self, status: str, logical_date: str) -> None:
        state = self._load()
        state[status].add(logical_date)
        os.makedirs(os.path.dirname(self._file), exist_ok=True)
        tmp = self._file + ".tmp"
        with open(tmp, "w") as fh:
            json.dump({k: sorted(v) for k, v in state.items()}, fh)
        os.replace(tmp, self._file)  # atomic: a crash never truncates the ledger
