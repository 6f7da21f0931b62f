"""Run-semantics tests: retry posture, notifications, chain ordering,
and catchup=False ledger behavior (reference parity:
/root/reference/dags/airflow_dag.py:13-18,27-29,62)."""

from __future__ import annotations

import pytest

from data_engineer_coder_spark.scheduling import (
    RetryPolicy,
    RunLedger,
    TaskFailed,
    run_chain,
    run_task,
)


def _collector():
    sent: list[tuple[str, str]] = []
    return sent, lambda subject, body: sent.append((subject, body))


def test_retry_then_success_notifies_once():
    calls = {"n": 0}
    slept: list[float] = []

    def flaky():
        calls["n"] += 1
        if calls["n"] == 1:
            raise ValueError("transient")
        return "ok"

    sent, notify = _collector()
    out = run_task("fetch", flaky, RetryPolicy(retries=1, delay_s=30), notify, slept.append)
    assert out == "ok"
    assert calls["n"] == 2
    assert slept == [30]  # the reference's retry_delay
    assert len(sent) == 1 and sent[0][0] == "retry: fetch"


def test_exhausted_retries_raise_with_failure_notification():
    sent, notify = _collector()

    def broken():
        raise RuntimeError("boom")

    with pytest.raises(TaskFailed) as ei:
        run_task("load", broken, RetryPolicy(retries=1, delay_s=0), notify, lambda s: None)
    assert ei.value.attempts == 2
    assert isinstance(ei.value.cause, RuntimeError)
    subjects = [s for s, _ in sent]
    assert subjects == ["retry: load", "FAILED: load"]


def test_chain_stops_at_first_terminal_failure():
    ran: list[str] = []

    def ok(name):
        def f():
            ran.append(name)
            return name

        return f

    def bad():
        raise RuntimeError("down")

    with pytest.raises(TaskFailed):
        run_chain(
            [("t1", ok("t1")), ("t2", bad), ("t3", ok("t3"))],
            RetryPolicy(retries=0, delay_s=0),
            sleep=lambda s: None,
        )
    assert ran == ["t1"]  # t3 never ran: upstream failed


def test_ledger_catchup_false_runs_only_latest(tmp_path):
    led = RunLedger(str(tmp_path), "air_quality")
    days = ["2024-01-01", "2024-01-02", "2024-01-03"]
    # three missed days, catchup=False → only the newest is claimed, and
    # the older two are durably SKIPPED (the Airflow semantic) — a later
    # catchup=False tick must NOT backfill a stale day
    assert led.claim(days) == ["2024-01-03"]
    led.mark_done("2024-01-03")
    assert led.claim(days) == []
    # a NEW candidate after the skip is due as normal
    assert led.claim(days + ["2024-01-04"]) == ["2024-01-04"]
    led.mark_done("2024-01-04")
    # at-most-once: a re-offered completed date is never due again
    assert led.claim(["2024-01-04"]) == []


def test_ledger_due_is_read_only(tmp_path):
    led = RunLedger(str(tmp_path), "dryrun")
    days = ["2024-01-01", "2024-01-02", "2024-01-03"]
    # a monitoring caller previews the tick without settling anything
    assert led.due(days) == ["2024-01-03"]
    assert not (tmp_path / "dryrun.ledger.json").exists()
    # nothing was skipped, so a catchup=True claim still sees every day
    assert led.claim(days, catchup=True) == days


def test_ledger_catchup_true_resurrects_skipped(tmp_path):
    led = RunLedger(str(tmp_path), "backfill")
    days = ["2024-01-01", "2024-01-02", "2024-01-03"]
    assert led.claim(days) == ["2024-01-03"]
    led.mark_done("2024-01-03")
    # Airflow parity: enabling catchup later backfills intervals that
    # never ran — skipped dates resurrect, done dates stay settled
    assert led.due(days, catchup=True) == ["2024-01-01", "2024-01-02"]
    assert led.claim(days, catchup=True) == ["2024-01-01", "2024-01-02"]
    led.mark_done("2024-01-01")
    led.mark_done("2024-01-02")
    # backfilled dates are done now: a catchup=False tick sees nothing
    assert led.claim(days) == []
    assert led.claim(days, catchup=True) == []


def test_ledger_catchup_true_replays_all_missed(tmp_path):
    led = RunLedger(str(tmp_path), "aq")
    days = ["2024-01-01", "2024-01-02", "2024-01-03"]
    # catchup=True replays everything missed, oldest first, skipping none
    assert led.claim(days, catchup=True) == days
    led.mark_done("2024-01-01")
    assert led.claim(days, catchup=True) == ["2024-01-02", "2024-01-03"]


def test_ledger_skip_batch_is_one_write(tmp_path, monkeypatch):
    import os

    import data_engineer_coder_spark.scheduling as sched

    led = RunLedger(str(tmp_path), "batched")
    writes = []
    orig = os.replace
    monkeypatch.setattr(
        sched.os, "replace", lambda a, b: (writes.append(b), orig(a, b))[1]
    )
    # 30 stale days → ONE ledger rewrite, not 29 (ADVICE r5)
    days = [f"2024-01-{d:02d}" for d in range(1, 31)]
    assert led.claim(days) == ["2024-01-30"]
    assert len(writes) == 1


def test_ledger_reads_pre_skip_format(tmp_path):
    import json as _json

    # a bare done-list (the pre-skip ledger format) must keep working
    path = tmp_path / "legacy.ledger.json"
    path.write_text(_json.dumps(["2024-03-01"]))
    led = RunLedger(str(tmp_path), "legacy")
    assert led.claim(["2024-03-01", "2024-03-02"]) == ["2024-03-02"]


def test_ledger_survives_reopen(tmp_path):
    RunLedger(str(tmp_path), "p").mark_done("2024-02-01")
    assert RunLedger(str(tmp_path), "p").claim(["2024-02-01"]) == []
