"""bench.py budget machinery: the round scorecard must be structurally
unable to go blank (VERDICT r4 #1).

Pins: every JSON field starts "skipped" (a killed run still parses), the
section guard skips instead of overrunning, guard() converts exceptions
into error markers without killing the run, and a TPU-service
first-dispatch STALL is credited back to the wall budget (capped) so a
6-16 min platform hang cannot skip every section of an otherwise
healthy run (seen round 5: all-"skipped" record after a 16 min stall).

bench.py's module top level imports no jax — safe to import on CPU.
"""

import importlib
import json

import pytest


@pytest.fixture()
def bench():
    import bench as mod

    mod = importlib.reload(mod)  # fresh T_START / RESULTS per test
    yield mod
    importlib.reload(mod)


def test_initial_record_parses_and_is_all_skipped(bench):
    line = json.dumps(bench.RESULTS)
    rec = json.loads(line)
    assert rec["metric"] == "rtf_proc_per_audio"
    # the driver reads these exact keys; everything not yet measured is
    # the literal string "skipped", never missing
    for key in ("value", "vs_baseline", "link_rtt_ms", "decode_micro_b2_ms",
                "int8_logit_snr_db", "ttfa_idle_p50_ms",
                "agg_frames_per_s_b16", "ttfa_p95_b16_busy12_ms",
                "duplex_turn_ttfa_ms", "cold_start_first_ttfa_ms"):
        assert rec[key] == "skipped"


def test_section_guard_skips_when_budget_spent(bench):
    assert bench.section("fits", needs_s=1.0)
    bench.T_START -= bench.BUDGET_S  # simulate a fully spent budget
    assert not bench.section("late", needs_s=1.0)


def test_guard_marks_fields_instead_of_raising(bench):
    def boom():
        raise RuntimeError("kaput")

    bench.guard("boom", boom, "value", "vs_baseline")
    assert bench.RESULTS["value"] == "error:RuntimeError"
    assert bench.RESULTS["vs_baseline"] == "error:RuntimeError"
    # an already-measured field is never overwritten by a later error
    bench.RESULTS["link_rtt_ms"] = 31.2
    bench.guard("boom2", boom, "link_rtt_ms")
    assert bench.RESULTS["link_rtt_ms"] == 31.2


def test_stall_credit_extends_budget_and_caps(bench):
    r0 = bench.remaining()
    bench.credit_stall(700.0)
    assert bench.remaining() == pytest.approx(r0 + 700.0, abs=2.0)
    assert bench.RESULTS["stall_credit_s"] == 700.0
    bench.credit_stall(5000.0)  # pathological hang: capped at 900 s
    assert bench.RESULTS["stall_credit_s"] == 900.0
