"""bench.py artifact-contract tests (no TPU, no subprocesses).

Round 3's official bench artifact timed out (rc=124) and the driver recorded
a 13B side metric as the round's headline (VERDICT r03, "What's weak" #1).
The rework these tests pin down:
  * the north-star line is the LAST {"metric"...} line under every outcome
    (the driver parses the last line),
  * sections that don't fit the wall-clock budget emit {"skipped": ...}
    markers instead of silently vanishing,
  * a run whose serving section produced nothing still emits an explicit
    value-0 headline (never some other section's metric) and exits non-zero.

bench.py imports no jax at module scope, so this is cheap to test directly.
"""

import json
import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
import bench


FAKE_LINES = {
    "serve7b": [
        json.dumps({"metric": bench.HEADLINE_METRIC, "value": 8.8,
                    "unit": "actions/sec", "vs_baseline": 1.467}),
        json.dumps({"metric": "openvla7b-int8_speculative_effective_throughput",
                    "value": 13.2, "unit": "actions/sec", "vs_baseline": 2.2}),
    ],
    "data": [json.dumps({"metric": "rlds_preprocess_frames_per_sec",
                         "value": 300.0, "unit": "frames/sec per host", "vs_baseline": 0})],
    "closedloop": [json.dumps({"metric": "closed_loop_hz_sequential",
                               "value": 7.2, "unit": "Hz", "vs_baseline": 1.2})],
    "loadtest": [json.dumps({"metric": "serving_p99_ms",
                             "value": 735, "unit": "ms p99", "vs_baseline": 0})],
    "train": [json.dumps({"metric": "vla_train_step_tokens_per_sec",
                          "value": 19900.0, "unit": "tokens/sec", "vs_baseline": 0.567})],
    "lora": [json.dumps({"metric": "vla_lora_finetune_tokens_per_sec",
                         "value": 2990.0, "unit": "tokens/sec", "vs_baseline": 0.437})],
    "vlmtrain": [], "lora13b": [], "13b4": [], "7b4": [],
}


def _run_main(monkeypatch, capsys, budget, sections=FAKE_LINES, relay_up=True):
    monkeypatch.setenv("BENCH_BUDGET_S", str(budget))
    monkeypatch.setattr(bench, "_wait_for_tpu", lambda *a, **k: relay_up)
    calls = []

    def fake_section(mode, timeout_s):
        calls.append((mode, timeout_s))
        return sections.get(mode, [])

    monkeypatch.setattr(bench, "_run_section_subprocess", fake_section)
    rc = 0
    try:
        bench.main()
    except SystemExit as e:
        rc = e.code
    out = capsys.readouterr().out.splitlines()
    metrics = [json.loads(ln) for ln in out if ln.startswith('{"metric"')]
    skips = [json.loads(ln) for ln in out if ln.startswith('{"skipped"')]
    return rc, metrics, skips, calls


def test_headline_is_always_the_last_metric_line(monkeypatch, capsys):
    rc, metrics, skips, calls = _run_main(monkeypatch, capsys, budget=10_000)
    assert rc == 0 and not skips
    # the default run covers exactly DEFAULT_SECTIONS — slow canonical-only
    # material (lora/int4/vlmtrain) must NOT run (VERDICT r04 item 2)
    assert [m for m, _ in calls] == [m for m, _ in bench.DEFAULT_SECTIONS]
    assert metrics[0]["metric"] == bench.HEADLINE_METRIC  # printed first...
    assert metrics[-1]["metric"] == bench.HEADLINE_METRIC  # ...and re-printed last
    assert metrics[-1]["value"] == 8.8
    # every secondary metric is followed (eventually) by a headline re-print:
    # truncate the stream after ANY metric line and the last headline-named
    # line still carries the north-star value, never a side number.
    for i, m in enumerate(metrics):
        if m["metric"] != bench.HEADLINE_METRIC:
            tail = metrics[i + 1:]
            assert any(t["metric"] == bench.HEADLINE_METRIC for t in tail)


def test_section_death_leaves_explicit_marker(monkeypatch, capsys):
    """A section that times out or crashes mid-run (produces no metric line)
    must leave an explicit {"skipped": ...} marker in the artifact — the
    round's record must never silently lack a number (contract of f354f8f;
    the r04 gate missed this because the test asserted `not skips`)."""
    sections = dict(FAKE_LINES, closedloop=[])
    rc, metrics, skips, calls = _run_main(monkeypatch, capsys, budget=10_000,
                                          sections=sections)
    assert rc == 0  # the headline was still measured
    (s,) = [s for s in skips if s["skipped"] == "closedloop"]
    assert s["reason"] == "section produced no metric line (timeout or failure)"
    assert metrics[-1]["metric"] == bench.HEADLINE_METRIC


def test_final_headline_reprint_is_not_duplicated(monkeypatch, capsys):
    """The artifact ends with exactly one trailing headline line — when the
    last section's re-print already left the headline as the final line, the
    closing re-print is skipped (ADVICE r04)."""
    monkeypatch.setenv("BENCH_BUDGET_S", "10000")
    monkeypatch.setattr(bench, "_wait_for_tpu", lambda *a, **k: True)
    monkeypatch.setattr(bench, "_run_section_subprocess",
                        lambda mode, timeout_s: FAKE_LINES.get(mode, []))
    try:
        bench.main()
    except SystemExit as e:
        assert e.code == 0
    out = [ln for ln in capsys.readouterr().out.splitlines() if ln.startswith("{")]
    assert json.loads(out[-1])["metric"] == bench.HEADLINE_METRIC
    assert out[-1] != out[-2]  # no back-to-back duplicate at the tail


def test_budget_exhaustion_emits_skip_markers(monkeypatch, capsys):
    rc, metrics, skips, calls = _run_main(monkeypatch, capsys, budget=0)
    assert calls == []  # nothing ran
    assert {s["skipped"] for s in skips} == {m for m, _ in bench.DEFAULT_SECTIONS}
    assert all(s["reason"] == "wall-clock budget exhausted" for s in skips)
    # no measurement -> explicit value-0 headline, non-zero exit
    assert rc == 1
    assert metrics[-1]["metric"] == bench.HEADLINE_METRIC
    assert metrics[-1]["value"] == 0


def test_missing_serving_section_never_promotes_a_side_metric(monkeypatch, capsys):
    sections = dict(FAKE_LINES, serve7b=[])  # serving produced nothing
    rc, metrics, skips, calls = _run_main(monkeypatch, capsys, budget=10_000,
                                          sections=sections)
    assert rc == 1
    # train/lora lines still print (they are real measurements)...
    assert any(m["metric"] == "vla_train_step_tokens_per_sec" for m in metrics)
    # ...but the LAST metric line is the explicit headline failure, not a
    # side metric with a misleading vs_baseline (the r03 failure mode).
    assert metrics[-1]["metric"] == bench.HEADLINE_METRIC
    assert metrics[-1]["value"] == 0 and metrics[-1]["vs_baseline"] == 0


def test_relay_outage_fails_loudly(monkeypatch, capsys):
    rc, metrics, skips, calls = _run_main(monkeypatch, capsys, budget=10_000,
                                          relay_up=False)
    assert rc == 1 and calls == []
    assert metrics[-1]["metric"] == bench.HEADLINE_METRIC and metrics[-1]["value"] == 0


def test_default_sections_fit_the_driver_budget_profile():
    default = [m for m, _ in bench.DEFAULT_SECTIONS]
    # the headline runs first; the driver-required evidence (closedloop,
    # loadtest, data) is IN the default run; the multi-compile slow material
    # (full-depth lora, int4 modes, vlm pretrain) is canonical-capture-only
    assert default[0] == "serve7b"
    assert {"data", "closedloop", "loadtest", "train"} <= set(default)
    slow = {"lora", "lora13b", "13b4", "7b4", "vlmtrain"}
    assert slow.isdisjoint(default)
    # `bench.py all` runs default + slow, default material first
    order = [m for m, _ in bench.SECTIONS]
    assert order[: len(default)] == default
    assert set(order[len(default):]) == slow


def test_run_all_covers_every_section(monkeypatch, capsys):
    monkeypatch.setenv("BENCH_BUDGET_S", "1")  # run_all must ignore the budget
    monkeypatch.setattr(bench, "_wait_for_tpu", lambda *a, **k: True)
    calls = []

    def fake_section(mode, timeout_s):
        calls.append(mode)
        return FAKE_LINES.get(mode, [])

    monkeypatch.setattr(bench, "_run_section_subprocess", fake_section)
    try:
        bench.main(run_all=True)
    except SystemExit:
        pass
    assert calls == [m for m, _ in bench.SECTIONS]


def test_cold_compile_headline_gets_one_retry(monkeypatch, capsys):
    """A serve7b attempt that misses the headline (cold-compile timeout —
    the exact BENCH_r03 failure) is retried ONCE with the cold cap; other
    sections never retry."""
    attempts = {"n": 0}
    retry_lines = [json.dumps({"metric": bench.HEADLINE_METRIC, "value": 7.5,
                               "unit": "actions/sec", "vs_baseline": 1.25})]

    def sections_get(mode):
        if mode == "serve7b":
            attempts["n"] += 1
            return [] if attempts["n"] == 1 else retry_lines
        return FAKE_LINES.get(mode, [])

    monkeypatch.setenv("BENCH_BUDGET_S", "10000")
    monkeypatch.setattr(bench, "_wait_for_tpu", lambda *a, **k: True)
    calls = []

    def fake_section(mode, timeout_s):
        calls.append((mode, timeout_s))
        return sections_get(mode)

    monkeypatch.setattr(bench, "_run_section_subprocess", fake_section)
    rc = 0
    try:
        bench.main()
    except SystemExit as e:
        rc = e.code
    out = capsys.readouterr().out.splitlines()
    metrics = [json.loads(ln) for ln in out if ln.startswith('{"metric"')]
    assert rc == 0
    serve_calls = [(m, t) for m, t in calls if m == "serve7b"]
    assert len(serve_calls) == 2
    assert serve_calls[1][1] == bench.SERVE_BENCH_COLD_TIMEOUT_S
    assert metrics[-1]["metric"] == bench.HEADLINE_METRIC
    assert metrics[-1]["value"] == 7.5
    # every other section ran exactly once
    rest = [m for m, _ in calls if m != "serve7b"]
    assert rest == [m for m, _ in bench.DEFAULT_SECTIONS if m != "serve7b"]
