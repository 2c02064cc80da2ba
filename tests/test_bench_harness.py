"""Structural tests for the budgeted bench harness (VERDICT r4 #1).

The round-4 driver bench recorded NOTHING (rc=124, parsed:null). These
tests pin the structural guarantees that prevent a repeat — without
touching a TPU: measurements are monkeypatched, only the scheduling,
budget, summary-emission, and anchor-correction logic runs.
"""

import importlib
import json
import sys

import pytest

import bench as bench_mod


@pytest.fixture()
def bench(monkeypatch, tmp_path):
    """A reloaded bench module with fake measurements and tmp goldens."""
    b = importlib.reload(bench_mod)
    calls = {"ladder": [], "train": [], "convergence": 0, "selftest": []}

    monkeypatch.setattr(b, "measure",
                        lambda model, n, batch: calls["ladder"].append(model)
                        or 100.0)
    monkeypatch.setattr(
        b, "measure_train",
        lambda model, batch, window, accum: calls["train"].append(model)
        or {"s_per_step": 0.1, "tokens_per_s": 50000, "mfu": 0.05,
            "params": 1000})
    monkeypatch.setattr(
        b, "measure_convergence",
        lambda: {"final_loss": 1.0, "loss_trajectory": [],
                 "motif_accuracy": 0.9, "background_accuracy": 0.3,
                 "repeat_loss": 1.0, "held_out": True})
    monkeypatch.setattr(b, "run_scaling_artifact",
                        lambda timeout_s: None)

    class FakeSelftest:
        @staticmethod
        def run(fast=False):
            calls["selftest"].append(fast)
            return True

    monkeypatch.setitem(sys.modules, "tools.tpu_selftest", FakeSelftest)
    monkeypatch.setenv("PCAD_BENCH_ALLOW_CPU", "1")
    monkeypatch.setattr(b, "TRAIN_ANCHORS_PATH",
                        str(tmp_path / "anchors.json"))
    monkeypatch.setattr(b, "CORRECTIONS_PATH",
                        str(tmp_path / "corrections.json"))
    monkeypatch.setattr(b, "CONVERGENCE_ANCHOR_PATH",
                        str(tmp_path / "conv.json"))
    b._calls = calls
    b._tmp = tmp_path
    return b


def _summaries(capsys):
    lines = [json.loads(ln) for ln in capsys.readouterr().out.splitlines()
             if ln.startswith("{")]
    return lines, [ln for ln in lines if "metric" in ln]


def test_full_run_emits_progressive_summaries(bench, capsys):
    bench.main()
    lines, summaries = _summaries(capsys)
    # partial after headline, partial after train, final at end
    assert len(summaries) >= 3
    assert summaries[0]["partial"] is True
    assert summaries[0]["value"] == 100.0          # headline present early
    final = summaries[-1]
    assert "partial" not in final
    assert final["value"] == 100.0
    assert final["selftest"] == "pass"
    # every ladder model and train lane ran
    assert set(m for m, *_ in bench.LADDER) == set(bench._calls["ladder"])
    assert len(final["train"]) == len(bench.TRAIN_LANE)
    # fast selftest ran before full
    assert bench._calls["selftest"] == [True, False]


def test_budget_skips_tail_lanes_but_keeps_headline(bench, capsys,
                                                    monkeypatch):
    # Headline-lane estimate fits, nothing else does: elapsed is 0 in the
    # fake (instant measurements), so choose a budget between the headline
    # cold estimate (380) + fast selftest (400) and the next lane's.
    monkeypatch.setattr(bench, "BUDGET", 380 + 100 + bench.RESERVE)
    # fake lane costs: pretend each completed lane took 300 s
    orig_run_lane = bench.run_lane

    def slow_clock_lane(name, cat, weight, fn):
        out = orig_run_lane(name, cat, weight, fn)
        bench._observed[cat] = 300.0  # observed per-unit cost stays high
        return out

    monkeypatch.setattr(bench, "run_lane", slow_clock_lane)
    bench.main()
    lines, summaries = _summaries(capsys)
    final = summaries[-1]
    assert final["value"] == 100.0                 # headline recorded
    assert final["skipped"], "tail lanes must be recorded as skipped"
    skipped_names = {s["lane"] for s in final["skipped"]}
    assert any(ln.startswith("ladder:pc2") or ln.startswith("train")
               for ln in skipped_names)
    for s in final["skipped"]:
        assert s["reason"] == "budget"


def test_anchor_corrects_downward_with_reason(bench, capsys):
    with open(bench.TRAIN_ANCHORS_PATH, "w") as fh:
        json.dump({"l20": 100000}, fh)  # flattered anchor: measured is 50k
    bench.main()
    lines, summaries = _summaries(capsys)
    final = summaries[-1]
    assert final["train_regressions"], "sub-tolerance lane must be flagged"
    assert final["anchor_corrections"]
    corr = final["anchor_corrections"][0]
    assert corr["lane"] == "l20" and corr["old"] == 100000 \
        and corr["new"] == 50000
    new_anchors = json.load(open(bench.TRAIN_ANCHORS_PATH))
    assert new_anchors["l20"] == 50000             # honest downward path
    log = json.load(open(bench.CORRECTIONS_PATH))
    assert log and log[0]["reason"]


def test_anchors_still_ratchet_up(bench, capsys):
    with open(bench.TRAIN_ANCHORS_PATH, "w") as fh:
        json.dump({"l20": 40000}, fh)
    bench.main()
    capsys.readouterr()
    assert json.load(open(bench.TRAIN_ANCHORS_PATH))["l20"] == 50000


def test_lane_error_does_not_kill_the_bench(bench, capsys, monkeypatch):
    def boom(model, n, batch):
        raise RuntimeError("lane exploded")

    monkeypatch.setattr(bench, "measure", boom)
    bench.main()
    lines, summaries = _summaries(capsys)
    final = summaries[-1]
    assert final["value"] is None
    assert any("lane exploded" in v for v in final["errors"].values())
    assert final["train"], "training lanes still ran"
