"""Unit tests for bench.py's measurement helpers.

The bench protocol itself has produced two rounds of misleading artifacts
(cross-process unroll comparisons, min-of-slopes bias, dispatch-latency
contamination — see docs/PERFORMANCE.md), so its arithmetic is pinned here.
"""

import sys
from pathlib import Path

import jax.numpy as jnp
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import bench

pytestmark = pytest.mark.quick


def test_min_slope_cancels_fixed_overhead_and_additive_contention(monkeypatch):
    """slope = (min(seg2) - min(seg1)) / (n2 - n1) must recover the true
    per-unit time when every chain pays a fixed overhead, and must NOT be
    deflated by a contention spike landing in the subtracted segment
    (the round-2 advisor finding against min-of-slope-estimates)."""
    clock = {"t": 0.0}
    monkeypatch.setattr(bench.time, "perf_counter", lambda: clock["t"])

    per_unit, fixed = 5.0, 7.0
    # Contention spikes (additive): rep 0 hits the n1 segment, rep 2 the n2
    # segment; rep 1 is clean.
    spikes = iter([3.0, 0.0, 0.0, 0.0, 0.0, 11.0])

    def run_chain(n):
        clock["t"] += fixed + per_unit * n + next(spikes)

    slope = bench._min_slope(run_chain, n1=2, n2=10, reps=3)
    assert slope == pytest.approx(per_unit)


def test_min_slope_not_biased_by_seg1_spike(monkeypatch):
    """With min-of-slopes, a spike in seg1 of one rep would make that rep's
    slope the smallest and win the min; per-segment minima must ignore it."""
    clock = {"t": 0.0}
    monkeypatch.setattr(bench.time, "perf_counter", lambda: clock["t"])
    spikes = iter([100.0, 0.0, 0.0, 0.0])  # huge spike in rep 0's seg1

    def run_chain(n):
        clock["t"] += 1.0 * n + next(spikes)

    slope = bench._min_slope(run_chain, n1=1, n2=5, reps=2)
    assert slope == pytest.approx(1.0)


def test_min_slope_interleaved_sees_drift_equally(monkeypatch):
    """A contention-level shift midway through the reps must not be
    misattributed to the A/B difference: both chains are measured in every
    repetition, so each chain's per-segment min comes from the quiet reps."""
    clock = {"t": 0.0}
    monkeypatch.setattr(bench.time, "perf_counter", lambda: clock["t"])

    rep = {"i": 0}  # reps 0-1 quiet, rep 2 contended (+50 per segment)

    def make_chain(per_unit, fixed):
        def run(n):
            contention = 50.0 if rep["i"] >= 2 else 0.0
            clock["t"] += fixed + per_unit * n + contention
        return run

    chain_a = make_chain(2.0, 1.0)
    chain_b_inner = make_chain(3.0, 9.0)

    def chain_b(n):  # last chain of the rep advances the rep counter
        chain_b_inner(n)
        if n == 8:
            rep["i"] += 1

    slopes = bench._min_slope_interleaved([chain_a, chain_b], 2, 8, reps=3)
    assert slopes[0] == pytest.approx(2.0)
    assert slopes[1] == pytest.approx(3.0)
    # The A/B difference is clean despite the drifted final rep.
    assert slopes[1] - slopes[0] == pytest.approx(1.0)


def test_fori_chain_runs_n_steps_in_one_dispatch():
    calls = {"traces": 0}

    def step(s):
        calls["traces"] += 1  # traced once, regardless of n
        return s + 1

    chain = bench._fori_chain(step)
    out = chain(jnp.asarray(0, jnp.int32), 7)
    assert int(out) == 7
    out = chain(out, 5)  # same compiled program, dynamic n
    assert int(out) == 12
    assert calls["traces"] == 1


def test_attach_watchdog_healthy_returns_none():
    # jax is importable and device_count() returns on the CPU test backend,
    # well inside the watchdog deadline.
    assert bench._attach_with_watchdog(timeout_s=60.0) is None


def test_attach_watchdog_reports_fast_failure(monkeypatch):
    import jax

    def boom():
        raise RuntimeError("UNAVAILABLE: backend down")

    monkeypatch.setattr(jax, "device_count", boom)
    err = bench._attach_with_watchdog(timeout_s=60.0)
    assert err is not None and "UNAVAILABLE: backend down" in err


def test_attach_watchdog_hard_exits_hung_attach():
    """A hung blocking attach must end the process (rc 0) with the error
    artifact as the stdout tail — verified in a real subprocess because
    the watchdog path is os._exit."""
    import json
    import subprocess

    code = (
        "import sys, time, json\n"
        "sys.path.insert(0, '.')\n"
        "import bench, jax\n"
        "jax.device_count = lambda: time.sleep(30)\n"
        "bench._attach_with_watchdog(timeout_s=1.0)\n"
        "time.sleep(30)\n"  # never reached: watchdog os._exits first
    )
    result = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True,
        timeout=25, cwd=str(Path(__file__).resolve().parents[1]),
    )
    assert result.returncode == 0
    payload = json.loads(result.stdout.strip().splitlines()[-1])
    assert payload["value"] == 0.0
    assert "watchdog" in payload["error"]


def test_main_emits_error_json_when_attach_fails(monkeypatch, capsys):
    """During a backend outage main() must still print exactly one JSON
    line (value 0 + error) instead of hanging in the in-process attach."""
    import json

    monkeypatch.setattr(
        bench, "_attach_with_watchdog", lambda: "attach watchdog fired")
    monkeypatch.setattr(sys, "argv", ["bench.py", "--quick"])
    monkeypatch.delenv("LGM_TPU_SKIP_ATTACH_GUARD", raising=False)
    assert bench.main() == 0
    lines = [l for l in capsys.readouterr().out.splitlines() if l.strip()]
    assert len(lines) == 1
    payload = json.loads(lines[0])
    assert payload["value"] == 0.0
    assert "attach watchdog fired" in payload["error"]


def test_main_healthy_emits_headline_then_enriched(monkeypatch, capsys):
    """Incremental-emission contract: the headline line lands first (a
    complete artifact on its own), the enriched line last; the driver
    reads the tail, so both must be parseable."""
    import json

    monkeypatch.setattr(bench, "_attach_with_watchdog", lambda: None)
    monkeypatch.setattr(bench, "bench_dcgan", lambda steps: (20_000.0, 0.0064, 0.001))
    monkeypatch.setattr(sys, "argv", ["bench.py", "--quick", "--steps", "3"])
    monkeypatch.delenv("LGM_TPU_SKIP_ATTACH_GUARD", raising=False)
    bench.main()
    lines = [l for l in capsys.readouterr().out.splitlines() if l.strip()]
    assert len(lines) == 2
    head = json.loads(lines[0])
    payload = json.loads(lines[-1])
    assert head["value"] == payload["value"] > 0
    assert "extras" not in head  # headline stands alone
    assert "error" not in payload
    # value is per-chip (divided by jax.device_count(), 8 virtual here).
    n_chips = payload["extras"]["n_chips"]
    assert payload["value"] == pytest.approx(20_000.0 / n_chips, rel=1e-3)
    assert payload["vs_baseline"] == pytest.approx(
        payload["value"] / bench.A100_DCGAN_IMG_PER_SEC, rel=1e-2
    )
    assert payload["skipped"] == []
    assert "wall_s" in payload


def test_main_budget_gates_extras_in_priority_order(monkeypatch, capsys):
    """Extras that don't fit the remaining budget are skipped (recorded in
    "skipped"), later cheaper extras still run, and per-extra wall times
    are recorded."""
    import json

    clock = {"elapsed": 10.0}
    monkeypatch.setattr(bench, "_elapsed", lambda: clock["elapsed"])
    monkeypatch.setattr(bench, "_attach_with_watchdog", lambda: None)
    monkeypatch.setattr(bench, "bench_dcgan", lambda steps: (20_000.0, 0.0064, 0.001))

    def run_a():
        clock["elapsed"] = 55.0  # a overran its estimate
        return {"a_metric": 1.0}

    monkeypatch.setattr(bench, "_extra_runners", lambda: [
        ("a", 30, run_a),
        ("b", 60, lambda: {"b_metric": 2.0}),   # 55+60 > 100 -> skipped
        ("c", 10, lambda: {"c_metric": 3.0}),   # 55+10 < 100 -> runs
        ("d", 10, lambda: (_ for _ in ()).throw(RuntimeError("boom"))),
    ])
    monkeypatch.setenv("LGM_TPU_BENCH_BUDGET_S", "100")
    monkeypatch.setattr(sys, "argv", ["bench.py"])
    monkeypatch.delenv("LGM_TPU_SKIP_ATTACH_GUARD", raising=False)
    bench.main()
    lines = [l for l in capsys.readouterr().out.splitlines() if l.strip()]
    payload = json.loads(lines[-1])
    assert payload["skipped"] == ["b"]
    assert payload["extras"]["a_metric"] == 1.0
    assert payload["extras"]["c_metric"] == 3.0
    # A failing extra records its error and does not abort the run.
    assert "boom" in payload["extras"]["d_error"]
    for name in ("a", "c", "d"):
        assert f"{name}_wall_s" in payload["extras"]
    assert payload["budget_s"] == 100.0


def test_only_mode_rows_exist_for_every_extra():
    """Every extras-table row is runnable standalone via --only (manual
    runs + the VERDICT-required fm_train/edm_train/dit_moe_train rows)."""
    names = [name for name, _est, _fn in bench._extra_runners()]
    for required in ("ddpm_train", "ddim50", "dit_train", "fm_train",
                     "edm_train", "dpmpp20", "ct_sample", "ct_train",
                     "dit_moe_train", "ldm64"):
        assert required in names
    # Priority order: the three VERDICT-required coverage rows precede the
    # docs-only unroll2 row, and ddpm_train leads.
    assert names[0] == "ddpm_train"
    assert names.index("ddim50") < names.index("dpmpp20")


def test_fori_chain_threads_pytree_state():
    def step(s):
        return {"a": s["a"] + 1, "b": s["b"] * 2.0}

    chain = bench._fori_chain(step)
    out = chain({"a": jnp.asarray(0), "b": jnp.asarray(1.0)}, 3)
    assert int(out["a"]) == 3
    assert float(out["b"]) == 8.0
