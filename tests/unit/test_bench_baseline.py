"""bench.cpu_baseline semantics.

The reference-architecture CPU baseline (bench.py) mirrors the
reference's host enrichment loop (reference solver.py:306-506).  These
tests pin the measured/extrapolated bookkeeping that BASELINE_FULL.json
and the per-run `vs_baseline` figure depend on — pure host numpy, no
device work.
"""

import numpy as np
import pytest


@pytest.fixture()
def tiny_bench(monkeypatch):
    import bench

    monkeypatch.setattr(bench, "N_X", 32)
    monkeypatch.setattr(bench, "N_P", 8)
    monkeypatch.setattr(bench, "NUM_PARAMS", 2)
    monkeypatch.setattr(bench, "BOUNDARY_BOOST", (8.0, 6))
    return bench


def test_converged_baseline_is_fully_measured(tiny_bench, monkeypatch):
    """If the baseline's own convergence criterion stops the loop before
    the target rank, the measurement is COMPLETE (the reference would
    stop there too) — it must not be labeled extrapolated, which would
    make scripts/measure_baseline_full.py refuse a finished artifact."""
    bench = tiny_bench
    monkeypatch.setattr(bench, "CPU_BASELINE_MODES", 200)
    monkeypatch.setattr(bench, "TOL", 1e-3)
    total, measured, done, extrapolated = bench.cpu_baseline(200)
    assert 0 < done < 200  # converged early at this tolerance
    assert extrapolated is False
    assert total == measured


def test_capped_baseline_extrapolates(tiny_bench, monkeypatch):
    """A budget-capped run (the per-run bench default) extrapolates the
    remaining modes and says so."""
    bench = tiny_bench
    monkeypatch.setattr(bench, "CPU_BASELINE_MODES", 3)
    monkeypatch.setattr(bench, "TOL", 1e-30)  # never converges
    total, measured, done, extrapolated = bench.cpu_baseline(10)
    assert done == 3
    assert extrapolated is True
    assert total > measured
    np.testing.assert_allclose(total, measured + (measured / 3) * 7)


def test_full_baseline_artifact_match(tiny_bench, monkeypatch):
    """bench picks up BASELINE_FULL.json iff the config matches and the
    measurement is complete — including a baseline that CONVERGED on its
    own criterion before the deployed rank (modes < N_MODES,
    extrapolated=False: the real 42/50-mode artifact on this host)."""
    bench = tiny_bench
    monkeypatch.setattr(bench, "N_MODES", 50, raising=False)
    cfg = {
        "n_x": bench.N_X, "n_p": bench.N_P,
        "num_params": bench.NUM_PARAMS,
        "boundary_boost": list(bench.BOUNDARY_BOOST),
        "tol": bench.TOL, "tol_fp_it": 1e-6, "max_fp_it": 30,
    }
    # full budget measured
    assert bench.full_baseline_matches(
        {"config": cfg, "modes": 50, "extrapolated": False})
    # converged early — complete measurement, still valid
    assert bench.full_baseline_matches(
        {"config": cfg, "modes": 42, "extrapolated": False})
    # extrapolated artifacts never qualify
    assert not bench.full_baseline_matches(
        {"config": cfg, "modes": 42, "extrapolated": True})
    # deeper than the deployed rank = different problem
    assert not bench.full_baseline_matches(
        {"config": cfg, "modes": 51, "extrapolated": False})
    # config drift = different problem
    assert not bench.full_baseline_matches(
        {"config": dict(cfg, n_x=bench.N_X + 1), "modes": 50,
         "extrapolated": False})
    # degenerate/empty artifacts
    assert not bench.full_baseline_matches({})
    assert not bench.full_baseline_matches(
        {"config": cfg, "modes": 0, "extrapolated": False})
