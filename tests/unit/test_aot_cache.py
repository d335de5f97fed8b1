"""Persistent AOT-executable cache (utils/aot_cache.py): the remote-TPU
compile-time mitigation.  On-chip the cache turns the 100-1000 s axon
server compile into a ~1 s executable load; here the same machinery is
exercised on the CPU backend."""

import os
import tempfile

import numpy as np
import pytest

from pgdrome_tpu.models.problems import parametric_elliptic
from pgdrome_tpu.separated import SeparatedPGD


class TestAotCache:
    def test_miss_then_hit_same_results(self):
        with tempfile.TemporaryDirectory() as d:
            sep, _ = parametric_elliptic(n_x=16, n_p=4, num_params=2)
            s1 = SeparatedPGD(
                sep, n_max=4, tol=0.0, residual_check=False, aot_cache_dir=d
            )
            r1 = s1.solve_fused()
            assert s1.last_compile_status == "miss"
            assert any(f.endswith(".pjrt") for f in os.listdir(d))

            s2 = SeparatedPGD(
                sep, n_max=4, tol=0.0, residual_check=False, aot_cache_dir=d
            )
            r2 = s2.solve_fused()
            assert s2.last_compile_status == "hit"
            np.testing.assert_allclose(
                np.asarray(r1.amplitudes), np.asarray(r2.amplitudes), rtol=1e-12
            )

    def test_corrupt_entry_recompiles(self):
        with tempfile.TemporaryDirectory() as d:
            sep, _ = parametric_elliptic(n_x=16, n_p=4, num_params=2)
            s1 = SeparatedPGD(
                sep, n_max=4, tol=0.0, residual_check=False, aot_cache_dir=d
            )
            r1 = s1.solve_fused()
            (entry,) = [f for f in os.listdir(d) if f.endswith(".pjrt")]
            with open(os.path.join(d, entry), "wb") as f:
                f.write(b"not a pickle")
            s2 = SeparatedPGD(
                sep, n_max=4, tol=0.0, residual_check=False, aot_cache_dir=d
            )
            r2 = s2.solve_fused()  # must fall back to a fresh compile
            assert s2.last_compile_status == "miss"
            np.testing.assert_allclose(
                np.asarray(r1.amplitudes), np.asarray(r2.amplitudes), rtol=1e-12
            )

    def test_different_budget_different_entry(self):
        with tempfile.TemporaryDirectory() as d:
            sep, _ = parametric_elliptic(n_x=16, n_p=4, num_params=2)
            s = SeparatedPGD(
                sep, n_max=8, tol=0.0, residual_check=False, aot_cache_dir=d
            )
            s.solve_fused(n_enrich=3)
            s.solve_fused(n_enrich=6)
            entries = [f for f in os.listdir(d) if f.endswith(".pjrt")]
            assert len(entries) == 2

    def test_off_by_default(self, monkeypatch):
        monkeypatch.delenv("PGDROME_AOT_CACHE", raising=False)
        sep, _ = parametric_elliptic(n_x=16, n_p=4, num_params=2)
        s = SeparatedPGD(sep, n_max=3, tol=0.0, residual_check=False)
        s.solve_fused()
        assert s.last_compile_status == "off"
