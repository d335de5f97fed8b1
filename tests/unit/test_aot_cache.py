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


class TestServingAot:
    """aot_jit: the per-shape persistent-executable wrapper the serving
    sweep builders route through when $PGDROME_AOT_CACHE is set."""

    def _trained(self):
        from pgdrome_tpu.separated import SeparatedPGD as S

        sep, Vs = parametric_elliptic(n_x=16, n_p=4, num_params=2)
        res = S(sep, n_max=4, tol=0.0, residual_check=False).solve()
        return Vs, res

    def test_sweep_roundtrip_and_hit(self, monkeypatch):
        import jax.numpy as jnp

        from pgdrome_tpu.parallel.vademecum import make_sweep_fn

        Vs, res = self._trained()
        modes = [jnp.asarray(m) for m in res.modes]
        samples = np.random.default_rng(0).uniform(0.1, 0.9, size=(13, 2))
        monkeypatch.delenv("PGDROME_AOT_CACHE", raising=False)
        plain = make_sweep_fn(Vs, modes, res.n_modes)
        ref = np.asarray(plain(jnp.asarray(samples)))
        with tempfile.TemporaryDirectory() as d:
            monkeypatch.setenv("PGDROME_AOT_CACHE", d)
            fn1 = make_sweep_fn(Vs, modes, res.n_modes)
            out1 = np.asarray(fn1(jnp.asarray(samples)))
            assert fn1.last_status == "miss"
            assert any(f.endswith(".pjrt") for f in os.listdir(d))
            # fresh builder (simulates a new serving process): same key →
            # executable load, not a recompile
            fn2 = make_sweep_fn(Vs, modes, res.n_modes)
            out2 = np.asarray(fn2(jnp.asarray(samples)))
            assert fn2.last_status == "hit"
            np.testing.assert_allclose(out1, ref, rtol=1e-12)
            np.testing.assert_allclose(out2, ref, rtol=1e-12)

    def test_transparent_to_transformations(self, monkeypatch):
        # jacfwd/vmap through an aot_jit-wrapped serving fn must trace the
        # underlying jitted callable, not the loaded Compiled executable
        # (which rejects tracers) — regression for the warm-cache failure
        # of tests/unit/test_serving_analytics.py::test_vs_jacfwd
        import jax
        import jax.numpy as jnp

        from pgdrome_tpu.parallel.vademecum import make_sweep_fn

        Vs, res = self._trained()
        modes = [jnp.asarray(m) for m in res.modes]
        p = jnp.asarray([[0.4, 0.6]])
        with tempfile.TemporaryDirectory() as d:
            monkeypatch.setenv("PGDROME_AOT_CACHE", d)
            fn = make_sweep_fn(Vs, modes, res.n_modes)
            fn(p)  # concrete call populates the per-shape table
            J = jax.jacfwd(lambda q: fn(q[None])[0])(p[0])
            # finite-difference cross-check on one parameter direction
            h = 1e-6
            fd = (np.asarray(fn(p + jnp.array([[h, 0.0]])))
                  - np.asarray(fn(p - jnp.array([[h, 0.0]])))) / (2 * h)
            np.testing.assert_allclose(
                np.asarray(J)[:, 0], fd[0], rtol=1e-4, atol=1e-10
            )

    def test_distinct_shapes_distinct_entries(self, monkeypatch):
        import jax.numpy as jnp

        from pgdrome_tpu.parallel.vademecum import make_sweep_fn

        Vs, res = self._trained()
        modes = [jnp.asarray(m) for m in res.modes]
        with tempfile.TemporaryDirectory() as d:
            monkeypatch.setenv("PGDROME_AOT_CACHE", d)
            fn = make_sweep_fn(Vs, modes, res.n_modes)
            rng = np.random.default_rng(1)
            fn(jnp.asarray(rng.uniform(0.1, 0.9, size=(8, 2))))
            fn(jnp.asarray(rng.uniform(0.1, 0.9, size=(16, 2))))
            entries = [f for f in os.listdir(d) if f.endswith(".pjrt")]
            assert len(entries) == 2

    def test_different_modes_different_key(self, monkeypatch):
        # the program bakes the mode values in as constants: changing them
        # MUST change the cache key (a stale hit would serve wrong fields)
        import jax.numpy as jnp

        from pgdrome_tpu.parallel.vademecum import make_sweep_fn

        Vs, res = self._trained()
        modes = [jnp.asarray(m) for m in res.modes]
        samples = jnp.asarray(
            np.random.default_rng(2).uniform(0.1, 0.9, size=(9, 2))
        )
        with tempfile.TemporaryDirectory() as d:
            monkeypatch.setenv("PGDROME_AOT_CACHE", d)
            out1 = np.asarray(make_sweep_fn(Vs, modes, res.n_modes)(samples))
            scaled = [modes[0] * 2.0] + modes[1:]
            fn2 = make_sweep_fn(Vs, scaled, res.n_modes)
            out2 = np.asarray(fn2(samples))
            assert fn2.last_status == "miss"
            np.testing.assert_allclose(out2, 2.0 * out1, rtol=1e-12)

    def test_sensors_and_moments_through_cache(self, monkeypatch):
        import jax.numpy as jnp

        from pgdrome_tpu.serving import Vademecum

        Vs, res = self._trained()
        samples = np.random.default_rng(3).uniform(0.1, 0.9, size=(21, 2))
        pts = np.array([0.3, 0.7])
        monkeypatch.delenv("PGDROME_AOT_CACHE", raising=False)
        vd_plain = Vademecum(Vs, res, dtype=np.float64)
        ref_s = np.asarray(vd_plain.sensors(pts)(jnp.asarray(samples)))
        ref_m = vd_plain.moments(samples, chunk=8)
        with tempfile.TemporaryDirectory() as d:
            monkeypatch.setenv("PGDROME_AOT_CACHE", d)
            vd = Vademecum(Vs, res, dtype=np.float64)
            np.testing.assert_allclose(
                np.asarray(vd.sensors(pts)(jnp.asarray(samples))),
                ref_s, rtol=1e-12,
            )
            mean, var = vd.moments(samples, chunk=8)
            np.testing.assert_allclose(mean, ref_m[0], rtol=1e-12)
            np.testing.assert_allclose(var, ref_m[1], rtol=1e-10, atol=1e-18)
            assert any(f.endswith(".pjrt") for f in os.listdir(d))

    def test_sharded_sweep_bypasses_aot(self, monkeypatch):
        # sharded path must keep the live jitted fn (persisted executables
        # are single-device); with the cache ON it must still shard-run
        import jax.numpy as jnp

        from pgdrome_tpu.parallel.vademecum import sharded_sweep

        Vs, res = self._trained()
        modes = [jnp.asarray(m) for m in res.modes]
        samples = np.random.default_rng(4).uniform(0.1, 0.9, size=(19, 2))
        with tempfile.TemporaryDirectory() as d:
            monkeypatch.setenv("PGDROME_AOT_CACHE", d)
            out = np.asarray(
                sharded_sweep(Vs, modes, res.n_modes, samples)
            )
            from pgdrome_tpu.parallel.vademecum import make_sweep_fn

            monkeypatch.delenv("PGDROME_AOT_CACHE")
            ref = np.asarray(
                make_sweep_fn(Vs, modes, res.n_modes)(jnp.asarray(samples))
            )
            np.testing.assert_allclose(out, ref, rtol=1e-12)

    def test_code_change_invalidates_serving_key(self, monkeypatch):
        # regression (caught live on-chip): editing a serving-program
        # builder must MISS the cache — a stale hit silently serves the
        # OLD program.  The key embeds a source fingerprint; simulate a
        # code edit by patching it.
        import jax.numpy as jnp

        import pgdrome_tpu.parallel.vademecum as pv

        Vs, res = self._trained()
        modes = [jnp.asarray(m) for m in res.modes]
        samples = jnp.asarray(
            np.random.default_rng(5).uniform(0.1, 0.9, size=(7, 2))
        )
        with tempfile.TemporaryDirectory() as d:
            monkeypatch.setenv("PGDROME_AOT_CACHE", d)
            fn1 = pv.make_sweep_fn(Vs, modes, res.n_modes)
            fn1(samples)
            assert fn1.last_status == "miss"
            fn2 = pv.make_sweep_fn(Vs, modes, res.n_modes)
            fn2(samples)
            assert fn2.last_status == "hit"
            monkeypatch.setattr(pv, "_CODE_FP", "simulated-code-edit")
            fn3 = pv.make_sweep_fn(Vs, modes, res.n_modes)
            fn3(samples)
            assert fn3.last_status == "miss"

    def test_prune_by_age(self, monkeypatch):
        import time

        from pgdrome_tpu.utils.aot_cache import prune

        with tempfile.TemporaryDirectory() as d:
            old = os.path.join(d, "old.pjrt")
            new = os.path.join(d, "new.pjrt")
            for p in (old, new):
                with open(p, "wb") as f:
                    f.write(b"x" * 100)
            past = time.time() - 10 * 86400
            os.utime(old, (past, past))
            n, freed = prune(cache_dir=d, max_age_days=5.0)
            assert n == 1 and freed == 100
            assert os.path.exists(new) and not os.path.exists(old)
            # no cache dir configured -> no-op
            monkeypatch.delenv("PGDROME_AOT_CACHE", raising=False)
            assert prune() == (0, 0)
