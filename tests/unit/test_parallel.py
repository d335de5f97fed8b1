"""Sharding tests on the 8-virtual-device CPU mesh (SURVEY.md §4 strategy)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pgdrome_tpu.models.problems import parametric_elliptic
from pgdrome_tpu.separated import SeparatedPGD


@pytest.fixture(scope="module")
def solved():
    sep, Vs = parametric_elliptic(n_x=40, n_p=16, num_params=2)
    res = SeparatedPGD(sep, n_max=10, tol=1e-12, tol_fp=1e-8).solve()
    return sep, Vs, res


class TestShardedSweep:
    def test_sweep_matches_serial_evaluate(self, solved):
        sep, Vs, res = solved
        from pgdrome_tpu.parallel.vademecum import sharded_sweep, make_sweep_fn

        rng = np.random.default_rng(0)
        samples = rng.uniform(0.05, 0.95, size=(37, 2))
        out = np.asarray(
            sharded_sweep(Vs, [jnp.asarray(m) for m in res.modes], res.n_modes, samples)
        )
        assert out.shape == (37, sep.sizes[0])

        # against per-sample reconstruction
        from pgdrome_tpu.separated import evaluate_modes_1d

        for i in [0, 13, 36]:
            fac = np.ones(res.n_modes)
            for j in range(2):
                vals = np.asarray(
                    evaluate_modes_1d(
                        Vs[1 + j], res.modes[1 + j], np.asarray([samples[i, j]]), xp=np
                    )
                )[0]
                fac *= vals[: res.n_modes]
            u = fac @ np.asarray(res.modes[0])[: res.n_modes]
            np.testing.assert_allclose(out[i], u, rtol=1e-10, atol=1e-12)

    def test_sensor_sweep_matches_field_sweep(self, solved):
        # batched sensor responses == full-field sweep evaluated at the
        # sensor points (reference evaluate_sensor_response semantics,
        # model.py:862-953, batched over parameter samples)
        sep, Vs, res = solved
        from pgdrome_tpu.fem.interpolate import eval_dofs_at_points
        from pgdrome_tpu.parallel.vademecum import (
            make_sensor_sweep_fn, make_sweep_fn,
        )

        pts = np.array([0.117, 0.5, 0.73, 0.997])
        samples = jnp.asarray(
            np.random.default_rng(5).uniform(0.1, 0.9, size=(23, 2))
        )
        modes = [jnp.asarray(m) for m in res.modes]
        sensor = make_sensor_sweep_fn(Vs, modes, res.n_modes, pts)
        out = np.asarray(sensor(samples))
        assert out.shape == (23, 4)
        fields = np.asarray(make_sweep_fn(Vs, modes, res.n_modes)(samples))
        for i in [0, 11, 22]:
            ref = np.asarray(eval_dofs_at_points(Vs[0], fields[i], pts))
            np.testing.assert_allclose(out[i], ref, rtol=1e-10, atol=1e-12)

        # the fused-kernel route (point table as the dim-0 modes; interpret
        # mode off-TPU) must match the XLA sensor sweep.  The kernel is
        # float32-only, so the fused branch runs on f32 modes; requesting
        # it on f64 modes raises, and 'auto' silently serves the f64 XLA
        # path (ADVICE round 2: no silent precision downgrade)
        modes32 = [jnp.asarray(np.asarray(m, dtype=np.float32)) for m in res.modes]
        fused = make_sensor_sweep_fn(Vs, modes32, res.n_modes, pts,
                                     method="fused")
        np.testing.assert_allclose(
            np.asarray(fused(jnp.asarray(np.asarray(samples, np.float32)))),
            out, rtol=1e-5, atol=1e-7
        )
        with pytest.raises(ValueError, match="float32-only"):
            make_sensor_sweep_fn(Vs, modes, res.n_modes, pts, method="fused")
        with pytest.raises(ValueError, match="float32-only"):
            make_sweep_fn(Vs, modes, res.n_modes, method="fused")
        auto = make_sensor_sweep_fn(Vs, modes, res.n_modes, pts,
                                    method="auto")
        assert np.asarray(auto(samples)).dtype == np.float64

    def test_sweep_errors(self, solved):
        sep, Vs, res = solved
        from pgdrome_tpu.parallel.vademecum import sweep_errors, make_sweep_fn

        samples = np.array([[0.25, 0.5], [0.75, 0.125]])
        sweep = make_sweep_fn(Vs, [jnp.asarray(m) for m in res.modes], res.n_modes)
        fom = np.asarray(sweep(jnp.asarray(samples)))
        errs = np.asarray(sweep_errors(Vs, res.modes, res.n_modes, samples, fom))
        np.testing.assert_allclose(errs, 0.0, atol=1e-14)


class TestShardedFit:
    def test_dp_sharded_identification(self, solved):
        """Batch calibration scales over the device mesh: the fit
        program is pure batch, so dp-sharding the (observations, p0)
        inputs GSPMD-partitions every Gauss–Newton step (no aot wrapper
        here — loaded executables are single-device)."""
        from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

        from pgdrome_tpu.parallel.vademecum import make_fit_fn

        sep, Vs, res = solved
        modes = [jnp.asarray(np.asarray(m, np.float64)) for m in res.modes]
        pts = np.array([0.2, 0.4, 0.6, 0.8])
        fit = make_fit_fn(Vs, modes, res.n_modes, pts, n_iter=30)
        from pgdrome_tpu.parallel.vademecum import make_sensor_sweep_fn

        sensor = make_sensor_sweep_fn(Vs, modes, res.n_modes, pts,
                                      method="xla")
        rng = np.random.default_rng(8)
        p_true = rng.uniform(0.2, 0.8, size=(16, 2))
        obs = np.asarray(sensor(jnp.asarray(p_true)))
        mesh = Mesh(np.array(jax.devices()), ("dp",))
        sh = NamedSharding(mesh, P("dp"))
        obs_s = jax.device_put(jnp.asarray(obs), sh)
        p0_s = jax.device_put(jnp.full((16, 2), 0.5), sh)
        p_hat, r = fit(obs_s, p0_s)
        np.testing.assert_allclose(np.asarray(p_hat), p_true, atol=1e-6)
        assert np.all(np.asarray(r) < 1e-9)


class TestMultichipTrainStep:
    def test_dryrun_8(self):
        assert len(jax.devices()) >= 8, "conftest should provide 8 cpu devices"
        from pgdrome_tpu.parallel.enrich import dryrun

        assert dryrun(8, verbose=True)

    def test_dryrun_odd(self):
        from pgdrome_tpu.parallel.enrich import dryrun

        assert dryrun(1)


class TestSolveMany:
    def test_batched_vademecum_training(self):
        # B independent load cases trained at once must match per-case
        # single solves
        from pgdrome_tpu.parallel.enrich import solve_many
        from pgdrome_tpu.separated import SeparatedPGD

        sep, Vs = parametric_elliptic(n_x=31, n_p=8, num_params=2, degree_x=1)
        sep32 = sep.as_device(np.float64)
        B = 4
        scales = np.array([1.0, 2.0, 0.5, 3.0])
        rhs0 = jnp.asarray(
            np.stack([s * np.asarray(sep.rhs[0]) for s in scales])
        )
        modes_b, normUs, alphas = solve_many(sep32, rhs0, n_max=4)

        for b in [0, 2]:
            single = SeparatedPGD(
                sep, n_max=4, tol=0.0, tol_fp=1e-6, max_fp_it=30,
                residual_check=False,
            )
            # single solve with the scaled rhs via the enrich rhs argument
            modes = single.init_buffers()
            trace = []
            for n in range(4):
                modes, nU, al, fp, res = single._enrich(
                    modes, n, rhs=[scales[b] * jnp.asarray(sep.rhs[0])]
                    + [jnp.asarray(r) for r in sep.rhs[1:]]
                )
                trace.append(float(nU))
            np.testing.assert_allclose(normUs[b], trace, rtol=1e-8)
            np.testing.assert_allclose(
                np.asarray(modes_b[0][b]), np.asarray(modes[0]), rtol=1e-7, atol=1e-12
            )


class TestDataAsInputs:
    def test_constants_path_matches_inputs_path(self):
        # data-as-inputs (value-independent executable) and the legacy
        # closed-over-constants program must produce identical training
        from pgdrome_tpu.parallel.enrich import solve_many

        sep, Vs = parametric_elliptic(n_x=15, n_p=6, num_params=2, degree_x=1)
        sep = sep.as_device(np.float64)
        # B must divide the mesh's dp axis (8 devices -> dp=4)
        rhs0 = jnp.asarray(
            np.stack([s * np.asarray(sep.rhs[0]) for s in (1.0, 2.0, 0.5, 3.0)])
        )
        _, normU_in, _ = solve_many(sep, rhs0, n_max=3, data_as_inputs=True)
        _, normU_ct, _ = solve_many(sep, rhs0, n_max=3, data_as_inputs=False)
        np.testing.assert_allclose(normU_in, normU_ct, rtol=1e-12)


class TestMultichipMinres:
    def test_solve_many_chol_renorm(self):
        # sharded normal-equations training with the f32-stable knobs
        # (chol + renorm_sweep) must match a single solve per case
        from pgdrome_tpu.parallel.enrich import solve_many
        from pgdrome_tpu.separated import (
            SeparatedPGD, ne_dim_base, normal_equations, precondition_dim,
        )

        sep, Vs = parametric_elliptic(n_x=15, n_p=6, num_params=2,
                                      degree_x=1)
        ne = normal_equations(sep)
        ne_pc, _ = precondition_dim(ne, dim=0, dtype=np.float64,
                                    base=ne_dim_base(sep, 0))
        ne_pc = ne_pc.as_device(np.float64)
        scales = (1.0, 2.0, 0.5, 3.0)
        rhs0 = jnp.asarray(
            np.stack([s * np.asarray(ne_pc.rhs[0]) for s in scales])
        )
        _, normUs, _ = solve_many(ne_pc, rhs0, n_max=3, solver="chol",
                                  renorm_sweep=True)
        single = SeparatedPGD(ne_pc, n_max=3, tol=0.0, tol_fp=1e-6,
                              max_fp_it=30, solver="chol",
                              renorm_sweep=True, residual_check=False)
        modes = single.init_buffers()
        trace = []
        for n in range(3):
            modes, nU, *_ = single._enrich(
                modes, n,
                rhs=[2.0 * jnp.asarray(ne_pc.rhs[0])]
                + [jnp.asarray(r) for r in ne_pc.rhs[1:]],
            )
            trace.append(float(nU))
        np.testing.assert_allclose(normUs[1], trace, rtol=1e-8)


class TestDryrunSizes:
    def test_dryrun_4(self):
        from pgdrome_tpu.parallel.enrich import dryrun

        assert dryrun(4)


class TestSweepPadding:
    def test_k128_buffer_skips_padding(self, solved):
        # mode buffer already >= 128: the pad branch must be skipped and
        # results still match the small-buffer sweep exactly
        sep, Vs, res = solved
        from pgdrome_tpu.parallel.vademecum import make_sweep_fn

        big = [np.pad(np.asarray(m), ((0, 128 - m.shape[0]), (0, 0))) for m in res.modes]
        samples = jnp.asarray(np.random.default_rng(1).uniform(0.1, 0.9, size=(9, 2)))
        small = make_sweep_fn(Vs, [jnp.asarray(m) for m in res.modes], res.n_modes)
        wide = make_sweep_fn(Vs, [jnp.asarray(m) for m in big], res.n_modes)
        np.testing.assert_allclose(
            np.asarray(wide(samples)), np.asarray(small(samples)), rtol=1e-12
        )


class TestSmallBatchPadding:
    def test_batch_smaller_than_mesh(self, solved):
        # B=3 on the 8-device mesh: pad (5) exceeds B, so padding by
        # repeating samples[:pad] would under-fill — the sweep must still
        # shard and return exactly B rows
        sep, Vs, res = solved
        from pgdrome_tpu.parallel.vademecum import sharded_sweep, make_sweep_fn

        samples = np.random.default_rng(2).uniform(0.1, 0.9, size=(3, 2))
        out = np.asarray(
            sharded_sweep(Vs, [jnp.asarray(m) for m in res.modes], res.n_modes, samples)
        )
        assert out.shape == (3, sep.sizes[0])
        sweep = make_sweep_fn(Vs, [jnp.asarray(m) for m in res.modes], res.n_modes)
        np.testing.assert_allclose(out, np.asarray(sweep(jnp.asarray(samples))), rtol=1e-12)
