"""Vademecum serving container: sweeps, sensor cache, persistence, bridge."""

import numpy as np
import jax.numpy as jnp
import pytest

from pgdrome_tpu.models.problems import parametric_elliptic
from pgdrome_tpu.separated import SeparatedPGD
from pgdrome_tpu.serving import Vademecum


@pytest.fixture(scope="module")
def trained():
    sep, Vs = parametric_elliptic(n_x=40, n_p=16, num_params=2)
    res = SeparatedPGD(sep, n_max=8, tol=1e-12, tol_fp=1e-8).solve()
    return sep, Vs, res


class TestVademecum:
    def test_fields_matches_sweep_fn(self, trained):
        sep, Vs, res = trained
        from pgdrome_tpu.parallel.vademecum import make_sweep_fn

        vd = Vademecum(Vs, res, dtype=np.float64)
        samples = jnp.asarray(
            np.random.default_rng(0).uniform(0.1, 0.9, size=(17, 2))
        )
        direct = make_sweep_fn(
            Vs, [jnp.asarray(m) for m in res.modes], res.n_modes
        )(samples)
        np.testing.assert_allclose(
            np.asarray(vd.fields(samples)), np.asarray(direct), rtol=1e-12
        )

    def test_fields_stream_matches_fields(self, trained):
        # chunked + pipelined streaming == the one-shot sweep, including a
        # ragged tail chunk (padded internally, trimmed before the consumer)
        sep, Vs, res = trained
        vd = Vademecum(Vs, res, dtype=np.float64)
        samples = np.random.default_rng(3).uniform(0.1, 0.9, size=(53, 2))
        ref = np.asarray(vd.fields(jnp.asarray(samples)))
        streamed = vd.fields_stream(samples, chunk=16, depth=2)
        np.testing.assert_allclose(streamed, ref, rtol=1e-12)
        assert streamed.shape == ref.shape

    def test_fields_stream_consumer(self, trained):
        # consumer mode: per-chunk reduction, correct chunk sizes/order
        sep, Vs, res = trained
        vd = Vademecum(Vs, res, dtype=np.float64)
        samples = np.random.default_rng(4).uniform(0.1, 0.9, size=(40, 2))
        sizes = []
        sums = vd.fields_stream(
            samples,
            consumer=lambda y: (sizes.append(y.shape[0]), float(y.sum()))[1],
            chunk=16, depth=3,
        )
        assert sizes == [16, 16, 8]
        ref = np.asarray(vd.fields(jnp.asarray(samples)))
        np.testing.assert_allclose(
            sums, [ref[:16].sum(), ref[16:32].sum(), ref[32:].sum()],
            rtol=1e-10,
        )

    def test_fields_stream_bf16_output(self, trained):
        # out_dtype=bfloat16: compute stays full precision, only the
        # output store narrows (~4e-3 relative) — the halved blocks are
        # what let HBM-bound field serving double its chunk (PERF.md)
        import jax.numpy as jnp

        sep, Vs, res = trained
        vd = Vademecum(Vs, res, dtype=np.float32)
        samples = np.random.default_rng(6).uniform(
            0.1, 0.9, size=(40, 2)
        ).astype(np.float32)
        ref = np.asarray(vd.fields(jnp.asarray(samples)), dtype=np.float64)
        dtypes = []
        out = vd.fields_stream(
            samples, chunk=16, depth=2, out_dtype=jnp.bfloat16,
            consumer=lambda y: (dtypes.append(y.dtype), np.asarray(
                y, dtype=np.float64))[1],
        )
        assert all(d == jnp.bfloat16 for d in dtypes)
        got = np.concatenate(out, axis=0)
        scale = np.abs(ref).max()
        assert np.abs(got - ref).max() / scale < 1.6e-2  # bf16 quantization
        # the f32 path is unaffected (separate cached sweep)
        exact = vd.fields_stream(samples, chunk=16, depth=2)
        np.testing.assert_allclose(exact, ref.astype(np.float32), rtol=1e-6)

    def test_sensors_stream_matches_sensors(self, trained):
        # pipelined sensor streaming == the one-shot jitted sweep,
        # ragged tail included (shares _stream_pipeline with fields)
        sep, Vs, res = trained
        vd = Vademecum(Vs, res, dtype=np.float64)
        pts = np.array([0.2, 0.5, 0.8])
        samples = np.random.default_rng(5).uniform(0.1, 0.9, size=(45, 2))
        ref = np.asarray(vd.sensors(pts)(jnp.asarray(samples)))
        streamed = vd.sensors_stream(pts, samples, chunk=16, depth=2)
        np.testing.assert_allclose(streamed, ref, rtol=1e-12)
        assert streamed.shape == (45, 3)
        # consumer mode: per-chunk shapes
        sizes = []
        vd.sensors_stream(pts, samples, chunk=16, depth=2,
                          consumer=lambda y: sizes.append(y.shape[0]))
        assert sizes == [16, 16, 13]

    def test_sensor_lru_bound(self, trained):
        sep, Vs, res = trained
        vd = Vademecum(Vs, res, dtype=np.float64)
        vd._sensor_cache_max = 3
        fns = [vd.sensors(np.array([0.1 + 0.05 * i])) for i in range(5)]
        assert len(vd._sensor_cache) == 3
        # the oldest entries were evicted: re-requesting rebuilds
        assert vd.sensors(np.array([0.1])) is not fns[0]
        # the newest is still cached
        assert vd.sensors(np.array([0.1 + 0.05 * 4])) is fns[4]

    def test_sensors_cached_and_correct(self, trained):
        sep, Vs, res = trained
        from pgdrome_tpu.fem.interpolate import eval_dofs_at_points

        vd = Vademecum(Vs, res, dtype=np.float64)
        pts = np.array([0.21, 0.64])
        fn1 = vd.sensors(pts)
        fn2 = vd.sensors(pts.copy())
        assert fn1 is fn2, "same point set must reuse the tabled sweep"
        # permuted points with equal coordinate sum must NOT collide
        assert vd.sensors(pts[::-1].copy()) is not fn1

        samples = jnp.asarray(
            np.random.default_rng(1).uniform(0.1, 0.9, size=(5, 2))
        )
        out = np.asarray(fn1(samples))
        fields = np.asarray(vd.fields(samples))
        for i in range(5):
            ref = np.asarray(eval_dofs_at_points(Vs[0], fields[i], pts))
            np.testing.assert_allclose(out[i], ref, rtol=1e-10, atol=1e-13)

    def test_save_load_roundtrip(self, trained, tmp_path):
        sep, Vs, res = trained
        vd = Vademecum(Vs, res, dtype=np.float64)
        p = tmp_path / "vd.h5"
        vd.save(p)
        vd2 = Vademecum.load(p, Vs)
        samples = jnp.asarray(
            np.random.default_rng(2).uniform(0.1, 0.9, size=(9, 2))
        )
        np.testing.assert_allclose(
            np.asarray(vd2.fields(samples)), np.asarray(vd.fields(samples)),
            rtol=1e-12,
        )
        assert vd2.n_modes == vd.n_modes

    def test_load_rejects_wrong_mesh(self, trained, tmp_path):
        sep, Vs, res = trained
        vd = Vademecum(Vs, res)
        p = tmp_path / "vd.h5"
        vd.save(p)
        sep2, Vs2 = parametric_elliptic(n_x=24, n_p=16, num_params=2)
        with pytest.raises(ValueError, match="mesh does not match"):
            Vademecum.load(p, Vs2)

    def test_energy_basis_transform_applied(self, trained):
        # a precondition_dim0-trained result must serve identical fields
        # once the transform is passed to the container
        sep, Vs, res = trained
        from pgdrome_tpu.separated import precondition_dim0, SeparatedPGD

        sep_pc, tf = precondition_dim0(sep, dtype=np.float64)
        res_pc = SeparatedPGD(sep_pc, n_max=8, tol=1e-12, tol_fp=1e-8).solve()
        vd = Vademecum(Vs, res, dtype=np.float64)
        vd_pc = Vademecum(Vs, res_pc, dim0_transform=tf, dtype=np.float64)
        samples = jnp.asarray(
            np.random.default_rng(3).uniform(0.1, 0.9, size=(7, 2))
        )
        np.testing.assert_allclose(
            np.asarray(vd_pc.fields(samples)),
            np.asarray(vd.fields(samples)),
            rtol=1e-6, atol=1e-10,
        )

    def test_to_pgd_bridge(self, trained):
        sep, Vs, res = trained
        vd = Vademecum(Vs, res, dtype=np.float64)
        pgd = vd.to_pgd(name="served")
        # model-layer single-sample evaluate == batched fields row
        p = np.array([0.33, 0.71])
        u_model = pgd.evaluate(0, [1, 2], list(p), 0)
        u_batch = np.asarray(vd.fields(jnp.asarray(p[None, :])))[0]
        np.testing.assert_allclose(
            np.asarray(u_model.array if hasattr(u_model, "array") else u_model),
            u_batch, rtol=1e-6, atol=1e-10,
        )

    def test_errors_zero_on_own_fields(self, trained):
        sep, Vs, res = trained
        vd = Vademecum(Vs, res, dtype=np.float64)
        samples = np.array([[0.25, 0.5], [0.75, 0.125]])
        fom = np.asarray(vd.fields(jnp.asarray(samples)))
        errs = np.asarray(vd.errors(samples, fom))
        np.testing.assert_allclose(errs, 0.0, atol=1e-13)


@pytest.fixture(scope="module")
def transient_served():
    from pgdrome_tpu.models.problems import moving_heat_source
    from pgdrome_tpu.recipes import two_stage_minres
    from pgdrome_tpu.serving import TransientVademecum

    sep, Vs, factors, _ = moving_heat_source(
        n_x=24, n_t=16, n_P=5, n_v=6, af=0.2, source_rank=8
    )
    res = two_stage_minres(sep, n_stage1=8, n_stage2=6, dtype=np.float64)
    vd = TransientVademecum(Vs, res, dtype=np.float32)
    P_grid = Vs[2].tabulate_dof_coordinates()[:, 0]
    v_grid = Vs[3].tabulate_dof_coordinates()[:, 0]
    rng = np.random.default_rng(3)
    samples = np.stack(
        [P_grid[rng.integers(0, len(P_grid), size=7)],
         v_grid[rng.integers(0, len(v_grid), size=7)]], axis=1
    )
    return sep, Vs, res, vd, samples


class TestTransientVademecum:
    def _direct_fields(self, sep, res, samples, Vs):
        """Per-sample nodal reconstruction at on-grid (P, v) values."""
        P_grid = Vs[2].tabulate_dof_coordinates()[:, 0]
        v_grid = Vs[3].tabulate_dof_coordinates()[:, 0]
        K = res.n_modes
        out = []
        for P, v in samples:
            ip = int(np.argmin(np.abs(P_grid - P)))
            iv = int(np.argmin(np.abs(v_grid - v)))
            fac = (np.asarray(res.modes[2])[:K, ip]
                   * np.asarray(res.modes[3])[:K, iv])
            u = np.einsum("k,ki,kj->ij", fac,
                          np.asarray(res.modes[0])[:K],
                          np.asarray(res.modes[1])[:K])
            out.append(u.ravel())
        return np.stack(out)

    def test_fields_are_flattened_space_time(self, transient_served):
        sep, Vs, res, vd, samples = transient_served
        ref = self._direct_fields(sep, res, samples, Vs)
        got = np.asarray(vd.fields(samples))
        assert got.shape == (len(samples), np.prod(vd.field_shape))
        assert vd.field_shape == (sep.sizes[0], sep.sizes[1])
        np.testing.assert_allclose(got, ref, rtol=2e-5, atol=2e-6)

    def test_sensors_gather_the_field(self, transient_served):
        sep, Vs, res, vd, samples = transient_served
        x_grid = Vs[0].tabulate_dof_coordinates()[:, 0]
        t_grid = Vs[1].tabulate_dof_coordinates()[:, 0]
        idx = [(3, 2), (10, 7), (20, 15)]
        pts = np.array([[x_grid[i], t_grid[j]] for i, j in idx])
        resp = np.asarray(vd.sensors(pts)(jnp.asarray(samples)))
        fields = np.asarray(vd.fields(samples))
        nt = sep.sizes[1]
        gathered = np.stack(
            [fields[:, i * nt + j] for i, j in idx], axis=1
        )
        np.testing.assert_allclose(resp, gathered, rtol=2e-5, atol=2e-6)
        # wrong point arity is rejected
        with pytest.raises(ValueError, match="space-time"):
            vd.sensors(np.zeros((3, 1)))

    def test_sensors_jacobian_finite_difference(self, transient_served):
        sep, Vs, res, vd, samples = transient_served
        x_grid = Vs[0].tabulate_dof_coordinates()[:, 0]
        t_grid = Vs[1].tabulate_dof_coordinates()[:, 0]
        pts = np.array([[x_grid[12], t_grid[8]]])
        # strictly element-INTERIOR samples: at a grid node the P1
        # interpolant's derivative is one-sided while central FD
        # straddles the kink
        s = np.array([[0.62, 0.71], [0.83, 0.57], [0.77, 0.93]])
        jac = np.asarray(vd.sensors_jacobian(pts)(jnp.asarray(s)))
        fn = vd.sensors(pts)
        eps = 1e-4
        for j in range(2):
            sp, sm = s.copy(), s.copy()
            sp[:, j] += eps
            sm[:, j] -= eps
            fd = (np.asarray(fn(jnp.asarray(sp)))
                  - np.asarray(fn(jnp.asarray(sm)))) / (2 * eps)
            np.testing.assert_allclose(jac[:, :, j], fd, rtol=5e-3,
                                       atol=1e-5)

    def test_save_load_roundtrip(self, transient_served, tmp_path):
        from pgdrome_tpu.serving import TransientVademecum

        sep, Vs, res, vd, samples = transient_served
        path = str(tmp_path / "tvd.h5")
        vd.save(path)
        back = TransientVademecum.load(path, Vs)
        assert back.field_shape == vd.field_shape
        np.testing.assert_allclose(
            np.asarray(back.fields(samples)),
            np.asarray(vd.fields(samples)), rtol=1e-6,
        )
        # wrong space list is rejected
        from pgdrome_tpu.fem.mesh import IntervalMesh
        from pgdrome_tpu.fem.space import FunctionSpace

        wrong = list(Vs)
        wrong[1] = FunctionSpace(IntervalMesh(9, 0.0, 1.0), "P", 1)
        with pytest.raises(ValueError, match="mesh does not match"):
            TransientVademecum.load(path, wrong)

    def test_to_pgd_keeps_dims_separate(self, transient_served):
        sep, Vs, res, vd, samples = transient_served
        pgd = vd.to_pgd()
        assert len(pgd.mesh) == 4
        # reference-style evaluate over the x field at fixed (t, P, v)
        t_grid = Vs[1].tabulate_dof_coordinates()[:, 0]
        P_grid = Vs[2].tabulate_dof_coordinates()[:, 0]
        v_grid = Vs[3].tabulate_dof_coordinates()[:, 0]
        it, ip, iv = 5, 2, 3
        u = pgd.evaluate(0, [1, 2, 3],
                         [t_grid[it], P_grid[ip], v_grid[iv]], 0)
        K = res.n_modes
        fac = (np.asarray(res.modes[1])[:K, it]
               * np.asarray(res.modes[2])[:K, ip]
               * np.asarray(res.modes[3])[:K, iv])
        ref = fac @ np.asarray(res.modes[0])[:K]
        # the container carries the serving-dtype (f32) mode casts
        np.testing.assert_allclose(np.asarray(u.array), ref, rtol=1e-4,
                                   atol=1e-7)

    def test_derivative_differentiates_space_only(self, transient_served):
        sep, Vs, res, vd, samples = transient_served
        dvd = vd.derivative()
        # DG(degree-1) space dim, unchanged time/param dims
        assert dvd.field_shape[1] == vd.field_shape[1]
        # du/dx of the served field: compare against the x finite
        # difference of the P1 field (exact on element midpoints;
        # the DG0 derivative is the per-element slope)
        f = np.asarray(vd.fields(samples[:2]))
        df = np.asarray(dvd.fields(samples[:2]))
        nx, nt = vd.field_shape
        x = Vs[0].tabulate_dof_coordinates()[:, 0]
        f3 = f.reshape(2, nx, nt)
        slopes = (f3[:, 1:, :] - f3[:, :-1, :]) / (
            x[1:] - x[:-1]
        )[None, :, None]
        df3 = df.reshape(2, dvd.field_shape[0], nt)
        np.testing.assert_allclose(df3, slopes, rtol=2e-4, atol=1e-5)
