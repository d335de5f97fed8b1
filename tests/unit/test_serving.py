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
