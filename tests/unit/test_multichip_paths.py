"""Falsifiable multichip claims (round-4 VERDICT weak #4).

Three layers, all on the 8-virtual-device CPU mesh (conftest forces
xla_force_host_platform_device_count=8):

1. the sp-sharded TRAIN step's compiled HLO must contain all-reduce /
   all-gather (the dim-0 Gram reductions) — a silently-replicated
   PartitionSpec fails instead of lying;
2. the dp-sharded SERVING paths added in round 4 (certifier sweeps,
   Bayesian chains, corrected-sensor sweeps) must produce the same
   values as their single-device form, with the batch axis genuinely
   sharded and the partitioned program collective-free (independence is
   the claim — ICI traffic would falsify it);
3. bench-like dryrun shapes: per-device shard shapes of the live
   buffers are asserted inside parallel.enrich.dryrun itself.
"""

import numpy as np
import pytest

import jax
from jax.sharding import Mesh

from pgdrome_tpu.models.problems import parametric_elliptic
from pgdrome_tpu.parallel.hlo import (
    assert_collectives,
    collective_inventory,
    compiled_hlo,
)
from pgdrome_tpu.separated import SeparatedPGD, precondition_dim0


@pytest.fixture(scope="module")
def dp_mesh():
    devs = jax.devices("cpu")[:8]
    return Mesh(np.array(devs), ("dp",))


@pytest.fixture(scope="module")
def solved():
    sep, Vs = parametric_elliptic(n_x=48, n_p=12, num_params=2, degree_x=2)
    sep_pc, tf = precondition_dim0(sep, dtype=np.float64)
    res = SeparatedPGD(sep_pc, n_max=8, tol=0.0, residual_check=False,
                       dtype=np.float32).solve_fused()
    grid = Vs[1].tabulate_dof_coordinates()[:, 0]
    rng = np.random.default_rng(0)
    samples = grid[rng.integers(1, len(grid) - 1, size=(24, 2))]
    return sep, Vs, tf, res, samples


class TestTrainStepCollectives:
    def test_sp_sharding_inserts_reductions(self):
        """The (dp×sp) train step's optimized HLO must carry the
        cross-shard Gram reductions — the communication pattern of
        SURVEY.md §2.4 made checkable."""
        import jax.numpy as jnp

        from pgdrome_tpu.parallel.enrich import (
            _mesh_axes,
            make_multichip_train_step,
            problem_data,
        )

        devs = jax.devices("cpu")[:8]
        dp, sp = _mesh_axes(8)
        mesh = Mesh(np.array(devs).reshape(dp, sp), ("dp", "sp"))
        sep, _ = parametric_elliptic(n_x=16 * sp - 1, n_p=8, num_params=2,
                                     degree_x=1)
        sep = sep.as_device(np.float64)
        B = dp
        rhs0 = jnp.broadcast_to(sep.rhs[0][None], (B,) + sep.rhs[0].shape)
        modes = tuple(jnp.zeros((B, 4, n), dtype=sep.ops[0].dtype)
                      for n in sep.sizes)
        step = make_multichip_train_step(sep, mesh, data_as_inputs=True)
        hlo = compiled_hlo(step, modes, 0, rhs0, problem_data(sep))
        inv = assert_collectives(
            hlo, expect_present=("all-reduce", "all-gather"),
            expect_absent=("all-to-all",),
        )
        assert inv["all-reduce"] >= 1

    def test_dryrun_records_shardings_and_collectives(self):
        from pgdrome_tpu.parallel.enrich import dryrun

        info = dryrun(8, devices=jax.devices("cpu")[:8],
                      check_collectives=True)
        assert info["mesh"] == (4, 2)
        assert info["collectives"]["all-reduce"] >= 1
        # dim-0 live buffer: (B/dp, n_max, n0/sp) per device
        assert info["shardings"]["modes0"]["shards"] == [(1, 4, 16)]
        # param-dim buffer rides dp only
        spec1 = info["shardings"]["modes1"]["spec"]
        assert "dp" in spec1 and "sp" not in spec1


class TestShardedCertifier:
    def test_values_match_and_batch_is_sharded(self, dp_mesh, solved):
        from pgdrome_tpu.parallel.certify import make_residual_indicator

        sep, Vs, tf, res, samples = solved
        ind0 = make_residual_indicator(sep, Vs, res, tf=tf)
        ind8 = make_residual_indicator(sep, Vs, res, tf=tf, mesh=dp_mesh)
        a, b = ind0(samples), ind8(samples)
        np.testing.assert_allclose(b, a, rtol=1e-5)
        assert ind8.chunk % 8 == 0

    def test_partitioned_sweep_is_collective_free(self, dp_mesh, solved):
        from pgdrome_tpu.parallel.certify import make_residual_indicator

        sep, Vs, tf, res, samples = solved
        ind8 = make_residual_indicator(sep, Vs, res, tf=tf, mesh=dp_mesh)
        blk = jax.device_put(
            np.zeros((ind8.chunk, 2), dtype=np.float32), ind8._shard
        )
        hlo = compiled_hlo(ind8._call, blk, *ind8._dev_args)
        inv = collective_inventory(hlo)
        assert inv["all-reduce"] == 0 and inv["all-to-all"] == 0, inv


class TestShardedBayes:
    def test_chains_ride_dp_collective_free(self, dp_mesh, solved):
        from pgdrome_tpu.parallel.bayes import make_mcmc_fn

        sep, Vs, tf, res, _ = solved
        full0 = tf.modes_to_full(np.asarray(res.modes[0])[: res.n_modes])
        modes = [full0] + [np.asarray(res.modes[d])[: res.n_modes]
                           for d in (1, 2)]
        pts = np.array([0.25, 0.5])
        mcmc = make_mcmc_fn(Vs, modes, res.n_modes, pts, n_steps=20,
                            mesh=dp_mesh)
        grid = Vs[1].tabulate_dof_coordinates()[:, 0]
        C = 12  # NOT divisible by the 8-device mesh: pad/slice path
        rng = np.random.default_rng(1)
        p0 = grid[rng.integers(1, len(grid) - 1, size=(C, 2))]
        obs = np.zeros(2, np.float32)
        sigma = np.ones(2, np.float32)
        chol = np.eye(2, dtype=np.float32) * 0.05
        chain, n_acc = mcmc(obs, sigma, p0.astype(np.float32), chol,
                            np.float32(1.0), jax.random.PRNGKey(0))
        assert chain.shape == (20, C, 2)
        assert np.all(np.isfinite(np.asarray(chain)))
        # independence: no cross-chain traffic in the partitioned sampler
        # (inspect with a mesh-divisible chain count; the public wrapper
        # pads internally)
        p0_16 = np.concatenate([p0, p0[:4]]).astype(np.float32)
        p0s = jax.device_put(
            p0_16,
            jax.sharding.NamedSharding(
                dp_mesh, jax.sharding.PartitionSpec("dp")),
        )
        hlo = compiled_hlo(mcmc._jitted, obs, sigma, p0s, chol,
                           np.float32(1.0), jax.random.PRNGKey(0))
        inv = collective_inventory(hlo)
        assert inv["all-reduce"] == 0 and inv["all-to-all"] == 0, inv


class TestShardedCorrectedSensors:
    def test_corrected_sweep_matches_single_device(self, dp_mesh):
        from pgdrome_tpu.dual import (
            DualCorrector,
            adjoint_problem,
            make_corrected_sensor_fn,
            point_functional,
        )

        num_params = 2
        sep, Vs = parametric_elliptic(n_x=40, n_p=12,
                                      num_params=num_params, degree_x=2)
        sep_pc, tf_u = precondition_dim0(sep, dtype=np.float64)
        res_u = SeparatedPGD(sep_pc, n_max=5, tol=0.0, tol_fp=1e-9,
                             residual_check=False,
                             dtype=np.float64).solve()
        l = point_functional(Vs[0], 0.375)
        adj_pc, tf_z = precondition_dim0(adjoint_problem(sep, l),
                                         dtype=np.float64)
        res_z = SeparatedPGD(adj_pc, n_max=6, tol=0.0, tol_fp=1e-9,
                             residual_check=False,
                             dtype=np.float64).solve()
        dc = DualCorrector(sep, Vs, l, res_u, tf_u, res_z, tf_z)
        fn0 = make_corrected_sensor_fn(dc, aot=False)
        fn8 = make_corrected_sensor_fn(dc, mesh=dp_mesh)
        grid = Vs[1].tabulate_dof_coordinates()[:, 0]
        rng = np.random.default_rng(2)
        samples = grid[
            rng.integers(1, len(grid) - 1, size=(16, num_params))
        ].astype(np.float32)
        c0, p0 = fn0(samples)
        c8, p8 = fn8(samples)
        # non-divisible batch: the wrapper must pad to a mesh multiple
        # and slice back, not crash on device_put
        c13, _ = fn8(samples[:13])
        np.testing.assert_allclose(np.asarray(c13), np.asarray(c0)[:13],
                                   rtol=2e-5, atol=1e-8)
        np.testing.assert_allclose(np.asarray(c8), np.asarray(c0),
                                   rtol=2e-5, atol=1e-8)
        np.testing.assert_allclose(np.asarray(p8), np.asarray(p0),
                                   rtol=2e-5, atol=1e-8)
        assert "dp" in str(c8.sharding.spec) or c8.sharding.is_fully_replicated is False
        inv = collective_inventory(compiled_hlo(
            fn8._jitted,
            jax.device_put(samples, jax.sharding.NamedSharding(
                dp_mesh, jax.sharding.PartitionSpec("dp"))),
        ))
        assert inv["all-to-all"] == 0, inv
