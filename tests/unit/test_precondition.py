"""Energy-basis (congruence) preconditioning of the space dimension:
amplitude invariance + float32 accuracy (the TPU bench precision story)."""

import numpy as np
import jax.numpy as jnp

from pgdrome_tpu.models.problems import parametric_elliptic
from pgdrome_tpu.separated import SeparatedPGD, precondition_dim0, evaluate_modes_1d


class TestPrecondition:
    def test_amplitudes_invariant_f64(self):
        sep, Vs = parametric_elliptic(n_x=40, n_p=12, num_params=2)
        res_plain = SeparatedPGD(sep, n_max=8, tol=1e-12, tol_fp=1e-8).solve()
        sep_pc, tf = precondition_dim0(sep, dtype=np.float64)
        res_pc = SeparatedPGD(sep_pc, n_max=8, tol=1e-12, tol_fp=1e-8).solve()
        n = min(res_plain.n_modes, res_pc.n_modes)
        np.testing.assert_allclose(
            res_plain.amplitudes[:n], res_pc.amplitudes[:n], rtol=1e-8
        )
        # reconstructed full-dof modes agree with the plain run (rank-1
        # product comparison at a parameter point)
        full0 = tf.modes_to_full(res_pc.modes[0])
        p = (0.25, 0.5)
        for res, m0 in [(res_plain, np.asarray(res_plain.modes[0])), (res_pc, full0)]:
            fac = np.ones(n)
            for j, pj in enumerate(p):
                vals = np.asarray(
                    evaluate_modes_1d(Vs[1 + j], res.modes[1 + j], np.asarray([pj]), xp=np)
                )[0]
                fac *= vals[:n]
            u = fac @ m0[:n]
            if res is res_plain:
                u_ref = u
        np.testing.assert_allclose(u, u_ref, rtol=1e-8, atol=1e-12)

    def test_f32_accuracy(self):
        # the whole point: f32 solves in the energy basis stay accurate
        sep, Vs = parametric_elliptic(n_x=256, n_p=32, num_params=2)
        sep_pc, tf = precondition_dim0(sep, dtype=np.float32)
        res32 = SeparatedPGD(sep_pc, n_max=20, tol=1e-12, tol_fp=1e-6).solve()

        res64 = SeparatedPGD(sep, n_max=20, tol=1e-12, tol_fp=1e-6).solve()
        n = min(res32.n_modes, res64.n_modes)
        # amplitudes agree to f32 resolution while above the f32 noise floor
        sig = res64.amplitudes[:n] > 1e-4
        np.testing.assert_allclose(
            res32.amplitudes[:n][sig].astype(np.float64),
            res64.amplitudes[:n][sig],
            rtol=1e-3,
        )

        # reconstruction at an on-grid parameter point vs the f64 solution
        full0 = tf.modes_to_full(res32.modes[0]).astype(np.float64)
        p = (0.375, 0.75)
        fac32 = np.ones(res32.n_modes)
        fac64 = np.ones(res64.n_modes)
        for j, pj in enumerate(p):
            v32 = np.asarray(
                evaluate_modes_1d(Vs[1 + j], res32.modes[1 + j], np.asarray([pj]), xp=np)
            )[0]
            fac32 *= v32[: res32.n_modes]
            v64 = np.asarray(
                evaluate_modes_1d(Vs[1 + j], res64.modes[1 + j], np.asarray([pj]), xp=np)
            )[0]
            fac64 *= v64[: res64.n_modes]
        u32 = fac32 @ full0[: res32.n_modes]
        u64 = fac64 @ np.asarray(res64.modes[0])[: res64.n_modes]
        err = np.linalg.norm(u32 - u64) / np.linalg.norm(u64)
        print("f32 vs f64 reconstruction rel err:", err)
        assert err < 5e-6
