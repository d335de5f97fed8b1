"""Transient (space-time) certification (VERDICT r3 next #5): the
Gram-quadratic-form residual indicator for the moving_heat_source family,
its calibration into a Certifier, and serving through
TransientVademecum.error_bound.

Mirrors tests/unit/test_certify.py for the elliptic family.  The
reference's only certification story is per-sample FOM solves
(reference model.py:1666-1825).
"""

import unittest
import warnings

import numpy as np
from scipy import sparse as sps

from pgdrome_tpu.models.problems import (
    moving_heat_source,
    transient_dense_verifier,
)
from pgdrome_tpu.recipes import two_stage_minres
from pgdrome_tpu.separated import evaluate_modes_1d
from pgdrome_tpu.parallel.certify import (
    Certifier,
    make_transient_certifier,
    make_transient_residual_indicator,
)


def _setup():
    sep, Vs, factors, _ = moving_heat_source(
        n_x=60, n_t=40, n_P=8, n_v=10,
        source_rank=40, separation="hierarchical", separation_tol=1e-7,
    )
    res = two_stage_minres(sep, n_stage1=32, n_stage2=24, dtype=np.float64)
    return sep, Vs, factors, res


class TestTransientIndicator(unittest.TestCase):
    @classmethod
    def setUpClass(cls):
        cls.sep, cls.Vs, cls.factors, cls.res = _setup()
        cls.verify = transient_dense_verifier(cls.sep, cls.Vs, cls.factors)
        cls.P_grid = cls.Vs[2].tabulate_dof_coordinates()[:, 0]
        cls.v_grid = cls.Vs[3].tabulate_dof_coordinates()[:, 0]

    def _pts(self, idx):
        return np.array(
            [[self.P_grid[i], self.v_grid[j]] for i, j in idx]
        )

    def test_matches_direct_spacetime_residual(self):
        """The Gram quadratic form equals the materialized space-time
        residual to machine precision."""
        sep, res, factors = self.sep, self.res, self.factors
        ind = make_transient_residual_indicator(sep, self.Vs, res, factors)
        ops0 = np.asarray(sep.ops[0])
        ops1 = np.asarray(sep.ops[1])
        nx, nt = sep.sizes[0], sep.sizes[1]
        A = sum(
            sps.kron(sps.csr_matrix(ops0[t]), sps.csr_matrix(ops1[t]))
            for t in range(ops0.shape[0])
        ).tolil()
        ic = [ix * nt for ix in range(nx)]
        for rr in ic:
            A.rows[rr] = [rr]
            A.data[rr] = [1.0]
        A = A.tocsr()
        Mx = np.asarray(sep.mass[0])
        Mt = np.asarray(sep.ops[1][1])
        K = res.n_modes
        samples = self._pts([(0, 0), (7, 9), (3, 4)])
        direct = []
        for P, v in samples:
            fv = np.asarray(
                evaluate_modes_1d(
                    self.Vs[3], np.asarray(factors[2]), np.asarray([v]),
                    xp=np,
                )
            )[0]
            b = np.einsum(
                "r,ri,rj->ij",
                P * fv,
                np.asarray(factors[0]) @ Mx.T,
                np.asarray(factors[1]) @ Mt.T,
            ).ravel()
            b[ic] = 0.0
            wk = (
                np.asarray(
                    evaluate_modes_1d(
                        self.Vs[2], np.asarray(res.modes[2])[:K],
                        np.asarray([P]), xp=np,
                    )
                )[0]
                * np.asarray(
                    evaluate_modes_1d(
                        self.Vs[3], np.asarray(res.modes[3])[:K],
                        np.asarray([v]), xp=np,
                    )
                )[0]
            )
            u = np.einsum(
                "k,ki,kj->ij",
                wk,
                np.asarray(res.modes[0])[:K],
                np.asarray(res.modes[1])[:K],
            ).ravel()
            direct.append(np.linalg.norm(b - A @ u) / np.linalg.norm(b))
        np.testing.assert_allclose(
            ind(samples), np.asarray(direct), rtol=1e-9
        )

    def test_calibrated_bound_covers_held_out(self):
        cert = make_transient_certifier(
            self.sep, self.Vs, self.res, self.factors
        )
        cal_idx = [(0, 0), (0, 9), (7, 0), (7, 9), (3, 4), (2, 7)]
        cal_pts = self._pts(cal_idx)
        true_errs = self.verify.sample_errors(self.res, cal_idx)
        resid = cert.residuals(cal_pts)
        # effectivity is stable: spread under 10x on this family
        eff = true_errs / resid
        self.assertLess(eff.max() / eff.min(), 10.0)
        cert.calibrate(cal_pts, true_errs, safety=2.0)
        held_idx = [(1, 2), (5, 8), (6, 3), (4, 6)]
        held_pts = self._pts(held_idx)
        held_true = self.verify.sample_errors(self.res, held_idx)
        bounds = cert.bound(held_pts)
        self.assertTrue(np.all(bounds >= held_true))

    def test_serving_through_transient_vademecum(self):
        from pgdrome_tpu.serving import TransientVademecum

        cert = make_transient_certifier(
            self.sep, self.Vs, self.res, self.factors
        )
        cal_idx = [(0, 0), (7, 9), (3, 4)]
        cert.calibrate(
            self._pts(cal_idx),
            self.verify.sample_errors(self.res, cal_idx),
        )
        vd = TransientVademecum(
            self.Vs, self.res, field_dims=2, dtype=np.float64
        ).attach_certifier(cert)
        q = self._pts([(2, 3), (5, 5)])
        b = vd.error_bound(q)
        self.assertEqual(b.shape, (2,))
        self.assertTrue(np.all(b > 0))

    def test_out_of_distribution_warns(self):
        cert = make_transient_certifier(
            self.sep, self.Vs, self.res, self.factors
        )
        cal_idx = [(0, 0), (7, 9), (3, 4)]
        cert.calibrate(
            self._pts(cal_idx),
            self.verify.sample_errors(self.res, cal_idx),
        )
        far = np.array([[10.0 * self.P_grid[-1], self.v_grid[0]]])
        with warnings.catch_warnings(record=True) as w:
            warnings.simplefilter("always")
            cert.bound(far)
        self.assertTrue(
            any("outside the calibration" in str(x.message) for x in w)
        )

    def test_save_unsupported_raises_clearly(self):
        cert = make_transient_certifier(
            self.sep, self.Vs, self.res, self.factors
        )
        with self.assertRaises(ValueError):
            cert.save("/tmp/should_not_exist.h5")

    def test_rejects_wrong_family(self):
        from pgdrome_tpu.models.problems import parametric_elliptic

        sep_e, Vs_e = parametric_elliptic(n_x=32, n_p=8, num_params=2)
        with self.assertRaises(ValueError):
            make_transient_residual_indicator(
                sep_e, Vs_e, self.res, self.factors
            )


if __name__ == "__main__":
    unittest.main()
