"""Certified residual-based error indicators (parallel/certify.py).

The reference certifies by sampling FOM solves (PGDErrorComputation,
reference model.py:1666-1825); this is the TPU-native complement — the
per-sample algebraic residual, batched on device, verified here against
a direct f64 numpy residual, against boost invariance, and for the
calibrated-bound workflow end to end."""

import numpy as np
import pytest

from pgdrome_tpu.models.problems import (
    elliptic_dense_verifier,
    parametric_elliptic,
)
from pgdrome_tpu.parallel.certify import (
    Certifier,
    make_certifier,
    make_residual_indicator,
    make_screener,
    screened_verify,
)
from pgdrome_tpu.separated import (
    SeparatedPGD,
    evaluate_modes_1d,
    precondition_dim0,
)


@pytest.fixture(scope="module")
def solved():
    sep, Vs = parametric_elliptic(n_x=64, n_p=16, num_params=2, degree_x=2)
    sep_pc, tf = precondition_dim0(sep, dtype=np.float64)
    res = SeparatedPGD(
        sep_pc, n_max=16, tol=0.0, tol_fp=1e-8,
        residual_check=False, dtype=np.float32,
    ).solve_fused()
    grid = Vs[1].tabulate_dof_coordinates()[:, 0]
    rng = np.random.default_rng(0)
    samples = grid[rng.integers(1, len(grid) - 1, size=(12, 2))]
    return sep, Vs, tf, res, grid, samples


def _direct_residuals(sep, Vs, tf, res, grid, samples):
    """f64 numpy ground truth: assemble K(p), b(p) per sample."""
    full0 = tf.modes_to_full(
        np.asarray(res.modes[0])[: res.n_modes]
    ).astype(np.float64)
    ops0 = np.asarray(sep.ops[0])
    mask = np.asarray(sep.bc_masks[0])
    out = []
    for p in samples:
        theta = np.ones(sep.num_terms)
        rho = np.ones(sep.num_rhs)
        w = np.ones(res.n_modes)
        for d in range(1, sep.num_dims):
            od = np.asarray(sep.ops[d])
            gi = np.argmin(np.abs(grid - p[d - 1]))
            theta *= np.array(
                [np.diag(od[t])[gi] for t in range(sep.num_terms)]
            )
            rho *= np.asarray(sep.rhs[d])[:, gi]
            mv = np.asarray(
                evaluate_modes_1d(
                    Vs[d], res.modes[d], np.asarray([p[d - 1]]), xp=np
                )
            )[0]
            w *= mv[: res.n_modes].astype(np.float64)
        u = w @ full0
        K = np.einsum("t,tij->ij", theta, ops0)
        b = rho @ np.asarray(sep.rhs[0])
        r = (b - K @ u) * mask
        out.append(np.linalg.norm(r) / np.linalg.norm(b * mask))
    return np.asarray(out)


class TestResidualIndicator:
    def test_matches_direct_f64_residual(self, solved):
        sep, Vs, tf, res, grid, samples = solved
        ind = make_residual_indicator(sep, Vs, res, tf=tf,
                                      precondition=False)
        vals = ind(samples)
        direct = _direct_residuals(sep, Vs, tf, res, grid, samples)
        # dd contraction of the f32 mode set vs exact f64: ~2^-48 plus
        # f32 interpolation-weight rounding — well under 1e-5 relative
        assert np.all(np.abs(vals - direct) / direct < 1e-5)

    def test_energy_norm_matches_host_transform(self, solved):
        sep, Vs, tf, res, grid, samples = solved
        vals = make_residual_indicator(sep, Vs, res, tf=tf)(samples)
        # host f64 ground truth with the L⁻¹-transformed tables
        full0 = tf.modes_to_full(
            np.asarray(res.modes[0])[: res.n_modes]
        ).astype(np.float64)
        ops0 = np.asarray(sep.ops[0])
        direct = []
        for k, p in enumerate(samples):
            theta = np.ones(sep.num_terms)
            rho = np.ones(sep.num_rhs)
            w = np.ones(res.n_modes)
            for d in range(1, sep.num_dims):
                od = np.asarray(sep.ops[d])
                gi = np.argmin(np.abs(grid - p[d - 1]))
                theta *= np.array(
                    [np.diag(od[t])[gi] for t in range(sep.num_terms)]
                )
                rho *= np.asarray(sep.rhs[d])[:, gi]
                mv = np.asarray(
                    evaluate_modes_1d(
                        Vs[d], res.modes[d], np.asarray([p[d - 1]]), xp=np
                    )
                )[0]
                w *= mv[: res.n_modes].astype(np.float64)
            u = w @ full0
            K = np.einsum("t,tij->ij", theta, ops0)
            b = rho @ np.asarray(sep.rhs[0])
            r = (b - K @ u)[tf.interior]
            rt = tf.apply_Linv(r[:, None])[:, 0]
            bt = tf.apply_Linv(b[tf.interior][:, None])[:, 0]
            direct.append(np.linalg.norm(rt) / np.linalg.norm(bt))
        direct = np.asarray(direct)
        assert np.all(np.abs(vals - direct) / direct < 1e-5)

    def test_preconditioned_problem_shortcut(self, solved):
        # building from the pc stacks with tf=None IS the energy
        # indicator: pc dim-0 stacks are L⁻¹K_tL⁻ᵀ/L⁻¹b and the modes
        # already live in that basis (the bench setup cache keeps only
        # the pc problem — this is its supported path)
        sep, Vs, tf, res, grid, samples = solved
        sep_pc, _ = precondition_dim0(sep, dtype=np.float64)
        v_energy = make_residual_indicator(sep, Vs, res, tf=tf)(samples)
        v_pc = make_residual_indicator(sep_pc, Vs, res)(samples)
        assert np.all(np.abs(v_pc - v_energy) / v_energy < 1e-6)

    def test_boost_invariant_on_grid(self, solved):
        sep, Vs, tf, res, grid, samples = solved
        sep_b, _ = parametric_elliptic(
            n_x=64, n_p=16, num_params=2, degree_x=2, boundary_boost=4.0
        )
        vals = make_residual_indicator(sep, Vs, res, tf=tf)(samples)
        vals_b = make_residual_indicator(sep_b, Vs, res, tf=tf)(samples)
        assert np.all(np.abs(vals_b - vals) / vals < 1e-5)

    def test_decreases_with_rank(self, solved):
        sep, Vs, tf, res, grid, samples = solved
        from pgdrome_tpu.separated import PGDResult

        lo = PGDResult(
            modes=res.modes, n_modes=3,
            amplitudes=res.amplitudes[:3], alpha=res.alpha[:3],
            fp_its=res.fp_its[:3], normU0=res.normU0,
        )
        v_lo = make_residual_indicator(sep, Vs, lo, tf=tf)(samples)
        v_hi = make_residual_indicator(sep, Vs, res, tf=tf)(samples)
        assert v_hi.max() < 0.2 * v_lo.max()

    def test_chunking_matches_single_dispatch(self, solved):
        sep, Vs, tf, res, grid, samples = solved
        v1 = make_residual_indicator(sep, Vs, res, tf=tf, chunk=5)(samples)
        v2 = make_residual_indicator(sep, Vs, res, tf=tf, chunk=64)(samples)
        np.testing.assert_allclose(v1, v2, rtol=1e-6)

    def test_galerkin_params_rejected(self):
        sep, Vs = parametric_elliptic(
            n_x=32, n_p=8, num_params=2, param_discretization="galerkin"
        )
        sep_pc, tf = precondition_dim0(sep, dtype=np.float64)
        res = SeparatedPGD(
            sep_pc, n_max=4, tol=0.0, dtype=np.float32,
            residual_check=False,
        ).solve_fused()
        with pytest.raises(ValueError, match="collocation"):
            make_residual_indicator(sep, Vs, res, tf=tf)

    def test_shape_validation(self, solved):
        sep, Vs, tf, res, grid, samples = solved
        ind = make_residual_indicator(sep, Vs, res, tf=tf)
        with pytest.raises(ValueError, match="samples"):
            ind(samples[:, :1])


class TestCertifier:
    def test_calibrated_bound_holds_on_held_out(self, solved):
        sep, Vs, tf, res, grid, samples = solved
        verify = elliptic_dense_verifier(Vs, tf=tf, n_random=8, seeds=(7,))
        rng_c = np.random.default_rng(5)
        cal = np.concatenate([
            verify.corners,
            grid[rng_c.integers(1, len(grid) - 1, size=(12, 2))],
        ])
        cert = make_certifier(sep, Vs, res, tf=tf)
        eta = cert.calibrate(cal, verify.sample_errors(res, cal),
                             safety=2.0)
        assert eta > 0 and cert.n_calibration == len(cal)
        rng = np.random.default_rng(42)
        held = grid[rng.integers(1, len(grid) - 1, size=(24, 2))]
        true_err = verify.sample_errors(res, held)
        bd = cert.bound(held)
        assert np.all(bd >= true_err)

    def test_bound_requires_calibration(self, solved):
        sep, Vs, tf, res, grid, samples = solved
        cert = make_certifier(sep, Vs, res, tf=tf)
        with pytest.raises(RuntimeError, match="calibrate"):
            cert.bound(samples)
        # explicit eta bypasses calibration
        cert2 = make_certifier(sep, Vs, res, tf=tf, eta=2.0)
        vals = cert2.bound(samples)
        assert vals.shape == (len(samples),)

    def test_vademecum_wiring(self, solved):
        sep, Vs, tf, res, grid, samples = solved
        from pgdrome_tpu.serving import Vademecum

        vad = Vademecum(Vs, res, dim0_transform=tf)
        with pytest.raises(RuntimeError, match="certifier"):
            vad.residuals(samples)
        cert = make_certifier(sep, Vs, res, tf=tf, eta=1.0)
        vad.attach_certifier(cert)
        r1 = vad.residuals(samples)
        b1 = vad.error_bound(samples)
        np.testing.assert_allclose(b1, r1)


class TestScreener:
    @pytest.fixture(scope="class")
    def solved3(self):
        sep, Vs = parametric_elliptic(n_x=48, n_p=12, num_params=3)
        sep_pc, tf = precondition_dim0(sep, dtype=np.float64)
        res = SeparatedPGD(
            sep_pc, n_max=12, tol=0.0, tol_fp=1e-8,
            residual_check=False, dtype=np.float32,
        ).solve_fused()
        grid = Vs[1].tabulate_dof_coordinates()[:, 0]
        return sep_pc, Vs, tf, res, grid

    def test_matches_dd_indicator(self, solved3):
        sep_pc, Vs, tf, res, grid = solved3
        rng = np.random.default_rng(1)
        pts = grid[rng.integers(1, len(grid) - 1, size=(16, 3))]
        dd_vals = make_residual_indicator(sep_pc, Vs, res)(pts)
        screen = make_screener(sep_pc, Vs, n_modes_cap=16, chunk=8)
        f32_vals = screen(res, pts)
        # f32 HIGHEST matmul: noise ~cancellation·2^-24 of the reading
        assert np.all(np.abs(f32_vals - dd_vals) / dd_vals < 1e-2)

    def test_padding_reuse_across_ranks(self, solved3):
        sep_pc, Vs, tf, res, grid = solved3
        from pgdrome_tpu.separated import PGDResult

        screen = make_screener(sep_pc, Vs, n_modes_cap=16, chunk=8)
        pts = grid[np.array([[2, 3, 4], [5, 6, 7]])]
        lo = PGDResult(
            modes=res.modes, n_modes=4,
            amplitudes=res.amplitudes[:4], alpha=res.alpha[:4],
            fp_its=res.fp_its[:4], normU0=res.normU0,
        )
        v_lo = screen(lo, pts)
        v_hi = screen(res, pts)
        assert np.all(np.isfinite(v_lo)) and np.all(np.isfinite(v_hi))
        assert v_hi.max() < v_lo.max()  # deeper rank -> smaller residual
        # exceeding the cap raises instead of silently truncating
        with pytest.raises(ValueError, match="cap"):
            make_screener(sep_pc, Vs, n_modes_cap=8)(res, pts)

    def test_screened_verify_conservative(self, solved3):
        sep_pc, Vs, tf, res, grid = solved3
        verify = elliptic_dense_verifier(Vs, tf=tf, n_random=4, seeds=(7,))
        corners = verify.corners  # 8 corners at 3 params
        true_c = verify.sample_errors(res, corners)
        screen = make_screener(sep_pc, Vs, n_modes_cap=16, chunk=8)
        rng = np.random.default_rng(2)
        interior = grid[rng.integers(1, len(grid) - 1, size=(4, 3))]
        sv = screened_verify(
            screen, verify.sample_errors, corners,
            top_k=4, interior_samples=interior,
        )
        out = sv(res)
        assert out["screened"] and out["eta"] > 0
        # the screened corner value must cover the TRUE full-sweep max
        assert out["corners"] >= true_c.max() * 0.999
        # and not be wildly pessimistic (within safety*spread of it)
        assert out["corners"] < 50 * true_c.max()
        assert out["max"] >= out["interior"]


class TestHighDimUnderflow:
    def test_indicator_and_screener_finite_at_10_params(self):
        # at d=10 with n_p=128 the common per-sample measure factor
        # prod_d(w*omega) ~ 1e-21; its square underflows f32 to 0/0=NaN
        # without the per-sample scale normalization (found on the real
        # 10-param grind: edge/interior estimates came back NaN)
        sep, Vs = parametric_elliptic(
            n_x=16, n_p=128, num_params=10, degree_x=1,
        )
        sep_pc, tf = precondition_dim0(sep, dtype=np.float64)
        res = SeparatedPGD(
            sep_pc, n_max=2, tol=0.0, tol_fp=1e-4, max_fp_it=4,
            residual_check=False, dtype=np.float32,
        ).solve_fused()
        grid = Vs[1].tabulate_dof_coordinates()[:, 0]
        rng = np.random.default_rng(0)
        pts = grid[rng.integers(1, len(grid) - 1, size=(6, 10))]
        vals = make_residual_indicator(sep_pc, Vs, res)(pts)
        assert np.all(np.isfinite(vals)) and np.all(vals > 0)
        screen = make_screener(sep_pc, Vs, n_modes_cap=4, chunk=8)
        svals = screen(res, pts)
        assert np.all(np.isfinite(svals)) and np.all(svals > 0)
        # normalization must not change the values where both are fine:
        # cross-check screener vs dd indicator
        assert np.all(np.abs(svals - vals) / vals < 5e-2)


class TestCertifierPersistence:
    def test_save_load_roundtrip(self, solved, tmp_path):
        sep, Vs, tf, res, grid, samples = solved
        cert = make_certifier(sep, Vs, res, tf=tf, eta=1.5)
        cert.safety = 2.0
        cert.n_calibration = 12
        vals = cert.residuals(samples)
        path = str(tmp_path / "cert.h5")
        cert.save(path, spaces=Vs)
        back = Certifier.load(path, Vs)
        assert back.eta == 1.5 and back.safety == 2.0
        assert back.n_calibration == 12
        # dd tables round-trip exactly -> identical residuals
        np.testing.assert_allclose(back.residuals(samples), vals, rtol=1e-7)
        np.testing.assert_allclose(back.bound(samples), 1.5 * vals,
                                   rtol=1e-7)

    def test_load_validates_spaces(self, solved, tmp_path):
        sep, Vs, tf, res, grid, samples = solved
        cert = make_certifier(sep, Vs, res, tf=tf)
        path = str(tmp_path / "cert.h5")
        cert.save(path, spaces=Vs)
        from pgdrome_tpu.fem.mesh import IntervalMesh
        from pgdrome_tpu.fem.space import FunctionSpace

        wrong = [Vs[0], Vs[1],
                 FunctionSpace(IntervalMesh(9, 0.0, 1.0), "P", 1)]
        with pytest.raises(ValueError, match="mesh does not match"):
            Certifier.load(path, wrong)
        with pytest.raises(ValueError, match="spaces"):
            Certifier.load(path, Vs[:2])
        # uncalibrated snapshot loads with eta None
        cert2 = make_certifier(sep, Vs, res, tf=tf)
        path2 = str(tmp_path / "cert2.h5")
        cert2.save(path2)
        back = Certifier.load(path2, Vs)
        assert back.eta is None
        with pytest.raises(RuntimeError, match="calibrate"):
            back.bound(samples)

    def test_load_validates_dof_counts_without_coords(self, solved,
                                                      tmp_path):
        # save(spaces=None) stores no mesh coordinates; load must STILL
        # reject a wrong-sized parameter space instead of gathering
        # garbage through a mismatched dof map (code-review finding)
        sep, Vs, tf, res, grid, samples = solved
        cert = make_certifier(sep, Vs, res, tf=tf)
        path = str(tmp_path / "cert_nospaces.h5")
        cert.save(path)  # default: no coords datasets
        from pgdrome_tpu.fem.mesh import IntervalMesh
        from pgdrome_tpu.fem.space import FunctionSpace

        wrong = [Vs[0], Vs[1],
                 FunctionSpace(IntervalMesh(9, 0.0, 1.0), "P", 1)]
        with pytest.raises(ValueError, match="dofs"):
            Certifier.load(path, wrong)


class TestScreenedVerifyGuards:
    def test_top_k_zero_rejected(self, solved):
        # order[-0:] would silently select ALL corners (full FEM sweep);
        # eta also needs at least one measured pair — must raise
        with pytest.raises(ValueError, match="top_k"):
            screened_verify(
                lambda r, pts: np.ones(len(pts)),
                lambda r, pts: np.ones(len(pts)),
                np.zeros((4, 2)),
                top_k=0,
            )


def test_box_corners_convention():
    from pgdrome_tpu.models.problems import box_corners

    c = box_corners(0.25, 2.0, 3)
    assert c.shape == (8, 3) and c.dtype == np.float64
    # bit i of the corner index selects dim i: 0 -> lo, 1 -> hi
    np.testing.assert_array_equal(c[0], [0.25, 0.25, 0.25])
    np.testing.assert_array_equal(c[5], [2.0, 0.25, 2.0])
    np.testing.assert_array_equal(c[7], [2.0, 2.0, 2.0])
    sub = box_corners(0.25, 2.0, 3, idx=[7, 0])
    np.testing.assert_array_equal(sub[0], c[7])
    np.testing.assert_array_equal(sub[1], c[0])


class TestGuaranteedFieldBound:
    """guaranteed_field_bound: the zero-calibration A(p) ⪰ K0 field
    certificate (round-4 VERDICT weak #1).  Guarantees are checked
    against the per-sample banded f64 FEM truth; both calling modes
    (nodal problem + tf, preconditioned shortcut + nodal_tf) must agree
    exactly."""

    @pytest.fixture(scope="class")
    def setup(self):
        sep, Vs = parametric_elliptic(n_x=64, n_p=16, num_params=2,
                                      degree_x=2)
        sep_pc, tf = precondition_dim0(sep, dtype=np.float64)
        res = SeparatedPGD(
            sep_pc, n_max=10, tol=0.0, residual_check=False,
            dtype=np.float64,
        ).solve_fused()
        ver = elliptic_dense_verifier(Vs, tf, n_random=10, seeds=(7,))
        grid = Vs[1].tabulate_dof_coordinates()[:, 0]
        rng = np.random.default_rng(5)
        pts = np.concatenate(
            [ver.corners, grid[rng.integers(1, len(grid) - 1, size=(24, 2))]]
        )
        true = ver.sample_errors(res, pts)
        return sep, sep_pc, Vs, tf, res, pts, true

    def test_bound_holds_and_is_sharp(self, setup):
        from pgdrome_tpu.parallel.certify import guaranteed_field_bound

        sep, _, Vs, tf, res, pts, true = setup
        gb = guaranteed_field_bound(sep, Vs, res, tf=tf)
        out = gb(pts)
        assert np.all(out["rel_l2"] >= true)
        assert np.all(out["rel_energy"] > 0)
        assert np.all(out["abs_K0"] > 0)
        # zero calibration must stay within ~30x of truth (measured ~3x
        # median on this family) or it is not a useful certificate
        assert np.median(out["rel_l2"] / true) < 30.0

    def test_pc_shortcut_matches_nodal(self, setup):
        from pgdrome_tpu.parallel.certify import guaranteed_field_bound

        sep, sep_pc, Vs, tf, res, pts, _ = setup
        a = guaranteed_field_bound(sep, Vs, res, tf=tf)(pts)
        b = guaranteed_field_bound(sep_pc, Vs, res, tf=None,
                                   nodal_tf=tf)(pts)
        np.testing.assert_allclose(a["rel_l2"], b["rel_l2"], rtol=1e-5)
        np.testing.assert_allclose(a["abs_K0"], b["abs_K0"], rtol=1e-5)

    def test_lambda_min_is_guaranteed_side(self, setup):
        from pgdrome_tpu.parallel.certify import guaranteed_field_bound

        sep, _, Vs, tf, res, _, _ = setup
        gb = guaranteed_field_bound(sep, Vs, res, tf=tf)
        # the row-sum bound must sit BELOW the Rayleigh estimate of
        # lambda_min (lower bound -> division inflates, stays guaranteed)
        assert gb.lam_min_lower <= gb.lam_min_estimate * (1 + 1e-12)
        # and be tight enough to matter (within 3x on the 1D family)
        assert gb.lam_min_lower > gb.lam_min_estimate / 3.0

    def test_energy_only_without_transform(self, setup):
        from pgdrome_tpu.parallel.certify import guaranteed_field_bound

        _, sep_pc, Vs, _, res, pts, _ = setup
        out = guaranteed_field_bound(sep_pc, Vs, res)(pts)
        assert "rel_l2" not in out and "rel_energy" in out

    def test_certifier_attachment(self, setup):
        from pgdrome_tpu.parallel.certify import guaranteed_field_bound

        sep, _, Vs, tf, res, pts, true = setup
        cert = make_certifier(sep, Vs, res, tf=tf)
        with pytest.raises(RuntimeError, match="attach"):
            cert.guaranteed_bound(pts)
        cert.attach_guaranteed(guaranteed_field_bound(sep, Vs, res, tf=tf))
        g = cert.guaranteed_bound(pts)
        assert np.all(g >= true)
        with pytest.raises(KeyError):
            cert.guaranteed_bound(pts, norm="nope")

    def test_validate_spd_family_raises(self):
        from pgdrome_tpu.parallel.certify import validate_spd_family

        sep, _ = parametric_elliptic(n_x=24, n_p=8, num_params=2)
        validate_spd_family(sep)  # canonical family passes
        bad_ops = [np.array(o) for o in sep.ops]
        bad_ops[1] = bad_ops[1].copy()
        np.fill_diagonal(bad_ops[1][1], -1.0)  # negative theta
        from pgdrome_tpu.separated import SeparatedProblem

        bad = SeparatedProblem(ops=bad_ops, rhs=list(sep.rhs),
                               mass=list(sep.mass),
                               bc_dofs=list(sep.bc_dofs))
        with pytest.raises(ValueError, match="negative"):
            validate_spd_family(bad)
