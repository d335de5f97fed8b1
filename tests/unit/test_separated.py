"""Jitted fast path vs the reference-parity orchestration layer.

The north-star requirement (BASELINE.md): amplitudes from the fully jitted
separated solver must match the reference-semantics solver to 1e-8
relative."""

import numpy as np
import pytest

from pgdrome_tpu.models.problems import (
    parametric_elliptic,
    poisson_xy,
    elastic_truss,
    pgd_problem_from_separated,
)
from pgdrome_tpu.separated import (
    SeparatedPGD,
    SeparatedProblem,
    evaluate_modes_1d,
)


class TestFastPathParity:
    def test_parametric_elliptic_amplitudes(self):
        sep, Vs = parametric_elliptic(n_x=40, n_p=10, num_params=2)
        fast = SeparatedPGD(sep, n_max=8, tol=1e-10, tol_fp=1e-7)
        res = fast.solve()

        compat = pgd_problem_from_separated(sep, Vs)
        compat.PGD_nmax = 8
        compat.PGD_tol = 1e-10
        compat.tol_fp_it = 1e-7
        compat.stop_fp = "norm"
        compat.norm_modes = "stiff"
        compat.solve_PGD(_problem="linear")

        amp_fast = np.asarray(res.amplitudes)
        amp_compat = np.asarray(compat.amplitude)
        n = min(len(amp_fast), len(amp_compat))
        assert n >= 2
        np.testing.assert_allclose(amp_fast[:n], amp_compat[:n], rtol=1e-8)

        # alpha agreement too
        al_fast = res.alpha[:n]
        al_compat = np.asarray(compat.alpha[:n])
        np.testing.assert_allclose(al_fast, al_compat, rtol=1e-8)

    def test_poisson_xy_single_mode(self):
        sep, Vs = poisson_xy(n_x=30, n_y=20)
        fast = SeparatedPGD(sep, n_max=5, tol=1e-10, tol_fp=1e-6)
        res = fast.solve()
        # exactly-separable problem converges immediately: second mode has
        # relative amplitude ~0 (reference test_laplace asserts 1 mode)
        assert res.amplitudes[0] == 1.0
        if res.n_modes > 1:
            assert res.amplitudes[1] < 1e-8

    def test_elastic_truss_vs_compat(self):
        sep, Vs = elastic_truss(n_x=50, n_E=40)
        fast = SeparatedPGD(sep, n_max=6, tol=1e-10, tol_fp=1e-7)
        res = fast.solve()
        compat = pgd_problem_from_separated(sep, Vs)
        compat.PGD_nmax = 6
        compat.tol_fp_it = 1e-7
        compat.solve_PGD(_problem="linear")
        n = min(res.n_modes, len(compat.amplitude))
        np.testing.assert_allclose(
            res.amplitudes[:n], np.asarray(compat.amplitude)[:n], rtol=1e-8
        )

    def test_vademecum_accuracy(self):
        # fast-path solution vs a direct solve at a parameter point; the
        # error floor is the parameter-grid discretization O(h_p²)
        # (verified 2nd-order: 1.2e-5 @ n_p=16 → 3.1e-6 @ 32 → 8.2e-7 @ 64)
        sep, Vs = parametric_elliptic(n_x=60, n_p=64, num_params=2)
        fast = SeparatedPGD(sep, n_max=30, tol=1e-14, tol_fp=1e-9)
        res = fast.solve()

        # direct FEM at an on-grid parameter point (vademecum = lookup on
        # the parameter grid; off-grid adds P1 parameter interpolation error)
        from pgdrome_tpu.fem.assembly import stiffness_matrix, load_vector
        from pgdrome_tpu.fem.bc import DirichletBC

        p = (0.375, 0.75)
        Vx = Vs[0]
        kappa = lambda x: (
            1.0
            + p[0] * np.sin(np.pi * x) ** 2 / 4.0
            + p[1] * np.sin(2 * np.pi * x) ** 2 / 4.0
        )
        K = stiffness_matrix(Vx, weight=kappa)
        b = load_vector(Vx, lambda x: np.ones_like(x))
        bc = DirichletBC(Vx, 0.0, lambda x, onb: onb)
        A2, b2 = bc.apply_system(K, b)
        u_ref = np.linalg.solve(A2, b2)

        # PGD reconstruction: per-mode factors at the parameter point
        fac = np.ones(res.n_modes)
        for j, pj in enumerate(p):
            vals = np.asarray(
                evaluate_modes_1d(Vs[1 + j], res.modes[1 + j], np.asarray([pj]), xp=np)
            )[0]
            fac *= vals[: res.n_modes]
        u_pgd = fac @ np.asarray(res.modes[0])[: res.n_modes]
        err = np.linalg.norm(u_pgd - u_ref) / np.linalg.norm(u_ref)
        print("vademecum rel err:", err, "modes:", res.n_modes)
        assert err < 1e-6


class TestScannedStep:
    def test_scan_matches_unrolled(self):
        # the lax.scan-over-parameter-dims variant must reproduce the
        # unrolled Gauss-Seidel sweep exactly (prefix-new/suffix-old trick)
        sep, Vs = parametric_elliptic(n_x=48, n_p=12, num_params=3)
        a = SeparatedPGD(
            sep, n_max=6, tol=1e-13, tol_fp=1e-8, residual_check=False
        ).solve()
        b = SeparatedPGD(
            sep, n_max=6, tol=1e-13, tol_fp=1e-8, scan_params=True
        ).solve()
        # rtol 1e-9: the prefix/suffix product reassociates f64 round-off
        # (measured ~1e-10 with diagonal collocation parameter operators)
        np.testing.assert_allclose(a.amplitudes, b.amplitudes, rtol=1e-9)
        for d in range(4):
            np.testing.assert_allclose(
                np.asarray(a.modes[d]), np.asarray(b.modes[d]), rtol=1e-8, atol=1e-12
            )

    def test_scan_fused(self):
        sep, Vs = parametric_elliptic(n_x=32, n_p=8, num_params=2)
        s = SeparatedPGD(sep, n_max=5, tol=1e-13, tol_fp=1e-8, scan_params=True)
        r1 = s.solve()
        r2 = s.solve_fused()
        np.testing.assert_allclose(r1.amplitudes, r2.amplitudes, rtol=1e-12)


class TestDeltaStop:
    def test_delta_stop_matches_compat(self):
        # 'delta' fp stop parity between the fast path and the
        # reference-semantics orchestration layer
        sep, Vs = elastic_truss(n_x=40, n_E=30)
        fast = SeparatedPGD(
            sep, n_max=5, tol=1e-12, tol_fp=1e-9, stop_fp="delta"
        ).solve()
        compat = pgd_problem_from_separated(sep, Vs)
        compat.PGD_nmax = 5
        compat.tol_fp_it = 1e-9
        compat.stop_fp = "delta"
        compat.solve_PGD(_problem="linear")
        n = min(fast.n_modes, len(compat.amplitude))
        np.testing.assert_allclose(
            fast.amplitudes[:n], np.asarray(compat.amplitude)[:n], rtol=1e-8
        )


class TestFpInitAndStallRetry:
    def test_randomized_init_same_leading_modes(self):
        # reference fp_init='randomized' (solver.py get_Fsinit): a different
        # fixed-point init may pick a slightly different greedy sequence,
        # but the dominant amplitudes must agree
        from pgdrome_tpu.models.problems import parametric_elliptic

        sep, Vs = parametric_elliptic(n_x=40, n_p=16, num_params=2)
        r1 = SeparatedPGD(sep, n_max=6, tol=1e-13, tol_fp=1e-9).solve()
        r2 = SeparatedPGD(
            sep, n_max=6, tol=1e-13, tol_fp=1e-9, fp_init="randomized"
        ).solve()
        np.testing.assert_allclose(
            r1.amplitudes[:4], r2.amplitudes[:4], rtol=1e-2
        )

    def test_callable_fp_init_same_leading_modes(self):
        # custom per-mode fixed-point seeds (high-dim corner capture:
        # an end-localized rank-1 target has ~(1/n_p)^(d-1) overlap with
        # the ones init, so corner stages must be seeded — PERF.md
        # round-3 frontier): fn(mode, sizes) -> per-dim vectors.  On a
        # benign problem the seeding must not change the dominant modes.
        from pgdrome_tpu.models.problems import parametric_elliptic

        sep, Vs = parametric_elliptic(n_x=40, n_p=16, num_params=2)
        calls = []

        def init(n, sizes):
            calls.append(n)
            rng = np.random.default_rng(1000 + n)
            return tuple(
                rng.uniform(0.5, 1.0, size=s) for s in sizes
            )

        r1 = SeparatedPGD(sep, n_max=6, tol=1e-13, tol_fp=1e-9).solve()
        r2 = SeparatedPGD(
            sep, n_max=6, tol=1e-13, tol_fp=1e-9, fp_init=init
        ).solve()
        assert calls == list(range(6))  # seeded every mode
        np.testing.assert_allclose(
            r1.amplitudes[:4], r2.amplitudes[:4], rtol=1e-2
        )

    def test_structural_stall_not_hidden_by_retries(self):
        # greedy Galerkin on the non-symmetric moving-source operator stalls
        # structurally at mode 4 (randomized retries also collapse); the
        # solver must stop and report rather than store a garbage mode
        from pgdrome_tpu.models.problems import moving_heat_source

        sep, Vs, factors, sep_err = moving_heat_source(
            n_x=40, n_t=24, n_P=5, n_v=6, af=0.15, source_rank=15
        )
        r0 = SeparatedPGD(sep, n_max=12, tol=0.0, tol_fp=1e-7).solve()
        r2 = SeparatedPGD(
            sep, n_max=12, tol=0.0, tol_fp=1e-7, stall_retries=2
        ).solve()
        assert r0.n_modes <= 12 and r2.n_modes <= 12
        assert np.all(np.isfinite(np.asarray(r2.amplitudes)))
        # retries may legitimately recover extra modes, never lose any
        assert r2.n_modes >= r0.n_modes

    def test_unknown_solver_rejected(self):
        # a typo'd solver name must raise, not silently fall back to LU
        from pgdrome_tpu.models.problems import parametric_elliptic

        sep, Vs = parametric_elliptic(n_x=10, n_p=6, num_params=2)
        with np.testing.assert_raises(ValueError):
            SeparatedPGD(sep, n_max=2, solver="cholesky")


class TestCompression:
    def test_compressed_rank_beats_greedy_rank(self):
        # rank-R compression of a rank-K>R greedy solve must be at least as
        # accurate as the greedy rank-R solve (it is the span-optimal rank-R)
        from pgdrome_tpu.models.problems import parametric_elliptic
        from pgdrome_tpu.separated import (
            compress_modes,
            galerkin_update,
            evaluate_modes_1d,
        )
        from pgdrome_tpu.fem.assembly import stiffness_matrix, load_vector
        from pgdrome_tpu.fem.bc import DirichletBC

        sep, Vs = parametric_elliptic(n_x=128, n_p=32, num_params=3)
        res20 = SeparatedPGD(sep, n_max=20, tol=0.0, tol_fp=1e-9).solve()
        res12 = galerkin_update(
            sep, SeparatedPGD(sep, n_max=12, tol=0.0, tol_fp=1e-9).solve()
        )
        cmp12 = compress_modes(galerkin_update(sep, res20), sep.mass, 12)
        assert cmp12.n_modes == 12

        def err(res, p=(0.85, 0.85, 0.85)):
            kappa = lambda x: 1.0 + sum(
                p[i] * np.sin((i + 1) * np.pi * x) ** 2 / 6 for i in range(3)
            )
            K = stiffness_matrix(Vs[0], weight=kappa)
            b = load_vector(Vs[0], lambda x: np.ones_like(x))
            bc = DirichletBC(Vs[0], 0.0, lambda x, onb: onb)
            A2, b2 = bc.apply_system(K, b)
            u_ref = np.linalg.solve(A2, b2)
            fac = np.ones(res.n_modes)
            for j, pj in enumerate(p):
                vals = np.asarray(
                    evaluate_modes_1d(
                        Vs[1 + j], res.modes[1 + j], np.asarray([pj]), xp=np
                    )
                )[0]
                fac *= vals[: res.n_modes]
            u = fac @ np.asarray(res.modes[0])[: res.n_modes]
            return np.linalg.norm(u - u_ref) / np.linalg.norm(u_ref)

        e_greedy, e_cmp = err(res12), err(cmp12)
        print("greedy12:", e_greedy, "compressed12:", e_cmp)
        assert e_cmp <= e_greedy * 1.05  # at least as good (measured ~1.7x better)

    def test_invalid_target_rank(self):
        from pgdrome_tpu.models.problems import parametric_elliptic
        from pgdrome_tpu.separated import compress_modes

        sep, Vs = parametric_elliptic(n_x=16, n_p=8, num_params=2)
        res = SeparatedPGD(sep, n_max=4, tol=0.0, tol_fp=1e-8).solve()
        with np.testing.assert_raises(ValueError):
            compress_modes(res, sep.mass, res.n_modes + 1)


class TestFusedBudgetCache:
    def test_solve_fused_rekeys_on_n_enrich(self):
        # the jitted fused program bakes in the fori_loop bound; a second
        # call with a different n_enrich must rebuild, not silently reuse
        from pgdrome_tpu.models.problems import parametric_elliptic

        sep, _ = parametric_elliptic(n_x=24, n_p=8, num_params=2)
        s = SeparatedPGD(sep, n_max=8, tol=0.0, tol_fp=1e-8, residual_check=False)
        r3 = s.solve_fused(n_enrich=3)
        r6 = s.solve_fused(n_enrich=6)
        assert r3.n_modes == 3
        assert r6.n_modes == 6
        np.testing.assert_allclose(
            np.asarray(r6.amplitudes)[:3], np.asarray(r3.amplitudes), rtol=1e-12
        )


class TestNormModes:
    """All three reference normalizations (solver.py:404-470) on the fast
    path: they redistribute scale across factors but represent the same
    rank-1 function, so amplitudes and reconstructions must agree."""

    def _solve(self, norm_modes, scan=False):
        from pgdrome_tpu.models.problems import parametric_elliptic

        sep, Vs = parametric_elliptic(n_x=24, n_p=8, num_params=2)
        s = SeparatedPGD(
            sep, n_max=5, tol=1e-14, tol_fp=1e-9, residual_check=False,
            norm_modes=norm_modes, scan_params=scan,
        )
        return s.solve(), Vs

    def _tensor(self, res):
        # full rank-1 sum over small grids: normalization-invariant
        out = 0.0
        K = res.n_modes
        m = [np.asarray(mm)[:K] for mm in res.modes]
        return np.einsum("ki,kj,kl->ijl", m[0], m[1], m[2])

    def test_all_modes_same_function(self):
        res_stiff, _ = self._solve("stiff")
        res_l2, _ = self._solve("l2")
        res_no, _ = self._solve("no")
        t0 = self._tensor(res_stiff)
        np.testing.assert_allclose(self._tensor(res_l2), t0, rtol=1e-8)
        np.testing.assert_allclose(self._tensor(res_no), t0, rtol=1e-8)
        # amplitudes identical (normU is normalization-independent)
        np.testing.assert_allclose(res_l2.amplitudes, res_stiff.amplitudes, rtol=1e-8)
        np.testing.assert_allclose(res_no.amplitudes, res_stiff.amplitudes, rtol=1e-8)

    def test_l2_equidistributes_norms(self):
        res, _ = self._solve("l2")
        # per-dim M-norms of each stored mode must be (nearly) equal
        from pgdrome_tpu.models.problems import parametric_elliptic

        sep, _ = parametric_elliptic(n_x=24, n_p=8, num_params=2)
        M = [np.asarray(m) for m in sep.mass]
        for k in range(res.n_modes):
            norms = [
                float(np.sqrt(np.asarray(res.modes[d])[k] @ M[d] @ np.asarray(res.modes[d])[k]))
                for d in range(3)
            ]
            np.testing.assert_allclose(norms, norms[0], rtol=1e-6)

    def test_alpha_semantics(self):
        res_no, _ = self._solve("no")
        np.testing.assert_allclose(np.asarray(res_no.alpha), 1.0, rtol=1e-12)
        res_l2, _ = self._solve("l2")
        np.testing.assert_allclose(
            np.asarray(res_l2.alpha),
            np.asarray(res_l2.amplitudes) * res_l2.normU0,
            rtol=1e-6,
        )

    def test_scanned_step_norm_modes(self):
        for nm in ("l2", "no"):
            r_unrolled, _ = self._solve(nm, scan=False)
            r_scan, _ = self._solve(nm, scan=True)
            n = min(r_unrolled.n_modes, r_scan.n_modes)
            np.testing.assert_allclose(
                r_scan.amplitudes[:n], r_unrolled.amplitudes[:n], rtol=1e-7
            )

    def test_unknown_norm_modes_rejected(self):
        from pgdrome_tpu.models.problems import parametric_elliptic

        sep, _ = parametric_elliptic(n_x=16, n_p=4, num_params=2)
        with pytest.raises(ValueError):
            SeparatedPGD(sep, norm_modes="energy")


class TestTwoStageResidual:
    """residual_problem + combine_results: the two-stage refinement that
    restarts the f32 amplitude floor at the residual's scale."""

    def _setup(self):
        from pgdrome_tpu.models.problems import parametric_elliptic

        sep, Vs = parametric_elliptic(n_x=24, n_p=8, num_params=2)
        return sep, Vs

    def test_residual_scale_shrinks_with_rank(self):
        from pgdrome_tpu.separated import residual_problem

        sep, _ = self._setup()
        s_prev = None
        for n in (2, 6, 12):
            res = SeparatedPGD(sep, n_max=n, tol=0.0, residual_check=False,
                               tol_fp=1e-10).solve()
            _, s = residual_problem(sep, res)
            if s_prev is not None:
                assert s < s_prev
            s_prev = s

    def test_two_stage_reduces_error(self):
        from pgdrome_tpu.separated import (
            residual_problem,
            combine_results,
            galerkin_update,
        )

        sep, _ = self._setup()
        base = SeparatedPGD(sep, n_max=4, tol=0.0, residual_check=False,
                            tol_fp=1e-10).solve()
        sep_res, s = residual_problem(sep, base)
        assert sep_res.num_rhs == sep.num_rhs + sep.num_terms * base.n_modes
        delta = SeparatedPGD(sep_res, n_max=6, tol=0.0, residual_check=False,
                             tol_fp=1e-10).solve()
        combined = combine_results(base, delta, s)
        assert combined.n_modes == base.n_modes + delta.n_modes

        # residual norm of the combined solution must be far below base's
        _, s_base = residual_problem(sep, base)
        _, s_comb = residual_problem(sep, combined)
        assert s_comb < 0.05 * s_base

    def test_exactly_solved_residual_is_zero(self):
        from pgdrome_tpu.separated import residual_problem

        # single-mode problem solved to convergence: residual ~ 0
        from pgdrome_tpu.models.problems import poisson_xy

        sep, _ = poisson_xy(n_x=12, n_y=12)
        res = SeparatedPGD(sep, n_max=3, tol=1e-13, tol_fp=1e-12).solve()
        _, s = residual_problem(sep, res)
        base_scale = float(np.sqrt((np.asarray(sep.rhs[0]) ** 2).sum()))
        assert s < 1e-8 * max(base_scale, 1.0)


class TestCompressRhs:
    def test_rhs_compression_preserves_solution(self):
        from pgdrome_tpu.models.problems import parametric_elliptic
        from pgdrome_tpu.separated import compress_rhs, residual_problem

        sep, _ = parametric_elliptic(n_x=24, n_p=8, num_params=2)
        base = SeparatedPGD(sep, n_max=6, tol=0.0, residual_check=False,
                            tol_fp=1e-10).solve()
        sep_res, s = residual_problem(sep, base)
        assert sep_res.num_rhs > 8
        sep_c = compress_rhs(sep_res, 8)
        assert sep_c.num_rhs == 8
        # the compressed rhs must represent the same residual tensor: its
        # separated norm matches the uncompressed one
        _, s_full = residual_problem(sep, base)

        def rhs_norm(sp):
            G = np.ones((sp.num_rhs,) * 2)
            for d in range(sp.num_dims):
                r = np.asarray(sp.rhs[d], dtype=np.float64)
                G = G * (r @ r.T)
            return float(np.sqrt(max(G.sum(), 0.0)))

        nf, nc = rhs_norm(sep_res), rhs_norm(sep_c)
        # CP-ALS at rank 8 captures the residual tensor to ~1e-3 here;
        # higher rank must strictly improve the captured norm
        np.testing.assert_allclose(nc, nf, rtol=2e-2)
        sep_c16 = compress_rhs(sep_res, 16)
        assert abs(rhs_norm(sep_c16) - nf) <= abs(nc - nf)

    def test_rank_ge_R_is_identity(self):
        from pgdrome_tpu.models.problems import parametric_elliptic
        from pgdrome_tpu.separated import compress_rhs

        sep, _ = parametric_elliptic(n_x=16, n_p=4, num_params=2)
        assert compress_rhs(sep, 5) is sep


class TestRhsF64:
    """Mixed-precision stage solves: the rhs stack + load contraction in
    f64 while everything else runs f32 (the residual-cascade f32 floor
    fix, PERF.md round-3)."""

    def test_cancelling_rhs_recovers_f64_accuracy(self):
        # engineered cancellation: rhs rows of magnitude C cancel to the
        # O(1) load g.  f32 contraction noise scales ~C*eps_f32; rhs_f64
        # resolves the cancellation exactly.
        from pgdrome_tpu.models.problems import parametric_elliptic
        from pgdrome_tpu.separated import precondition_dim0

        sep, _ = parametric_elliptic(n_x=32, n_p=8, num_params=1)
        # precondition as the real pipeline does, so the f32 per-dim
        # solve (cond O(1)) does not mask the contraction comparison
        sep_pc, _tf = precondition_dim0(sep, dtype=np.float64)
        C = 3.0e5
        g0 = np.asarray(sep_pc.rhs[0], dtype=np.float64)
        g1 = np.asarray(sep_pc.rhs[1], dtype=np.float64)
        # stack [(1+C) g; -C g] == g exactly (each dim-1 row identical)
        rhs0 = np.concatenate([(1.0 + C) * g0, -C * g0], axis=0)
        rhs1 = np.concatenate([g1, g1], axis=0)
        sep_c = SeparatedProblem(
            ops=list(sep_pc.ops), rhs=[rhs0, rhs1], mass=list(sep_pc.mass),
            bc_dofs=list(sep_pc.bc_dofs),
        )
        kw = dict(n_max=4, tol=0.0, tol_fp=1e-7, max_fp_it=40,
                  residual_check=False)
        ref = SeparatedPGD(sep_pc, dtype=np.float64, **kw).solve_fused()
        mixed = SeparatedPGD(sep_c, dtype=np.float32, rhs_f64=True,
                             **kw).solve_fused()
        plain = SeparatedPGD(sep_c, dtype=np.float32, **kw).solve_fused()

        def tensor(res):
            K = res.n_modes
            return np.einsum(
                "ki,kj->ij",
                np.asarray(res.modes[0], dtype=np.float64)[:K],
                np.asarray(res.modes[1], dtype=np.float64)[:K],
            )

        t_ref = tensor(ref)
        scale = np.abs(t_ref).max()
        err_mixed = np.abs(tensor(mixed) - t_ref).max() / scale
        err_plain = np.abs(tensor(plain) - t_ref).max() / scale
        # mixed must reach f32-roundoff-of-the-solution accuracy
        # (measured 1.7e-7); the plain f32 contraction carries the C*eps
        # cancellation noise (measured 3.2e-2 ≈ 3e5 * 1e-7)
        assert err_mixed < 2e-6, err_mixed
        assert err_plain > 100 * err_mixed, (err_plain, err_mixed)

    def test_matches_plain_when_rhs_benign(self):
        # no cancellation: rhs_f64 and plain f32 agree to f32 accuracy
        from pgdrome_tpu.models.problems import parametric_elliptic

        sep, _ = parametric_elliptic(n_x=24, n_p=8, num_params=2)
        kw = dict(n_max=3, tol=0.0, tol_fp=1e-6, max_fp_it=30,
                  residual_check=False, dtype=np.float32)
        a = SeparatedPGD(sep, rhs_f64=True, **kw).solve_fused()
        b = SeparatedPGD(sep, **kw).solve_fused()
        np.testing.assert_allclose(
            np.asarray(a.amplitudes), np.asarray(b.amplitudes), rtol=2e-4
        )

    def test_scan_params_rejected(self):
        from pgdrome_tpu.models.problems import parametric_elliptic

        sep, _ = parametric_elliptic(n_x=16, n_p=6, num_params=2)
        with pytest.raises(ValueError, match="rhs_f64"):
            SeparatedPGD(sep, rhs_f64=True, scan_params=True)
