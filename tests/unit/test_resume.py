"""Solver-state checkpoint/resume (extension over the reference, which
restarts interrupted solves from scratch — SURVEY.md §5)."""

import os
import tempfile

import numpy as np

from pgdrome_tpu.models.problems import parametric_elliptic, elastic_truss, pgd_problem_from_separated
from pgdrome_tpu.separated import SeparatedPGD
from pgdrome_tpu.io import save_result, load_result


class TestFastPathResume:
    def test_resume_matches_uninterrupted(self):
        sep, Vs = parametric_elliptic(n_x=40, n_p=10, num_params=2)
        full = SeparatedPGD(sep, n_max=8, tol=1e-12, tol_fp=1e-8).solve()
        part = SeparatedPGD(sep, n_max=4, tol=1e-12, tol_fp=1e-8).solve()
        cont = SeparatedPGD(sep, n_max=8, tol=1e-12, tol_fp=1e-8).solve(
            resume_from=part
        )
        np.testing.assert_allclose(full.amplitudes, cont.amplitudes, rtol=1e-8)

    def test_checkpoint_roundtrip(self):
        sep, Vs = parametric_elliptic(n_x=30, n_p=8, num_params=2)
        part = SeparatedPGD(sep, n_max=3, tol=1e-12, tol_fp=1e-8).solve()
        with tempfile.TemporaryDirectory() as d:
            path = os.path.join(d, "state.h5")
            save_result(part, path)
            loaded = load_result(path)
        assert loaded.n_modes == part.n_modes
        assert loaded.normU0 == part.normU0
        np.testing.assert_allclose(
            np.asarray(loaded.modes[0]), np.asarray(part.modes[0])
        )
        full = SeparatedPGD(sep, n_max=6, tol=1e-12, tol_fp=1e-8).solve()
        cont = SeparatedPGD(sep, n_max=6, tol=1e-12, tol_fp=1e-8).solve(
            resume_from=loaded
        )
        np.testing.assert_allclose(full.amplitudes, cont.amplitudes, rtol=1e-8)


class TestCompatResume:
    def test_solve_pgd_resume(self):
        sep, Vs = elastic_truss(n_x=50, n_E=40)
        full = pgd_problem_from_separated(sep, Vs)
        full.PGD_nmax = 6
        full.tol_fp_it = 1e-7
        full.solve_PGD(_problem="linear")

        part = pgd_problem_from_separated(sep, Vs)
        part.PGD_nmax = 3
        part.tol_fp_it = 1e-7
        part.solve_PGD(_problem="linear")
        part.PGD_nmax = 6
        part.solve_PGD(_problem="linear", resume=True)

        np.testing.assert_allclose(
            np.asarray(full.amplitude), np.asarray(part.amplitude), rtol=1e-9
        )


class TestConfigAndMetrics:
    def test_pgd_config(self):
        from pgdrome_tpu.utils.pgd_config import PGDConfig
        from pgdrome_tpu.models.problems import elastic_truss, pgd_problem_from_separated

        cfg = PGDConfig().with_(PGD_nmax=4, tol_fp_it=1e-7)
        sep, Vs = elastic_truss(n_x=30, n_E=20)
        prob = pgd_problem_from_separated(sep, Vs)
        cfg.apply(prob)
        assert prob.PGD_nmax == 4 and prob.tol_fp_it == 1e-7

        s = SeparatedPGD(sep, **cfg.separated_kwargs())
        r = s.solve()
        assert r.n_modes <= 4

    def test_metrics_collected(self):
        from pgdrome_tpu.models.problems import parametric_elliptic

        sep, _ = parametric_elliptic(n_x=30, n_p=8, num_params=2)
        s = SeparatedPGD(sep, n_max=3, tol=1e-12, tol_fp=1e-7)
        s.solve()
        summ = s.metrics.summary()
        assert summ["enrichments"] == 3
        assert summ["total_wall_s"] > 0
        assert summ["final_amplitude"] is not None
