"""Transient workflow end to end: verified solve + space-time serving.

A moving heat source on a 1D bar — T(x, t; P, v) over source power P and
velocity v (models.problems.moving_heat_source, BASELINE.json config 5):

1. solve to a VERIFIED error bound with recipes.adaptive_minres (the
   f32-stable minimal-residual restart cascade; Galerkin enrichment has
   no minimization principle on the upwind time operator), verifying
   every stage against a per-sample SPARSE space-time FOM
   (models.problems.transient_dense_verifier — true-source by default,
   so the reported error includes the source-separation truncation);
2. deploy with serving.TransientVademecum: batched space-time field
   sweeps, virtual (x, t) gauges swept over (P, v) batches, parameter
   sensitivities, and a single-file snapshot.

Run: python examples/transient_serving.py      (CPU or TPU; ~2 min CPU)
"""

import sys
import pathlib

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import os

import jax

if not os.environ.get("PGDROME_EXAMPLE_TPU"):
    jax.config.update("jax_platforms", "cpu")  # TPU opt-in via env

import numpy as np

import pgdrome_tpu.config as cfg

cfg.use_full_f32_matmul()

from pgdrome_tpu.models.problems import (  # noqa: E402
    moving_heat_source,
    transient_dense_verifier,
)
from pgdrome_tpu.recipes import adaptive_minres  # noqa: E402
from pgdrome_tpu.serving import TransientVademecum  # noqa: E402


def main():
    # -- problem: finer source separation than the solver tolerance so the
    #    true-source bound is reachable (the separation floor is the
    #    honest limit — raise source_rank/separation_tol to push it)
    sep, Vs, factors, sep_err = moving_heat_source(
        n_x=60, n_t=40, n_P=8, n_v=10, af=0.12, source_rank=32
    )
    print(f"source separation floor: {sep_err:.2e}")

    # -- 1. solve until the verified bound clears
    verify = transient_dense_verifier(sep, Vs, factors, af=0.12,
                                      n_random=4, seeds=(7,))
    bound = max(5 * sep_err, 2e-3)
    res, history = adaptive_minres(
        sep, verify, bound=bound, n_stage1=16, stage_budget=10,
        max_stages=6, dtype=np.float32, log=print,
    )
    print(f"verified max error {history[-1]['max']:.2e} at rank "
          f"{res.n_modes} ({len(history)} stages, bound {bound:.1e})")

    # -- 2. deploy: the field dims (x, t) kron-flatten once; everything
    #    else is the standard Vademecum machinery
    vd = TransientVademecum(Vs, res)
    P_grid = Vs[2].tabulate_dof_coordinates()[:, 0]
    v_grid = Vs[3].tabulate_dof_coordinates()[:, 0]
    rng = np.random.default_rng(0)
    samples = np.stack(
        [rng.uniform(P_grid[0], P_grid[-1], size=512),
         rng.uniform(v_grid[0], v_grid[-1], size=512)], axis=1
    )

    fields = np.asarray(vd.fields(samples))  # (512, n_x*n_t)
    T = fields.reshape(len(samples), *vd.field_shape)
    print(f"field sweep: {T.shape} space-time fields, "
          f"peak T {T.max():.3f}")

    # virtual gauges: two (x, t) probes swept over the parameter batch
    x_grid = Vs[0].tabulate_dof_coordinates()[:, 0]
    t_grid = Vs[1].tabulate_dof_coordinates()[:, 0]
    gauges = np.array([[x_grid[30], t_grid[20]],
                       [x_grid[45], t_grid[-1]]])
    resp = np.asarray(vd.sensors(gauges)(samples))
    print(f"gauge sweep: {resp.shape}, gauge-0 range "
          f"[{resp[:, 0].min():.3f}, {resp[:, 0].max():.3f}]")

    # parameter sensitivities at the gauges (analytic, no FD)
    jac = np.asarray(vd.sensors_jacobian(gauges)(samples[:8]))
    print(f"dT/d(P, v) at gauge 0, sample 0: {jac[0, 0]}")

    # inverse problem: recover the hidden (P, v) from gauge readings —
    # batched multi-start Gauss–Newton with the analytic Jacobian; the
    # linearized posterior covariance quantifies identifiability
    gauges4 = np.array([[x_grid[20], t_grid[10]],
                        [x_grid[30], t_grid[20]],
                        [x_grid[45], t_grid[30]],
                        [x_grid[50], t_grid[-1]]])
    hidden = np.array([[0.4 * P_grid[0] + 0.6 * P_grid[-1],
                        0.7 * v_grid[0] + 0.3 * v_grid[-1]]],
                      dtype=np.float32)
    readings = np.asarray(vd.sensors(gauges4)(hidden))
    readings = readings + rng.normal(0, 1e-4, readings.shape)  # noise
    p_hat, rnorm, cov = vd.fit_parameters(
        gauges4, readings, return_covariance=True
    )
    err = np.abs(p_hat - hidden).max()
    print(f"gauge calibration: recovered (P, v) = "
          f"{p_hat[0].round(5).tolist()} (hidden "
          f"{hidden[0].round(5).tolist()}), max |Δ| {err:.1e}, "
          f"posterior std {np.sqrt(np.diag(cov[0])).round(6).tolist()}")
    assert err < 1e-2  # f32 serving dtype + 1e-4 gauge noise

    # -- exact sensor outputs, no vademecum involved: this family's
    #    operator is parameter-free, so s(p) = zᵀb(p) EXACTLY after one
    #    backward space-time adjoint solve per sensor
    #    (dual.rhs_parametric_qoi; error = the separation floor only)
    from pgdrome_tpu.dual import rhs_parametric_qoi

    qoi = rhs_parametric_qoi(sep, Vs, [(0.55, 0.8)])
    s_closed = qoi(samples[:4].astype(np.float64))[:, 0]
    s_vd = np.asarray(vd.sensors(np.array([[0.55, 0.8]]))(samples[:4]))[:, 0]
    print(f"closed-form vs vademecum sensors: max |Δ| "
          f"{np.abs(s_closed - s_vd).max():.2e} (vademecum carries the "
          f"solver floor; the closed form only the separation floor)")

    # single-file snapshot; reload redoes the flatten
    import tempfile, os
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "transient_vademecum.h5")
        vd.save(path)
        back = TransientVademecum.load(path, Vs)
        drift = np.abs(np.asarray(back.fields(samples[:4]))
                       - fields[:4]).max()
        print(f"snapshot round trip: {os.path.getsize(path)//1024} KB, "
              f"max drift {drift:.1e}")


if __name__ == "__main__":
    main()
