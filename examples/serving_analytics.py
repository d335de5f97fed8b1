"""Serving analytics on a trained vademecum: parameter sensitivities,
streaming UQ moment fields, and spatial-derivative serving.

Each of these is a batched path the reference (BAMresearch/PGDrome)
would run one sample at a time (model.py:724-860 evaluate loop,
1088-1206 per-sample derivative projection); here they are jitted batch
sweeps — on TPU the moment reduction measured 73 M samples/s at bench
scale (PERF.md "serving analytics").

Run: python examples/serving_analytics.py   (CPU works; forces the CPU
backend by default so the example is reproducible anywhere)
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax

if not os.environ.get("SERVING_ANALYTICS_TPU"):
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

import numpy as np
import jax.numpy as jnp

import pgdrome_tpu.config as cfg
from pgdrome_tpu.models.problems import parametric_elliptic
from pgdrome_tpu.separated import SeparatedPGD
from pgdrome_tpu.serving import Vademecum

cfg.use_full_f32_matmul()

# train a small 2-parameter surrogate (see vademecum_fast_path.py for the
# full-scale pipeline with preconditioning + floor restarts)
sep, spaces = parametric_elliptic(n_x=128, n_p=32, num_params=2)
res = SeparatedPGD(sep, n_max=12, tol=1e-12, tol_fp=1e-8).solve()
vd = Vademecum(spaces, res, dtype=res.modes[0].dtype)
print(f"trained: rank {vd.n_modes}, {vd.num_dims}-dim decomposition")

rng = np.random.default_rng(0)
samples = rng.uniform(0.1, 0.9, size=(10_000, 2))

# --- parameter sensitivities at sensor points (analytic, no FD) --------
pts = np.array([0.25, 0.5, 0.75])
J = np.asarray(vd.sensors_jacobian(pts)(jnp.asarray(samples)))
print(f"sensors_jacobian: {J.shape} = (batch, points, params); "
      f"mean |du/dp1| at x=0.5: {np.abs(J[:, 1, 0]).mean():.4f}")

# --- streaming UQ moment fields ----------------------------------------
# exact Monte-Carlo mean/variance of the FULL FIELD over the batch; only
# (K,) + (K, K) factor moments are reduced per chunk — the (B, n_dofs)
# field batch never materializes
mean, var = vd.moments(samples, chunk=4096)
i = int(np.argmax(var))
x = spaces[0].tabulate_dof_coordinates()[i, 0]
print(f"moments over {len(samples)} samples: max field std "
      f"{np.sqrt(var[i]):.5f} at x={x:.3f} (mean there {mean[i]:.5f})")

# cross-check on a small sub-batch
u = np.asarray(vd.fields(jnp.asarray(samples[:512])), np.float64)
m2, v2 = vd.moments(samples[:512], chunk=256)
assert np.allclose(m2, u.mean(axis=0), rtol=1e-6)
assert np.allclose(v2, u.var(axis=0), rtol=1e-4, atol=1e-12)

# --- spatial-derivative serving -----------------------------------------
# du/dx vademecum: dim-0 modes DG(deg-1)-projected once; every serving
# path (fields/sensors/streams/moments) then works on derivatives
dvd = vd.derivative()
flux_sensors = np.asarray(dvd.sensors(pts)(jnp.asarray(samples[:100])))
print(f"derivative vademecum: du/dx at {len(pts)} points for 100 samples "
      f"-> {flux_sensors.shape}; range [{flux_sensors.min():.3f}, "
      f"{flux_sensors.max():.3f}]")
dmean, dvar = dvd.moments(samples, chunk=4096)
print(f"du/dx moment fields: max flux std {np.sqrt(dvar.max()):.5f}")

# --- exact Sobol' sensitivity indices ------------------------------------
# closed-form through the separated structure (pgdrome_tpu.uq): no
# sampling, no FOM solves — per-dim FE mass-matrix moments + O(d² rank²)
# contractions.  points= gives per-sensor indices; no argument gives
# GENERALIZED indices of the whole field
sob = vd.sobol(points=pts)
for j in range(sob["first"].shape[0]):
    print(f"Sobol p{j + 1} at x={pts.tolist()}: "
          f"S={np.round(sob['first'][j], 3).tolist()} "
          f"ST={np.round(sob['total'][j], 3).tolist()}")
agg = vd.sobol()  # field-aggregated (variance under the spatial mass)
print(f"generalized indices: S={np.round(agg['first'], 3).tolist()}, "
      f"interaction share {1 - float(np.sum(agg['first'])):.4f}")
assert np.all(agg["total"] >= agg["first"] - 1e-12)

# --- parameter identification (inverse problem) ---------------------------
# calibrate parameters from observed sensor values: batched multi-start
# Gauss–Newton with the analytic rank-1 Jacobian, one compiled program
p_true = np.array([[0.31, 0.72], [0.66, 0.44]])
obs = np.asarray(vd.sensors(pts)(jnp.asarray(p_true)))
p_hat, resnorm = vd.fit_parameters(pts, obs, n_iter=40)
err = np.abs(p_hat - p_true).max()
print(f"fit_parameters: recovered {p_hat.round(6).tolist()} "
      f"(true {p_true.tolist()}), max |Δp| {err:.2e}, "
      f"residuals {resnorm.round(12).tolist()}")
# f64 CPU path recovers to roundoff; the TPU path serves f32 (~1e-3)
assert err < (5e-3 if os.environ.get("SERVING_ANALYTICS_TPU") else 1e-4)

# --- exact sensor covariance ---------------------------------------------
# closed-form mean + covariance MATRIX of the sensor responses under the
# parameter measure (uq.output_covariance) — the exact quantity moments()
# Monte-Carlo-estimates, with the cross terms (assimilation priors,
# sensor-redundancy screening)
cmean, ccov = vd.output_covariance(pts)
corr = ccov / np.sqrt(np.outer(np.diag(ccov), np.diag(ccov)))
print(f"output_covariance: sensor stds {np.sqrt(np.diag(ccov)).round(5).tolist()}, "
      f"corr(x=0.25, x=0.75) = {corr[0, 2]:.4f}")

# --- Bayesian calibration (full posterior, not just the MAP) --------------
# noisy observations of ONE true parameter point: sample the exact
# posterior with batched MCMC chains over the vademecum; R-hat/ESS
# diagnostics come back with the draws
p_star = np.array([0.58, 0.37])
y_clean = np.asarray(vd.sensors(pts)(jnp.asarray(p_star[None])))[0]
sigma = 0.01 * float(np.abs(y_clean).max())
y_obs = y_clean + rng.normal(0.0, sigma, y_clean.shape)
post = vd.sample_posterior(pts, y_obs, sigma, n_samples=1500,
                           n_chains=32, seed=4)
pm, ps = post["samples"].mean(0), post["samples"].std(0)
print(f"sample_posterior: mean {pm.round(4).tolist()} ± "
      f"{ps.round(4).tolist()} (true {p_star.tolist()}), "
      f"acceptance {post['acceptance']:.2f}, "
      f"R-hat {post['r_hat'].round(3).tolist()}, "
      f"min ESS {post['ess'].min():.0f}")
assert np.all(post["r_hat"] < 1.1)
assert np.all(np.abs(pm - p_star) < 5 * ps + 1e-3)
print("OK")
