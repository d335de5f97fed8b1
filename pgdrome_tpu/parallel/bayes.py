"""Bayesian posterior sampling over a served vademecum.

The forward model of a calibration problem — parameters → sensor
responses — is exactly the vademecum sensor sweep, so a full MCMC
posterior (not just the linearized Gauss–Newton covariance of
``Vademecum.fit_parameters``) costs one batched table contraction per
step for ALL chains at once: the likelihood of C chains is a single
(C, n_modes) × (n_modes, n_out) matmul.  The whole sampler — proposal,
likelihood, accept/reject — is ONE compiled ``lax.scan`` program; chains
ride the batch axis (MXU-friendly), and the observation, noise level,
proposal shape/scale and RNG key are runtime INPUTS, so step-size
adaptation and new datasets reuse the same executable.

The reference has no inverse/Bayesian capability at all; the nearest
workflow it supports is per-sample scipy over ``evaluate()`` calls, at
~1e4 FOM-free evaluations per second vs the sweep's ~1e7+.

This module is deliberately separate from ``parallel.vademecum``: that
module's persisted-AOT keys embed ITS source hash, so adding code there
would invalidate every cached serving executable.  The small
factor-product/table contraction is restated here (same math as
``make_sensor_sweep_fn``; parity is asserted in
tests/unit/test_bayes.py) and keyed by THIS module's hash.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from pgdrome_tpu.separated import evaluate_modes_1d, _PREC

_CODE_FP = None


def _code_fingerprint():
    """sha256 of the builder sources whose edits must invalidate
    persisted MCMC executables (this module + evaluate_modes_1d's)."""
    global _CODE_FP
    if _CODE_FP is None:
        import hashlib

        import pgdrome_tpu.separated as sp

        h = hashlib.sha256()
        for mod in (__file__, sp.__file__):
            with open(mod, "rb") as f:
                h.update(f.read())
        _CODE_FP = h.hexdigest()[:16]
    return _CODE_FP


def make_mcmc_fn(spaces, modes, n_modes, points, table=None,
                 n_steps=500, prior=None, mesh=None):
    """Build the jitted batched random-walk Metropolis kernel:

        mcmc(obs (n_out,), sigma (n_out,), p0 (C, d_p),
             chol (d_p, d_p), scale (), key)
            → (chain (n_steps, C, d_p), n_accept (C,))

    Log-posterior:  −½ ‖(sensor(p) − obs)/σ‖²  [− ½ ‖Γ(p − p_prior)‖²]
    with a UNIFORM box prior on the factor meshes' bounds always
    enforced by rejection (clipping proposals would bias the chain;
    outside the box the factor interpolants extrapolate garbage anyway).
    ``prior=(p_prior, gamma)`` adds an independent Gaussian with
    γ_j = 1/σ_prior,j — the SAME convention as ``make_fit_fn``, whose
    regularized objective is exactly −2·log posterior, so the MAP the
    fit returns is the mode of the density sampled here.

    Proposal: p + scale · (ε @ cholᵀ), ε ~ N(0, I) — ``chol`` carries
    the posterior SHAPE (e.g. the Cholesky factor of the linearized
    covariance from ``fit_parameters``), ``scale`` the global step size
    tuned to the 0.2–0.4 acceptance window.  ``chain[t]`` records the
    post-accept state at step t (chain[-1] is the live state — feed it
    back as p0 to continue).  All chains share one (obs, sigma); race
    independent observations via separate calls or vmap at the caller.

    ``mesh``: optional device mesh with a 'dp' axis — the CHAIN axis is
    then sharded across it (chains are independent: the partitioned
    sampler runs collective-free, asserted in
    tests/unit/test_multichip_paths.py).  Sharded mode bypasses the
    persistent AOT cache (loaded executables are single-device).
    """
    from pgdrome_tpu.fem.interpolate import eval_dofs_at_points
    from pgdrome_tpu.utils.aot_cache import aot_jit, array_fingerprint

    nd = len(spaces)
    d_p = nd - 1
    modes0 = np.asarray(modes[0])
    n_max = modes0.shape[0]
    pts = np.asarray(points)
    if table is None:
        table = np.stack(
            [np.asarray(eval_dofs_at_points(spaces[0], modes0[k], pts))
             for k in range(n_max)]
        ).reshape(n_max, -1).astype(modes0.dtype)
        table_extra = ()
    else:
        table = np.asarray(table, dtype=modes0.dtype).reshape(n_max, -1)
        # caller-built tables (TransientVademecum) are not a pure
        # function of the keyed spaces/modes/points — key them
        table_extra = ("tbl", array_fingerprint(table))
    if prior is not None:
        p_prior, gamma = prior
        p_prior = np.asarray(p_prior, dtype=modes0.dtype).reshape(-1)
        if p_prior.shape[0] != d_p:
            raise ValueError(f"p_prior must be ({d_p},)")
        gamma2 = np.broadcast_to(
            np.asarray(gamma, dtype=modes0.dtype) ** 2, (d_p,)
        ).copy()
        pp_j, g2_j = jnp.asarray(p_prior), jnp.asarray(gamma2)
    key_data = [
        "bayes_v1", _code_fingerprint(),
        tuple((s.degree, s.value_size) for s in spaces),
        array_fingerprint(*[s.mesh().coordinates() for s in spaces]),
        int(n_modes), array_fingerprint(*modes),
        pts.tobytes(), pts.shape, int(n_steps),
        (p_prior.tobytes() + gamma2.tobytes() if prior is not None
         else b""),
        *table_extra,
    ]
    mode_mask = (np.arange(n_max) < n_modes).astype(modes0.dtype)
    k_pad = (-n_max) % 128 if n_max < 128 else 0
    table_mm = jnp.asarray(
        np.pad(table, ((0, k_pad), (0, 0))) if k_pad else table
    )
    mask = jnp.asarray(mode_mask)
    lo = jnp.asarray([float(s.mesh().coordinates().min())
                      for s in spaces[1:]], dtype=modes0.dtype)
    hi = jnp.asarray([float(s.mesh().coordinates().max())
                      for s in spaces[1:]], dtype=modes0.dtype)

    def _response(p):  # (C, d_p) → (C, n_out)
        fac = mask[None, :]
        for j in range(1, nd):
            fac = fac * evaluate_modes_1d(spaces[j], modes[j], p[:, j - 1])
        if k_pad:
            fac = jnp.pad(fac, ((0, 0), (0, k_pad)))
        return jnp.einsum("bk,kp->bp", fac, table_mm, precision=_PREC)

    def _logpost(p, obs, inv_sigma):
        r = (_response(p) - obs[None, :]) * inv_sigma[None, :]
        lp = -0.5 * jnp.sum(r * r, axis=-1)
        if prior is not None:
            lp = lp - 0.5 * jnp.sum(
                g2_j[None, :] * (p - pp_j[None, :]) ** 2, axis=-1
            )
        inside = jnp.all((p >= lo[None, :]) & (p <= hi[None, :]), axis=-1)
        return jnp.where(inside, lp, -jnp.inf)

    def mcmc(obs, sigma, p0, chol, scale, key):
        inv_sigma = 1.0 / sigma
        lp0 = _logpost(p0, obs, inv_sigma)

        def step(carry, k):
            p, lp, n_acc = carry
            k1, k2 = jax.random.split(k)
            eps = jax.random.normal(k1, p.shape, p.dtype)
            prop = p + scale * (eps @ chol.T)
            lp_prop = _logpost(prop, obs, inv_sigma)
            # accept iff log α > −Exp(1): exact Metropolis in log space
            # without a log(uniform) underflow at f32
            e = jax.random.exponential(k2, (p.shape[0],), p.dtype)
            acc = (lp_prop - lp) > -e
            p_new = jnp.where(acc[:, None], prop, p)
            lp_new = jnp.where(acc, lp_prop, lp)
            return (p_new, lp_new, n_acc + acc.astype(jnp.int32)), p_new

        keys = jax.random.split(key, n_steps)
        n_acc0 = jnp.zeros((p0.shape[0],), jnp.int32)
        (_, _, n_acc), chain = jax.lax.scan(step, (p0, lp0, n_acc0), keys)
        return chain, n_acc

    jitted = jax.jit(mcmc)
    if mesh is not None:
        from jax.sharding import NamedSharding
        from jax.sharding import PartitionSpec as P

        shard = NamedSharding(mesh, P("dp"))
        n_dev = mesh.size

        def sharded(obs, sigma, p0, chol, scale, key):
            p0 = np.asarray(p0)
            # pad the chain axis to a mesh multiple (device_put of a
            # non-divisible axis raises), slice the outputs back
            pad = (-len(p0)) % n_dev
            if pad:
                p0 = np.concatenate(
                    [p0, np.repeat(p0[-1:], pad, axis=0)])
            p0 = jax.device_put(jnp.asarray(p0), shard)
            chain, n_acc = jitted(obs, sigma, p0, chol, scale, key)
            if pad:
                chain, n_acc = chain[:, :-pad], n_acc[:-pad]
            return chain, n_acc

        sharded._jitted = jitted  # HLO inspection (parallel/hlo.py)
        return sharded
    return aot_jit(jitted, key_data)
