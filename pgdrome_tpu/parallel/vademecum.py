"""Sharded vademecum sweeps: batched PGD evaluation over ICI.

The PGD "inference" workload is the parameter sweep: reconstruct
u(·; p₁..p_{d-1}) for a large batch of parameter samples.  The reference
does this one sample at a time through Python+dolfin point evaluation
(model.py:822-842, the SURVEY.md §3.3 hot loop); here the whole sweep is
one jitted program — per-dim mode evaluation is a shared-basis gather, the
mode products and the rank-1 reconstruction are einsums — with the sample
axis sharded over the device mesh ('dp', the honest data-parallel axis of
this workload, SURVEY.md §2.4).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from pgdrome_tpu.separated import evaluate_modes_1d, _PREC


_CODE_FP = None


def _code_fingerprint():
    """sha256 of the serving-program builder sources (this module +
    the Pallas kernels + evaluate_modes_1d's module): editing any of
    them MUST invalidate persisted serving executables — a stale hit
    silently serves the OLD program (caught live: the fused factor-
    moments rewrite hit the previous XLA program's cache entry)."""
    global _CODE_FP
    if _CODE_FP is None:
        import hashlib

        import pgdrome_tpu.ops.pallas_kernels as pk
        import pgdrome_tpu.separated as sp

        h = hashlib.sha256()
        for mod in (__file__, pk.__file__, sp.__file__):
            with open(mod, "rb") as f:
                h.update(f.read())
        _CODE_FP = h.hexdigest()[:16]
    return _CODE_FP


def _serving_key(kind, spaces, n_modes, arrays, extra=()):
    """Persistent-AOT key_data for an XLA-path serving program: these
    bake the mode tables (and the spaces' vertex arrays) in as jit
    constants, so the program identity is (builder code, kind, space
    meshes/degrees, mode bytes, knobs).  The fused path is keyed
    value-independently instead (its tables are jit inputs —
    _aot_wrap_fused)."""
    from pgdrome_tpu.utils.aot_cache import array_fingerprint

    return [
        "serving_v1", _code_fingerprint(), kind,
        tuple((s.degree, s.value_size) for s in spaces),
        array_fingerprint(*[s.mesh().coordinates() for s in spaces]),
        int(n_modes), array_fingerprint(*arrays), *extra,
    ]


def _aot_wrap_fused(fused):
    """Persist the fused sweep's VALUE-INDEPENDENT executable: the mode
    tables are jit inputs (pallas_kernels.make_fused_sweep), so the cache
    key is just the kernel identity + shapes — one persisted program
    serves every same-shaped vademecum across retrains."""
    from pgdrome_tpu.utils.aot_cache import aot_jit, default_cache_dir

    if default_cache_dir() is None:
        return fused
    jitted, consts, ident = fused._aot_parts
    inner = aot_jit(jitted, ["serving_v2", _code_fingerprint(), *ident])

    def call(samples):
        out = inner(samples, *consts)
        call.last_status = inner.last_status
        return out

    call.last_status = None
    return call


def _try_fused(spaces, dim0_modes, other_modes, n_modes, method, kind,
               out_dtype=None, aot=True):
    """Shared fused-kernel eligibility gate for the field and sensor
    sweeps: f64 modes are refused explicitly on method='fused' (the
    kernel is float32-only — silently serving f32 from an f64 vademecum
    would break the dtype contract), 'auto' takes the kernel on TPU when
    its constraints hold and quietly falls back to XLA otherwise.
    Returns the fused sweep (AOT-persisted when enabled) or None
    (→ caller's XLA path)."""
    if np.dtype(np.asarray(dim0_modes).dtype) == np.float64:
        if method == "fused":
            raise ValueError(
                f"fused {kind} kernel is float32-only; use method='xla' "
                "for float64 modes"
            )
        return None
    try:
        from pgdrome_tpu.ops.pallas_kernels import make_fused_sweep, _on_tpu

        if method == "fused" or _on_tpu():
            fused = make_fused_sweep(
                spaces,
                [jnp.asarray(dim0_modes)]
                + [jnp.asarray(m) for m in other_modes],
                n_modes, out_dtype=out_dtype,
            )
            return _aot_wrap_fused(fused) if aot else fused
    except ValueError:  # kernel constraints (grids/degree) not met
        if method == "fused":
            raise
    return None


def make_sweep_fn(spaces, modes, n_modes, method="xla", out_dtype=None,
                  aot=True):
    """Build the jitted sweep: samples (B, d-1) → fields (B, n0).

    spaces: per-dim function spaces (free dims 1..d-1 must be 1D scalar);
    modes: per-dim padded mode buffers (n_max, n_d).

    method: 'xla' (default — works everywhere, SPMD-partitionable, used
    by sharded_sweep), 'fused' (the Pallas kernel — single-chip, uniform
    P1/P2 parameter grids; bit-identical output, measured 2.7× the XLA
    rate at bench scale), or 'auto' (fused on TPU when its constraints
    hold, else xla).

    out_dtype: optional narrower OUTPUT dtype (e.g. jnp.bfloat16) —
    compute stays full precision, only the final store narrows (~4e-3
    relative quantization).  Halved output bytes double the streamable
    chunk, which is what lifts the pipelined field-serving rate to its
    compute margin on HBM-bound chips (serving.fields_stream).

    aot: route the jitted program through the persistent AOT-executable
    cache when $PGDROME_AOT_CACHE is set (fresh serving processes reload
    in ~1 s instead of re-paying the remote compile; utils/aot_cache).
    Single-device only — sharded_sweep passes aot=False."""
    from pgdrome_tpu.utils.aot_cache import aot_jit

    if method in ("fused", "auto"):
        fused = _try_fused(spaces, modes[0], modes[1:], n_modes, method,
                           "sweep", out_dtype=out_dtype, aot=aot)
        if fused is not None:
            return fused
        # 'auto' falls through to the XLA path
    key = _serving_key(
        "sweep", spaces, n_modes, modes,
        extra=(np.dtype(out_dtype).name if out_dtype else "-",),
    ) if aot else None
    nd = len(spaces)
    modes0 = jnp.asarray(modes[0])
    n_max = modes0.shape[0]
    mode_mask = (jnp.arange(n_max) < n_modes).astype(modes0.dtype)
    # pad the contraction axis up to the MXU-preferred 128: measured ~11%
    # faster on v5e at K=50 with bit-identical output (zero-padded modes
    # contribute exactly 0 through the masked factors)
    k_pad = (-n_max) % 128 if n_max < 128 else 0
    modes0_mm = jnp.pad(modes0, ((0, k_pad), (0, 0))) if k_pad else modes0

    def sweep(samples):
        fac = jnp.ones((samples.shape[0], n_max), dtype=modes0.dtype)
        for j in range(1, nd):
            vals = evaluate_modes_1d(spaces[j], modes[j], samples[:, j - 1])
            fac = fac * vals  # (B, n_max)
        fac = fac * mode_mask[None, :]
        if k_pad:
            fac = jnp.pad(fac, ((0, 0), (0, k_pad)))
        # pin true-f32 precision: TPU matmuls default to bf16 inputs
        out = jnp.einsum("bk,ki->bi", fac, modes0_mm, precision=_PREC)
        return out if out_dtype is None else out.astype(out_dtype)

    jitted = jax.jit(sweep)
    return aot_jit(jitted, key + ["xla"]) if aot else jitted


def make_sensor_sweep_fn(spaces, modes, n_modes, points, method="auto",
                         table=None):
    """Build the jitted sensor sweep: samples (B, d-1) → responses
    (B, n_pts) (or (B, n_pts·value_size) for vector space dims).

    The serving path for sensor/QoI sweeps: the fixed (space) dim's modes
    are pre-evaluated at the sensor points once — the batched analogue of
    the reference's eval_fixed_modes + evaluate_sensor_response
    (model.py:107-130, 862-953), which reconstructs one parameter sample
    at a time.  The whole sweep then collapses to the mode-product factors
    times an (n_max, n_pts) table, so the output write is n_pts/n0 of the
    full-field sweep.

    method: like :func:`make_sweep_fn` — 'auto' routes through the fused
    Pallas kernel on TPU with the point table standing in for the dim-0
    modes (the kernel's ragged edge tiles handle the narrow n_pts axis;
    the per-dim factor machinery, NOT the output write, dominates the XLA
    sensor sweep at large B — measured 3.5 M → fused ~field-sweep rate)."""
    from pgdrome_tpu.fem.interpolate import eval_dofs_at_points
    from pgdrome_tpu.utils.aot_cache import aot_jit

    nd = len(spaces)
    modes0 = np.asarray(modes[0])
    n_max = modes0.shape[0]
    pts = np.asarray(points)
    # (n_max, n_pts[, value_size]) fixed-mode table, flattened per point.
    # A caller-built table (TransientVademecum: product of space- and
    # time-mode values at (x, t) points) skips the dim-0 point eval —
    # the AOT key still covers it, since the table is a pure function of
    # the keyed points + modes.
    if table is None:
        table = np.stack(
            [np.asarray(eval_dofs_at_points(spaces[0], modes0[k], pts))
             for k in range(n_max)]
        ).reshape(n_max, -1).astype(modes0.dtype)
        table_extra = ()
    else:
        table = np.asarray(table, dtype=modes0.dtype).reshape(n_max, -1)
        # a caller-built table (TransientVademecum) is NOT a pure
        # function of the keyed spaces/modes/points — e.g. the field-dim
        # (time) mesh/degree shape it; fingerprint it into the key or a
        # stale persisted executable could serve wrong sensor values
        from pgdrome_tpu.utils.aot_cache import array_fingerprint

        table_extra = ("tbl", array_fingerprint(table))
    if method in ("fused", "auto"):
        fused = _try_fused(spaces, table, modes[1:], n_modes, method,
                           "sensor")
        if fused is not None:
            return fused
        # 'auto' falls through to the XLA path
    key = _serving_key(
        "sensor", spaces, n_modes, modes,
        extra=(pts.tobytes(), pts.shape, *table_extra),
    )
    mode_mask = (np.arange(n_max) < n_modes).astype(modes0.dtype)
    # MXU-preferred contraction width (see make_sweep_fn)
    k_pad = (-n_max) % 128 if n_max < 128 else 0
    table_mm = jnp.asarray(
        np.pad(table, ((0, k_pad), (0, 0))) if k_pad else table
    )
    mask = jnp.asarray(mode_mask)

    def sweep(samples):
        fac = jnp.ones((samples.shape[0], n_max), dtype=table_mm.dtype)
        for j in range(1, nd):
            vals = evaluate_modes_1d(spaces[j], modes[j], samples[:, j - 1])
            fac = fac * vals
        fac = fac * mask[None, :]
        if k_pad:
            fac = jnp.pad(fac, ((0, 0), (0, k_pad)))
        return jnp.einsum("bk,kp->bp", fac, table_mm, precision=_PREC)

    return aot_jit(jax.jit(sweep), key + ["xla"])


def make_sensor_jacobian_fn(spaces, modes, n_modes, points, table=None):
    """Build the jitted parameter-sensitivity sweep: samples (B, d-1) →
    Jacobian (B, n_pts·value_size, d-1) of the sensor responses w.r.t.
    the parameters.

    PGD gives ∂u/∂p_j analytically: the rank-1 structure turns the
    Jacobian into the same factor-product/table contraction as the sensor
    sweep with one factor differentiated per output column —
    ∂r_p/∂p_j = Σ_k table[k,p] · f'_{j,k}(p_j) · Π_{l≠j} f_{l,k}(p_l)
    (evaluate_modes_1d(derivative=True) supplies f').  The reference has
    no batched analogue: its sensitivity story is finite differences over
    per-sample evaluate calls (model.py:724-860).  Cost: (d-1) sensor-
    sweep matmuls per call — forward-mode efficiency without tracing
    jacfwd through the sweep (numerically identical a.e.; parity-tested
    against jax.jacfwd in tests/unit/test_serving_analytics.py)."""
    from pgdrome_tpu.fem.interpolate import eval_dofs_at_points
    from pgdrome_tpu.utils.aot_cache import aot_jit

    nd = len(spaces)
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
        # caller-built tables must be keyed — see make_sensor_sweep_fn
        from pgdrome_tpu.utils.aot_cache import array_fingerprint

        table_extra = ("tbl", array_fingerprint(table))
    key = _serving_key(
        "jacobian", spaces, n_modes, modes,
        extra=(pts.tobytes(), pts.shape, *table_extra),
    )
    mode_mask = (np.arange(n_max) < n_modes).astype(modes0.dtype)
    k_pad = (-n_max) % 128 if n_max < 128 else 0
    table_mm = jnp.asarray(
        np.pad(table, ((0, k_pad), (0, 0))) if k_pad else table
    )
    mask = jnp.asarray(mode_mask)

    def jac(samples):
        vals, dvals = [], []
        for j in range(1, nd):
            p_j = samples[:, j - 1]
            vals.append(evaluate_modes_1d(spaces[j], modes[j], p_j))
            dvals.append(
                evaluate_modes_1d(spaces[j], modes[j], p_j, derivative=True)
            )
        cols = []
        for j in range(nd - 1):
            fac = dvals[j]
            for l in range(nd - 1):
                if l != j:
                    fac = fac * vals[l]
            fac = fac * mask[None, :]
            if k_pad:
                fac = jnp.pad(fac, ((0, 0), (0, k_pad)))
            cols.append(jnp.einsum("bk,kp->bp", fac, table_mm,
                                   precision=_PREC))
        return jnp.stack(cols, axis=-1)  # (B, n_pts, d-1)

    return aot_jit(jax.jit(jac), key)


def make_fit_fn(spaces, modes, n_modes, points, table=None, n_iter=30,
                damping=1e-9, weights=None, prior=None):
    """Build the jitted batched parameter-identification solver:
    ``fit(observations (B, n_out), p0 (B, d-1)) → (p_hat (B, d-1),
    resnorm (B,))`` — box-projected Gauss–Newton on

        min_p ‖W·(sensor(p) − observations)‖² + ‖Γ·(p − p_prior)‖²

    ``weights``: optional (n_out,) per-observation weights W (e.g.
    1/σ_o for heteroscedastic gauges; resnorm is then the WEIGHTED
    norm — a χ statistic when weights are 1/σ).  ``prior``: optional
    ``(p_prior (d_p,), gamma scalar | (d_p,))`` Tikhonov term — makes
    UNDERDETERMINED calibration well-posed (fewer sensors than
    parameters: GN picks the prior-closest point on the observation
    manifold instead of a damping-seeded arbitrary one).

    with the ANALYTIC sensor Jacobian (the same rank-1 contraction as
    :func:`make_sensor_jacobian_fn`; value and derivative factor tables
    share one evaluation pass per iteration).  Everything is one
    compiled program: ``n_iter`` Levenberg–Marquardt steps under
    ``lax.scan`` with per-sample ADAPTIVE relative damping (trial steps
    are accepted only on true cost decrease, λ·tr(JᵀJ)/d otherwise
    grows 4× — all jnp.where, batch-uniform control flow; ``damping``
    is the λ floor), iterates clipped to the parameter box
    (the factor meshes' bounds — outside them the interpolants
    extrapolate garbage).  The reference has no inverse capability at
    all; per-sample scipy.optimize over evaluate() calls is the closest
    workflow it supports.

    Identification accuracy follows the serving dtype: f64 vademecums
    recover interior optima to ~1e-9; f32 to ~1e-4 (the normal-equation
    solve squares the conditioning)."""
    from pgdrome_tpu.fem.interpolate import eval_dofs_at_points
    from pgdrome_tpu.utils.aot_cache import aot_jit

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
        from pgdrome_tpu.utils.aot_cache import array_fingerprint

        table_extra = ("tbl", array_fingerprint(table))
    if weights is not None:
        weights = np.asarray(weights, dtype=modes0.dtype).reshape(-1)
        if weights.shape[0] != table.shape[1]:
            raise ValueError(
                f"weights must have one entry per output "
                f"({table.shape[1]}), got {weights.shape[0]}"
            )
    if prior is not None:
        p_prior, gamma = prior
        p_prior = np.asarray(p_prior, dtype=modes0.dtype).reshape(-1)
        if p_prior.shape[0] != d_p:
            raise ValueError(f"p_prior must be ({d_p},)")
        gamma2 = np.broadcast_to(
            np.asarray(gamma, dtype=modes0.dtype) ** 2, (d_p,)
        ).copy()
    key = _serving_key(
        "fit", spaces, n_modes, modes,
        extra=(pts.tobytes(), pts.shape, int(n_iter), float(damping),
               (weights.tobytes() if weights is not None else b""),
               (p_prior.tobytes() + gamma2.tobytes()
                if prior is not None else b""),
               *table_extra),
    )
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

    def _residual(p, obs, with_jac):
        vals = [evaluate_modes_1d(spaces[j], modes[j], p[:, j - 1])
                for j in range(1, nd)]
        fac = mask[None, :]
        for v in vals:
            fac = fac * v
        if k_pad:
            fac = jnp.pad(fac, ((0, 0), (0, k_pad)))
        r = jnp.einsum("bk,kp->bp", fac, table_mm,
                       precision=_PREC) - obs
        if not with_jac:
            return r, None
        dvals = [evaluate_modes_1d(spaces[j], modes[j], p[:, j - 1],
                                   derivative=True)
                 for j in range(1, nd)]
        cols = []
        for j in range(d_p):
            fj = mask[None, :] * dvals[j]
            for l in range(d_p):
                if l != j:
                    fj = fj * vals[l]
            if k_pad:
                fj = jnp.pad(fj, ((0, 0), (0, k_pad)))
            cols.append(jnp.einsum("bk,kp->bp", fj, table_mm,
                                   precision=_PREC))
        return r, jnp.stack(cols, axis=-1)  # (B, n_out), (B, n_out, d_p)

    w_j = jnp.asarray(weights) if weights is not None else None
    if prior is not None:
        pp_j, g2_j = jnp.asarray(p_prior), jnp.asarray(gamma2)

    def fit(obs, p0):
        eye = jnp.eye(d_p, dtype=obs.dtype)

        def cost_of(p, r):
            if w_j is not None:
                r = r * w_j[None, :]
            c = jnp.sum(r * r, axis=-1)
            if prior is not None:
                c = c + jnp.sum(g2_j[None, :] * (p - pp_j[None, :]) ** 2,
                                axis=-1)
            return c

        # Levenberg–Marquardt with per-sample adaptive RELATIVE damping
        # (λ scales tr(JᵀJ)/d): a trial step is accepted only if the
        # TRUE cost decreases, else the iterate stays and λ grows 4× —
        # plain fixed-damping Gauss–Newton overshoots along
        # near-nullspace directions (measured: a 1000:1-weighted fit
        # jumped cost 7.7e-6 → 0.41 in one step and box-clipped into a
        # boundary fixed point).  All control flow is jnp.where —
        # batch-uniform, scan-compiled.
        def step(state, _):
            p, lam = state
            r, J = _residual(p, obs, with_jac=True)
            if w_j is not None:
                rw = r * w_j[None, :]
                Jw = J * w_j[None, :, None]
            else:
                rw, Jw = r, J
            JtJ = jnp.einsum("bod,boe->bde", Jw, Jw, precision=_PREC)
            g = jnp.einsum("bod,bo->bd", Jw, rw, precision=_PREC)
            if prior is not None:
                JtJ = JtJ + jnp.diag(g2_j)[None]
                g = g + g2_j[None, :] * (p - pp_j[None, :])
            scale = (jnp.trace(JtJ, axis1=-2, axis2=-1) / d_p
                     + jnp.finfo(obs.dtype).tiny)
            delta = jnp.linalg.solve(
                JtJ + (lam * scale)[:, None, None] * eye, -g[..., None]
            )[..., 0]
            p_try = jnp.clip(p + delta, lo, hi)
            r_try, _ = _residual(p_try, obs, with_jac=False)
            better = cost_of(p_try, r_try) < cost_of(p, r)
            p_new = jnp.where(better[:, None], p_try, p)
            lam_new = jnp.clip(
                jnp.where(better, lam / 3.0, lam * 4.0),
                damping, 1e10,
            )
            return (p_new, lam_new), None

        lam0 = jnp.full((p0.shape[0],), max(1e-3, damping), obs.dtype)
        (p, _), _ = jax.lax.scan(step, (p0, lam0), None,
                                 length=int(n_iter))
        r, _ = _residual(p, obs, with_jac=False)
        if w_j is not None:
            r = r * w_j[None, :]
        return p, jnp.sqrt(jnp.sum(r * r, axis=-1))

    return aot_jit(jax.jit(fit), key)


def make_factor_moments_fn(spaces, modes, n_modes):
    """Build the jitted streaming-moment accumulator:
    fn(samples (B, d-1), w (B,)) → (Σ_b w_b·fac_b  (n_max,),
                                    Σ_b w_b·fac_b fac_bᵀ  (n_max, n_max)).

    ``fac_b`` is the per-sample mode-product factor vector, so ANY linear
    output's Monte-Carlo moments follow from these two reductions alone:
    mean field = f̄ᵀ M₀, variance field = diag(M₀ᵀ Cov M₀) — the (B, n0)
    field batch is never materialized and the sweep runs at the
    compute-bound sensor rate, not the HBM-bound field rate.  ``w`` is a
    0/1 validity mask (tail-chunk padding; w²=w is assumed).  Outputs are
    per-chunk partial sums — accumulate across chunks on the host in f64
    (serving.Vademecum.factor_moments)."""
    from pgdrome_tpu.utils.aot_cache import aot_jit

    key = _serving_key("moments", spaces, n_modes, modes[1:])
    nd = len(spaces)
    n_max = np.asarray(modes[1]).shape[0] if nd > 1 else modes[0].shape[0]
    dtype = np.asarray(modes[1 if nd > 1 else 0]).dtype
    mask = jnp.asarray((np.arange(n_max) < n_modes).astype(dtype))
    # factor computation through the fused kernel with an IDENTITY dim-0
    # table (fields = fac @ I = the masked factors themselves): the XLA
    # factor path materializes a (B, ndof_p) two-hot weight matrix in HBM
    # per parameter dim — measured 3.7 M samples/s at bench scale vs
    # ~90 M through the kernel, whose weights/factors live in VMEM
    fac_fused = _try_fused(
        spaces, np.eye(n_max, dtype=dtype), modes[1:], n_modes, "auto",
        "moments", aot=False,
    )

    def acc(samples, w):
        if fac_fused is not None:
            fac = fac_fused(samples)  # mode mask folded into the identity
        else:
            fac = jnp.ones((samples.shape[0], n_max), dtype=dtype)
            for j in range(1, nd):
                fac = fac * evaluate_modes_1d(
                    spaces[j], modes[j], samples[:, j - 1]
                )
            fac = fac * mask[None, :]
        fac = fac * w[:, None]
        s1 = jnp.sum(fac, axis=0)
        s2 = jnp.einsum("bk,bl->kl", fac, fac, precision=_PREC)
        return s1, s2

    return aot_jit(jax.jit(acc), key)


def sharded_sweep(spaces, modes, n_modes, samples, mesh=None):
    """Run the sweep with the sample axis sharded over the mesh's 'dp' axis
    (XLA inserts any needed collectives; mode buffers are replicated)."""
    if mesh is None:
        devs = jax.devices()
        mesh = Mesh(np.array(devs), ("dp",))
    # aot=False: persisted executables are pinned single-device; the
    # sharded path needs the live jitted fn so GSPMD can partition it
    sweep = make_sweep_fn(spaces, modes, n_modes, aot=False)
    samples = jnp.asarray(samples)
    sharding = NamedSharding(mesh, P("dp"))
    # pad B to a multiple of the dp axis
    ndev = mesh.shape["dp"]
    B = samples.shape[0]
    pad = (-B) % ndev
    if pad:
        # repeat the first sample (NOT samples[:pad]: when B < pad that
        # yields fewer than pad rows and the batch stays indivisible by the
        # dp axis; zeros could fall outside the parameter meshes)
        filler = jnp.broadcast_to(samples[:1], (pad, samples.shape[1]))
        samples = jnp.concatenate([samples, filler], axis=0)
    samples = jax.device_put(samples, sharding)
    out = sweep(samples)
    return out[:B]


def sweep_errors(spaces, modes, n_modes, samples, fom_fields):
    """Relative L2 errors of the PGD reconstruction vs precomputed FOM
    fields over a sample batch — the vmapped analogue of
    PGDErrorComputation.evaluate_error (reference model.py:1768-1825)."""
    sweep = make_sweep_fn(spaces, modes, n_modes)
    u = sweep(jnp.asarray(samples))
    fom = jnp.asarray(fom_fields)
    err = jnp.linalg.norm(u - fom, axis=1) / jnp.linalg.norm(fom, axis=1)
    return err
