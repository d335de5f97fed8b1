"""Certified a-posteriori error indicators for served vademecums.

The reference certifies a PGD result by SAMPLING: ``PGDErrorComputation``
(reference ``pgdrome/model.py:1666-1825``) solves the full-order model at
LHS-sampled parameter points and compares fields — O(FEM solve) per
sample, host-bound.  This module provides the complementary TPU-native
path: the per-sample ALGEBRAIC residual of the separated weak form,

    r(p) = b(p) − K(p) · u_N(p),     K(p) = Σ_t θ_t(p) K_t,
                                     b(p) = Σ_r ρ_r(p) b_r,

batched over samples on device, with NO per-sample FEM assembly or solve.
For collocation-discretized parameter dims (the framework default,
``models.problems.parametric_elliptic``) the per-dim operator stacks are
diagonal, so θ_t(p) / ρ_r(p) are the interpolated diagonal/rhs tables —
and the RELATIVE indicator ‖r‖/‖b(p)‖ is exactly invariant to
boundary-boosted measures (the per-grid-point weight ω·w multiplies
numerator and denominator alike).  At parameter GRID points the indicator
is the exact relative residual of the per-sample FEM system; off-grid it
additionally measures the P1 interpolation error of the lookup-table
semantics, which is the honest serving error there.

Precision: the residual is a cancellation of O(1) quantities down to
~1e-6·‖b‖ at convergence — plain f32 contraction noise (~1e-7 absolute)
would drown the signal for well-converged vademecums.  The contraction
therefore runs in compensated double-f32 (ops/ddf32.py, ~2^-48): the
indicator certifies the SHIPPED f32 mode set, computed essentially
exactly.  The Gram-free tables K_t·u_m are precomputed host-side in f64
and stored as dd pairs.

Certification: the relative residual is an INDICATOR, not a bound — the
residual→error map carries the (preconditioned) operator's conditioning.
:class:`Certifier` closes the gap empirically: calibrate an effectivity
η = safety · max(true_err / residual) on a small FEM-verified sample set
(e.g. ``elliptic_dense_verifier(...).sample_errors``), then
``bound(samples) = η · residuals(samples)`` certifies arbitrary batches
at sweep speed.  This is the classic constant-calibration a-posteriori
strategy; the safety factor and the calibration set are reported so the
certificate is auditable.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from pgdrome_tpu.ops.ddf32 import dd_add, dd_mul, dd_mul_f, dd_sum, dd_from_f64
from pgdrome_tpu.separated import evaluate_modes_1d
from pgdrome_tpu.utils.aot_cache import aot_jit, array_fingerprint


def _spaces_fingerprint(spaces):
    """Identity of the parameter-dim interpolation constants the jitted
    bodies close over (mesh coordinates + dof maps + degree): aot_jit
    keys on key_data + shapes only, so everything still baked into the
    program must enter the key."""
    return [
        (
            s.degree,
            array_fingerprint(s.mesh().coordinates(), s.element_dofs),
        )
        for s in spaces[1:]
    ]

__all__ = [
    "make_residual_indicator",
    "make_certifier",
    "make_transient_residual_indicator",
    "make_transient_certifier",
    "Certifier",
    "make_screener",
    "screened_verify",
]


def _chunked_dispatch(call, samples, chunk, num_params, *dev_args,
                      shard=None):
    """Fixed-chunk device dispatch over a host sample batch: pad the last
    block with repeated rows so ONE executable serves every batch size,
    slice the padding back off.  Samples are cast to f32 explicitly on
    the host (x64 is off on TPU; the jitted bodies compute in f32).
    ``shard``: optional NamedSharding placing each chunk's batch axis on
    the mesh's 'dp' axis (multichip certification sweeps)."""
    samples = np.asarray(samples, dtype=np.float64)
    if samples.ndim != 2 or samples.shape[1] != num_params:
        raise ValueError(
            f"samples must be (B, {num_params}), got {samples.shape}"
        )
    out = np.empty(samples.shape[0], dtype=np.float64)
    for s in range(0, samples.shape[0], chunk):
        blk = samples[s : s + chunk]
        if blk.shape[0] < chunk:
            blk = np.concatenate(
                [blk, np.repeat(blk[-1:], chunk - blk.shape[0], axis=0)]
            )
        arr = jnp.asarray(blk.astype(np.float32))
        if shard is not None:
            arr = jax.device_put(arr, shard)
        out[s : s + chunk] = np.asarray(
            call(arr, *dev_args)
        )[: samples.shape[0] - s]
    return out


def _param_tables(sep):
    """Extract per-parameter-dim diagonal operator tables (T, n_d) and rhs
    tables (R, n_d); raise if any parameter operator is not diagonal
    (Galerkin parameter discretizations have no per-sample pointwise
    semantics — use param_discretization='collocation')."""
    diag_tabs, rhs_tabs = [], []
    for d in range(1, sep.num_dims):
        od = np.asarray(sep.ops[d], dtype=np.float64)
        diags = np.stack([np.diag(od[t]) for t in range(od.shape[0])])
        dense = np.zeros_like(od)
        for t in range(od.shape[0]):
            np.fill_diagonal(dense[t], diags[t])
        if not np.allclose(od, dense, rtol=0.0, atol=1e-12 * np.abs(od).max()):
            raise ValueError(
                f"parameter dim {d} operators are not diagonal: residual "
                "certification requires collocation-discretized parameter "
                "dims (models.problems param_discretization='collocation')"
            )
        diag_tabs.append(diags)
        rhs_tabs.append(np.asarray(sep.rhs[d], dtype=np.float64))
    return diag_tabs, rhs_tabs


def make_residual_indicator(sep, spaces, result, tf=None, chunk=None,
                            precondition=True, mesh=None):
    """Build a batched per-sample relative-residual indicator.

    sep: the HOST f64 :class:`SeparatedProblem` in the NODAL basis (the
    builder output, before ``precondition_dim0``/``as_device``); spaces:
    its per-dim function spaces; result: a fast-path ``PGDResult``;
    tf: the ``Dim0Transform`` when the result's dim-0 modes live in a
    preconditioned basis, else None.

    Returns ``indicator(samples) -> (B,) np.float64`` with
    ``samples (B, num_params)``: the relative residual
    ‖b(p) − K(p)u_N(p)‖ / ‖b(p)‖ over interior (non-Dirichlet) dim-0
    dofs, computed in compensated double-f32 on device.

    When ``tf`` is given and ``precondition`` is True (default), the
    residual is measured in the ENERGY-preconditioned norm ‖L⁻¹·‖ with
    L Lᵀ the dim-0 Cholesky held by ``tf``: for SPD K(p) this is the
    ‖·‖_{K(p)⁻¹} residual up to the κ-spectral-equivalence constant,
    which removes the cond(K) leverage from the residual→error map
    (measured: effectivity spread 9.2× Euclidean → 5.7× energy on the
    2-param elliptic).  L⁻¹ is linear, so it folds into the host-f64
    precomputed tables — zero per-sample device cost.

    Equivalent shortcut when only the PRECONDITIONED stacks are at hand
    (e.g. from the bench setup cache, which drops the raw problem):
    ``make_residual_indicator(sep_pc, spaces, result)`` with ``tf=None``
    — the pc dim-0 stacks are L⁻¹K_tL⁻ᵀ / L⁻¹b and the result's modes
    already live in that basis, so the plain Euclidean residual there IS
    the energy-preconditioned residual (tested to 1e-6 relative).
    ``chunk``: samples per device dispatch (auto-sized to ~512 MB of dd
    product temporaries by default)."""
    nd = sep.num_dims
    T = sep.num_terms
    R = sep.num_rhs
    M = int(result.n_modes)
    if nd < 2:
        raise ValueError("need at least one parameter dim")

    mask0 = np.asarray(sep.bc_masks[0], dtype=np.float64)
    m0 = np.asarray(result.modes[0])[:M]
    full0 = (tf.modes_to_full(m0) if tf is not None else m0).astype(np.float64)
    if full0.shape[1] != sep.sizes[0]:
        raise ValueError(
            f"dim-0 modes have {full0.shape[1]} dofs but the problem has "
            f"{sep.sizes[0]} — pass tf= for preconditioned-basis results"
        )
    n_x = sep.sizes[0]

    diag_tabs, rhs_tabs = _param_tables(sep)

    # host-f64 precompute: G[t,m] = K_t u_m on interior rows, dd storage
    import scipy.sparse as _sp

    ops0 = np.asarray(sep.ops[0], dtype=np.float64)
    # dim-0 FEM matrices are banded: the sparse product is O(nnz·M)
    # where the dense einsum is O(n²·M·T) — at frontier ranks
    # (M ~ 2700, T = 11, n = 2049) that is ~1 s vs ~1 min on the 1-core
    # host, bit-identical up to f64 summation order
    G = np.stack([
        np.asarray((_sp.csr_matrix(ops0[t]) @ full0.T).T)
        for t in range(T)
    ])
    G = (G * mask0).reshape(T * M, n_x)
    B0 = np.asarray(sep.rhs[0], dtype=np.float64) * mask0
    if tf is not None and precondition:
        # energy norm: L⁻¹ applied to the interior rows of every table
        G = tf.apply_Linv(G[:, tf.interior].T).T
        B0 = tf.apply_Linv(B0[:, tf.interior].T).T
    # per-dim factor tables: modes (M) ++ operator diagonals (T) ++ rhs (R)
    # in ONE buffer so each dim costs a single interpolation call
    bufs = []
    for d in range(1, nd):
        tab = np.concatenate(
            [
                np.asarray(result.modes[d])[:M].astype(np.float64),
                diag_tabs[d - 1],
                rhs_tabs[d - 1],
            ],
            axis=0,
        )
        bufs.append(tab.astype(np.float32))

    return _indicator_from_dd(
        spaces, dd_from_f64(G), dd_from_f64(B0), bufs, M, T, R, chunk,
        mesh=mesh,
    )


def _indicator_from_dd(spaces, G_dd_host, B_dd_host, bufs_host, M, T, R,
                       chunk=None, mesh=None):
    """Indicator from prebuilt dd tables (shared by
    :func:`make_residual_indicator` and :meth:`Certifier.load`).
    ``mesh``: optional device mesh with a 'dp' axis — certification
    sweeps then shard the sample batch across it (tables replicated;
    each sample's dd chain is device-local, so the partitioned program
    carries NO cross-device collectives — asserted in
    tests/unit/test_multichip_paths.py)."""
    nd = len(bufs_host) + 1
    G_dd = jnp.asarray(G_dd_host)
    B_dd = jnp.asarray(B_dd_host)
    bufs = [jnp.asarray(b, dtype=jnp.float32) for b in bufs_host]
    shard = None
    if mesh is not None:
        from jax.sharding import NamedSharding
        from jax.sharding import PartitionSpec as P

        repl = NamedSharding(mesh, P())
        G_dd = jax.device_put(G_dd, repl)
        B_dd = jax.device_put(B_dd, repl)
        bufs = [jax.device_put(b, repl) for b in bufs]
        shard = NamedSharding(mesh, P("dp"))

    if chunk is None:
        # the (chunk, T*M, n_tab) dd product array dominates peak memory
        # (XLA fuses the elementwise dd chain; the tree fold halves from
        # there) — target ≤512 MB for it, cap 512 samples/dispatch so the
        # ~40 ms serial host enqueue amortizes (PERF.md round-3 serving)
        n_tab = G_dd_host.shape[1]
        chunk = max(1, min(512, 134_217_728 // (max(T * M, 1) * n_tab)))
    chunk = int(chunk)

    def _dd_prod(vals_list):
        """Compensated product across parameter dims of plain-f32 factor
        batches [(C, K), ...] -> dd pair ((C, K), (C, K))."""
        h = vals_list[0]
        l = jnp.zeros_like(h)
        for v in vals_list[1:]:
            h, l = dd_mul_f(h, l, v)
        return h, l

    # tables are jit INPUTS (they are device-resident anyway), so the
    # executable is value-independent and the persistent AOT cache can
    # serve every same-shape certification without a remote compile
    @jax.jit
    def _body(pts, G_dd, B_dd, *bufs):
        pts = pts.astype(jnp.float32)
        w_vals, t_vals, r_vals = [], [], []
        for d in range(1, nd):
            vals = evaluate_modes_1d(spaces[d], bufs[d - 1], pts[:, d - 1])
            vals = vals.astype(jnp.float32)
            w_vals.append(vals[:, :M])
            t_vals.append(vals[:, M : M + T])
            r_vals.append(vals[:, M + T :])
        wh, wl = _dd_prod(w_vals)  # (C, M) mode weights
        th, tl = _dd_prod(t_vals)  # (C, T) operator coefficients
        rh, rl = _dd_prod(r_vals)  # (C, R) rhs coefficients
        # per-sample scale normalization: at high d the common measure
        # factor ∏_d(w·ω) reaches ~1e-20, whose SQUARE underflows f32 in
        # the norms (0/0 = NaN).  The relative indicator is invariant to
        # a common coefficient scale, so divide θ and ρ by max|ρ| first.
        s = 1.0 / jnp.maximum(
            jnp.max(jnp.abs(rh), axis=1, keepdims=True),
            jnp.float32(1e-37),
        )
        th, tl = dd_mul_f(th, tl, s)
        rh, rl = dd_mul_f(rh, rl, s)
        # c[t,m] = θ_t · w_m  (dd outer product), flattened to (C, T*M)
        ch, cl = dd_mul(
            th[:, :, None], tl[:, :, None], wh[:, None, :], wl[:, None, :]
        )
        ch = ch.reshape(ch.shape[0], T * M)
        cl = cl.reshape(cl.shape[0], T * M)
        kh, kl = dd_mul(
            ch[:, :, None], cl[:, :, None], G_dd[None, :, :, 0], G_dd[None, :, :, 1]
        )
        kh, kl = dd_sum(kh, kl, axis=1)  # (C, n_x)
        bh, bl = dd_mul(
            rh[:, :, None], rl[:, :, None], B_dd[None, :, :, 0], B_dd[None, :, :, 1]
        )
        bh, bl = dd_sum(bh, bl, axis=1)  # (C, n_x)
        resh, resl = dd_add(bh, bl, -kh, -kl)
        rv = resh + resl
        bv = bh + bl
        num = jnp.sqrt(jnp.sum(rv * rv, axis=1))
        den = jnp.sqrt(jnp.sum(bv * bv, axis=1))
        return num / den

    if mesh is not None:
        # sharded chunks need the live jitted fn (loaded AOT executables
        # are pinned single-device, utils/aot_cache.py); round the chunk
        # up so every device holds an equal shard
        chunk = int(-(-chunk // mesh.size) * mesh.size)
        _call = _body
    else:
        _call = aot_jit(
            _body,
            key_data=["certify_dd_v2", nd, T, R, M,
                      _spaces_fingerprint(spaces)],
        )

    def indicator(samples):
        return _chunked_dispatch(_call, samples, chunk, nd - 1, G_dd, B_dd,
                                 *bufs, shard=shard)

    indicator.chunk = chunk
    indicator.n_modes = M
    indicator._tables = (G_dd_host, B_dd_host, bufs_host, M, T, R)
    indicator._call = _call  # HLO inspection (parallel/hlo.py)
    indicator._dev_args = (G_dd, B_dd, *bufs)
    indicator._shard = shard
    return indicator


class Certifier:
    """Residual indicator + empirically calibrated effectivity.

    Workflow::

        cert = make_certifier(sep, Vs, res, tf=tf)
        cert.calibrate(cal_samples, verify.sample_errors(res, cal_samples))
        bounds = cert.bound(query_samples)   # η·residual, sweep speed

    ``bound`` certifies (with the recorded safety margin) as long as the
    calibration set is representative — include the parameter-box corners
    (``elliptic_dense_verifier(...).corners``), where PGD errors peak."""

    def __init__(self, indicator, eta=None, safety=None):
        self._indicator = indicator
        self.eta = eta
        self.safety = safety
        self.n_calibration = 0
        # calibration-distribution record for the out-of-distribution
        # guard in bound(): η is an EMPIRICAL effectivity fit, so a query
        # whose parameters or residual fall outside what calibrate() saw
        # makes "certified" an extrapolation — warn, don't pretend
        self.cal_box = None  # (2, d-1): per-axis [min; max] of samples
        self.cal_res_range = None  # (res_min, res_max) over calibration

    def residuals(self, samples):
        """Relative algebraic residuals, (B,) float64."""
        return self._indicator(samples)

    def calibrate(self, samples, true_errors, safety=1.5):
        """Fit η = safety · max(true_err / residual) over the calibration
        pairs; returns η.  true_errors: per-sample relative errors vs a
        trusted solve (e.g. ``elliptic_dense_verifier``'s
        ``sample_errors``).  Also records the calibration sample box and
        residual range so :meth:`bound` can flag out-of-distribution
        queries."""
        res = self.residuals(samples)
        true_errors = np.asarray(true_errors, dtype=np.float64)
        if true_errors.shape != res.shape:
            raise ValueError("true_errors must align with samples")
        ratio = true_errors / np.maximum(res, 1e-300)
        self.eta = float(safety * ratio.max())
        self.safety = float(safety)
        self.n_calibration = int(res.shape[0])
        pts = np.asarray(samples, dtype=np.float64)
        if pts.ndim == 2:
            self.cal_box = np.stack([pts.min(axis=0), pts.max(axis=0)])
        self.cal_res_range = (float(res.min()), float(res.max()))
        return self.eta

    def _check_in_distribution(self, samples, res):
        """Warn when bound() queries leave the calibrated distribution:
        outside the calibration parameter box, or with residuals beyond
        10× the calibrated residual range (the effectivity η was fit on
        that range; far outside it the bound is an extrapolation)."""
        import warnings

        pts = np.asarray(samples, dtype=np.float64)
        if self.cal_box is not None and pts.ndim == 2 and (
            pts.shape[1] == self.cal_box.shape[1]
        ):
            tol = 1e-12 * np.maximum(
                1.0, np.abs(self.cal_box).max(axis=0)
            )
            n_out = int(
                np.sum(
                    np.any(pts < self.cal_box[0] - tol, axis=1)
                    | np.any(pts > self.cal_box[1] + tol, axis=1)
                )
            )
            if n_out:
                warnings.warn(
                    f"Certifier.bound: {n_out} quer"
                    f"{'y lies' if n_out == 1 else 'ies lie'} outside the "
                    "calibration parameter box — the certified bound is an "
                    "extrapolation there (re-calibrate on a covering set)",
                    stacklevel=3,
                )
        if self.cal_res_range is not None and res.size:
            lo, hi = self.cal_res_range
            n_far = int(np.sum((res > 10.0 * hi) | (res < 0.1 * lo)))
            if n_far:
                warnings.warn(
                    f"Certifier.bound: {n_far} residual(s) fall outside "
                    f"10x the calibrated residual range [{lo:.3e}, "
                    f"{hi:.3e}] — the effectivity fit does not cover them",
                    stacklevel=3,
                )

    def bound(self, samples):
        """Calibrated error bound η·residual, (B,) float64.  Emits a
        warning for queries outside the calibration distribution (see
        :meth:`_check_in_distribution`)."""
        if self.eta is None:
            raise RuntimeError("call calibrate() first (or set eta=)")
        res = self.residuals(samples)
        self._check_in_distribution(samples, res)
        return self.eta * res

    def attach_guaranteed(self, gbound):
        """Attach a :func:`guaranteed_field_bound` so this certifier
        serves the RIGOROUS zero-calibration bound beside the calibrated
        one (:meth:`guaranteed_bound`)."""
        self._guaranteed = gbound
        return self

    def guaranteed_bound(self, samples, norm: str = "rel_l2"):
        """Guaranteed (calibration-free) per-sample error bound from the
        attached :func:`guaranteed_field_bound`; ``norm`` picks the
        emitted component (``rel_l2`` default, or ``rel_energy`` /
        ``abs_K0`` / ``abs_l2``)."""
        gb = getattr(self, "_guaranteed", None)
        if gb is None:
            raise RuntimeError(
                "no guaranteed bound attached — build one with "
                "guaranteed_field_bound(...) and attach_guaranteed()"
            )
        out = gb(samples)
        if norm not in out:
            raise KeyError(
                f"{norm!r} unavailable (got {sorted(out)}) — Euclidean "
                "components need a Dim0Transform (tf/nodal_tf)"
            )
        return out[norm]

    def save(self, filepath, spaces=None):
        """Single-file HDF5 snapshot: the dd residual tables + the
        calibration, so a DEPLOYED container can serve certified bounds
        without the operator stacks (which :meth:`Vademecum.save`
        intentionally omits).  Pass ``spaces`` to also store per-dim mesh
        coordinates for validation at :meth:`load` (the Vademecum
        snapshot convention)."""
        import h5py

        if getattr(self._indicator, "_tables", None) is None:
            raise ValueError(
                "this certifier's indicator carries no dd tables "
                "(transient family): save is unsupported — rebuild with "
                "make_transient_certifier from the problem at load time"
            )
        G_dd, B_dd, bufs, M, T, R = self._indicator._tables
        with h5py.File(filepath, "w") as f:
            f.attrs["M"], f.attrs["T"], f.attrs["R"] = M, T, R
            f.attrs["num_dims"] = len(bufs) + 1
            f.attrs["n_calibration"] = self.n_calibration
            if self.eta is not None:
                f.attrs["eta"] = self.eta
            if self.safety is not None:
                f.attrs["safety"] = self.safety
            if self.cal_box is not None:
                f.create_dataset("cal_box", data=np.asarray(self.cal_box))
            if self.cal_res_range is not None:
                f.attrs["cal_res_range"] = np.asarray(self.cal_res_range)
            f.create_dataset("G_dd", data=np.asarray(G_dd))
            f.create_dataset("B_dd", data=np.asarray(B_dd))
            for d, b in enumerate(bufs):
                f.create_dataset(f"buf_{d + 1}", data=np.asarray(b))
            if spaces is not None:
                for d, s in enumerate(spaces):
                    f.create_dataset(
                        f"coords_{d}", data=s.mesh().coordinates()
                    )
                    f[f"coords_{d}"].attrs["degree"] = s.degree

    @classmethod
    def load(cls, filepath, spaces, chunk=None):
        """Rebuild from :meth:`save`, validated against ``spaces``: the
        per-dim table dof counts must match (always checked), and when the
        snapshot carries mesh coordinates (``save(spaces=...)``) those are
        checked exactly too."""
        import h5py

        with h5py.File(filepath, "r") as f:
            nd = int(f.attrs["num_dims"])
            if len(spaces) != nd:
                raise ValueError(f"expected {nd} spaces, got {len(spaces)}")
            for d in range(nd):
                if f"coords_{d}" not in f:
                    continue
                saved = np.asarray(f[f"coords_{d}"])
                have = spaces[d].mesh().coordinates()
                if saved.shape != have.shape or not np.allclose(saved, have):
                    raise ValueError(
                        f"space {d} mesh does not match the saved certifier"
                    )
                if int(f[f"coords_{d}"].attrs["degree"]) != spaces[d].degree:
                    raise ValueError(f"space {d} degree mismatch")
            M, T, R = int(f.attrs["M"]), int(f.attrs["T"]), int(f.attrs["R"])
            G_dd = np.asarray(f["G_dd"])
            B_dd = np.asarray(f["B_dd"])
            bufs = [np.asarray(f[f"buf_{d}"]) for d in range(1, nd)]
            eta = float(f.attrs["eta"]) if "eta" in f.attrs else None
            safety = (
                float(f.attrs["safety"]) if "safety" in f.attrs else None
            )
            n_cal = int(f.attrs["n_calibration"])
            cal_box = np.asarray(f["cal_box"]) if "cal_box" in f else None
            cal_res_range = (
                tuple(np.asarray(f.attrs["cal_res_range"], dtype=np.float64))
                if "cal_res_range" in f.attrs
                else None
            )
        # dof-count validation even without saved coordinates: the param-dim
        # tables are interpolated through spaces[d]'s dof map, so a size
        # mismatch would otherwise gather garbage silently
        for d in range(1, nd):
            if bufs[d - 1].shape[1] != spaces[d].dim():
                raise ValueError(
                    f"space {d} has {spaces[d].dim()} dofs but the saved "
                    f"certifier tables have {bufs[d - 1].shape[1]} — wrong "
                    "parameter space for this snapshot"
                )
        ind = _indicator_from_dd(spaces, G_dd, B_dd, bufs, M, T, R, chunk)
        out = cls(ind, eta=eta)
        out.safety = safety
        out.n_calibration = n_cal
        out.cal_box = cal_box
        out.cal_res_range = cal_res_range
        return out


def make_screener(sep, spaces, n_modes_cap, chunk=2048):
    """Recompile-free per-stage residual screener for adaptive cascades.

    High-parameter-count verification is the cost wall: the 10-param
    dense corner sweep is ~6 min of host FEM PER STAGE (PERF.md
    "Dimensionality frontier").  This screener ranks candidate points by
    their residual in one device dispatch so only the worst few need FEM
    verification (:func:`screened_verify`).

    Differences from :func:`make_residual_indicator`, all in service of
    calling it EVERY stage of a deep cascade without recompiles:

    * the G = K_t·u_m tables build ON DEVICE (f32 einsum at HIGHEST; the
      host-f64 build is 15-40 s at 10-param scale, the device one is ms)
      with the operator stacks uploaded once per screener;
    * dim-0 modes are zero-PADDED to ``n_modes_cap`` and passed as jit
      INPUTS along with the parameter mode tables, so every stage of a
      growing cascade reuses the same two compiled programs (zero rows
      are exactly inert);
    * the contraction is a plain f32 MXU matmul at HIGHEST — residual
      noise floor ~cancellation·2⁻²⁴ ≈ 1e-4 relative of the reading,
      plenty for RANKING errors in the 1e-3..1e-6 band (use the dd
      indicator for certification-grade values).

    sep: HOST f64 problem with dim-0 already preconditioned (the pc
    shortcut — see :func:`make_residual_indicator`); modes beyond
    ``n_modes_cap`` raise.  Returns ``screen(result, samples) -> (B,)``.
    """
    nd = sep.num_dims
    T = sep.num_terms
    R = sep.num_rhs
    cap = int(n_modes_cap)
    if nd < 2:
        raise ValueError("need at least one parameter dim")
    diag_tabs, rhs_tabs = _param_tables(sep)

    mask0 = np.asarray(sep.bc_masks[0], dtype=np.float64)
    ops0 = jnp.asarray(
        np.asarray(sep.ops[0], dtype=np.float64), dtype=jnp.float32
    )
    mask_dev = jnp.asarray(mask0, dtype=jnp.float32)
    B0 = jnp.asarray(
        np.asarray(sep.rhs[0], dtype=np.float64) * mask0, dtype=jnp.float32
    )
    stat_bufs = [
        jnp.asarray(
            np.concatenate([diag_tabs[d - 1], rhs_tabs[d - 1]], axis=0),
            dtype=jnp.float32,
        )
        for d in range(1, nd)
    ]
    prec = jax.lax.Precision.HIGHEST

    # both programs take every table as an INPUT (value-independent
    # executables → the persistent AOT cache serves all same-shape
    # cascades, and every stage reuses the same two loaded programs)
    @jax.jit
    def _tables(full0, ops, mask):
        G = jnp.einsum("tij,mj->tmi", ops, full0, precision=prec)
        return (G * mask).reshape(T * cap, -1)

    @jax.jit
    def _screen_body(pts, G, B, *tabs):
        stat = tabs[: nd - 1]
        mode = tabs[nd - 1 :]
        pts = pts.astype(jnp.float32)
        w = th = rh = None
        for d in range(1, nd):
            mv = evaluate_modes_1d(
                spaces[d], mode[d - 1], pts[:, d - 1]
            ).astype(jnp.float32)
            sv = evaluate_modes_1d(
                spaces[d], stat[d - 1], pts[:, d - 1]
            ).astype(jnp.float32)
            w = mv if w is None else w * mv
            th = sv[:, :T] if th is None else th * sv[:, :T]
            rh = sv[:, T:] if rh is None else rh * sv[:, T:]
        # same per-sample scale normalization as the dd body: the common
        # ∏_d(w·ω) measure factor (~1e-20 at d=10) squared underflows f32
        s = 1.0 / jnp.maximum(
            jnp.max(jnp.abs(rh), axis=1, keepdims=True),
            jnp.float32(1e-37),
        )
        th = th * s
        rh = rh * s
        C = (th[:, :, None] * w[:, None, :]).reshape(pts.shape[0], T * cap)
        Kp = jnp.einsum("bk,kn->bn", C, G, precision=prec)
        bvec = jnp.einsum("br,rn->bn", rh, B, precision=prec)
        r = bvec - Kp
        num = jnp.sqrt(jnp.sum(r * r, axis=1))
        den = jnp.sqrt(jnp.sum(bvec * bvec, axis=1))
        return num / den

    fp = _spaces_fingerprint(spaces)
    _tables_call = aot_jit(
        _tables, key_data=["certify_screen_tables_v1", nd, T, cap, fp]
    )
    _screen_call = aot_jit(
        _screen_body, key_data=["certify_screen_v2", nd, T, R, cap, fp]
    )

    def screen(result, samples):
        M = int(result.n_modes)
        if M > cap:
            raise ValueError(f"result has {M} modes > n_modes_cap {cap}")
        m0 = np.asarray(result.modes[0])[:M]
        if m0.shape[1] != sep.sizes[0]:
            raise ValueError(
                f"dim-0 modes have {m0.shape[1]} dofs, problem has "
                f"{sep.sizes[0]} — the screener needs the pc problem the "
                "modes were solved in"
            )
        full0 = np.zeros((cap, sep.sizes[0]), dtype=np.float32)
        full0[:M] = m0
        G = _tables_call(jnp.asarray(full0), ops0, mask_dev)
        mode_bufs = []
        for d in range(1, nd):
            buf = np.zeros((cap, sep.sizes[d]), dtype=np.float32)
            buf[:M] = np.asarray(result.modes[d])[:M]
            mode_bufs.append(jnp.asarray(buf))
        return _chunked_dispatch(
            _screen_call, samples, chunk, nd - 1, G, B0, *stat_bufs, *mode_bufs
        )

    screen.n_modes_cap = cap
    return screen


def screened_verify(screen, sample_errors, corners, *, top_k=16,
                    interior_samples=None, safety=2.0, log=None):
    """Build an ``adaptive_cascade``-compatible ``verify(result)`` that
    FEM-verifies only the ``top_k`` worst-screened corner candidates.

    Per call: screen ALL ``corners`` (one device dispatch), FEM-verify
    the ``top_k`` worst via ``sample_errors(result, pts)`` (e.g.
    ``elliptic_dense_verifier(...).sample_errors``), fit the stage
    effectivity η = safety·max(true/residual) on those pairs, and report
    the unmeasured candidates at their CERTIFIED ESTIMATE η·residual.
    The returned ``corners`` value is max(measured, estimated) — an
    estimate, not a measurement, for the screened-out points; the dict
    carries ``eta``/``measured_max``/``estimated_max`` so the cascade
    history is auditable.  ``interior_samples`` (optional) are always
    FEM-verified directly (keep the set small).

    At 10 params this replaces a ~6 min/stage corner sweep with one
    screening dispatch + ``top_k`` FEM solves (~10 ms each)."""
    corners = np.asarray(corners, dtype=np.float64)
    say = log or (lambda *a: None)
    if top_k < 1:
        # order[-0:] would select ALL corners (the full FEM sweep the
        # screener exists to avoid), and η cannot be fit from zero pairs
        raise ValueError("top_k must be >= 1 (eta needs measured pairs)")

    def verify(result):
        rs = screen(result, corners)
        order = np.argsort(rs)
        k = min(top_k, len(order))
        worst = order[len(order) - k:]
        rest = order[: len(order) - k]
        te = np.asarray(sample_errors(result, corners[worst]))
        eta = float(safety * (te / np.maximum(rs[worst], 1e-300)).max())
        est_max = float(eta * rs[rest].max()) if len(rest) else 0.0
        measured_max = float(te.max())
        corners_val = max(measured_max, est_max)
        interior_val = 0.0
        if interior_samples is not None:
            interior_val = float(
                np.asarray(sample_errors(result, interior_samples)).max()
            )
        say(
            f"screened verify: measured {measured_max:.3e} (top {len(worst)}"
            f" of {len(corners)}), estimated rest {est_max:.3e} "
            f"(eta {eta:.2f}), interior {interior_val:.3e}"
        )
        rank = np.argsort(te)[::-1]  # measured points, worst first: the
        # feedback channel for corner-seeded stages (adaptive_cascade)
        return {
            "corners": corners_val,
            "interior": interior_val,
            "max": max(corners_val, interior_val),
            "eta": eta,
            "measured_max": measured_max,
            "estimated_max": est_max,
            "screened": True,
            "worst_points": corners[worst][rank],
            "worst_errors": te[rank],
        }

    return verify


def make_certifier(sep, spaces, result, tf=None, chunk=None, eta=None,
                   mesh=None):
    """One-call constructor: :func:`make_residual_indicator` wrapped in a
    :class:`Certifier` (see class docstring for the calibrate/bound
    workflow).  ``mesh``: dp-shard the certification sweeps over a
    device mesh (see :func:`_indicator_from_dd`)."""
    return Certifier(
        make_residual_indicator(sep, spaces, result, tf=tf, chunk=chunk,
                                mesh=mesh),
        eta=eta,
    )


# ------------------------------------------------- guaranteed (rigorous)

def validate_spd_family(sep):
    """Validate the checkable hypotheses of the A(p) ⪰ K0 guaranteed
    bounds on a collocation problem: every parameter dim's operator
    stack is diagonal, its base-term diagonal (the measure weight) is
    positive, and every term's θ_0-normalized coefficient
    θ_t(p) = Π_d diag_td/diag_0d is ≥ 0 at all parameter grid points —
    then A(p)/c_0(p) = K0 + Σ_t θ_t(p) K_t ⪰ K0 whenever dim-0 term 0
    is the SPD K0 and the K_t are PSD (both structural for the
    stiffness builders, NOT re-verifiable from the parameter tables —
    callers own that hypothesis).  Raises ValueError when a checkable
    hypothesis fails.  Shared by :func:`guaranteed_field_bound` and
    :func:`pgdrome_tpu.dual.guaranteed_output_bound`."""
    for j in range(1, sep.num_dims):
        od = np.asarray(sep.ops[j], dtype=np.float64)
        off = od - od * np.eye(od.shape[1])[None]
        if np.abs(off).max() > 1e-12 * max(np.abs(od).max(), 1.0):
            raise ValueError(
                f"dim {j} operator stack is not collocation-diagonal — "
                "affine coefficients θ_t(p) cannot be read off a "
                "consistent-Galerkin parameter discretization"
            )
        w = np.diagonal(od[0]).astype(np.float64)
        if np.any(w <= 0):
            raise ValueError(
                f"dim {j} base-term diagonal is not positive"
            )
        # θ_t(p) = Π_d diag_td/diag_0d: normalizing BY term 0 makes
        # θ_0 ≡ 1 by construction (term 0 IS the reference operator the
        # coercivity argument measures against — that dim-0 term 0 is
        # the SPD K0 is structural for the builders, like K_t PSD-ness,
        # and not re-verifiable from the parameter tables).  The
        # checkable hypotheses are w > 0 above and θ_t ≥ 0 below.
        g = np.diagonal(od, axis1=1, axis2=2) / w[None, :]
        if g.min() < -1e-12:
            raise ValueError(
                f"dim {j} has negative operator coefficients "
                f"(min {g.min():.2e}) — A(p) ⪰ K0 does not hold and "
                "the guaranteed bound is invalid"
            )


def guaranteed_field_bound(sep, spaces, result, tf=None, *,
                           nodal_tf=None, chunk=None):
    """GUARANTEED (zero-calibration) per-sample FIELD-error bound — the
    companion of the calibrated η·residual :class:`Certifier` bound and
    of the output certificate
    (:func:`pgdrome_tpu.dual.guaranteed_output_bound`), closing the
    round-4 gap that the 1e-6 field claim rested only on per-sample FEM
    spot checks.

    Math (classic RB coercivity bound, with the coercivity constant
    EXACT by construction): for the affine SPD family
    A(p) = K0 + Σ_t θ_t(p) K_t with θ_0 ≡ 1, θ_t ≥ 0, K_t PSD
    (:func:`validate_spd_family`), A(p) ⪰ K0, so with e = u − u_r and
    r(p) = b(p) − A(p) u_r:

        ‖e‖_{K0} ≤ ‖e‖_{A(p)} = ‖r(p)‖_{A(p)⁻¹} ≤ ‖r(p)‖_{K0⁻¹}
                 = ‖L⁻¹ r(p)‖₂                  (K0 = L Lᵀ)

    — and ‖L⁻¹r‖/‖L⁻¹b‖ is EXACTLY what the energy-preconditioned dd
    residual indicator (:func:`make_residual_indicator`) computes at
    sweep speed.  The only inequality is A(p)⁻¹ ⪯ K0⁻¹, whose slack is
    bounded by the coefficient range (√(max κ/min κ), e.g. √1.5 for
    the bench family) — no empirical effectivity anywhere.

    Euclidean conversion: ‖e‖₂ ≤ ‖e‖_{K0}/√λ_min with the GUARANTEED
    lower bound λ_min(K0) ≥ 1/‖K0⁻¹‖_∞ (exact row sums of
    L⁻ᵀL⁻¹, computed once from the Cholesky data; the Rayleigh
    estimate is also recorded so the certificate reports its own
    conversion slack).  Relative bounds divide by the sweepable
    ‖u_r(p)‖ minus the error bound itself (‖u‖ ≥ ‖u_r‖ − ‖e‖).

    Arguments mirror :func:`make_residual_indicator`: ``sep`` nodal
    with ``tf`` for preconditioned-basis results, or ``sep`` the
    preconditioned stacks with ``tf=None`` (then dim-0 term 0 must be
    ~I and ``nodal_tf`` supplies the Euclidean conversion; without it
    only the energy-norm bounds are emitted).

    Returns ``bound(samples) -> dict`` with per-sample arrays:
    ``abs_K0`` (guaranteed ‖e‖_{K0}), ``rel_energy``
    (‖e‖_{K0}/‖u‖_{K0}), and — when convertible — ``abs_l2`` /
    ``rel_l2`` (the headline-comparable Euclidean relative bound);
    ``inf`` where the denominator guard fails.  Attributes:
    ``lam_min_lower``, ``lam_min_estimate``, ``indicator``."""
    from pgdrome_tpu.separated import evaluate_modes_1d

    validate_spd_family(sep)
    conv_tf = tf if tf is not None else nodal_tf
    if tf is None:
        I0 = np.asarray(sep.ops[0], dtype=np.float64)[0]
        mask0 = np.asarray(sep.bc_masks[0], dtype=np.float64)
        I_ref = np.diag(mask0) + np.diag(1.0 - mask0)
        if np.abs(I0 - I_ref).max() > 1e-8:
            raise ValueError(
                "preconditioned-basis mode (tf=None) needs dim-0 term 0 "
                "≈ I (precondition_dim0 stacks) for A(p) ⪰ I to hold"
            )

    ind = make_residual_indicator(sep, spaces, result, tf=tf, chunk=chunk)
    M = int(result.n_modes)
    m0 = np.asarray(result.modes[0])[:M].astype(np.float64)
    num_params = sep.num_dims - 1

    # ‖L⁻¹b(p)‖ via the (R, R) Gram of the preconditioned masked rhs
    mask0 = np.asarray(sep.bc_masks[0], dtype=np.float64)
    B0 = np.asarray(sep.rhs[0], dtype=np.float64) * mask0
    if tf is not None:
        B0p = tf.apply_Linv(B0[:, tf.interior].T).T
    else:
        B0p = B0
    Gb = B0p @ B0p.T
    diag_tabs, rhs_tabs = _param_tables(sep)
    # the collocation measure scales A(p) and b(p) by the COMMON factor
    # c0(p) = Π_d w_d(p_d) (the base-term coefficient product, e.g.
    # (lumped mass)^d ~ h_p^d).  The relative indicator is invariant to
    # it, but the PHYSICAL system the A(p) ⪰ K0 argument bounds is the
    # c0-normalized one: A_phys = A/c0 with θ_0 ≡ 1 (what
    # validate_spd_family checked), so the absolute residual norm is
    # ‖L⁻¹b(p)‖/c0(p) × rel — forgetting the division understates the
    # bound by ~h_p^d (measured: 1.7e-3 at n_p=24, d=2)
    base_tabs = [diag_tabs[d][:1] for d in range(num_params)]

    # ‖u_r(p)‖ Grams: modes live in the preconditioned basis in both
    # calling modes, so mᵀm IS the K0-energy Gram; Euclidean needs the
    # nodal reconstruction
    Gu_K0 = m0 @ m0.T
    full0 = conv_tf.modes_to_full(m0) if conv_tf is not None else None
    Gu_l2 = full0 @ full0.T if full0 is not None else None

    lam_min_lower = lam_min_est = None
    if conv_tf is not None:
        n_int = len(conv_tf.interior)
        Kinv = conv_tf.apply_LinvT(conv_tf.apply_Linv(np.eye(n_int)))
        lam_min_lower = 1.0 / float(np.abs(Kinv).sum(axis=1).max())
        v = np.ones(n_int)
        for _ in range(80):
            v = conv_tf.apply_LinvT(conv_tf.apply_Linv(v))
            v /= np.linalg.norm(v)
        mu = float(v @ conv_tf.apply_LinvT(conv_tf.apply_Linv(v)))
        lam_min_est = 1.0 / mu

    mode_tabs = [np.asarray(result.modes[1 + d])[:M].astype(np.float64)
                 for d in range(num_params)]

    def _factor_products(samples, tabs):
        out = None
        for d in range(num_params):
            vals = np.asarray(
                evaluate_modes_1d(spaces[1 + d], tabs[d],
                                  np.asarray(samples)[:, d], xp=np)
            ).astype(np.float64)
            out = vals if out is None else out * vals
        return out

    def bound(samples):
        samples = np.asarray(samples, dtype=np.float64)
        rel = np.asarray(ind(samples), dtype=np.float64)
        fb = _factor_products(samples, rhs_tabs)
        nb = np.sqrt(np.maximum(
            np.einsum("br,rs,bs->b", fb, Gb, fb), 0.0))
        c0 = _factor_products(samples, base_tabs)[:, 0]
        abs_K0 = rel * nb / c0
        fu = _factor_products(samples, mode_tabs)
        nu_K0 = np.sqrt(np.maximum(
            np.einsum("bi,ij,bj->b", fu, Gu_K0, fu), 0.0))
        den = nu_K0 - abs_K0
        rel_energy = np.where(den > 0.0, abs_K0 / np.maximum(den, 1e-300),
                              np.inf)
        out = {"abs_K0": abs_K0, "rel_energy": rel_energy}
        if lam_min_lower is not None:
            abs_l2 = abs_K0 / np.sqrt(lam_min_lower)
            nu_l2 = np.sqrt(np.maximum(
                np.einsum("bi,ij,bj->b", fu, Gu_l2, fu), 0.0))
            den2 = nu_l2 - abs_l2
            out["abs_l2"] = abs_l2
            out["rel_l2"] = np.where(
                den2 > 0.0, abs_l2 / np.maximum(den2, 1e-300), np.inf)
        return out

    bound.lam_min_lower = lam_min_lower
    bound.lam_min_estimate = lam_min_est
    bound.indicator = ind
    return bound


# ------------------------------------------------- transient (space-time)

def make_transient_residual_indicator(sep, spaces, result, factors):
    """Batched per-sample relative residual for the TRANSIENT family
    (:func:`pgdrome_tpu.models.problems.moving_heat_source` IR: dims
    (x, t, P, v) with a parameter-independent space-time operator and a
    P-linear separated source) — the certification analogue of
    ``transient_dense_verifier`` at serving speed.

    Per sample the full-order system is the space-time solve
    ``A u = b(P, v)`` with ``A = Σ_t kron(ops0_t, ops1_t)`` and
    initial-condition rows pinned to identity (exactly the FOM of
    ``transient_dense_verifier``, models/problems.py).  The served
    solution is ``u_N(P, v) = Σ_k w_k(P, v)·X_k ⊗ T_k`` with interpolated
    parameter factors, so the residual is a sum of RANK-1 space-time
    terms:

        r(P, v) = Σ_r ρ_r(P, v)·(Mx F_r) ⊗ (Mt G_r)          (source)
                − Σ_{t,k} w_k·(ops0_t X_k) ⊗ (ops1_t T_k)    (A·u, IC
                                                              rows masked)
                − Σ_k w_k·X_k ⊗ (e_0 T_k[0])                 (IC rows)

    and its Frobenius norm follows from the precomputed host-f64 Gram
    quadratic form  ‖r‖² = z(P,v)ᵀ Q z(P,v),  Q = (S_x S_xᵀ) ∘ (S_t S_tᵀ)
    — NO per-sample space-time vector is materialized; cost per sample is
    one (K_tot²) f64 quadratic form on the host (K_tot = (T+1)·M + R).

    Precision note: the quadratic form cancels from O(‖b‖²) down to
    ‖r‖², so f64 roundoff (~K_tot·eps·‖b‖²) floors the measurable
    relative residual at ~sqrt(K_tot·1e-16) ≈ 1e-6..1e-7 — exactly the
    transient family's achievable accuracy floor (PERF.md round-3
    findings).  Below that the indicator saturates; calibration on
    FEM-verified pairs (``transient_dense_verifier(...).sample_errors``)
    absorbs the saturation into η conservatively (the floor only ever
    OVER-estimates the residual).

    Returns ``indicator(samples) -> (B,) float64`` with physical
    ``samples = (P, v)`` rows; plug it into :class:`Certifier`
    (``make_transient_certifier``) and serve through
    ``TransientVademecum.attach_certifier`` / ``error_bound``.
    ``indicator._tables is None`` — :meth:`Certifier.save` does not
    support this family yet (rebuild from the problem at load time)."""
    if sep.num_dims != 4:
        raise ValueError(
            "make_transient_residual_indicator covers the "
            "moving_heat_source family: dims (x, t, P, v)"
        )
    for d in (2, 3):
        od = np.asarray(sep.ops[d], dtype=np.float64)
        md = np.asarray(sep.mass[d], dtype=np.float64)
        for t in range(od.shape[0]):
            if not np.allclose(od[t], md, rtol=0.0,
                               atol=1e-12 * np.abs(md).max()):
                raise ValueError(
                    f"parameter dim {d} operator term {t} is not the "
                    "mass: the per-sample space-time system would need "
                    "per-sample operator coefficients"
                )

    M = int(result.n_modes)
    ops0 = np.asarray(sep.ops[0], dtype=np.float64)  # (T, nx, nx)
    ops1 = np.asarray(sep.ops[1], dtype=np.float64)  # (T, nt, nt)
    T = ops0.shape[0]
    X = np.asarray(result.modes[0], dtype=np.float64)[:M]  # (M, nx)
    Tm = np.asarray(result.modes[1], dtype=np.float64)[:M]  # (M, nt)
    Mx = np.asarray(sep.mass[0], dtype=np.float64)
    Mt = np.asarray(ops1[1], dtype=np.float64)  # time mass (FD convention
    # of the family: ops1[1] is the M_t factor — same as the verifier)
    Fx = np.asarray(factors[0], dtype=np.float64)  # (R, nx)
    Ft = np.asarray(factors[1], dtype=np.float64)  # (R, nt)
    Fv = np.asarray(factors[2], dtype=np.float64)  # (R, nv)
    R = Fx.shape[0]

    # rank-1 space/time vector stacks, in block order [A-terms | IC | rhs]
    SA_blocks, SB_blocks = [], []
    for t in range(T):
        SA_blocks.append(X @ ops0[t].T)  # (M, nx)
        bt = Tm @ ops1[t].T
        bt[:, 0] = 0.0  # IC rows masked out of A·u
        SB_blocks.append(bt)
    SA_blocks.append(X)  # IC identity rows: u(x, t=0)
    e0 = np.zeros((M, Tm.shape[1]))
    e0[:, 0] = Tm[:, 0]
    SB_blocks.append(e0)
    SA_blocks.append(Fx @ Mx.T)  # source: (Mx F_r) ⊗ (Mt G_r)
    br = Ft @ Mt.T
    br[:, 0] = 0.0  # rhs IC rows are zeroed in the FOM
    SB_blocks.append(br)
    SA = np.concatenate(SA_blocks)  # (K_tot, nx)
    SB = np.concatenate(SB_blocks)  # (K_tot, nt)
    Q = (SA @ SA.T) * (SB @ SB.T)  # (K_tot, K_tot) f64
    K_tot = Q.shape[0]
    rhs_sl = slice(K_tot - R, K_tot)
    Q_rr = Q[rhs_sl, rhs_sl]

    VP, Vv = spaces[2], spaces[3]

    def indicator(samples):
        samples = np.asarray(samples, dtype=np.float64)
        if samples.ndim != 2 or samples.shape[1] != 2:
            raise ValueError(f"samples must be (B, 2)=(P, v), got {samples.shape}")
        P_val = samples[:, 0]
        v_val = samples[:, 1]
        wP = np.asarray(
            evaluate_modes_1d(VP, np.asarray(result.modes[2])[:M], P_val,
                              xp=np)
        ).astype(np.float64)  # (B, M)
        wv = np.asarray(
            evaluate_modes_1d(Vv, np.asarray(result.modes[3])[:M], v_val,
                              xp=np)
        ).astype(np.float64)
        w = wP * wv  # (B, M)
        fv = np.asarray(
            evaluate_modes_1d(Vv, Fv, v_val, xp=np)
        ).astype(np.float64)  # (B, R)
        rho = P_val[:, None] * fv
        z = np.concatenate(
            [np.tile(-w, (1, T)), -w, rho], axis=1
        )  # (B, K_tot)
        r2 = np.einsum("bi,bi->b", z @ Q, z)
        b2 = np.einsum("bi,bi->b", rho @ Q_rr, rho)
        # f64 cancellation floor: clip the quadratic form at its own
        # roundoff level instead of returning negative/NaN
        floor = K_tot * 1e-16 * np.abs(b2)
        return np.sqrt(np.maximum(r2, floor) / b2)

    indicator.n_modes = M
    indicator.chunk = None
    indicator._tables = None  # Certifier.save unsupported (see docstring)
    return indicator


def make_transient_certifier(sep, spaces, result, factors, eta=None):
    """One-call constructor: :func:`make_transient_residual_indicator`
    wrapped in a :class:`Certifier`.  Calibrate with FEM-verified pairs
    from ``transient_dense_verifier(...).sample_errors`` (mind its
    integer grid-index convention — convert to physical (P, v) for the
    certifier)."""
    return Certifier(
        make_transient_residual_indicator(sep, spaces, result, factors),
        eta=eta,
    )
