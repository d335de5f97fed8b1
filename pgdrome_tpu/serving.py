"""Deployment container for trained PGD vademecums.

The reference's deployment story is the model layer: save pxdmf, reload,
evaluate one parameter sample at a time (model.py:724-860).  On TPU the
serving workload is the opposite shape — huge parameter batches against a
fixed trained decomposition — so this container bundles the trained modes
with the jitted batch paths:

* :meth:`Vademecum.fields` — full-field reconstruction, (B, n0) per call
  (fused Pallas kernel on TPU, XLA elsewhere; parallel/vademecum).
* :meth:`Vademecum.sensors` — sensor/QoI responses at fixed points:
  returns the jitted sweep ``fn(samples) -> (B, n_pts)``; the fixed-dim
  modes are tabled once per point set (small LRU cache).
* :meth:`Vademecum.errors` — batched relative-L2 errors vs FOM fields
  (reference PGDErrorComputation.evaluate_error semantics,
  model.py:1768-1825).
* :meth:`Vademecum.sensors_jacobian` — batched parameter sensitivities
  ∂r/∂p at fixed sensor points (analytic through the rank-1 structure).
* :meth:`Vademecum.moments` / :meth:`Vademecum.factor_moments` —
  streaming Monte-Carlo mean/variance FIELDS over arbitrarily large
  sample batches, reduced on-device to K-sized factor moments (the
  (B, n0) fields are never materialized).
* :meth:`Vademecum.derivative` — the du/dx vademecum: dim-0 modes
  replaced by their exact DG(degree−1) derivatives once, so spatial-
  derivative fields/sensors serve at full sweep rate (the reference
  differentiates per evaluated sample, model.py:1088-1206).
* :meth:`Vademecum.save` / :meth:`Vademecum.load` — single-file HDF5
  persistence of the deployed (full-dof, mode-trimmed) decomposition.
* :meth:`Vademecum.to_pgd` — bridge into the reference-style PGD container
  (pxdmf export, derivatives, reducers — the whole model layer).

Energy-basis solves (precondition_dim0) pass their transform once at
construction; the container stores deployment-ready full-dof modes.

:class:`TransientVademecum` serves SPACE-TIME results (e.g.
moving_heat_source's (x, t, P, v)) through the same machinery by
kron-flattening the field dims' modes once; its sensors take (x, t)
points — virtual gauges swept over parameter batches.
"""

from __future__ import annotations

import numpy as np
import h5py
import jax.numpy as jnp


def _stream_pipeline(fn, samples, chunk, depth, consumer):
    """Shared chunked-dispatch pipeline behind fields_stream /
    sensors_stream: ``depth`` dispatches in flight, drain-BEFORE-dispatch
    (PJRT allocates the output at enqueue time, so dispatch-then-drain
    holds depth+1 live blocks — 3 × 4.3 GB OOMs a 16 GB HBM at bench
    scale, measured).  The tail chunk is padded to the compiled shape
    and trimmed on output.  ``consumer=None`` collects host numpy."""
    import jax

    samples = jnp.asarray(samples)
    B = samples.shape[0]
    collect = consumer is None
    if B == 0:
        # np.concatenate([]) raises; an empty query batch is a valid
        # server input and should produce an empty result.  The shape
        # probe reuses the normal chunk shape (warm cache: no compile).
        if collect:
            y0 = fn(jnp.zeros((chunk,) + samples.shape[1:], samples.dtype))
            return np.zeros((0,) + y0.shape[1:], np.asarray(y0[:0]).dtype)
        return []
    if collect:
        out_np = []
        consumer = lambda y: out_np.append(np.asarray(y))  # noqa: E731
    # pad the tail chunk with the first sample so every dispatch hits
    # the same compiled shape (a ragged tail would recompile)
    pad = (-B) % chunk if B > chunk else 0
    if pad:
        filler = jnp.broadcast_to(samples[:1], (pad, samples.shape[1]))
        samples = jnp.concatenate([samples, filler], axis=0)
    results = []
    pending = []  # (device block, valid rows)
    for start in range(0, samples.shape[0], chunk):
        if len(pending) >= depth:
            y, valid = pending.pop(0)
            jax.block_until_ready(y)
            results.append(consumer(y[:valid] if valid < y.shape[0] else y))
            del y
        sl = samples[start : start + chunk]
        pending.append((fn(sl), min(chunk, B - start)))
    for y, valid in pending:
        jax.block_until_ready(y)
        results.append(consumer(y[:valid] if valid < y.shape[0] else y))
        del y
    if collect:
        return np.concatenate(out_np, axis=0)
    return results


class Vademecum:
    """A trained PGD decomposition packaged for batch serving.

    spaces: per-dim function spaces; result: fast-path PGDResult;
    dim0_transform: the Dim0Transform when the solve ran in the energy
    basis (modes are mapped back to full dofs here, once).
    dtype: serving dtype (float32 default — the TPU sweep path)."""

    def __init__(self, spaces, result, dim0_transform=None, method="auto",
                 dtype=np.float32):
        import jax

        from pgdrome_tpu.separated import PGDResult

        if np.dtype(dtype) == np.float64 and not jax.config.jax_enable_x64:
            # jnp.asarray(f64) with x64 off silently truncates to f32 —
            # refuse instead of serving wrong-precision fields
            raise ValueError(
                "dtype=float64 requires jax x64 "
                "(jax.config.update('jax_enable_x64', True))"
            )
        self.spaces = list(spaces)
        self.n_modes = int(result.n_modes)
        self._method = method
        dim0 = np.asarray(result.modes[0])[: self.n_modes]
        if dim0_transform is not None:
            dim0 = dim0_transform.modes_to_full(dim0)
        modes = [np.asarray(dim0, dtype=dtype)] + [
            np.asarray(m, dtype=dtype)[: self.n_modes] for m in result.modes[1:]
        ]
        self._modes = [jnp.asarray(m) for m in modes]
        self._result = PGDResult(
            modes=self._modes, n_modes=self.n_modes,
            amplitudes=np.asarray(result.amplitudes)[: self.n_modes],
            alpha=np.asarray(result.alpha)[: self.n_modes],
            fp_its=np.asarray(result.fp_its)[: self.n_modes],
            normU0=result.normU0,
        )
        self._sweep = None
        self._sweep_by_dtype = {}  # out_dtype name → jitted sweep
        # small LRU: each entry holds a jitted function + tabled modes; an
        # unbounded dict would leak executables in a long-running server
        # querying many distinct point sets (ADVICE round 2)
        from collections import OrderedDict

        self._sensor_cache = OrderedDict()
        self._sensor_cache_max = 8
        self._moments_fn = None

    @property
    def num_dims(self):
        return len(self._modes)

    def fields(self, samples):
        """Full-field reconstruction u(·; p) for a sample batch:
        (B, d-1) → (B, n0)."""
        from pgdrome_tpu.parallel.vademecum import make_sweep_fn

        if self._sweep is None:
            self._sweep = make_sweep_fn(
                self.spaces, self._modes, self.n_modes, method=self._method
            )
        return self._sweep(jnp.asarray(samples))

    def fields_stream(self, samples, consumer=None, chunk=524_288, depth=2,
                      out_dtype=None):
        """Chunked, pipelined field sweep for batches too large to hold in
        HBM at once — the serving analogue of the bench's depth-2
        double-buffering, packaged behind ONE call (round-2 VERDICT #5:
        no caller-side tricks).

        Splits ``samples`` into ``chunk``-sized dispatches and keeps
        ``depth`` of them in flight: the ~40 ms tunnel dispatch latency of
        chunk i+1 overlaps chunk i's on-chip compute.  Each completed
        (chunk_i, n0) device block is handed to ``consumer`` (reduce it or
        copy what you need promptly — at bench scale each block is ~4 GB
        and ``depth + 1`` live blocks OOM a 16 GB HBM; the block is
        dropped right after the call).  ``consumer=None`` collects the
        blocks as HOST numpy arrays and returns their concatenation
        (fine for small sweeps; a 4 GB+ result belongs in a consumer).

        ``out_dtype``: serve the fields in a narrower dtype (e.g.
        ``jnp.bfloat16``, ~4e-3 output quantization; compute stays f32).
        Halved blocks let ``chunk`` double within the same HBM bound —
        at bench scale chunk=1M bf16 streams at the compute-marginal
        rate where f32 is HBM-capped at 512k chunks (PERF.md round-3).

        Returns the list of consumer results (or the concatenated array
        when ``consumer is None``)."""
        from pgdrome_tpu.parallel.vademecum import make_sweep_fn

        if out_dtype is None:
            if self._sweep is None:
                self._sweep = make_sweep_fn(
                    self.spaces, self._modes, self.n_modes,
                    method=self._method,
                )
            fn = self._sweep
        else:
            key = np.dtype(out_dtype).name
            fn = self._sweep_by_dtype.get(key)
            if fn is None:
                fn = make_sweep_fn(
                    self.spaces, self._modes, self.n_modes,
                    method=self._method, out_dtype=out_dtype,
                )
                self._sweep_by_dtype[key] = fn
        return _stream_pipeline(fn, samples, chunk, depth, consumer)

    def sensors_stream(self, points, samples, consumer=None,
                       chunk=8_388_608, depth=2):
        """Chunked, pipelined sensor sweep — :meth:`fields_stream` for
        :meth:`sensors`.  Sensor outputs are tiny ((chunk, n_pts) —
        no HBM pressure), so the chunk can be large and depth-2
        pipelining runs the sweep at its compute-marginal rate: the
        ~40 ms/dispatch tunnel enqueue hides under the previous chunk's
        on-chip compute once chunk/marginal-rate exceeds it (measured:
        the crossover is ~5M samples on v5e-1)."""
        return _stream_pipeline(self.sensors(points), samples, chunk, depth,
                                consumer)

    def sharded_fields(self, samples, mesh=None):
        """fields() with the sample axis sharded over the device mesh."""
        from pgdrome_tpu.parallel.vademecum import sharded_sweep

        return sharded_sweep(
            self.spaces, self._modes, self.n_modes, samples, mesh=mesh
        )

    def sensors(self, points):
        """The jitted sensor sweep for a fixed point set: returns
        fn(samples (B, d-1)) → (B, n_pts).  Tables the fixed-dim modes at
        the points once; keyed collision-free by the point bytes (NOT the
        reference's sum-of-coordinates hash, model.py:116)."""
        from pgdrome_tpu.parallel.vademecum import make_sensor_sweep_fn

        pts = np.asarray(points, dtype=np.float64)
        key = (pts.tobytes(), pts.shape)
        fn = self._sensor_cache.get(key)
        if fn is None:
            fn = make_sensor_sweep_fn(
                self.spaces, self._modes, self.n_modes, pts,
                method=self._method,
            )
            self._sensor_cache[key] = fn
            while len(self._sensor_cache) > self._sensor_cache_max:
                self._sensor_cache.popitem(last=False)
        else:
            self._sensor_cache.move_to_end(key)
        return fn

    def sensors_jacobian(self, points):
        """The jitted parameter-sensitivity sweep for a fixed point set:
        returns fn(samples (B, d-1)) → (B, n_pts·value_size, d-1) with
        ∂(sensor response)/∂p_j in column j — analytic through the PGD
        rank-1 structure (one differentiated factor per column), no
        finite differences.  Cached alongside :meth:`sensors` (same
        LRU)."""
        from pgdrome_tpu.parallel.vademecum import make_sensor_jacobian_fn

        pts = np.asarray(points, dtype=np.float64)
        key = ("jac", pts.tobytes(), pts.shape)
        fn = self._sensor_cache.get(key)
        if fn is None:
            fn = make_sensor_jacobian_fn(
                self.spaces, self._modes, self.n_modes, pts
            )
            self._sensor_cache[key] = fn
            while len(self._sensor_cache) > self._sensor_cache_max:
                self._sensor_cache.popitem(last=False)
        else:
            self._sensor_cache.move_to_end(key)
        return fn

    def factor_moments(self, samples, chunk=8_388_608, depth=2):
        """Streaming first/second raw moments of the mode-product factor
        vector over the sample batch: returns ``(fbar (K,), C (K, K))``
        with fbar = E[fac], C = E[fac facᵀ] — K = the padded mode count.

        Chunked like :meth:`sensors_stream` (the per-chunk outputs are a
        K-vector and a K×K matrix — no HBM pressure), device-reduced in
        f32, host-accumulated across chunks in f64.  The tail chunk is
        padded and masked with a 0/1 weight row, so every dispatch hits
        one compiled shape."""
        import jax

        from pgdrome_tpu.parallel.vademecum import make_factor_moments_fn

        if self._moments_fn is None:
            self._moments_fn = make_factor_moments_fn(
                self.spaces, self._modes, self.n_modes
            )
        fn = self._moments_fn
        samples = jnp.asarray(samples)
        B = int(samples.shape[0])
        if B == 0:
            raise ValueError("factor_moments needs at least one sample")
        chunk = min(chunk, B)
        pad = (-B) % chunk
        if pad:
            filler = jnp.broadcast_to(samples[:1], (pad, samples.shape[1]))
            samples = jnp.concatenate([samples, filler], axis=0)
        ones = jnp.ones((chunk,), samples.dtype)
        n_max = int(self._modes[1].shape[0])
        s1 = np.zeros(n_max, np.float64)
        s2 = np.zeros((n_max, n_max), np.float64)
        pending = []
        for start in range(0, int(samples.shape[0]), chunk):
            if len(pending) >= depth:
                y1, y2 = pending.pop(0)
                jax.block_until_ready(y2)
                s1 += np.asarray(y1, np.float64)
                s2 += np.asarray(y2, np.float64)
            valid = min(chunk, B - start)
            w = ones if valid == chunk else (
                jnp.arange(chunk) < valid
            ).astype(samples.dtype)
            pending.append(fn(samples[start : start + chunk], w))
        for y1, y2 in pending:
            jax.block_until_ready(y2)
            s1 += np.asarray(y1, np.float64)
            s2 += np.asarray(y2, np.float64)
        return s1 / B, s2 / B

    def moments(self, samples, chunk=8_388_608, depth=2):
        """Monte-Carlo mean and variance FIELDS over the sample batch:
        returns ``(mean (n0·value_size,), var (n0·value_size,))``.

        Exact reduction through the separated structure — with
        fac_b the per-sample factor vector and M₀ the dim-0 mode table,
        mean = f̄ᵀM₀ and var_i = (M₀ᵀ Cov M₀)_{ii}: only the K/K² factor
        moments are accumulated on device (:meth:`factor_moments`), the
        field-sized outer products happen once on the host in f64.
        Serving-rate analogue: the sensor sweep (compute-bound), NOT the
        HBM-bound field sweep — UQ moment fields over 10⁸ samples cost
        seconds.  The (tiny) covariance subtraction runs in f64, so
        var ≳ 1e-10·mean² stays meaningful; device accumulation is f32
        (relative error ~1e-6 on C's entries)."""
        fbar, C = self.factor_moments(samples, chunk=chunk, depth=depth)
        M0 = np.asarray(self._modes[0], np.float64)  # (n_max, n0)
        mean = fbar @ M0
        cov = C - np.outer(fbar, fbar)
        var = np.einsum("ki,ki->i", cov @ M0, M0)
        return mean, np.maximum(var, 0.0)

    def fit_parameters(self, points, observations, p0=None, n_starts=8,
                       seed=0, n_iter=30, damping=1e-9, weights=None,
                       prior=None, return_covariance=False):
        """Identify the parameters behind observed sensor values: batched
        box-projected Gauss–Newton on ``‖sensor(p) − obs‖²`` with the
        analytic rank-1 Jacobian (parallel.vademecum.make_fit_fn) —
        every (observation × start) runs in ONE compiled device program.

        points: sensor locations (same contract as :meth:`sensors`);
        observations: (B, n_out) measured responses; p0: optional
        explicit starts (B, d_p) — otherwise ``n_starts`` Latin-hypercube
        starts per observation are raced and the best residual wins
        (the least-squares landscape of a multi-mode vademecum is
        multimodal; a single start finds local optima).  ``weights``:
        per-observation (n_out,) weights (1/σ_o → resnorm is a χ
        statistic); ``prior=(p_prior, gamma)``: Tikhonov pull toward
        p_prior — makes underdetermined gauge sets well-posed (see
        make_fit_fn).

        Returns ``(p_hat (B, d_p), resnorm (B,))``; with
        ``return_covariance=True`` additionally the LINEARIZED posterior
        covariance ``cov (B, d_p, d_p)`` = σ̂²(JᵀJ)⁻¹ at p_hat with
        σ̂² = resnorm²/(n_out − d_p) — the standard Gauss–Newton
        calibration-uncertainty estimate (exact for models linear in p,
        a curvature approximation otherwise; needs n_out > d_p).
        Accuracy follows the serving dtype (f64 ≈ 1e-9, f32 ≈ 1e-4 —
        the normal equations square the conditioning).  The reference
        has no inverse capability; its closest workflow is per-sample
        scipy.optimize over evaluate() calls."""
        from pgdrome_tpu.parallel.vademecum import make_fit_fn

        pts_arr = np.asarray(points, np.float64)
        key = ("fit", pts_arr.tobytes(), pts_arr.shape,
               int(n_iter), float(damping),
               (np.asarray(weights, np.float64).tobytes()
                if weights is not None else b""),
               (np.asarray(prior[0], np.float64).tobytes()
                + np.asarray(prior[1], np.float64).tobytes()
                if prior is not None else b""))
        fn = self._sensor_cache.get(key)
        if fn is not None:
            self._sensor_cache.move_to_end(key)
        if fn is None:
            fn = make_fit_fn(
                self.spaces, self._modes, self.n_modes,
                self._fit_points(points), table=self._fit_table(points),
                n_iter=n_iter, damping=damping, weights=weights,
                prior=prior,
            )
            self._sensor_cache[key] = fn
            while len(self._sensor_cache) > self._sensor_cache_max:
                self._sensor_cache.popitem(last=False)
        obs = jnp.asarray(observations)
        if obs.ndim != 2:
            raise ValueError(
                f"observations must be (B, n_out), got {obs.shape}"
            )
        B = int(obs.shape[0])
        d_p = self.num_dims - 1
        lo = np.array([float(s.mesh().coordinates().min())
                       for s in self.spaces[1:]])
        hi = np.array([float(s.mesh().coordinates().max())
                       for s in self.spaces[1:]])
        if p0 is not None:
            p0 = jnp.asarray(p0)
            if p0.shape != (B, d_p):
                raise ValueError(
                    f"p0 must be ({B}, {d_p}), got {p0.shape}"
                )
            p_hat, res = fn(obs, p0.astype(obs.dtype))
            p_hat, res = np.asarray(p_hat), np.asarray(res)
        else:
            from scipy.stats import qmc

            S = int(n_starts)
            starts = qmc.LatinHypercube(d=d_p, seed=seed).random(S)
            # shrink 2% off the box edges: the clip boundary is a GN
            # fixed point, edge starts waste their run there
            starts = lo + (0.02 + 0.96 * starts) * (hi - lo)
            obs_t = jnp.repeat(obs, S, axis=0)            # (B·S, n_out)
            p0_t = jnp.asarray(np.tile(starts, (B, 1)), obs.dtype)
            p_all, r_all = fn(obs_t, p0_t)
            p_all = np.asarray(p_all).reshape(B, S, d_p)
            r_all = np.asarray(r_all).reshape(B, S)
            # pick the winner by the FULL objective each start minimized:
            # with a prior, two starts can reach near-equal data residual
            # at different manifold points — the regularized cost is what
            # distinguishes the prior-closest one
            cost_all = r_all**2
            if prior is not None:
                g2 = np.broadcast_to(
                    np.asarray(prior[1], np.float64) ** 2, (d_p,)
                )
                pp = np.asarray(prior[0], np.float64).reshape(-1)
                cost_all = cost_all + np.sum(
                    g2 * (p_all - pp) ** 2, axis=-1
                )
            best = np.argmin(cost_all, axis=1)
            idx = np.arange(B)
            p_hat, res = p_all[idx, best], r_all[idx, best]
        if not return_covariance:
            return p_hat, res
        n_out = int(obs.shape[1])
        if n_out <= d_p:
            raise ValueError(
                f"return_covariance needs n_out > d_p "
                f"({n_out} sensors for {d_p} parameters)"
            )
        J = np.asarray(
            self.sensors_jacobian(points)(jnp.asarray(p_hat)), np.float64
        )  # (B, n_out, d_p)
        if weights is not None:
            # resnorm is already the weighted norm; weight J to match
            J = J * np.asarray(weights, np.float64).reshape(-1)[None, :,
                                                                None]
        JtJ = np.einsum("bod,boe->bde", J, J)
        if prior is not None:
            # the linearized posterior of the REGULARIZED objective:
            # σ̂²(JᵀJ + Γ²)⁻¹ — without the prior precision, a gauge set
            # that is well-posed only because of the prior gets a
            # near-singular JᵀJ and garbage (1e10+) 'posterior' entries
            JtJ = JtJ + np.diag(np.broadcast_to(
                np.asarray(prior[1], np.float64) ** 2, (d_p,)
            ))[None]
        sigma2 = res.astype(np.float64) ** 2 / (n_out - d_p)
        cov = sigma2[:, None, None] * np.linalg.inv(JtJ)
        return p_hat, res, cov

    def sample_posterior(self, points, observation, sigma, n_samples=1000,
                         n_chains=64, burn=0.5, n_adapt=4, adapt_steps=150,
                         seed=0, prior=None, target_accept=0.3):
        """Sample the FULL Bayesian posterior of the parameters given
        observed sensor values — batched random-walk Metropolis over the
        vademecum (parallel.bayes.make_mcmc_fn): all ``n_chains`` chains
        advance together, one table contraction per step, the whole
        sampler one compiled program.

        Model: obs = sensor(p) + N(0, diag(σ²)), p ~ uniform on the
        parameter box, optionally × Gaussian ``prior=(p_prior, gamma)``
        with γ = 1/σ_prior (the :meth:`fit_parameters` convention — the
        MAP of that fit is the mode of this posterior).  ``sigma``:
        scalar or (n_out,) observation noise.

        Pipeline: (1) MAP via :meth:`fit_parameters` + Laplace
        (JᵀΣ⁻¹J + Γ²)⁻¹ proposal shape from the analytic Jacobian;
        (2) ``n_adapt`` short adaptation rounds tune the global step
        scale to ``target_accept`` and re-estimate the proposal shape
        from the pooled walkers (all rounds reuse ONE executable —
        scale/shape are runtime inputs); (3) the main run, first
        ``burn`` fraction discarded.  Adaptation stops before the kept
        samples, so the recorded chain is a valid Markov chain.

        Returns dict: ``samples (n_samples·n_chains, d_p)`` (pooled
        post-burn draws), ``chains (n_samples, n_chains, d_p)``,
        ``acceptance``, ``r_hat (d_p,)`` / ``ess (d_p,)``
        (uq.split_rhat / uq.effective_sample_size — check r_hat ≤ 1.05
        before trusting intervals), ``p_map``, ``logpost_sigma_note``.
        Accuracy follows the serving dtype (build the vademecum with
        ``dtype=np.float64`` for tight posteriors — f32 likelihoods
        blur below σ ~1e-4 relative).  The reference has no Bayesian
        capability; its closest workflow is per-sample scipy over
        ``evaluate()`` calls."""
        import jax

        from pgdrome_tpu.parallel.bayes import make_mcmc_fn
        from pgdrome_tpu.uq import effective_sample_size, split_rhat

        if n_chains < 2:
            raise ValueError("n_chains must be >= 2 (R-hat needs them)")
        if n_samples < 4:
            raise ValueError("n_samples must be >= 4")
        dtype = np.asarray(self._modes[0]).dtype
        obs = np.asarray(observation, np.float64).reshape(-1)
        n_out = obs.shape[0]
        d_p = self.num_dims - 1
        sig = np.broadcast_to(
            np.asarray(sigma, np.float64).reshape(-1), (n_out,)
        ).astype(np.float64)
        if np.any(sig <= 0):
            raise ValueError("sigma must be positive")
        lo = np.array([float(s.mesh().coordinates().min())
                       for s in self.spaces[1:]])
        hi = np.array([float(s.mesh().coordinates().max())
                       for s in self.spaces[1:]])
        rng = np.random.default_rng(seed)

        # --- MAP + Laplace proposal shape ------------------------------
        p_map, _ = self.fit_parameters(
            points, obs[None], weights=1.0 / sig, prior=prior,
            n_starts=8, seed=seed,
        )
        p_map = np.asarray(p_map, np.float64)[0]
        J = np.asarray(
            self.sensors_jacobian(points)(
                jnp.asarray(p_map[None], dtype)
            ), np.float64,
        )[0]  # (n_out, d_p)
        Jw = J / sig[:, None]
        H = Jw.T @ Jw
        if prior is not None:
            H = H + np.diag(np.broadcast_to(
                np.asarray(prior[1], np.float64) ** 2, (d_p,)
            ))
        # Laplace covariance; fall back to box-scaled diagonal where the
        # information matrix is (near-)singular
        jitter = 1e-12 * max(np.trace(H) / d_p, 1e-300)
        try:
            cov0 = np.linalg.inv(H + jitter * np.eye(d_p))
        except np.linalg.LinAlgError:
            cov0 = np.diag(((hi - lo) / 20.0) ** 2)
        if not np.all(np.isfinite(cov0)):
            cov0 = np.diag(((hi - lo) / 20.0) ** 2)
        # cap the proposal at the box scale: a flat likelihood direction
        # must not fling every proposal outside the box
        box_var = ((hi - lo) / 2.0) ** 2
        s = np.sqrt(np.minimum(np.diag(cov0), box_var)
                    / np.maximum(np.diag(cov0), 1e-300))
        cov0 = cov0 * np.outer(s, s)

        def _chol(C):
            C = 0.5 * (C + C.T)
            eps = 1e-12 * max(np.trace(C) / d_p, 1e-300)
            for _ in range(8):
                try:
                    return np.linalg.cholesky(C + eps * np.eye(d_p))
                except np.linalg.LinAlgError:
                    eps *= 100.0
            return np.diag(np.sqrt(np.maximum(np.diag(C), 1e-300)))

        chol = _chol(cov0)
        scale = 2.38 / np.sqrt(d_p)

        # --- chain starts: MAP + proposal-shaped scatter, kept in-box --
        starts = p_map[None, :] + rng.standard_normal(
            (int(n_chains), d_p)
        ) @ chol.T
        margin = 1e-6 * (hi - lo)
        starts = np.clip(starts, lo + margin, hi - margin)

        def _fn(steps):
            key = ("mcmc", self._fit_points(points).tobytes(),
                   np.asarray(points).shape, int(steps),
                   (np.asarray(prior[0], np.float64).tobytes()
                    + np.asarray(prior[1], np.float64).tobytes()
                    if prior is not None else b""))
            fn = self._sensor_cache.get(key)
            if fn is None:
                fn = make_mcmc_fn(
                    self.spaces, self._modes, self.n_modes,
                    self._fit_points(points),
                    table=self._fit_table(points),
                    n_steps=int(steps), prior=prior,
                )
                self._sensor_cache[key] = fn
                while len(self._sensor_cache) > self._sensor_cache_max:
                    self._sensor_cache.popitem(last=False)
            else:
                self._sensor_cache.move_to_end(key)
            return fn

        obs_j = jnp.asarray(obs, dtype)
        sig_j = jnp.asarray(sig, dtype)
        state = jnp.asarray(starts, dtype)

        # --- adaptation: tune scale to target_accept, re-estimate the
        # proposal shape from the pooled walkers ------------------------
        if n_adapt > 0:
            fn_a = _fn(adapt_steps)
            for i in range(int(n_adapt)):
                key = jax.random.PRNGKey(
                    np.uint32(rng.integers(0, 2**31 - 1))
                )
                chain, n_acc = fn_a(obs_j, sig_j, state,
                                    jnp.asarray(chol, dtype),
                                    jnp.asarray(scale, dtype), key)
                state = chain[-1]
                acc = float(np.mean(np.asarray(n_acc))) / adapt_steps
                scale *= float(np.exp(1.5 * (acc - target_accept)))
                scale = float(np.clip(scale, 1e-4, 1e2))
                pool = np.asarray(
                    chain[adapt_steps // 2:], np.float64
                ).reshape(-1, d_p)
                cov_emp = np.cov(pool.T).reshape(d_p, d_p)
                if (np.all(np.isfinite(cov_emp))
                        and np.trace(cov_emp) > 0):
                    chol = _chol(cov_emp)

        # --- main run --------------------------------------------------
        n_burn = int(np.ceil(float(burn) * n_samples))
        n_total = int(n_samples) + n_burn
        fn_m = _fn(n_total)
        key = jax.random.PRNGKey(np.uint32(rng.integers(0, 2**31 - 1)))
        chain, n_acc = fn_m(obs_j, sig_j, state,
                            jnp.asarray(chol, dtype),
                            jnp.asarray(scale, dtype), key)
        kept = np.asarray(chain, np.float64)[n_burn:]
        acc = float(np.mean(np.asarray(n_acc))) / n_total
        return {
            "samples": kept.reshape(-1, d_p),
            "chains": kept,
            "acceptance": acc,
            "r_hat": split_rhat(kept),
            "ess": effective_sample_size(kept),
            "p_map": p_map,
            "proposal_scale": scale,
            "proposal_chol": chol,
        }

    def design_sensors(self, candidates, k, samples=None):
        """D-optimal sensor placement for parameter identification:
        greedily pick ``k`` of the ``candidates`` (same point contract
        as :meth:`sensors`) maximizing ``det(JᵀJ)`` of the resulting
        calibration problem — the volume of the posterior confidence
        ellipsoid of :meth:`fit_parameters` shrinks as 1/√det.

        J rows are the analytic parameter sensitivities of each
        candidate response, averaged (in the Gram) over ``samples``
        (default: the parameter-box center) so the design is not tuned
        to a single nominal point.  Greedy with the standard
        information-matrix update (exact for k ≤ d_p where det grows
        from zero rank, 1−1/e-competitive beyond); O(n_cand·k·d_p²)
        host work after one Jacobian sweep.

        Returns ``(indices (k,), points (k, …))`` into/from the
        candidate array.  The reference has no experiment-design story
        at all."""
        cands = np.asarray(candidates, np.float64)
        n_cand = cands.shape[0]
        k = int(k)
        if not 1 <= k <= n_cand:
            raise ValueError(f"k must be in 1..{n_cand}, got {k}")
        d_p = self.num_dims - 1
        if samples is None:
            lo = np.array([float(s.mesh().coordinates().min())
                           for s in self.spaces[1:]])
            hi = np.array([float(s.mesh().coordinates().max())
                           for s in self.spaces[1:]])
            samples = (0.5 * (lo + hi))[None, :]
        samples = jnp.asarray(np.asarray(samples, np.float64))
        J = np.asarray(self.sensors_jacobian(candidates)(samples),
                       np.float64)            # (S, n_out, d_p)
        vs = max(1, J.shape[1] // n_cand)     # value_size outputs/point
        # per-candidate information atoms, sample-averaged:
        # A_c = mean_s Σ_comp J_sc J_scᵀ  (d_p, d_p)
        A = np.einsum("sod,soe->ode", J, J) / J.shape[0]
        A = A.reshape(n_cand, vs, d_p, d_p).sum(axis=1)
        chosen: list = []
        # regularized det: M starts at eps·I so det is defined below
        # rank d_p and the greedy still orders by information gain
        eps = 1e-12 * (np.trace(A, axis1=1, axis2=2).max() + 1e-300)
        M = np.eye(d_p) * eps
        avail = np.ones(n_cand, dtype=bool)
        for _ in range(k):
            Minv = np.linalg.inv(M)
            # det(M + A_c) = det(M)·det(I + Minv A_c): rank-d_p form,
            # evaluated for every available candidate at once
            gain = np.linalg.det(
                np.eye(d_p)[None] + np.einsum("de,cef->cdf", Minv, A)
            )
            gain[~avail] = -np.inf
            c = int(np.argmax(gain))
            chosen.append(c)
            avail[c] = False
            M = M + A[c]
        idx = np.asarray(chosen)
        return idx, cands[idx]

    def _fit_points(self, points):
        return np.asarray(points, dtype=np.float64)

    def _fit_table(self, points):
        # base class: the fit builder computes its own table from the
        # dim-0 space; TransientVademecum overrides with the space-time
        # product table
        return None

    def _fixed_weights(self, fixed):
        """Validate ``fixed`` {param index → value} and return the
        (n_modes,) per-mode weights of the fixed factors' values."""
        from pgdrome_tpu.separated import evaluate_modes_1d

        d_p = self.num_dims - 1
        fixed = {int(j): float(v) for j, v in dict(fixed).items()}
        if not fixed:
            raise ValueError("fixed must name at least one parameter dim")
        if not all(0 <= j < d_p for j in fixed):
            raise ValueError(f"parameter indices must be in 0..{d_p - 1}")
        if len(fixed) >= d_p:
            raise ValueError(
                "at least one parameter dim must stay free (to evaluate "
                "at a single full parameter point, use fields/sensors)"
            )
        w = np.ones(self.n_modes, np.float64)
        for j, v in fixed.items():
            V = self.spaces[1 + j]
            lo = float(V.mesh().coordinates().min())
            hi = float(V.mesh().coordinates().max())
            if not lo <= v <= hi:
                raise ValueError(
                    f"fixed value {v} for parameter {j} is outside its "
                    f"box [{lo}, {hi}]"
                )
            vals = evaluate_modes_1d(
                V, np.asarray(self._modes[1 + j], np.float64),
                np.array([v]), xp=np,
            )
            w *= np.asarray(vals, np.float64).reshape(-1)
        return fixed, w

    def fix_parameters(self, fixed):
        """Partial evaluation: fold FIXED parameter dims into the dim-0
        mode weights and return a LOWER-dimensional vademecum over the
        remaining parameters — every serving path (fields/sensors/
        streams/sobol/fit/posterior) then runs on the conditional
        solution u(·; p_free | p_fixed) at full rate.

        fixed: {parameter index (0-based, the fit/sobol convention) →
        value inside that parameter's box}.  At least one parameter must
        stay free.  Exact: fixing is evaluation of the separated factors,
        not approximation — parity with the full vademecum is asserted
        in tests/unit/test_slice.py.  The reference has no partial-
        evaluation concept; its evaluate() (model.py:724-860) always
        takes the full parameter tuple."""
        from pgdrome_tpu.separated import PGDResult

        fixed, w = self._fixed_weights(fixed)
        dtype = np.asarray(self._modes[0]).dtype
        d_p = self.num_dims - 1
        keep = [j for j in range(d_p) if j not in fixed]
        new0 = (np.asarray(self._modes[0], np.float64)
                * w[:, None]).astype(dtype)
        res = PGDResult(
            modes=[new0] + [np.asarray(self._modes[1 + j])
                            for j in keep],
            n_modes=self.n_modes,
            amplitudes=np.asarray(self._result.amplitudes),
            alpha=np.asarray(self._result.alpha),
            fp_its=np.asarray(self._result.fp_its),
            normU0=self._result.normU0,
        )
        return Vademecum(
            [self.spaces[0]] + [self.spaces[1 + j] for j in keep],
            res, method=self._method, dtype=dtype,
        )

    def sobol(self, points=None, densities=None, second_order=False):
        """EXACT Sobol' sensitivity indices of the served solution —
        closed-form through the separated structure (pgdrome_tpu.uq), no
        sampling and no FOM solves; the reference's nearest capability
        is Monte-Carlo over per-sample FEM (model.py:1666-1825).

        points: sensor points (same contract as :meth:`sensors`; (x, t)
        rows for TransientVademecum) → per-output indices ``(d_p, n_out)``
        plus the mean/variance per output.  None → GENERALIZED indices of
        the whole field (variance integrated against the dim-0
        (vector-)mass measure, Lamboni/Gamboa aggregation): scalar
        variance/indices plus the mean FIELD.

        densities: optional per-parameter-dim UNNORMALIZED densities
        (None = uniform; scalar / callable / fem Function on the factor
        space).  Parameters are treated as independent — the product
        measure every Sobol' decomposition assumes.

        Returns ``{'mean', 'variance', 'first' (d_p, …), 'total'
        (d_p, …)}``; ``second_order=True`` adds ``'second' (d_p, d_p, …)``
        pairwise interaction indices.  Host f64, O(d²·rank²):
        milliseconds next to any sweep."""
        from pgdrome_tpu.uq import sobol_from_stats

        stats = self._factor_stats(densities)
        if points is not None:
            out = sobol_from_stats(stats, table=self._sobol_table(points),
                                   second_order=second_order)
        else:
            out = sobol_from_stats(stats, out_gram=self._output_gram(),
                                   second_order=second_order)
            fbar = np.ones(self.n_modes)
            for m, _ in stats:
                fbar *= m
            out["mean"] = fbar @ np.asarray(self._modes[0], np.float64)
        return out

    def sobol_group(self, group, points=None, densities=None):
        """Closed/total Sobol' indices of a GROUP of parameters (0-based
        indices into the parameter dims) — e.g. 'how much variance do
        the material parameters jointly control'.  Same exact machinery
        and points/densities contract as :meth:`sobol`; returns
        ``{'variance', 'closed', 'total'}`` (uq.sobol_group)."""
        from pgdrome_tpu.uq import sobol_group

        stats = self._factor_stats(densities)
        if points is not None:
            return sobol_group(stats, group,
                               table=self._sobol_table(points))
        return sobol_group(stats, group, out_gram=self._output_gram())

    def output_covariance(self, points, densities=None):
        """EXACT mean and covariance matrix of the sensor responses
        under the parameter measure (uq.output_covariance): returns
        ``(mean (n_out,), cov (n_out, n_out))`` — closed-form through
        the separated structure, no sampling.  Same points/densities
        contract as :meth:`sobol`; cov's diagonal equals the per-output
        Sobol' ``variance``.  This is the exact quantity
        :meth:`moments` Monte-Carlo-estimates per field dof — here for
        sensor sets, WITH the cross-covariances (assimilation, QoI
        correlation, sensor-redundancy screening)."""
        from pgdrome_tpu.uq import output_covariance

        return output_covariance(self._factor_stats(densities),
                                 self._sobol_table(points))

    def main_effect(self, j, values, points, densities=None):
        """Closed-form ANOVA main-effect curve of parameter ``j`` at the
        given sensor ``points``: returns ``(mean (n_out,), effect
        (n_values, n_out))`` with effect[v] = E[u|p_j = values[v]] − E[u]
        (uq.main_effect — the deviation curves whose variances are the
        first-order Sobol' numerators; exact, no sampling)."""
        from pgdrome_tpu.separated import evaluate_modes_1d
        from pgdrome_tpu.uq import main_effect

        stats = self._factor_stats(densities)
        j = int(j)
        if not 0 <= j < len(stats):
            raise ValueError(f"j must be in 0..{len(stats) - 1}")
        vals = evaluate_modes_1d(
            self.spaces[1 + j],
            np.asarray(self._modes[1 + j], np.float64)[: self.n_modes],
            np.asarray(values, np.float64), xp=np,
        )
        # evaluate_modes_1d returns (n_points, n_modes); uq wants (R, n_v)
        vals = np.asarray(vals).T
        return main_effect(stats, j, vals, self._sobol_table(points))

    def _factor_stats(self, densities=None):
        from pgdrome_tpu.uq import factor_stats

        modes_h = [np.asarray(m, np.float64) for m in self._modes[1:]]
        return factor_stats(self.spaces[1:], modes_h, self.n_modes,
                            densities=densities)

    def _sobol_table(self, points):
        """(R, n_out) f64 dim-0 mode values at the sensor points."""
        from pgdrome_tpu.fem.interpolate import eval_dofs_at_points

        pts = np.asarray(points, dtype=np.float64)
        m0 = np.asarray(self._modes[0], np.float64)
        return np.stack([
            np.asarray(eval_dofs_at_points(self.spaces[0], m0[k], pts))
            for k in range(self.n_modes)
        ]).reshape(self.n_modes, -1)

    def _output_gram(self):
        """(R, R) f64 Gram of the dim-0 modes under the spatial mass
        measure, normalized by domain volume (so the aggregated
        'variance' is the spatial MEAN of the pointwise variance).
        The mass matrix is banded — the sparse product makes W·Uᵀ
        O(nnz·R) instead of O(n²·R), which halves the frontier-scale
        (rank ≳ 2500) Sobol wall on the 1-core host."""
        from pgdrome_tpu.fem.assembly import mass_matrix, vector_mass_matrix

        V0 = self.spaces[0]
        W = (vector_mass_matrix(V0, sparse=True) if V0.value_size > 1
             else mass_matrix(V0, sparse=True))
        U = np.asarray(self._modes[0], np.float64)
        vol = float(np.sum(V0.q_weights))
        return U @ (W.tocsr() @ U.T) / vol

    def _dim0_mode_map(self, map_fn):
        """New Vademecum with every dim-0 mode replaced by
        ``map_fn(Function) -> Function`` (applied ONCE per mode); all
        serving paths then serve the mapped quantity at full sweep rate."""
        from pgdrome_tpu.fem.function import Function
        from pgdrome_tpu.separated import PGDResult

        V0 = self.spaces[0]
        modes0 = np.asarray(self._modes[0])
        dfs = [map_fn(Function(V0, modes0[k])) for k in range(modes0.shape[0])]
        dmodes = np.stack([np.asarray(f.array) for f in dfs])
        res = PGDResult(
            modes=[dmodes] + [np.asarray(m) for m in self._modes[1:]],
            n_modes=self.n_modes,
            amplitudes=np.asarray(self._result.amplitudes),
            alpha=np.asarray(self._result.alpha),
            fp_its=np.asarray(self._result.fp_its),
            normU0=self._result.normU0,
        )
        return Vademecum(
            [dfs[0].function_space()] + self.spaces[1:], res,
            method=self._method, dtype=modes0.dtype,
        )

    def derivative(self, direction: int = 0):
        """The derivative vademecum: a new container over the DG(degree−1)
        space with every dim-0 mode replaced by its exact derivative
        (fem.derivative.derivative_function — the reference's
        create_derivation_fct, model.py:1088-1206, applied ONCE per mode
        instead of per evaluated sample).  All serving paths —
        :meth:`fields`, :meth:`sensors`, streams, :meth:`moments` — then
        serve spatial-derivative quantities at full sweep rate.

        1D/2D scalar dim-0: ∂/∂x_direction (scalar DG fields).  2D vector
        dim-0 (e.g. the elasticity-ν flagship): the full ∇u tensor —
        fields are (B, n_scalar_dofs·4) with row-major components
        ∂u_i/∂x_j at ``i·gdim+j``; see :meth:`strain` for the symmetric
        part."""
        from pgdrome_tpu.fem.derivative import derivative_function

        return self._dim0_mode_map(
            lambda f: derivative_function(f, direction=direction)
        )

    def gradient(self):
        """The ∇u vademecum (2D scalar dim-0 → DG 2-vector fields; vector
        dim-0 → the ∇u tensor, same as :meth:`derivative`)."""
        from pgdrome_tpu.fem.derivative import gradient_function

        return self._dim0_mode_map(gradient_function)

    def strain(self):
        """The ε(u) = sym(∇u) vademecum for a 2D VECTOR dim-0 space
        (elasticity): engineering/Voigt components (ε_xx, ε_yy, γ_xy =
        2ε_xy) per scalar dof — strain is parameter-independent and
        linear in the modes, so it is exact per-mode preprocessing and
        serves at full sweep rate.  Stress needs the material law's
        parameter dependence (ν is a swept parameter in the flagship):
        combine the strain sweep with the separated C(p) weights
        sample-side."""
        from pgdrome_tpu.fem.derivative import _dg_space, gradient_function
        from pgdrome_tpu.fem.function import Function

        V0 = self.spaces[0]
        if V0.value_size != 2 or V0.mesh().topology_dim() != 2:
            raise ValueError("strain() needs a 2D vector dim-0 space")

        def to_strain(f):
            G = gradient_function(f)  # 4 comps: ux,x ux,y uy,x uy,y
            Vg = G.function_space()
            g = np.asarray(G.array).reshape(-1, 4)
            eps = np.stack(
                [g[:, 0], g[:, 3], g[:, 1] + g[:, 2]], axis=1
            )  # Voigt (ε_xx, ε_yy, γ_xy)
            # per-mesh cached DG space: to_strain runs once per mode
            Vs = _dg_space(Vg.mesh(), Vg.degree, dim=3)
            return Function(Vs, eps.reshape(-1))

        return self._dim0_mode_map(to_strain)

    def errors(self, samples, fom_fields):
        """Relative L2 errors vs precomputed FOM fields over the batch."""
        from pgdrome_tpu.parallel.vademecum import sweep_errors

        return sweep_errors(
            self.spaces, self._modes, self.n_modes, samples, fom_fields
        )

    def attach_certifier(self, certifier):
        """Attach a :class:`pgdrome_tpu.parallel.certify.Certifier` so
        :meth:`residuals` / :meth:`error_bound` serve certified error
        queries alongside fields/sensors.  Not persisted by
        :meth:`save` — the certifier closes over the separated operator
        stacks, which the snapshot intentionally omits; re-attach after
        :meth:`load`."""
        self._certifier = certifier
        return self

    def _require_certifier(self):
        if getattr(self, "_certifier", None) is None:
            raise RuntimeError(
                "no certifier attached — build one with "
                "parallel.certify.make_certifier(sep, spaces, result, tf=tf) "
                "and attach_certifier(...)"
            )
        return self._certifier

    def residuals(self, samples):
        """Per-sample relative algebraic residuals (certifier required:
        see :func:`pgdrome_tpu.parallel.certify.make_certifier`)."""
        return self._require_certifier().residuals(samples)

    def error_bound(self, samples):
        """Calibrated per-sample error bounds η·residual (certifier must
        be attached and calibrated)."""
        return self._require_certifier().bound(samples)

    def attach_corrector(self, corrector, device=True):
        """Attach a :class:`pgdrome_tpu.dual.DualCorrector` (one output
        functional) so :meth:`corrected_sensors` serves goal-oriented
        corrected outputs alongside plain sensors — the path that
        certifies outputs far below the field error (FRONTIER.md
        "Goal-oriented outputs": field 1.5e-4 → outputs < 1e-6 at
        d=10).  ``device=True`` stages the jitted dd-compensated TPU
        sweep (:func:`pgdrome_tpu.dual.make_corrected_sensor_fn`,
        ~5e-7 device floor); ``device=False`` keeps the host f64
        corrector (certification grade).  Not persisted by
        :meth:`save` (the corrector closes over the operator stacks);
        re-attach after :meth:`load`."""
        self._corrector = corrector
        if device:
            from pgdrome_tpu.dual import make_corrected_sensor_fn

            self._corrector_fn = make_corrected_sensor_fn(corrector)
        else:
            self._corrector_fn = None
        return self

    def corrected_sensors(self, samples, return_estimate=False):
        """Dual-corrected outputs s_corr(p) for the attached
        corrector's functional, shape (B,).  ``return_estimate``
        additionally returns the built-in output error estimate
        s_corr − s_plain (effectivity ≈ 1 once the dual converges)."""
        dc = getattr(self, "_corrector", None)
        if dc is None:
            raise RuntimeError(
                "no corrector attached — build one with "
                "dual.DualCorrector(sep, spaces, l, res_u, tf_u, res_z, "
                "tf_z) and attach_corrector(...)"
            )
        if getattr(self, "_corrector_fn", None) is not None:
            # same guard the host corrected() applies: outside the box
            # the theta tables clamp while the mode factors extrapolate
            # and the device sweep would silently return wrong outputs
            s = np.atleast_2d(np.asarray(samples))
            for j, (lo, hi) in enumerate(dc._ranges):
                if s[:, j].min() < lo or s[:, j].max() > hi:
                    raise ValueError(
                        f"samples leave the parameter box in dim {j} "
                        f"([{lo}, {hi}]): corrected outputs are only "
                        "defined inside the vademecum's box"
                    )
            s_corr, s_plain = (np.asarray(a)
                               for a in self._corrector_fn(samples))
        else:
            s_corr, s_plain, _ = dc.corrected(samples, return_parts=True)
        if return_estimate:
            return s_corr, s_corr - s_plain
        return s_corr

    def to_pgd(self, name="vademecum", name_coord=None):
        """Bridge into the reference-style PGD container (model layer:
        evaluate/reducers/derivatives, pxdmf/HDF5 export)."""
        from pgdrome_tpu.model import pgd_from_result

        return pgd_from_result(
            self._result, self.spaces, name=name, name_coord=name_coord
        )

    # ------------------------------------------------------------ persistence

    def save(self, filepath):
        """Single-file HDF5 snapshot of the deployed decomposition
        (full-dof modes, amplitude trace, per-dim mesh coordinates for
        validation at load)."""
        with h5py.File(filepath, "w") as f:
            f.attrs["n_modes"] = self.n_modes
            f.attrs["num_dims"] = self.num_dims
            f.create_dataset(
                "amplitudes", data=np.asarray(self._result.amplitudes)
            )
            f.create_dataset("alpha", data=np.asarray(self._result.alpha))
            for d, m in enumerate(self._modes):
                f.create_dataset(f"modes_{d}", data=np.asarray(m))
                f.create_dataset(
                    f"coords_{d}",
                    data=self.spaces[d].mesh().coordinates(),
                )
                f[f"modes_{d}"].attrs["degree"] = self.spaces[d].degree

    @classmethod
    def load(cls, filepath, spaces, method="auto"):
        """Rebuild from :meth:`save`.  ``spaces`` must match the saved
        meshes (validated against the stored coordinates)."""
        from pgdrome_tpu.separated import PGDResult

        with h5py.File(filepath, "r") as f:
            nd = int(f.attrs["num_dims"])
            if len(spaces) != nd:
                raise ValueError(f"expected {nd} spaces, got {len(spaces)}")
            modes = []
            for d in range(nd):
                saved = np.asarray(f[f"coords_{d}"])
                have = spaces[d].mesh().coordinates()
                if saved.shape != have.shape or not np.allclose(saved, have):
                    raise ValueError(
                        f"space {d} mesh does not match the saved vademecum"
                    )
                if int(f[f"modes_{d}"].attrs["degree"]) != spaces[d].degree:
                    raise ValueError(f"space {d} degree mismatch")
                modes.append(np.asarray(f[f"modes_{d}"]))
            res = PGDResult(
                modes=modes,
                n_modes=int(f.attrs["n_modes"]),
                amplitudes=np.asarray(f["amplitudes"]),
                alpha=np.asarray(f["alpha"]),
                fp_its=np.zeros(int(f.attrs["n_modes"]), dtype=np.int64),
                normU0=1.0,
            )
        return cls(spaces, res, method=method, dtype=modes[0].dtype)


class TransientVademecum(Vademecum):
    """:class:`Vademecum` for SPACE-TIME results: the first
    ``field_dims`` dims (e.g. :func:`moving_heat_source`'s (x, t)) are
    FIELD dims, the rest parameters.

    The field dims' modes are kron-flattened ONCE into a single
    ``(K, n0·n1)`` buffer (the framework's standard trick: a tensor
    structure the sweep kernels don't need to know about), so every
    batch path serves space-time quantities unchanged:

    * :meth:`fields` / :meth:`fields_stream` / :meth:`moments` return
      ``(B, n0·n1)`` — ``.reshape(B, *vd.field_shape)`` recovers the
      (x, t) grid;
    * :meth:`sensors` / :meth:`sensors_stream` /
      :meth:`sensors_jacobian` take ``(n_pts, field_dims)`` SPACE-TIME
      points — virtual gauges at fixed (x, t) locations swept over
      parameter batches (the table is the product of the per-field-dim
      mode values, built host-side; no flattened-mode point eval);
    * :meth:`errors` compares against FOM fields flattened the same way
      (``fom.reshape(B, -1)``).

    The flatten costs ``K·n0·n1`` serving-dtype bytes once (~0.5 GB at
    the rank-896 transient bench scale — host build a few seconds,
    well inside HBM).  :meth:`save` stores the ORIGINAL per-dim modes
    (the flatten is redone at :meth:`load`), :meth:`to_pgd` bridges the
    unflattened result into the reference-style container, and
    :meth:`derivative` differentiates the SPACE dim (du/dx fields over
    (x, t))."""

    def __init__(self, spaces, result, field_dims: int = 2,
                 dim0_transform=None, method="auto", dtype=np.float32):
        from pgdrome_tpu.separated import PGDResult

        if not (2 <= field_dims < len(spaces)):
            raise ValueError(
                f"field_dims must be in [2, num_dims); got {field_dims} "
                f"for {len(spaces)} dims"
            )
        K = int(result.n_modes)
        fmods = []
        for d in range(field_dims):
            m = np.asarray(result.modes[d])[:K]
            if d == 0 and dim0_transform is not None:
                m = dim0_transform.modes_to_full(m)
            fmods.append(np.asarray(m, dtype=dtype))
        flat = fmods[0]
        for d in range(1, field_dims):
            flat = (flat[:, :, None] * fmods[d][:, None, :]).reshape(K, -1)
        flat_res = PGDResult(
            modes=[flat] + [np.asarray(m)[:K] for m in
                            result.modes[field_dims:]],
            n_modes=K,
            amplitudes=np.asarray(result.amplitudes)[:K],
            alpha=np.asarray(result.alpha)[:K],
            fp_its=np.asarray(result.fp_its)[:K],
            normU0=result.normU0,
        )
        # the parameter machinery only touches spaces[1:], which must
        # align with the flattened modes list; spaces[0] stays the space
        # dim's space for bookkeeping (never point-evaluated here)
        super().__init__(
            [spaces[0]] + list(spaces[field_dims:]), flat_res,
            method=method, dtype=dtype,
        )
        self.field_dims = int(field_dims)
        self.field_spaces = list(spaces[:field_dims])
        self.field_shape = tuple(m.shape[1] for m in fmods)
        self._field_modes = fmods
        self._all_spaces = list(spaces)
        self._orig_result = result

    def _st_table(self, pts):
        """(K, n_pts) product-of-field-dim-mode-values table at space-time
        points (n_pts, field_dims)."""
        from pgdrome_tpu.fem.interpolate import eval_dofs_at_points

        K = self.n_modes
        table = np.ones((K, pts.shape[0]), dtype=np.float64)
        for d, (V, m) in enumerate(zip(self.field_spaces,
                                       self._field_modes)):
            vals = np.stack([
                np.asarray(eval_dofs_at_points(V, m[k], pts[:, d]))
                for k in range(K)
            ]).reshape(K, -1)
            table *= vals
        return table

    def _st_points(self, points):
        pts = np.asarray(points, dtype=np.float64)
        if pts.ndim != 2 or pts.shape[1] != self.field_dims:
            raise ValueError(
                f"space-time sensor points must be (n_pts, "
                f"{self.field_dims}), got {pts.shape}"
            )
        return pts

    def _sobol_table(self, points):
        # space-time sensors: the dim-0 output weights are the product
        # of the per-field-dim mode values at each (x, t) row
        return self._st_table(self._st_points(points))

    def _fit_points(self, points):
        return self._st_points(points)

    def _fit_table(self, points):
        return self._st_table(self._st_points(points))

    def _output_gram(self):
        """Kron-structured space-time mass Gram of the flattened field
        modes, normalized by the space-time volume: applied axis-by-axis
        (never forming the n0·n1 × n0·n1 kron)."""
        from pgdrome_tpu.fem.assembly import mass_matrix

        U = np.asarray(self._modes[0], np.float64).reshape(
            self.n_modes, *self.field_shape
        )
        T = U
        vol = 1.0
        for d, V in enumerate(self.field_spaces):
            if V.value_size != 1:
                raise ValueError(
                    "aggregated sobol() needs scalar field dims; use "
                    "points= for vector space-time quantities"
                )
            M = np.asarray(mass_matrix(V), np.float64)
            T = np.moveaxis(
                np.tensordot(T, M, axes=([d + 1], [0])), -1, d + 1
            )
            vol *= float(np.sum(V.q_weights))
        return np.tensordot(
            T.reshape(self.n_modes, -1),
            U.reshape(self.n_modes, -1), axes=([1], [1]),
        ) / vol

    def sensors(self, points):
        """Jitted sensor sweep at fixed SPACE-TIME points (n_pts,
        field_dims): fn(samples (B, d_param)) -> (B, n_pts)."""
        from pgdrome_tpu.parallel.vademecum import make_sensor_sweep_fn

        pts = self._st_points(points)
        key = ("st", pts.tobytes(), pts.shape)
        fn = self._sensor_cache.get(key)
        if fn is None:
            fn = make_sensor_sweep_fn(
                self.spaces, self._modes, self.n_modes, pts,
                method=self._method, table=self._st_table(pts),
            )
            self._sensor_cache[key] = fn
            while len(self._sensor_cache) > self._sensor_cache_max:
                self._sensor_cache.popitem(last=False)
        else:
            self._sensor_cache.move_to_end(key)
        return fn

    def sensors_jacobian(self, points):
        """Parameter sensitivities at fixed space-time points:
        fn(samples) -> (B, n_pts, d_param)."""
        from pgdrome_tpu.parallel.vademecum import make_sensor_jacobian_fn

        pts = self._st_points(points)
        key = ("st-jac", pts.tobytes(), pts.shape)
        fn = self._sensor_cache.get(key)
        if fn is None:
            fn = make_sensor_jacobian_fn(
                self.spaces, self._modes, self.n_modes, pts,
                table=self._st_table(pts),
            )
            self._sensor_cache[key] = fn
            while len(self._sensor_cache) > self._sensor_cache_max:
                self._sensor_cache.popitem(last=False)
        else:
            self._sensor_cache.move_to_end(key)
        return fn

    def derivative(self):
        """The du/dx transient vademecum: SPACE-dim modes replaced by
        their exact DG(degree−1) derivatives; time/parameter dims
        unchanged."""
        from pgdrome_tpu.fem.derivative import derivative_function
        from pgdrome_tpu.fem.function import Function
        from pgdrome_tpu.separated import PGDResult

        V0 = self._all_spaces[0]
        m0 = self._field_modes[0]
        dfs = [
            derivative_function(Function(V0, m0[k]))
            for k in range(self.n_modes)
        ]
        dmodes = np.stack([np.asarray(f.array) for f in dfs])
        res = PGDResult(
            modes=[dmodes]
            + [np.asarray(m) for m in self._field_modes[1:]]
            + [np.asarray(m) for m in self._modes[1:]],
            n_modes=self.n_modes,
            amplitudes=np.asarray(self._result.amplitudes),
            alpha=np.asarray(self._result.alpha),
            fp_its=np.asarray(self._result.fp_its),
            normU0=self._result.normU0,
        )
        return TransientVademecum(
            [dfs[0].function_space()] + self._all_spaces[1:], res,
            field_dims=self.field_dims, method=self._method,
            dtype=m0.dtype,
        )

    def fix_parameters(self, fixed):
        """Partial evaluation over the PARAMETER dims (0-based among
        parameters, the fit/sobol convention); the space-time field
        dims always stay.  Fixed factor values fold into the SECOND
        field dim's modes (exact — any one dim carries the per-mode
        weights), so the returned TransientVademecum keeps the full
        (x, t) serving contract over the remaining parameters."""
        from pgdrome_tpu.separated import PGDResult

        fixed, w = self._fixed_weights(fixed)
        dtype = np.asarray(self._modes[0]).dtype
        d_p = self.num_dims - 1
        keep = [j for j in range(d_p) if j not in fixed]
        fmods = [np.asarray(m) for m in self._field_modes]
        fmods[1] = (np.asarray(fmods[1], np.float64)
                    * w[:, None]).astype(dtype)
        res = PGDResult(
            modes=fmods + [np.asarray(self._modes[1 + j]) for j in keep],
            n_modes=self.n_modes,
            amplitudes=np.asarray(self._result.amplitudes),
            alpha=np.asarray(self._result.alpha),
            fp_its=np.asarray(self._result.fp_its),
            normU0=self._result.normU0,
        )
        return TransientVademecum(
            self.field_spaces + [self.spaces[1 + j] for j in keep],
            res, field_dims=self.field_dims, method=self._method,
            dtype=dtype,
        )

    def to_pgd(self, name="vademecum", name_coord=None):
        """Bridge the UNFLATTENED result into the reference-style PGD
        container (all original dims kept separate)."""
        from pgdrome_tpu.model import pgd_from_result
        from pgdrome_tpu.separated import PGDResult

        K = self.n_modes
        res = PGDResult(
            modes=[np.asarray(m) for m in self._field_modes]
            + [np.asarray(m) for m in self._modes[1:]],
            n_modes=K,
            amplitudes=np.asarray(self._result.amplitudes),
            alpha=np.asarray(self._result.alpha),
            fp_its=np.asarray(self._result.fp_its),
            normU0=self._result.normU0,
        )
        return pgd_from_result(
            res, self._all_spaces, name=name, name_coord=name_coord
        )

    def save(self, filepath):
        """HDF5 snapshot of the ORIGINAL per-dim modes (+ field_dims
        marker); the kron flatten is redone at :meth:`load`."""
        all_modes = list(self._field_modes) + [
            np.asarray(m) for m in self._modes[1:]
        ]
        with h5py.File(filepath, "w") as f:
            f.attrs["n_modes"] = self.n_modes
            f.attrs["num_dims"] = len(all_modes)
            f.attrs["field_dims"] = self.field_dims
            f.create_dataset(
                "amplitudes", data=np.asarray(self._result.amplitudes)
            )
            f.create_dataset("alpha", data=np.asarray(self._result.alpha))
            for d, m in enumerate(all_modes):
                f.create_dataset(f"modes_{d}", data=np.asarray(m))
                f.create_dataset(
                    f"coords_{d}",
                    data=self._all_spaces[d].mesh().coordinates(),
                )
                f[f"modes_{d}"].attrs["degree"] = self._all_spaces[d].degree

    @classmethod
    def load(cls, filepath, spaces, method="auto"):
        """Rebuild from :meth:`save`; ``spaces`` is the FULL per-dim list
        (field dims first), validated against the stored meshes."""
        from pgdrome_tpu.separated import PGDResult

        with h5py.File(filepath, "r") as f:
            nd = int(f.attrs["num_dims"])
            fd = int(f.attrs.get("field_dims", 2))
            if len(spaces) != nd:
                raise ValueError(f"expected {nd} spaces, got {len(spaces)}")
            modes = []
            for d in range(nd):
                saved = np.asarray(f[f"coords_{d}"])
                have = spaces[d].mesh().coordinates()
                if saved.shape != have.shape or not np.allclose(saved, have):
                    raise ValueError(
                        f"space {d} mesh does not match the saved vademecum"
                    )
                if int(f[f"modes_{d}"].attrs["degree"]) != spaces[d].degree:
                    raise ValueError(f"space {d} degree mismatch")
                modes.append(np.asarray(f[f"modes_{d}"]))
            res = PGDResult(
                modes=modes,
                n_modes=int(f.attrs["n_modes"]),
                amplitudes=np.asarray(f["amplitudes"]),
                alpha=np.asarray(f["alpha"]),
                fp_its=np.zeros(int(f.attrs["n_modes"]), dtype=np.int64),
                normU0=1.0,
            )
        return cls(spaces, res, field_dims=fd, method=method,
                   dtype=modes[0].dtype)
