"""End-to-end solver recipes: the measured pipelines from PERF.md as
single calls.

These compose existing framework pieces (precondition/normal-equations
transforms, fused solves, f64 residual re-solve, CP-ALS compression,
Galerkin update) into the two workflows the benchmarks run:

* :func:`two_stage_elliptic` — the north-star vademecum pipeline:
  energy-basis f32 stage-1 greedy + f64-exact residual re-solve +
  optional CP-ALS compression to the deployed rank + Galerkin update.
  (bench.py measures this at 1.3 s / 6.5e-7 for the 50-mode
  parametric-elliptic problem.)
* :func:`two_stage_minres` — the transient/non-symmetric pipeline:
  f32-stable minimal-residual solve (diag-sum congruence bases +
  mid-sweep renorm) + f64 residual re-solve + Galerkin update.
  (PERF.md measures 2.46e-4 in 2.6 s on the 4-dim moving-heat-source
  surrogate where plain Galerkin stalls at 3 modes.)

Both return nodal-basis results ready for the model layer / serving
(``Vademecum``, ``pgd_from_result``).
"""

from __future__ import annotations

import numpy as np

from pgdrome_tpu.separated import (
    PGDResult,
    SeparatedPGD,
    SeparatedProblem,
    combine_results,
    compress_modes,
    galerkin_update,
    ne_dim_base,
    normal_equations,
    pad_rhs_bucket,
    precondition_dim,
    residual_problem,
)


def _to_nodal(res: PGDResult, transforms) -> PGDResult:
    """Back-transform each congruence-preconditioned dim to its nodal
    basis (host f64)."""
    modes = [np.asarray(m, dtype=np.float64) for m in res.modes]
    for tf in transforms:
        modes[tf.dim] = tf.modes_to_full(res.modes[tf.dim])
    return PGDResult(modes=modes, n_modes=res.n_modes,
                     amplitudes=res.amplitudes, alpha=res.alpha,
                     fp_its=res.fp_its, normU0=res.normU0)


def residual_cascade(problem_pc: SeparatedProblem, budgets,
                     tol_fp: float = 1e-7, solver: str = "cg",
                     cg_iters: int = 25, dtype=np.float32,
                     aot_cache_dir: str | None = None,
                     stage_problems=None, rhs_f64: bool = False,
                     rhs_comp: bool = False, rhs_comp_from: int | None = None):
    """Multi-stage floor-restarted greedy solve on an (already
    preconditioned) problem: stage 1 solves ``budgets[0]`` modes; each
    further budget forms the f64-exact residual rhs on the host
    (:func:`residual_problem` — restarting the f32 amplitude floor at the
    residual's scale) and re-solves.  The restarts STACK: measured on the
    5-parameter elliptic, each stage roughly halves the error
    (4.3e-5 → 1.9e-5 → 9.9e-6 — PERF.md "Dimensionality scaling").

    ``stage_problems``: optional dict {stage index (2-based) →
    SeparatedProblem} — the (re-weighted) problem a stage's residual is
    computed against.  Used for LATE-STAGE CORNER BOOSTING: once the
    error whitens, re-target the remaining stages at a harder
    boundary-boosted measure (same operators per grid point, so the
    solution is unchanged; same shapes, so cached executables serve it).
    This is the measured recipe that lands the 5-parameter vademecum
    under 1e-6: budgets (192, 128×6), boost (48, 6) from stage 5 →
    8.7e-7 dense-verified (PERF.md round-3).

    ``rhs_f64``: ship each stage's rhs stack in f64 and contract it at
    f64 (CPU/x64 backends only) — deep cascades freeze at ~1.5e-6 in
    pure f32 because the residual stack's rows carry magnitude ~1/s and
    cancel in the load contraction (measured, PERF.md round-3); with
    rhs_f64 the cascade converges like full f64.

    ``rhs_comp``: the TPU-native alternative — each stage's rhs stack is
    shipped as double-f32 pairs and contracted compensated on the VPU
    (ops/ddf32.py, ~2^-48 relative of the stack rows), so deep cascades
    stay entirely on-chip with no x64 backend.  The host hybrid
    (early stages f32 on TPU, finishing stages rhs_f64 on CPU) remains
    the fallback for cancellation beyond dd's ~C·2^-48 resolution.

    ``rhs_comp_from``: enable rhs_comp only from this 1-based stage
    index on — the measured all-on-chip recipe: early stages are not
    cancellation-bound (plain f32 is cheaper and its executables are
    already cached), the deep stages are.  The 5-parameter vademecum
    lands at 9.7e-7 with plain stages to the ~1.6e-6 floor and two
    rhs_comp stages after (PERF.md round-3 #7).

    Later stages use the loose 8-sweep fixed point (measured best for
    corrections, PERF.md).  Returns the combined (uncompressed) result in
    ``problem_pc``'s basis."""
    def common(si):
        comp = rhs_comp or (rhs_comp_from is not None and si >= rhs_comp_from)
        return dict(tol=0.0, solver=solver, cg_iters=cg_iters,
                    residual_check=False, dtype=dtype,
                    aot_cache_dir=aot_cache_dir, rhs_f64=rhs_f64,
                    rhs_comp=comp)

    res = SeparatedPGD(problem_pc, n_max=budgets[0], tol_fp=tol_fp,
                       max_fp_it=40, **common(1)).solve_fused()
    for si, b in enumerate(budgets[1:], start=2):
        prob_s = (stage_problems or {}).get(si, problem_pc)
        sep_res, s_res = residual_problem(prob_s, res)
        delta = SeparatedPGD(sep_res, n_max=b, tol_fp=1e-5, max_fp_it=8,
                             **common(si)).solve_fused()
        res = combine_results(res, delta, s_res)
    return res


def adaptive_cascade(problem_pc: SeparatedProblem, verify, *,
                     bound: float = 1e-6, n_stage1: int = 128,
                     stage_budget: int = 128, max_stages: int = 12,
                     boost_problem: SeparatedProblem | None = None,
                     boost_margin: float = 2.0,
                     rhs_comp="auto", rhs_comp_below: float = 1e-5,
                     stall_stages: int = 3,
                     tol_fp: float = 1e-7, solver: str = "cg",
                     cg_iters: int = 25, dtype=np.float32,
                     aot_cache_dir: str | None = None, log=None,
                     init_result: PGDResult | None = None,
                     checkpoint=None,
                     corner_seed_range=None, seed_max_fp_it: int = 20,
                     seed_always: bool = False,
                     rhs_bucket: int | None = None,
                     minutes: float | None = None):
    """Error-DRIVEN residual cascade: solve until a verified bound, not a
    fixed stage list.  This packages the measured multi-parameter
    discipline (PERF.md round-3, scripts/probe_5param.py) as one call:

    * after every stage the SPAN-OPTIMAL (Galerkin-updated) result is
      verified through the user's ``verify`` callback;
    * while the CORNERS bind (corner error above ``bound`` and more than
      ``boost_margin``× the interior error) and a ``boost_problem`` is
      given, the next stage's residual targets that corner-boosted
      measure — and reverts to the plain measure as soon as corners clear
      (leaving the boost on stalls the interior: the measured
      "boost window" failure, PERF.md round-3 #8);
    * once the error enters the cancellation-bound region
      (below ``rhs_comp_below``), stages switch to the compensated
      double-f32 rhs contraction (``rhs_comp="auto"``; pass True/False to
      force) — the on-chip fix for the ~1.5e-6 pure-f32 stack floor;
    * stops at ``bound``, at ``max_stages``, or when the best verified
      error hasn't improved for ``stall_stages`` stages; returns the BEST
      Galerkin-updated result seen, not the last.

    ``verify(result) -> float | {"corners": c, "interior": i, ...}`` must
    measure the result against ground truth (e.g.
    :func:`pgdrome_tpu.models.problems.elliptic_dense_verifier`); a bare
    float is treated as both corner and interior error (no boost
    steering).  Like the probes, the cascade itself continues from the
    RAW combination — the Galerkin update is for verification/deployment
    only (updating mid-cascade measured worse, PERF.md).

    ``init_result``: warm-start from an existing (raw, uncompressed)
    combination instead of solving stage 1 — continue an interrupted
    cascade, or hand off from a fixed-budget :func:`residual_cascade`
    (``n_stage1`` is then ignored; stage 1 just verifies the input).

    ``checkpoint``: optional ``fn(stage_dict, raw_result)`` called after
    each stage's verification — persist the raw combination so a killed
    run (remote-compile stalls) resumes via ``init_result`` instead of
    re-solving.

    ``corner_seed_range``: pass the parameter box ``(p_lo, p_hi)`` to run
    boosted stages CORNER-SEEDED — the fixed point of each new mode
    starts at one of the verifier's measured-worst boundary points
    (``verify``'s dict must carry ``worst_points``/``worst_errors``, as
    :func:`models.problems.elliptic_dense_verifier` and
    :func:`parallel.certify.screened_verify` do) instead of the ones
    init, whose corner overlap decays like (1/n_p)^(d-1).  This is the
    measured 10-param discipline (PERF.md "Dimensionality frontier":
    seeded stages gain ~3×/stage at corners where ones-init stages made
    them worse).  ``seed_max_fp_it`` bounds the seeded stages' fixed
    point (end-localized targets need more alternations than the
    8-sweep default).

    ``rhs_bucket``: pad each stage's residual rhs stack to this bucket
    (:func:`pgdrome_tpu.separated.pad_rhs_bucket`) so deep cascades on
    remote-compile backends reuse a handful of executables instead of
    recompiling 100–1000 s per stage.

    Returns ``(best_result, history)``: history is one dict per stage
    with rank, errors, measure/precision decisions, and timing."""
    import time

    def common(comp):
        return dict(tol=0.0, solver=solver, cg_iters=cg_iters,
                    residual_check=False, dtype=dtype,
                    aot_cache_dir=aot_cache_dir, rhs_comp=comp)

    def _split(v):
        if isinstance(v, dict):
            return float(v["corners"]), float(v["interior"])
        return float(v), float(v)

    say = log or (lambda *a: None)
    history = []
    best_err, best_res, best_stage = np.inf, None, 0
    corners = interior = np.inf
    worst_pts = worst_errs = None
    res = None
    t_start = time.perf_counter()
    for si in range(1, max_stages + 1):
        if (
            minutes is not None
            and si > 1
            and time.perf_counter() - t_start > minutes * 60.0
        ):
            say(f"adaptive cascade: {minutes:.0f} min budget reached at "
                f"stage {si - 1}, best {best_err:.2e}")
            break
        t0 = time.perf_counter()
        boosted = comp = seeded = False
        if si == 1:
            res = init_result if init_result is not None else SeparatedPGD(
                problem_pc, n_max=n_stage1, tol_fp=tol_fp,
                max_fp_it=40, **common(False)).solve_fused()
        else:
            boosted = (
                boost_problem is not None
                and corners > bound
                and corners > boost_margin * interior
            )
            prob_s = boost_problem if boosted else problem_pc
            if isinstance(rhs_comp, bool):
                comp = rhs_comp
            else:  # "auto": engage in the cancellation-bound region
                comp = (
                    max(corners, interior) < rhs_comp_below
                    and np.dtype(dtype) != np.float64
                )
            sep_res, s_res = residual_problem(prob_s, res)
            if rhs_bucket:
                sep_res = pad_rhs_bucket(sep_res, rhs_bucket)
            seeded = (
                (boosted or (seed_always and corners > bound))
                # seed_always: corner-seeded fixed points on the PLAIN
                # measure — the finishing regime where a strong boost
                # flutters near the f32 floor (the 5-param lesson) but
                # the remaining error is still corner-LOCALIZED, which
                # plain ones-init stages never target (measured round 5
                # at d=10 rank 2333: plain stage moved corners
                # 1.67e-6 → 1.65e-6 while seeded stages had been
                # contracting ~1.2×/stage)
                and corner_seed_range is not None
                and worst_pts is not None
                and len(worst_pts) > 0
            )
            if seeded:
                from pgdrome_tpu.models.problems import corner_seeded_init

                lo, hi = corner_seed_range
                delta = SeparatedPGD(
                    sep_res, n_max=stage_budget, tol_fp=1e-5,
                    max_fp_it=seed_max_fp_it,
                    fp_init=corner_seeded_init(
                        np.asarray(worst_pts)[:stage_budget], lo, hi
                    ),
                    **common(comp),
                ).solve()
            else:
                delta = SeparatedPGD(
                    sep_res, n_max=stage_budget, tol_fp=1e-5,
                    max_fp_it=8, **common(comp),
                ).solve_fused()
            res = combine_results(res, delta, s_res)
        res_g = galerkin_update(problem_pc, res)
        v = verify(res_g)
        corners, interior = _split(v)
        if isinstance(v, dict) and "worst_points" in v:
            worst_pts = np.asarray(v["worst_points"])
            worst_errs = np.asarray(v.get("worst_errors", []))
            if worst_errs.shape[:1] == worst_pts.shape[:1]:
                rank_w = np.argsort(worst_errs)[::-1]
                worst_pts = worst_pts[rank_w]
        mx = max(corners, interior)
        entry = {
            "stage": si, "rank": res.n_modes, "corners": corners,
            "interior": interior, "max": mx, "boosted": boosted,
            "seeded": seeded,
            "rhs_comp": comp, "stage_s": round(time.perf_counter() - t0, 2),
        }
        if isinstance(v, dict):
            # audit trail for screened verification (screened_verify):
            # the stage's "corners" may be a calibrated ESTIMATE for
            # unmeasured points — keep eta/measured/estimated so the
            # history says which, and so a one-off full FEM confirmation
            # sweep at the stopping stage can be targeted after the run
            for audit_key in ("screened", "eta", "measured_max",
                              "estimated_max"):
                if audit_key in v:
                    entry[audit_key] = v[audit_key]
        history.append(entry)
        say(f"adaptive stage {si}: rank {res.n_modes} corners {corners:.2e} "
            f"interior {interior:.2e}"
            + (" [boost]" if boosted else "")
            + (" [seeded]" if seeded else "")
            + (" [dd]" if comp else ""))
        if checkpoint is not None:
            checkpoint(history[-1], res)
        if mx < best_err:
            best_err, best_res, best_stage = mx, res_g, si
        if mx < bound:
            break
        if si - best_stage >= stall_stages:
            say(f"adaptive cascade stalled: best {best_err:.2e} at stage "
                f"{best_stage}, no improvement for {stall_stages} stages")
            break
    return best_res, history


def two_stage_elliptic(sep: SeparatedProblem, n_stage1: int = 64,
                       n_stage2: int = 48, n_deploy: int | None = 50,
                       tol_fp: float = 1e-7, solver: str = "cg",
                       cg_iters: int = 25, dtype=np.float32,
                       aot_cache_dir: str | None = None,
                       extra_stages=(), stage_problems=None):
    """The north-star elliptic vademecum pipeline (bench.py, PERF.md).

    sep: the HOST-f64 separated problem (builders' convention); dim 0 is
    congruence-preconditioned here.  Returns ``(result, tf)`` — result's
    dim-0 modes are in the transformed basis; ``tf.modes_to_full`` maps
    them to nodal dofs (Vademecum takes ``dim0_transform=tf`` directly).

    Stages: f32 greedy (n_stage1, full budget) → f64-exact residual rhs
    (:func:`residual_problem`, restarts the f32 amplitude floor) → f32
    re-solve (n_stage2, 8 fp sweeps — measured best, PERF.md) →
    optional further restarts (``extra_stages`` budgets, via
    :func:`residual_cascade` — they stack) → CP-ALS compression to
    n_deploy (None/0 disables) → Galerkin update.

    ``stage_problems``: {stage index (2-based) → PRECONDITIONED problem}
    forwarded to :func:`residual_cascade` (late-stage corner boosting —
    note the values must be in the same transformed basis as this
    recipe's own ``precondition_dim(sep, 0)``)."""
    sep_pc, tf = precondition_dim(sep, dim=0, dtype=np.float64)
    res = residual_cascade(
        sep_pc, (n_stage1, n_stage2) + tuple(extra_stages), tol_fp=tol_fp,
        solver=solver, cg_iters=cg_iters, dtype=dtype,
        aot_cache_dir=aot_cache_dir, stage_problems=stage_problems,
    )
    if n_deploy and res.n_modes > n_deploy:
        mass_c = [np.asarray(sep_pc.mass[0])] + [
            np.asarray(sep_pc.ops[j][0]) for j in range(1, sep_pc.num_dims)
        ]
        res = compress_modes(res, mass_c, n_deploy, n_iters=20)
    res = galerkin_update(sep_pc, res)
    return res, tf


def two_stage_minres(sep: SeparatedProblem, n_stage1: int = 128,
                     n_stage2: int = 64, precondition_dims=(0, 1),
                     tol_fp: float = 1e-6, max_fp_it: int = 50,
                     dtype=np.float32, aot_cache_dir: str | None = None,
                     extra_stages=(), rhs_comp: bool = False):
    """The transient / non-symmetric minres pipeline (PERF.md).

    sep: the HOST-f64 separated problem.  Greedy Galerkin has no
    minimization principle on non-symmetric operators (upwind time);
    each stage solves the normal equations with the f32-stable recipe —
    diag-sum congruence bases (:func:`ne_dim_base`) on
    ``precondition_dims`` and mid-sweep Euclidean renormalization — then
    the f64-exact residual re-solve restarts the f32 amplitude floor.
    ``extra_stages``: further residual-restart budgets (they stack, like
    :func:`residual_cascade`'s — each f64 restart attacks the previous
    stage's own f32 correction floor).

    ``rhs_comp``: contract the RESIDUAL stages' rhs stacks in
    compensated double-f32 on-chip (ops/ddf32.py) — the residual NE
    stack ships rescaled rows that cancel in the load contraction,
    same mechanism as the elliptic cascades.  Stage 1 stays plain (its
    rhs is benign).

    Returns the combined, Galerkin-updated result in NODAL bases for
    every dim (ready for evaluation/serving)."""

    def minres_stage(problem, n_max, comp=False):
        return _minres_stage(problem, n_max, precondition_dims, tol_fp,
                             max_fp_it, dtype, aot_cache_dir, comp)

    res = minres_stage(sep, n_stage1)
    for b in (n_stage2,) + tuple(extra_stages):
        sep_res, s_res = residual_problem(sep, res)
        delta = minres_stage(sep_res, b, comp=rhs_comp)
        res = combine_results(res, delta, s_res)
    return galerkin_update(sep, res)


def _minres_stage(problem, n_max, precondition_dims, tol_fp, max_fp_it,
                  dtype, aot_cache_dir, comp):
    """One f32-stable minimal-residual stage: normal equations + diag-sum
    congruence bases on ``precondition_dims`` + mid-sweep renorm, result
    mapped back to nodal bases (shared by :func:`two_stage_minres` and
    :func:`adaptive_minres`)."""
    ne = normal_equations(problem)
    tfs = []
    for d in precondition_dims:
        ne, tfd = precondition_dim(ne, dim=d, dtype=np.float64,
                                   base=ne_dim_base(problem, d))
        tfs.append(tfd)
    # measured trade-off at scale (PERF.md): max_fp_it=50 -> 2.9e-4
    # in 3.4 s; 25 -> 3.7e-4 in 2.1 s (the f32 relative-stop floor is
    # above 1e-5, so the cap — not tol_fp — is the speed knob)
    s = SeparatedPGD(ne, n_max=n_max, tol=0.0, tol_fp=tol_fp,
                     max_fp_it=max_fp_it, solver="chol",
                     residual_check=False, dtype=dtype,
                     renorm_sweep=True, aot_cache_dir=aot_cache_dir,
                     rhs_comp=comp)
    return _to_nodal(s.solve_fused(), tfs)


def adaptive_minres(sep: SeparatedProblem, verify, *,
                    bound: float = 1e-6, n_stage1: int = 128,
                    stage_budget: int = 128, max_stages: int = 12,
                    precondition_dims=(0, 1),
                    rhs_comp="auto", rhs_comp_below: float = 1e-4,
                    stall_stages: int = 3, tol_fp: float = 1e-6,
                    max_fp_it: int = 50, dtype=np.float32,
                    rhs_bucket: int | None = None,
                    aot_cache_dir: str | None = None, log=None,
                    init_result: PGDResult | None = None,
                    checkpoint=None):
    """Error-driven TRANSIENT cascade: :func:`two_stage_minres`'s
    restart stacking continued until a VERIFIED bound — the minres
    counterpart of :func:`adaptive_cascade` (whose Galerkin enrichment
    has no minimization principle on non-symmetric operators).

    The measured discipline it packages (PERF.md round-3 transient
    findings, scripts/probe_minres_floor.py): restart stacking is the
    convergence lever above ~1e-4; compensated-dd rhs stages HURT there
    but are required once the ~1.5e-6 rhs-cancellation floor appears —
    so ``rhs_comp="auto"`` engages dd only below ``rhs_comp_below``
    (pass True/False to force).  Verification runs after every stage on
    the Galerkin-updated span (the cascade itself continues from the
    raw combination); use
    :func:`pgdrome_tpu.models.problems.transient_dense_verifier` —
    true-source by default, so the bound INCLUDES the source-separation
    truncation and stalls honestly at the separation floor (raise the
    builder's ``separation_tol`` resolution, e.g. ``source_rank=256`` at
    ``separation_tol=1e-7``, to push it).

    ``verify``/``init_result``/``checkpoint``/``stall_stages`` follow
    the :func:`adaptive_cascade` conventions; returns
    ``(best_result, history)`` with nodal-basis results."""
    import time

    def _split(v):
        if isinstance(v, dict):
            return float(v["corners"]), float(v["interior"])
        return float(v), float(v)

    say = log or (lambda *a: None)
    history = []
    best_err, best_res, best_stage = np.inf, None, 0
    corners = interior = np.inf
    res = None
    for si in range(1, max_stages + 1):
        t0 = time.perf_counter()
        comp = False
        if si == 1:
            res = init_result if init_result is not None else _minres_stage(
                sep, n_stage1, precondition_dims, tol_fp, max_fp_it,
                dtype, aot_cache_dir, False)
        else:
            if isinstance(rhs_comp, bool):
                comp = rhs_comp
            else:  # "auto": dd only in the cancellation-bound region
                comp = (
                    max(corners, interior) < rhs_comp_below
                    and np.dtype(dtype) != np.float64
                )
            sep_res, s_res = residual_problem(sep, res)
            if rhs_bucket:
                sep_res = pad_rhs_bucket(sep_res, rhs_bucket)
            delta = _minres_stage(
                sep_res, stage_budget, precondition_dims, tol_fp,
                max_fp_it, dtype, aot_cache_dir, comp)
            res = combine_results(res, delta, s_res)
        res_g = galerkin_update(sep, res)
        v = verify(res_g)
        corners, interior = _split(v)
        mx = max(corners, interior)
        entry = {
            "stage": si, "rank": res.n_modes, "corners": corners,
            "interior": interior, "max": mx, "rhs_comp": comp,
            "stage_s": round(time.perf_counter() - t0, 2),
        }
        if isinstance(v, dict):
            # screened-verification audit fields (see adaptive_cascade)
            for audit_key in ("screened", "eta", "measured_max",
                              "estimated_max"):
                if audit_key in v:
                    entry[audit_key] = v[audit_key]
        history.append(entry)
        say(f"adaptive minres stage {si}: rank {res.n_modes} corners "
            f"{corners:.2e} interior {interior:.2e}"
            + (" [dd]" if comp else ""))
        if checkpoint is not None:
            checkpoint(history[-1], res)
        if mx < best_err:
            best_err, best_res, best_stage = mx, res_g, si
        if mx < bound:
            break
        if si - best_stage >= stall_stages:
            say(f"adaptive minres stalled: best {best_err:.2e} at stage "
                f"{best_stage}, no improvement for {stall_stages} stages")
            break
    return best_res, history


def highd_frontier(num_params, *, bound=1e-6, n_x=1024, n_p=128,
                   n_stage1=128, stage_budget=128, max_stages=24,
                   minutes=None, base_boost=(8.0, 6),
                   window_boost=(16.0, 6), boost_margin=1.2,
                   n_edge=16, screen_from=8, screen_top_k=32,
                   screener_cap=3072, n_screen_edges=2048,
                   final_fem_corners=1024, state_path=None,
                   init_result=None, dtype=np.float32, log=None,
                   artifact_path=None, anova_order: int = 0,
                   anova_tol_pair: float = 2e-7,
                   seed_always: bool = False):
    """Packaged dimensionality-frontier drive (the core scientific claim
    of PGD — dimensionality separation, reference solver.py:538-724 —
    pushed to parameter counts the reference could never reach): build
    the ``num_params``-parameter elliptic vademecum problem, drive
    :func:`adaptive_cascade` with the full measured high-d discipline,
    and return a VERIFIED corner-inclusive uniform bound plus the
    error-vs-rank history.

    Packages the round-3 frontier rules (PERF.md "Dimensionality
    frontier") in one call:

    * balanced base measure ``base_boost=(8, 6)`` for the
      Galerkin/greedy metric, strong ``window_boost=(16, 6)`` stages
      only while corners bind;
    * corner-SEEDED boosted stages (``corner_seed_range`` — the
      ones-init fixed point has ~(1/n_p)^(d-1) corner overlap);
    * compensated double-f32 rhs contraction in the cancellation-bound
      region (``rhs_comp="auto"``);
    * verification: below ``screen_from`` params, the FULL 2^d corner
      FEM sweep + edges + multi-seed interior
      (:func:`models.problems.elliptic_dense_verifier`); at
      ``screen_from``+ params the f32 residual screener ranks all
      corners + ``n_screen_edges`` edge/face candidates per stage and
      FEM-verifies the worst ``screen_top_k``
      (:func:`parallel.certify.screened_verify`), with a one-off FEM
      confirmation sweep of the ``final_fem_corners`` worst-screened
      corners at the end — the claimed ``final['max']`` is the max of
      the FEM-MEASURED worst sets AND η-calibrated (1.5× safety)
      estimates for every unmeasured screened corner/edge candidate,
      each reported separately in the artifact.

    Returns ``(best_result, report)``; ``report`` carries the verified
    maxima, rank, the per-stage history (the error-vs-rank law) and the
    final FEM confirmation, and is dumped as JSON to ``artifact_path``
    when given.  ``state_path``/``init_result``: checkpoint/resume of
    the raw combination (remote-compile stalls kill long runs; resume
    instead of re-solving).
    """
    import json
    import time as _time

    from pgdrome_tpu.fem.assembly import load_vector, stiffness_matrix
    from pgdrome_tpu.fem.mesh import IntervalMesh
    from pgdrome_tpu.fem.space import FunctionSpace
    from pgdrome_tpu.models.problems import (
        box_corners,
        elliptic_dense_verifier,
        parametric_elliptic,
    )
    from pgdrome_tpu.separated import precondition_dim0
    from pgdrome_tpu.utils.setup_cache import cached_setup

    say = log or (lambda *a: None)
    t_run0 = _time.perf_counter()

    def build(boost):
        def _build():
            import warnings

            with warnings.catch_warnings():
                warnings.filterwarnings(
                    "ignore", message=".*boundary_boost compounds.*"
                )
                sep64, _ = parametric_elliptic(
                    n_x=n_x, n_p=n_p, num_params=num_params, degree_x=2,
                    boundary_boost=boost,
                )
            sep_pc64, tf = precondition_dim0(sep64, dtype=np.float64)
            return sep_pc64, tf

        # key matches the round-3 probes so their setup caches hit
        (sep_pc64, tf), status = cached_setup(
            _build,
            key_data=["probe5_build_v1", n_x, n_p, num_params, boost],
            code_objects=(parametric_elliptic, stiffness_matrix,
                          load_vector),
        )
        say(f"setup cache {status} (boost {boost})")
        return sep_pc64, tf

    sep_base, tf = build(tuple(base_boost))
    sep_boost, _ = build(tuple(window_boost))

    anova_report = None
    if anova_order and init_result is None:
        # Structure-exploiting start (VERDICT round-4 #1): the measured
        # d=10 solution is near-additive (FRONTIER_SOBOL_d10.json,
        # interaction share 0.08%), so build the anchored-ANOVA
        # surrogate EXACTLY from per-grid-point f64 collocation solves
        # (pgdrome_tpu/anova.py) and let the cascade enrich only the
        # genuine interaction remainder, instead of spending full
        # d-dimensional rank-1 modes against the rank^-1.55 wall.
        from pgdrome_tpu.anova import anova_init

        def _build_anova():
            sep_nodal, _ = parametric_elliptic(
                n_x=n_x, n_p=n_p, num_params=num_params, degree_x=2,
            )
            return anova_init(sep_nodal, order=anova_order, tf=tf,
                              tol_pair=anova_tol_pair, log=say)

        (init_result, anova_report), status = cached_setup(
            _build_anova,
            key_data=["anova_init_v1", n_x, n_p, num_params,
                      anova_order, anova_tol_pair],
            code_objects=(anova_init, parametric_elliptic),
        )
        say(f"anova init cache {status}: order {anova_order} "
            f"rank {init_result.n_modes}")
    Vx = FunctionSpace(IntervalMesh(n_x, 0.0, 1.0), "P", 2)
    Vp = [FunctionSpace(IntervalMesh(n_p, 0.0, 1.0), "P", 1)
          for _ in range(num_params)]
    Vs = [Vx] + Vp
    grid = Vp[0].tabulate_dof_coordinates()[:, 0]
    lo, hi = grid[1], grid[-2]
    corners = box_corners(lo, hi, num_params)
    screened = num_params >= screen_from

    verifier = elliptic_dense_verifier(
        Vs, tf, n_random=16, seeds=(7, 101, 1234, 777),
        corner_cap=(2 if screened else None),
        n_edge=(0 if screened else n_edge),
    )
    if screened:
        from pgdrome_tpu.parallel.certify import (
            make_screener,
            screened_verify,
        )

        rng = np.random.default_rng(424242)
        edge_cands = grid[
            rng.integers(1, len(grid) - 1,
                         size=(n_screen_edges, num_params))
        ]
        for r in range(n_screen_edges):
            k = int(rng.integers(1, num_params))
            dims = rng.choice(num_params, size=k, replace=False)
            edge_cands[r, dims] = np.where(
                rng.integers(0, 2, size=k) == 0, lo, hi
            )
        interior_small = grid[
            rng.integers(1, len(grid) - 1, size=(32, num_params))
        ]
        # the cap must cover the deepest rank this run can reach —
        # resumed legs start high and a mid-cascade cap overflow raises
        # inside verify (no artifact, wasted leg)
        start_rank = init_result.n_modes if init_result is not None else 0
        max_rank = (start_rank + (0 if start_rank else n_stage1)
                    + stage_budget * max_stages)
        cap = max(int(screener_cap), -(-max_rank // 128) * 128)
        screen = make_screener(sep_base, Vs, n_modes_cap=cap)
        verify = screened_verify(
            screen, verifier.sample_errors,
            np.concatenate([corners, edge_cands]),
            top_k=screen_top_k, safety=1.5,
            interior_samples=interior_small, log=say,
        )
    else:
        verify = verifier

    def checkpoint(stage_line, raw):
        say(json.dumps({k: v for k, v in stage_line.items()
                        if not isinstance(v, np.ndarray)}))
        if state_path:
            arrs = {f"m{d}": np.asarray(raw.modes[d], dtype=np.float64)
                    for d in range(1 + num_params)}
            np.savez(state_path, n_modes=raw.n_modes,
                     amplitudes=np.asarray(raw.amplitudes),
                     alpha=np.asarray(raw.alpha),
                     fp_its=np.asarray(raw.fp_its),
                     normU0=raw.normU0,
                     stage=int(stage_line["stage"]), **arrs)

    best, history = adaptive_cascade(
        sep_base, verify, bound=bound, n_stage1=n_stage1,
        stage_budget=stage_budget, max_stages=max_stages,
        boost_problem=sep_boost, boost_margin=boost_margin,
        rhs_comp=True, dtype=dtype, log=say,
        init_result=init_result, checkpoint=checkpoint,
        corner_seed_range=(lo, hi), rhs_bucket=4096,
        seed_always=seed_always,
        minutes=minutes,
    )

    # final verification of the BEST result: measured, corner-inclusive
    final = {}
    if screened:
        rs = screen(best, corners)
        k = min(final_fem_corners, len(corners))
        worst = corners[np.argsort(rs)[-k:]]
        t0 = _time.perf_counter()
        te = verifier.sample_errors(best, worst)
        final["corners_fem_max"] = float(te.max())
        final["corners_fem_n"] = int(k)
        final["corners_fem_s"] = round(_time.perf_counter() - t0, 1)
        if k < len(corners):
            eta = 1.5 * float(
                (te / np.maximum(rs[np.argsort(rs)[-k:]], 1e-300)).max()
            )
            final["corners_rest_estimate"] = float(
                eta * rs[np.argsort(rs)[:-k]].max()
            )
        ev = screen(best, edge_cands)
        e_order = np.argsort(ev)
        worst_e = edge_cands[e_order[-screen_top_k:]]
        te_e = verifier.sample_errors(best, worst_e)
        final["edges_fem_max"] = float(te_e.max())
        final["edges_fem_n"] = int(len(worst_e))
        if screen_top_k < len(edge_cands):
            # the f32 screener's effectivity can under-rank a pocket:
            # like the corners, the UNMEASURED edge candidates get an
            # eta-calibrated estimate (eta fit on the measured worst
            # set, 1.5x safety) that participates in the claimed max —
            # a 'measured maximum' that silently ignored 2016 screened
            # edges would repeat the round-3 5-param edge-pocket miss
            eta_e = 1.5 * float(
                (te_e / np.maximum(ev[e_order[-screen_top_k:]],
                                   1e-300)).max()
            )
            final["edges_rest_estimate"] = float(
                eta_e * ev[e_order[:-screen_top_k]].max()
            )
        final["interior_fem_max"] = float(
            verifier.sample_errors(best, interior_small).max()
        )
    else:
        v = verify(best)
        final["corners_fem_max"] = float(v["corners"])
        final["corners_fem_n"] = int(len(corners))
        final["interior_fem_max"] = float(v["interior"])

    final["max"] = max(
        final.get("corners_fem_max", 0.0),
        final.get("edges_fem_max", 0.0),
        final.get("interior_fem_max", 0.0),
        final.get("corners_rest_estimate", 0.0),
        final.get("edges_rest_estimate", 0.0),
    )

    # resumed legs extend the prior artifact's history so the shipped
    # JSON always carries the FULL error-vs-rank law (the convergence
    # claim), not just the last leg's stages
    import os as _os

    prior_hist, prior_wall, leg = [], 0.0, 1
    if (artifact_path and init_result is not None
            and _os.path.exists(artifact_path)):
        try:
            with open(artifact_path) as f:
                prev = json.load(f)
            prior_hist = prev.get("history", [])
            prior_wall = float(prev.get("wall_s", 0.0))
            leg = int(prev.get("legs", 1)) + 1
        except Exception:
            pass

    report = {
        "num_params": int(num_params),
        "n_x": int(n_x), "n_p": int(n_p),
        "bound_target": float(bound),
        "rank": int(best.n_modes),
        "anova": anova_report,
        "verified": final,
        "screened_verification": bool(screened),
        "legs": leg,
        "history": prior_hist + [
            dict({k: (float(v)
                      if isinstance(v, (int, float, np.floating))
                      else v)
                  for k, v in h.items()
                  if not isinstance(v, np.ndarray)}, leg=leg)
            for h in history
        ],
        "wall_s": round(prior_wall + _time.perf_counter() - t_run0, 1),
    }
    if artifact_path:
        with open(artifact_path, "w") as f:
            json.dump(report, f, indent=1)
    return best, report


def goal_oriented_frontier(num_params, sensors, primal_result, *,
                           bound=1e-6, n_x=1024, n_p=128,
                           dual_stage1=128, dual_budget=128,
                           max_dual_stages=8, minutes=None,
                           n_corners=0, n_edge=48, n_random=64,
                           seeds=(7, 101, 1234), dtype=np.float32,
                           state_prefix=None, log=None,
                           artifact_path=None):
    """Goal-oriented OUTPUT certification at the dimensionality frontier
    (the companion of :func:`highd_frontier` for outputs): per sensor,
    drive an adjoint-vademecum cascade whose per-stage error metric IS
    the FEM-verified corrected-output error — the cascade stops the
    moment the outputs clear ``bound``, boosts while output CORNERS
    bind, and corner-seeds at the measured output-worst points.

    Math (``pgdrome_tpu/dual.py``): s_corr = l·u_r + z_r·r has error
    (z − z_r)·r — dual error × primal residual — so a modest dual on a
    rank-walled primal certifies outputs far below the field error
    (measured at d=10: field 1.5e-4 → outputs < 7.2e-7,
    FRONTIER.md "Goal-oriented outputs").

    ``primal_result``: the (raw or Galerkin-updated) frontier primal in
    the PRECONDITIONED dim-0 basis of the canonical build (a
    :func:`highd_frontier` state).  ``sensors``: dim-0 sensor
    coordinates (x0 values).  The FEM truth sweep (ALL 2^d corners when
    ``n_corners=0``, plus per-seed edge/interior draws) runs ONCE and
    serves every sensor and every stage.

    Returns ``(duals, report)``: per-sensor dual results + the
    artifact dict (per-stage corrected-error history = the output
    error-vs-dual-rank law, estimate effectivity, timing)."""
    import json as _json
    import time as _time

    from pgdrome_tpu.dual import (
        DualCorrector,
        adjoint_problem,
        point_functional,
    )
    from pgdrome_tpu.fem.assembly import load_vector, stiffness_matrix
    from pgdrome_tpu.models.problems import elliptic_fem_solver
    from pgdrome_tpu.fem.mesh import IntervalMesh
    from pgdrome_tpu.fem.space import FunctionSpace
    from pgdrome_tpu.models.problems import box_corners, parametric_elliptic
    from pgdrome_tpu.separated import galerkin_update, precondition_dim0
    from pgdrome_tpu.utils.setup_cache import cached_setup

    say = log or (lambda *a: None)
    t_run0 = _time.perf_counter()
    d = num_params

    def build(boost):
        def _build():
            import warnings

            with warnings.catch_warnings():
                warnings.filterwarnings(
                    "ignore", message=".*boundary_boost compounds.*")
                sep64, _ = parametric_elliptic(
                    n_x=n_x, n_p=n_p, num_params=d, degree_x=2,
                    boundary_boost=boost)
            return precondition_dim0(sep64, dtype=np.float64)

        (sep_pc64, tf), status = cached_setup(
            _build, key_data=["probe5_build_v1", n_x, n_p, d, boost],
            code_objects=(parametric_elliptic, stiffness_matrix,
                          load_vector))
        say(f"setup cache {status} (boost {boost})")
        return sep_pc64, tf

    sep_pc, tf_u = build((8.0, 6))
    sep_plain, Vs = parametric_elliptic(n_x=n_x, n_p=n_p, num_params=d,
                                        degree_x=2)
    import warnings as _warnings

    with _warnings.catch_warnings():
        _warnings.filterwarnings(
            "ignore", message=".*boundary_boost compounds.*")
        sep_b16, _ = parametric_elliptic(
            n_x=n_x, n_p=n_p, num_params=d, degree_x=2,
            boundary_boost=(16.0, 6))

    res_u = galerkin_update(sep_pc, primal_result)
    Vx = Vs[0]
    grid = Vs[1].tabulate_dof_coordinates()[:, 0]
    lo, hi = grid[1], grid[-2]

    # ---- shared verification set + one FEM truth sweep ----
    n_c = 2 ** d
    idx = np.arange(n_c)
    if n_corners and n_c > n_corners:
        rng_c = np.random.default_rng(0)
        idx = np.concatenate(
            [[0, n_c - 1],
             rng_c.choice(n_c - 2, size=n_corners - 2, replace=False) + 1])
    corners = box_corners(lo, hi, d, idx)
    sets = [("corners", corners)]
    for seed in seeds:
        rng = np.random.default_rng(seed)
        if n_random:
            sets.append((f"interior_{seed}", grid[
                rng.integers(1, len(grid) - 1, size=(n_random, d))]))
        if n_edge:
            pts = grid[rng.integers(1, len(grid) - 1, size=(n_edge, d))]
            for r in range(n_edge):
                k = int(rng.integers(1, d)) if d > 1 else 1
                dims = rng.choice(d, size=k, replace=False)
                pts[r, dims] = np.where(
                    rng.integers(0, 2, size=k) == 0, lo, hi)
            sets.append((f"edges_{seed}", pts))
    samples = np.concatenate([s for _, s in sets])
    n_corner_rows = len(corners)

    fem_solve = elliptic_fem_solver(Vx, d)   # the ONE truth model,
    # shared with elliptic_dense_verifier (change kappa there, every
    # verification path follows)
    ls = [point_functional(Vx, x0) for x0 in sensors]
    t0 = _time.perf_counter()
    s_true = np.zeros((len(samples), len(ls)))
    for si, p in enumerate(samples):
        u_t = fem_solve(p)
        for j, l in enumerate(ls):
            s_true[si, j] = l @ u_t
    out_floor = 1e-9 * max(np.abs(s_true).max(), 1e-300)
    for j, x0 in enumerate(sensors):
        if np.abs(s_true[:, j]).min() < out_floor:
            raise ValueError(
                f"sensor x0={x0} has (near-)zero true outputs on the "
                "verification set (e.g. a Dirichlet-boundary sensor): "
                "relative output errors are undefined"
            )
    say(f"fem truth: {len(samples)} samples "
        f"({n_corner_rows} corners) in "
        f"{_time.perf_counter() - t0:.1f} s")

    report = {
        "num_params": d, "bound_target": float(bound),
        "primal_rank": int(res_u.n_modes),
        "n_samples": int(len(samples)),
        "n_corners": int(n_corner_rows), "seeds": list(seeds),
        "sensors": [],
    }
    duals = []
    for j, x0 in enumerate(sensors):
        say(f"=== sensor x0={x0} ===")
        l = ls[j]
        st = s_true[:, j]
        adj_pc, tf_z = precondition_dim0(adjoint_problem(sep_plain, l),
                                         dtype=np.float64)
        adj_b_pc, _ = precondition_dim0(adjoint_problem(sep_b16, l),
                                        dtype=np.float64)
        last = {}

        # boundary (corner + edge) vs interior row masks: edges count
        # toward "corners" for the boost steering AND for the corner
        # seeding, exactly like elliptic_dense_verifier — a binding
        # edge pocket must fire the boost and be seedable
        is_boundary = np.zeros(len(samples), dtype=bool)
        off = 0
        for name, pts in sets:
            if name == "corners" or name.startswith("edges"):
                is_boundary[off: off + len(pts)] = True
            off += len(pts)
        b_rows = np.nonzero(is_boundary)[0]
        i_rows = np.nonzero(~is_boundary)[0]
        corr_cache = {}

        def verify_outputs(res_zg):
            dc = DualCorrector(sep_plain, Vs, l, res_u, tf_u,
                               res_zg, tf_z, cache=corr_cache)
            s_corr, s_plain, est = dc.corrected(samples,
                                                return_parts=True)
            rel = np.abs(s_corr - st) / np.abs(st)
            mc = float(rel[b_rows].max())
            mi = float(rel[i_rows].max()) if len(i_rows) else 0.0
            order = np.argsort(rel[b_rows])[::-1][:128]
            te = st - s_plain
            big = np.abs(te) > 1e-12 * np.abs(st).max()
            last.update(
                plain_rel_max=float(
                    (np.abs(s_plain - st) / np.abs(st)).max()),
                eff_median=float(np.median(est[big] / te[big])),
            )
            return {
                "corners": mc, "interior": mi, "max": max(mc, mi),
                "worst_points": samples[b_rows][order],
                "worst_errors": rel[b_rows][order],
            }

        def checkpoint(stage_line, raw):
            if not state_prefix:
                return
            arrs = {f"m{dd}": np.asarray(raw.modes[dd],
                                         dtype=np.float64)
                    for dd in range(1 + d)}
            np.savez(f"{state_prefix}_s{j}.npz", n_modes=raw.n_modes,
                     amplitudes=np.asarray(raw.amplitudes),
                     alpha=np.asarray(raw.alpha),
                     fp_its=np.asarray(raw.fp_its),
                     normU0=raw.normU0, **arrs)

        t0 = _time.perf_counter()
        res_z, hist = adaptive_cascade(
            adj_pc, verify_outputs, bound=bound,
            n_stage1=dual_stage1, stage_budget=dual_budget,
            max_stages=max_dual_stages, boost_problem=adj_b_pc,
            boost_margin=1.2, rhs_comp=True, dtype=dtype, log=say,
            checkpoint=checkpoint, corner_seed_range=(lo, hi),
            rhs_bucket=4096, minutes=minutes)
        duals.append((res_z, tf_z))
        best = min(h["max"] for h in hist)
        sensor = {
            "x0": float(x0), "dual_rank": int(res_z.n_modes),
            "corrected_rel_max": float(best),
            "met_bound": bool(best < bound),
            "plain_rel_max": last.get("plain_rel_max"),
            "estimate_effectivity_median": last.get("eff_median"),
            "history": [{k: (float(v) if isinstance(
                v, (int, float, np.floating)) else v)
                for k, v in h.items()
                if not isinstance(v, np.ndarray)} for h in hist],
            "cascade_s": round(_time.perf_counter() - t0, 1),
        }
        report["sensors"].append(sensor)
        say(_json.dumps({k: sensor[k] for k in
                         ("x0", "dual_rank", "corrected_rel_max",
                          "met_bound")}))
        if artifact_path:
            with open(artifact_path, "w") as f:
                _json.dump(report, f, indent=1)

    report["wall_s"] = round(_time.perf_counter() - t_run0, 1)
    report["corrected_rel_max"] = max(
        s["corrected_rel_max"] for s in report["sensors"])
    if artifact_path:
        with open(artifact_path, "w") as f:
            _json.dump(report, f, indent=1)
    return duals, report


def transient_goal_oriented(sensors_x, *, n_x=256, n_t=96, n_p=48,
                            num_params=3, bound=1e-6,
                            primal_stages=(96, 64), dual_stage1=48,
                            dual_budget=48, max_dual_stages=6,
                            n_random=16, seeds=(7, 101),
                            tol_fp=1e-7, max_fp_it=50,
                            dtype=np.float32, log=None,
                            artifact_path=None):
    """Goal-oriented OUTPUT certification for the OPERATOR-parametric
    transient family (round-4 VERDICT weak #5): the transient companion
    of :func:`goal_oriented_frontier`.

    :func:`models.problems.transient_parametric_conductivity` puts the
    parameters in the operator, so the exact rhs-parametric closed form
    (:func:`pgdrome_tpu.dual.rhs_parametric_qoi`) does not apply and
    the FIELD goes through the f32 minres floor.  Per sensor (x0, final
    time) this recipe drives a BACKWARD-IN-TIME adjoint minres cascade
    (:func:`pgdrome_tpu.dual.adjoint_problem_nd` — the upwind stencil
    transposes to downwind) whose per-stage error metric IS the
    corrected-output error against the exact space-time FOM
    (:func:`models.problems.transient_conductivity_fom`, sparse-LU
    solves of the masked kron system — no source-separation floor in
    this family), stopping at ``bound``.  The correction is the
    space-time :class:`pgdrome_tpu.dual.DualCorrector` (``n_fixed=2``):
    s_corr = l·u_r + z_r·r(p), error (z−z_r)·r — dual error × primal
    residual, so modest duals certify outputs far below the field.

    Returns ``(duals, report)``; the report carries per-sensor
    histories, the primal field error for contrast, and is dumped to
    ``artifact_path``."""
    import json as _json
    import time as _time

    from pgdrome_tpu.dual import DualCorrector, adjoint_problem_nd
    from pgdrome_tpu.models.problems import (
        box_corners,
        transient_conductivity_fom,
        transient_parametric_conductivity,
    )
    from pgdrome_tpu.separated import evaluate_modes_1d

    say = log or (lambda *a: None)
    t0_run = _time.perf_counter()
    sep, Vs = transient_parametric_conductivity(
        n_x=n_x, n_t=n_t, n_p=n_p, num_params=num_params)
    fom = transient_conductivity_fom(sep, Vs)

    grid = Vs[2].tabulate_dof_coordinates()[:, 0]
    lo, hi = grid[1], grid[-2]
    pts = [box_corners(lo, hi, num_params)]
    for seed in seeds:
        rng = np.random.default_rng(seed)
        pts.append(grid[rng.integers(1, len(grid) - 1,
                                     size=(n_random, num_params))])
    pts = np.concatenate(pts)

    say(f"primal minres stages {primal_stages} ...")
    t0 = _time.perf_counter()
    res_u = two_stage_minres(sep, n_stage1=primal_stages[0],
                             n_stage2=(primal_stages[1]
                                       if len(primal_stages) > 1 else 0),
                             extra_stages=tuple(primal_stages[2:]),
                             tol_fp=tol_fp, max_fp_it=max_fp_it,
                             dtype=dtype)
    t_primal = _time.perf_counter() - t0

    x_dofs = Vs[0].tabulate_dof_coordinates()[:, 0]
    l_t = np.zeros(Vs[1].dim())
    l_t[-1] = 1.0

    # FOM truth: one space-time solve per verification point serves
    # EVERY sensor and every stage (u(x0,T) is a readout of the field)
    say(f"FOM truth sweep: {len(pts)} space-time solves ...")
    t0 = _time.perf_counter()
    U_true = [fom(p) for p in pts]
    t_fom = _time.perf_counter() - t0
    # field error of the primal for contrast (the floor the outputs
    # must beat)
    fu = np.ones((len(pts), res_u.n_modes))
    for j in range(num_params):
        fu *= np.asarray(evaluate_modes_1d(
            Vs[2 + j], res_u.modes[2 + j], pts[:, j], xp=np
        ))[:, : res_u.n_modes]
    m0 = np.asarray(res_u.modes[0])[: res_u.n_modes]
    m1 = np.asarray(res_u.modes[1])[: res_u.n_modes]
    field_err = max(
        float(np.linalg.norm(
            np.einsum("k,ki,kj->ij", fu[s], m0, m1) - U_true[s])
            / np.linalg.norm(U_true[s]))
        for s in range(len(pts))
    )
    say(f"primal rank {res_u.n_modes}: field err {field_err:.2e} "
        f"({t_primal:.1f}s solve, {t_fom:.1f}s FOM truth)")

    duals, sensor_reports = [], []
    for x0 in np.atleast_1d(sensors_x):
        ix0 = int(np.argmin(np.abs(x_dofs - x0)))
        l_x = np.zeros(Vs[0].dim())
        l_x[ix0] = 1.0
        s_true = np.array([U[ix0, -1] for U in U_true])
        s_scale = float(np.abs(s_true).max())
        adj = adjoint_problem_nd(sep, [l_x, l_t], n_fixed=2)
        cache = {}
        hist_box = []

        def verify(res_zg, _cache=cache, _s_true=s_true,
                   _l_x=l_x, _hist=hist_box, _scale=s_scale):
            dc = DualCorrector(sep, Vs, None, res_u, None, res_zg, None,
                               n_fixed=2, l_factors=[_l_x, l_t],
                               cache=_cache)
            s_corr = dc.corrected(pts)
            err = float(np.abs(s_corr - _s_true).max() / _scale)
            _hist.append(err)
            return err

        t0 = _time.perf_counter()
        res_z, hist = adaptive_minres(
            adj, verify, bound=bound, n_stage1=dual_stage1,
            stage_budget=dual_budget, max_stages=max_dual_stages,
            tol_fp=tol_fp, max_fp_it=max_fp_it, dtype=dtype,
            log=say,
        )
        duals.append(res_z)
        sensor_reports.append({
            "x0": float(x_dofs[ix0]),
            "dual_rank": int(res_z.n_modes),
            # the RETURNED dual is the BEST stage (adaptive_minres
            # returns best_res), so the headline field describes it;
            # the last stage's error stays as an audit field
            "corrected_rel_max": float(min(hist_box)
                                       if hist_box else np.inf),
            "corrected_last": float(hist_box[-1]
                                    if hist_box else np.inf),
            "corrected_best": float(min(hist_box) if hist_box else np.inf),
            "history": [
                {k: h[k] for k in ("stage", "rank", "max", "stage_s")}
                for h in hist
            ],
            "wall_s": round(_time.perf_counter() - t0, 1),
        })
        say(f"sensor x0={x_dofs[ix0]:.3f}: corrected "
            f"{sensor_reports[-1]['corrected_best']:.2e} at dual rank "
            f"{res_z.n_modes} (field floor {field_err:.2e})")

    report = {
        "family": "transient_parametric_conductivity",
        "n_x": n_x, "n_t": n_t, "n_p": n_p, "num_params": num_params,
        "bound_target": float(bound),
        "primal_rank": int(res_u.n_modes),
        "primal_field_rel_max": field_err,
        "n_verify": int(len(pts)),
        "sensors": sensor_reports,
        "max_corrected": max(s["corrected_best"]
                             for s in sensor_reports),
        "wall_s": round(_time.perf_counter() - t0_run, 1),
    }
    if artifact_path:
        with open(artifact_path, "w") as f:
            _json.dump(report, f, indent=1)
    return duals, report


def nonlinear_vademecum(sep, Vs, ml, eps, *, n_outer=12,
                        picard_tol=1e-8, cube_rank=40, cube_tol=1e-10,
                        budgets=(64, 48, 48), rhs_bucket=512,
                        rhs_comp_last=True, tol_fp=1e-7,
                        dtype=np.float32, log=None):
    """NONLINEAR parametric vademecum at scale (round-4 VERDICT weak
    #3): outer Picard on  −∇·(κ(x;p)∇u) + ε·u³ = f
    (:func:`models.problems.nonlinear_elliptic`).

    Each outer iteration is LINEAR separated algebra, all of it on the
    existing fast path:

    1. evaluate the current iterate on the full collocation grid
       (host-f64 mode contraction — the (n_x, n_p^d) tensor is exact
       there, which is the vademecum's own semantics);
    2. cube it pointwise and CP-compress (randomized range finder on
       the x-unfolding + per-component SVD, the
       :mod:`pgdrome_tpu.anova` compression scheme) to ``cube_rank``
       rhs terms at ``cube_tol``·‖b‖ truncation;
    3. re-solve the SAME preconditioned operators with the extended
       rhs stack  [b, −ε·M_L u³]  through the measured residual-cascade
       pipeline (:func:`residual_cascade`) — the operator stacks never
       change, so every outer iteration reuses ONE bucketed executable
       (reference contrast: dolfin re-assembles the nonlinear form
       inside every fixed-point sweep, reference solver.py:579-595).

    Stops when the separated iterate moves < ``picard_tol`` in relative
    product-space L2.  Returns ``(result_pc, tf, report)`` — verify
    with :func:`models.problems.nonlinear_dense_verifier` (per-sample
    banded NEWTON truth).  dtype=f32 runs the solves on TPU;
    ``rhs_comp_last`` contracts the final iterations' rhs stacks in
    compensated double-f32 (the cube rows cancel against b near the
    fixed point)."""
    import time as _time

    from pgdrome_tpu.separated import precondition_dim0

    say = log or (lambda *a: None)
    t0_run = _time.perf_counter()
    num_params = sep.num_dims - 1
    sep_pc, tf = precondition_dim0(sep, dtype=np.float64)
    ml = np.asarray(ml, dtype=np.float64)
    mask0 = np.asarray(sep.bc_masks[0], dtype=np.float64)
    # collocation weights (boost ω included, so re-weighted measures
    # keep the per-grid-point cancellation for the cube rows too)
    w_p = [np.diagonal(np.asarray(sep.ops[1 + j], dtype=np.float64)[0])
           for j in range(num_params)]
    base_rhs = [np.asarray(r, dtype=np.float64) for r in sep_pc.rhs]
    b_norm = float(np.linalg.norm(base_rhs[0][0]))

    def cube_terms(res):
        """CP factors of u³ on the collocation grid (host f64)."""
        K = res.n_modes
        full0 = tf.modes_to_full(
            np.asarray(res.modes[0])[:K]).astype(np.float64)
        Ps = [np.asarray(res.modes[1 + j])[:K].astype(np.float64)
              for j in range(num_params)]
        if num_params == 2:
            U = np.einsum("kx,ka,kb->xab", full0, Ps[0], Ps[1])
        elif num_params == 3:
            U = np.einsum("kx,ka,kb,kc->xabc", full0, Ps[0], Ps[1],
                          Ps[2])
        else:
            raise NotImplementedError(
                "cube tensors materialize n_x·n_p^d entries: supported "
                "for 2-3 params (the bench-scale nonlinear config)"
            )
        C = (U ** 3).reshape(U.shape[0], -1)
        from pgdrome_tpu.anova import _rand_range_svd

        X, s, Vt = _rand_range_svd(C.T, cube_rank)
        k = int(np.sum(s > cube_tol * max(b_norm, 1.0)))
        xs, ps = [], []
        shape_p = U.shape[1:]
        for r in range(k):
            W = Vt[r].reshape(shape_p)
            if num_params == 2:
                Uw, sw, Vtw = np.linalg.svd(W, full_matrices=False)
                for q in range(sw.size):
                    if s[r] * sw[q] <= cube_tol * max(b_norm, 1.0):
                        break
                    xs.append(X[:, r] * (s[r] * sw[q]))
                    ps.append([Uw[:, q], Vtw[q]])
            else:  # 3 params: sequential SVD of the remaining unfolding
                W1 = W.reshape(shape_p[0], -1)
                Uw, sw, Vtw = np.linalg.svd(W1, full_matrices=False)
                for q in range(sw.size):
                    if s[r] * sw[q] <= cube_tol * max(b_norm, 1.0):
                        break
                    W2 = Vtw[q].reshape(shape_p[1], shape_p[2])
                    U2, s2, V2 = np.linalg.svd(W2, full_matrices=False)
                    for m in range(s2.size):
                        if (s[r] * sw[q] * s2[m]
                                <= cube_tol * max(b_norm, 1.0)):
                            break
                        xs.append(X[:, r] * (s[r] * sw[q] * s2[m]))
                        ps.append([Uw[:, q], U2[:, m], V2[m]])
        return xs, ps

    def extended_problem(res):
        xs, ps = cube_terms(res)
        rows0 = [base_rhs[0][0]]
        rows_p = [[base_rhs[1 + j][0]] for j in range(num_params)]
        for r in range(len(xs)):
            v = (-eps * ml * xs[r]) * mask0
            rows0.append(tf.apply_Linv(v[tf.interior][:, None])[:, 0])
            for j in range(num_params):
                rows_p[j].append(w_p[j] * ps[r][j])
        rhs = [np.stack(rows0)] + [np.stack(r) for r in rows_p]
        prob = SeparatedProblem(
            ops=list(sep_pc.ops), rhs=rhs, mass=list(sep_pc.mass),
            bc_dofs=list(sep_pc.bc_dofs),
        )
        return pad_rhs_bucket(prob, rhs_bucket), len(xs)

    def rel_change(res_a, res_b):
        """‖u_a − u_b‖/‖u_b‖ in product-space L2 via separated Grams."""
        def grams(r1, r2):
            G = np.ones((r1.n_modes, r2.n_modes))
            for d in range(sep.num_dims):
                G = G * (np.asarray(r1.modes[d], dtype=np.float64)
                         [: r1.n_modes]
                         @ np.asarray(r2.modes[d], dtype=np.float64)
                         [: r2.n_modes].T)
            return G.sum()

        naa, nbb, nab = grams(res_a, res_a), grams(res_b, res_b), \
            grams(res_a, res_b)
        return float(np.sqrt(max(naa - 2 * nab + nbb, 0.0))
                     / np.sqrt(max(nbb, 1e-300)))

    res = None
    history = []
    for it in range(n_outer):
        t0 = _time.perf_counter()
        if res is None:
            prob_it, n_cube = pad_rhs_bucket(sep_pc, rhs_bucket), 0
        else:
            prob_it, n_cube = extended_problem(res)
        comp = rhs_comp_last and it >= 2 and np.dtype(dtype) != np.float64
        new = residual_cascade(prob_it, budgets, tol_fp=tol_fp,
                               dtype=dtype, rhs_comp=comp)
        new = galerkin_update(prob_it, new)
        delta = rel_change(new, res) if res is not None else np.inf
        history.append({
            "outer": it + 1, "rank": int(new.n_modes),
            "cube_terms": int(n_cube), "rel_change": float(delta),
            "rhs_comp": bool(comp),
            "outer_s": round(_time.perf_counter() - t0, 2),
        })
        say(f"picard {it + 1}: rank {new.n_modes} cube {n_cube} "
            f"moved {delta:.2e}" + (" [dd]" if comp else ""))
        prev = history[-2]["rel_change"] if len(history) > 1 else np.inf
        res = new
        if delta < picard_tol:
            break
        if it >= 2 and delta > 0.5 * prev:
            # per-iteration solve noise floor reached: the contraction
            # stopped (measured: stagnates ~1.3e-7 at f64 rank 40);
            # further outer sweeps re-randomize, they don't converge
            say(f"picard stalled at {delta:.2e} (floor); stopping")
            break
    report = {
        "eps": float(eps), "num_params": num_params,
        "outer_iterations": len(history), "history": history,
        "rank": int(res.n_modes),
        "wall_s": round(_time.perf_counter() - t0_run, 1),
    }
    return res, tf, report
