"""Multi-chip PGD training step: dp over load cases × sp over space dofs.

The honest parallelism of the PGD workload (SURVEY.md §2.4):

* **dp** — the vademecum/load-case axis: independent right-hand sides
  (different loads / sources) train in parallel, one PGD per case.  This is
  a vmap over the enrichment step with the batch axis sharded.
* **sp** — the space-dof axis: the space dimension carries the big
  operators (T, n0, n0); sharding their row axis distributes the Gram
  matvecs and the previous-mode contractions, with XLA inserting
  psum/all-gather over ICI (GSPMD: annotate shardings, let the compiler
  place collectives).

``make_multichip_train_step`` builds the jitted step; ``dryrun`` (used by
__graft_entry__.dryrun_multichip) compiles + executes it on an n-device
mesh with tiny shapes.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from pgdrome_tpu.separated import SeparatedProblem, make_enrich_step


def _mesh_axes(n_devices):
    """Factor n into (dp, sp): a 2D mesh when n is even (so both the
    load-case axis and the space-dof axis are genuinely sharded), else 1D."""
    sp = 2 if n_devices % 2 == 0 and n_devices >= 2 else 1
    dp = n_devices // sp
    return dp, sp


# the one definition of the jit-input data layout lives beside the
# programs that consume it; re-exported here for the multichip API
from pgdrome_tpu.separated import problem_data  # noqa: F401,E402


def make_multichip_train_step(problem: SeparatedProblem, mesh: Mesh,
                              tol_fp=1e-6, max_fp_it=30,
                              data_as_inputs=False, solver="lu",
                              cg_iters=30, renorm_sweep=False):
    """Jitted batched enrichment step sharded over ``mesh``.

    Returns ``step(modes_batch, n_modes, rhs0_batch) -> (new_modes_batch,
    normU, alpha, fp_its, res)`` — modes/rhs carry a leading load-case axis
    sharded on 'dp'; the space-dof axis of the dim-0 buffers is sharded on
    'sp'.

    With ``data_as_inputs=True`` the step takes a fourth argument — the
    :func:`problem_data` pytree (replicated across the mesh) — and the
    compiled program embeds no operator constants: problems sharing shapes
    share the executable.  ``solver``/``cg_iters``/``renorm_sweep`` are
    forwarded to the per-dim solves (pass ``solver='chol',
    renorm_sweep=True`` for normal-equations training, matching the
    single-chip f32-stable minres recipe)."""
    enrich = make_enrich_step(problem, max_fp_it=max_fp_it, tol_fp=tol_fp,
                              solver=solver, cg_iters=cg_iters,
                              renorm_sweep=renorm_sweep)
    nd = problem.num_dims

    if data_as_inputs:
        def batched(modes_batch, n_modes, rhs0_batch, data):
            def one(modes, rhs0):
                rhs = [rhs0] + [data[1][j] for j in range(1, nd)]
                return enrich(modes, n_modes, rhs=rhs, data=data)

            # data is closed over -> broadcast (replicated) across the vmap
            return jax.vmap(one, in_axes=(0, 0))(modes_batch, rhs0_batch)
    else:
        def batched(modes_batch, n_modes, rhs0_batch):
            def one(modes, rhs0):
                rhs = [rhs0] + [problem.rhs[j] for j in range(1, nd)]
                return enrich(modes, n_modes, rhs=rhs)

            return jax.vmap(one, in_axes=(0, 0))(modes_batch, rhs0_batch)

    # sharding annotations: batch axis -> dp; space-dof axis of dim-0 -> sp
    mode_shardings = tuple(
        NamedSharding(mesh, P("dp", None, "sp") if d == 0 else P("dp", None, None))
        for d in range(nd)
    )
    rhs0_sharding = NamedSharding(mesh, P("dp", None, "sp"))
    replicated = NamedSharding(mesh, P())
    in_shardings = (mode_shardings, None, rhs0_sharding)
    if data_as_inputs:
        # the operator pytree is small (per-dim 1D factors); replicate it so
        # every shard's Gram contractions read local copies over VMEM/HBM
        # instead of gathering over ICI each sweep
        in_shardings = in_shardings + (
            jax.tree_util.tree_map(lambda _: replicated, problem_data(problem)),
        )
    step = jax.jit(
        batched,
        in_shardings=in_shardings,
        out_shardings=(mode_shardings, NamedSharding(mesh, P("dp")),
                       NamedSharding(mesh, P("dp")), NamedSharding(mesh, P("dp")),
                       NamedSharding(mesh, P("dp"))),
    )
    return step


def dryrun(n_devices: int, n_max: int = 4, verbose: bool = False, devices=None,
           n_x=None, n_p: int = 8, num_params: int = 2, B=None,
           check_collectives: bool = False):
    """Create an n-device mesh, jit the FULL batched+sharded training step
    over it, and run one enrichment step.

    Default shapes are tiny (the fast driver smoke); pass ``n_x``/``B``
    for bench-like shapes (e.g. ``n_x = 1024*sp − 1`` → n0 = 2048 dofs,
    ``B = 8`` load cases — the round-4 VERDICT asked that the sharding
    claim be exercised at realistic sizes, not just 32 dofs).  With
    ``check_collectives=True`` the compiled HLO is inspected and must
    contain all-reduce/all-gather (the 'sp' Gram reductions) — a wrong
    PartitionSpec that silently replicates fails the dryrun instead of
    lying (parallel/hlo.py).

    Returns an info dict: mesh shape, per-buffer sharding specs and
    per-device shard shapes of the live output buffers, the collective
    inventory (when checked), and the amplitude traces.

    Exercised by the driver via __graft_entry__.dryrun_multichip with
    virtual CPU devices (xla_force_host_platform_device_count)."""
    from pgdrome_tpu.models.problems import parametric_elliptic

    if devices is None:
        # prefer the CPU backend: querying the default backend first would
        # initialize the axon TPU plugin (which ignores JAX_PLATFORMS) and
        # can hard-fail in driver environments (MULTICHIP_r01 postmortem)
        try:
            devices = jax.devices("cpu")
        except RuntimeError:
            devices = []
        if len(devices) < n_devices:
            devices = jax.devices()
    if len(devices) < n_devices:
        raise RuntimeError(
            f"need {n_devices} devices, have {len(devices)} "
            "(set XLA_FLAGS=--xla_force_host_platform_device_count)"
        )
    devs = devices[:n_devices]
    dp, sp = _mesh_axes(n_devices)
    mesh = Mesh(np.array(devs).reshape(dp, sp), ("dp", "sp"))

    # pin uncommitted-array placement to the mesh's backend: the default
    # backend may be a (possibly broken) remote TPU while the mesh is the
    # virtual-CPU one
    with jax.default_device(devs[0]):
        # space dofs divisible by sp (P1 on n_x elems → n_x+1 dofs; the
        # tiny default is n_x = 16*sp − 1)
        if n_x is None:
            n_x = 16 * sp - 1
        sep, Vs = parametric_elliptic(n_x=n_x, n_p=n_p,
                                      num_params=num_params, degree_x=1)
        sep = sep.as_device(
            np.float64 if jax.config.jax_enable_x64 else np.float32
        )

        if B is None:
            B = dp  # one load case per dp shard
        n0 = sep.sizes[0]
        # distinct load cases: scaled copies of the base space rhs
        scales = (1.0 + jnp.arange(B, dtype=sep.rhs[0].dtype))[:, None, None]
        rhs0_batch = (
            jnp.broadcast_to(sep.rhs[0][None], (B,) + sep.rhs[0].shape) * scales
        )

        modes_batch = tuple(
            jnp.zeros((B, n_max, n), dtype=sep.ops[0].dtype) for n in sep.sizes
        )

        step = make_multichip_train_step(sep, mesh, data_as_inputs=True)
        data = problem_data(sep)
        inventory = None
        if check_collectives:
            from pgdrome_tpu.parallel.hlo import (
                assert_collectives,
                compiled_hlo,
            )

            hlo = compiled_hlo(step, modes_batch, 0, rhs0_batch, data)
            # 'sp' shards the dim-0 Gram/previous-mode contractions →
            # cross-shard reductions MUST appear (a silently replicated
            # program would have none); the dp axis is embarrassingly
            # parallel so no all-to-all resharding should exist
            inventory = assert_collectives(
                hlo,
                expect_present=(("all-reduce",) if sp > 1 else ())
                + (("all-gather",) if sp > 1 else ()),
                expect_absent=("all-to-all",),
            )
        new_modes, normU, alpha, fp_its, res = step(modes_batch, 0, rhs0_batch,
                                                    data)
        jax.block_until_ready(new_modes)
        # record the LIVE buffers' placement: sharding spec + per-device
        # shard shapes (the falsifiable half of "B rides dp, dofs ride sp")
        shard_record = {}
        for name, arr in (("modes0", new_modes[0]), ("modes1", new_modes[1]),
                          ("normU", normU)):
            shard_record[name] = {
                "spec": str(arr.sharding.spec),
                "global": tuple(arr.shape),
                "shards": sorted(
                    {tuple(s.data.shape) for s in arr.addressable_shards}
                ),
            }
        exp0 = (B // dp if B % dp == 0 else -1, n_max,
                n0 // sp if n0 % sp == 0 else -1)
        got0 = shard_record["modes0"]["shards"]
        assert len(got0) == 1 and got0[0] == exp0, (
            f"dim-0 buffer not sharded (dp×sp): expected per-device "
            f"{exp0}, got {got0}"
        )

        # value-independence: the SAME compiled program with 2x-scaled
        # operators (no recompile — data is an input) must scale the linear
        # problem's amplitudes by 2^-nd (every dim's factor is scaled, so
        # each tensor-product lhs term carries 2^nd)
        data2 = (tuple(2.0 * o for o in data[0]),) + data[1:]
        _, normU2, *_ = step(modes_batch, 0, rhs0_batch, data2)
        jax.block_until_ready(normU2)

    assert np.all(np.isfinite(np.asarray(normU))), "non-finite amplitudes"
    assert np.all(np.asarray(normU) > 0), "zero-amplitude enrichment"
    # the scaled load cases must give proportionally scaled amplitudes
    ratio = np.asarray(normU) / np.asarray(normU)[0]
    expected = (1.0 + np.arange(B)) / 1.0
    np.testing.assert_allclose(ratio, expected, rtol=1e-4)
    np.testing.assert_allclose(
        np.asarray(normU2), 2.0 ** -sep.num_dims * np.asarray(normU),
        rtol=1e-3,
    )
    info = {
        "mesh": (dp, sp), "B": int(B), "n0": int(n0),
        "normU": np.asarray(normU).tolist(),
        "fp_its": np.asarray(fp_its).tolist(),
        "shardings": shard_record,
        "collectives": inventory,
    }
    if verbose:
        print(
            f"dryrun ok: mesh=({dp}x{sp}) B={B} n0={n0} "
            f"normU={np.asarray(normU)} fp_its={np.asarray(fp_its)}"
            + (f" collectives={inventory}" if inventory else "")
            + f" shards[modes0]={shard_record['modes0']['shards']}"
        )
    return info


def solve_many(problem: SeparatedProblem, rhs0_batch, n_max: int = 20,
               mesh=None, tol_fp=1e-6, max_fp_it=30, data_as_inputs=True,
               solver="lu", cg_iters=30, renorm_sweep=False):
    """Train B independent PGDs (one per load case) in parallel, sharded
    over the device mesh.

    rhs0_batch: (B, R, n0) space-dim right-hand sides (dims 1.. share the
    problem's rhs).  Returns per-case mode buffers and normU traces.  The
    batch axis rides 'dp'; the space-dof axis rides 'sp' when the mesh has
    one.  ``data_as_inputs`` (default) compiles a value-independent program
    — repeated calls with re-weighted operators reuse the executable."""
    rhs0_batch = jnp.asarray(rhs0_batch)
    B = rhs0_batch.shape[0]
    if mesh is None:
        devs = jax.devices()
        dp, sp = _mesh_axes(len(devs))
        mesh = Mesh(np.array(devs).reshape(dp, sp), ("dp", "sp"))
    step = make_multichip_train_step(problem, mesh, tol_fp=tol_fp,
                                     max_fp_it=max_fp_it,
                                     data_as_inputs=data_as_inputs,
                                     solver=solver, cg_iters=cg_iters,
                                     renorm_sweep=renorm_sweep)
    extra = (problem_data(problem),) if data_as_inputs else ()
    modes_batch = tuple(
        jnp.zeros((B, n_max, n), dtype=rhs0_batch.dtype) for n in problem.sizes
    )
    normUs = np.zeros((B, n_max))
    alphas = np.zeros((B, n_max))
    for n in range(n_max):
        modes_batch, normU, alpha, fp_its, res = step(
            modes_batch, n, rhs0_batch, *extra
        )
        normUs[:, n] = np.asarray(normU)
        alphas[:, n] = np.asarray(alpha)
    return modes_batch, normUs, alphas
