"""SPMD fleet execution: multi-axis mesh solving with ICI collectives.

Two cooperating parallel axes (this domain's natural decomposition — see
SURVEY §2's parallelism checklist):

  dp  scenario data parallelism: each shard runs an independent sub-fleet of
      full iLQR solves (vmap inside shard_map); convergence metrics are
      reduced across shards with psum over ICI.
  sp  sequence parallelism over the batch-iLQR control-time axis: the
      Gauss-Newton normal matrix (Su^T G Su, [(H-1)nu]^2) is assembled from
      column-sharded Su via all_gather + local matmul, each shard owning a
      row block — the trajectory-optimization analogue of sequence-parallel
      attention assembly.

`fleet_step` composes both in one jitted SPMD program; `dryrun_multichip`
in __graft_entry__.py compiles and runs it on an n-device mesh.
"""

from functools import partial
from typing import Dict

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ilqr_planner_tpu.parallel.mesh import batch_specs
from ilqr_planner_tpu.solvers import batch as batch_solver
from ilqr_planner_tpu.solvers import ilqr
from ilqr_planner_tpu.systems.spec import Spec

__all__ = ["fleet_step"]


def fleet_step(spec: Spec, overrides: Dict[str, jnp.ndarray], U0s, kp_idx,
               nb_iter: int, mesh: Mesh, dp_axis: str = "dp",
               sp_axis: str = "sp"):
    """One full fleet step on a 2-D (dp, sp) mesh.

    - Scenarios shard over dp; each (dp, sp) shard pair solves its scenario
      slice with the recursive solver (replicated over sp).
    - The batch-GN normal-equation assembly for scenario 0 runs
      sequence-parallel over sp: Su columns are sharded, each sp shard
      computes its row block of Su^T (J^T Q J) Su after an all_gather of Su.
    - Mean final cost is psum-reduced over dp — the convergence collective.

    Returns (costs [B], mean_cost scalar, gn_lhs [(H-1)nu, (H-1)nu]).
    """
    spec_b, spec_axes = batch_specs(spec, overrides)
    kp_idx = tuple(int(k) for k in kp_idx)
    H, nu = spec.horizon, spec.nu
    W = (H - 1) * nu
    n_sp = mesh.shape[sp_axis]
    assert W % n_sp == 0, f"(H-1)*nu={W} must divide sp axis size {n_sp}"

    kp_steps_static = ilqr.static_kp_steps(spec_b)
    spec_pspec = jax.tree_util.tree_map(lambda _: P(), spec)
    spec_pspec = spec_pspec.replace(**{k: P(dp_axis) for k in overrides})

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(spec_pspec, P(dp_axis)),
        out_specs=(P(dp_axis), P(), P(sp_axis)),
        check_vma=False,
    )
    def step(s_local, U0_local):
        # --- dp: local sub-fleet of full solves -------------------------
        solve = jax.vmap(
            lambda s, U0: ilqr._solve_impl(s, U0, nb_iter, True, True, False,
                                           False, kp_steps_static),
            in_axes=(spec_axes, 0),
        )
        res = solve(s_local, U0_local)
        local_mean = jnp.mean(res.cost)
        mean_cost = jax.lax.pmean(local_mean, dp_axis)

        # --- sp: sequence-parallel GN normal-matrix assembly ------------
        first = s_local.replace(
            **{k: getattr(s_local, k)[0] for k in overrides}
        )
        U = U0_local[0]
        X, fX, As, Bs, Js, Ldiag, qL = batch_solver._open_loop_rollout(first, U)
        Su = batch_solver._build_su(first, As, Bs, kp_idx)  # [n_kp*nx, W]
        Jblk = batch_solver._block_diag([Js[k] for k in kp_idx])
        Q = batch_solver.sparse_Q(first, kp_idx)
        G = Jblk.T @ Q @ Jblk  # [n_kp*nx, n_kp*nx]
        # shard Su columns over sp: my row block of Su^T G Su
        i = jax.lax.axis_index(sp_axis)
        cols = W // n_sp
        Su_local = jax.lax.dynamic_slice(Su, (0, i * cols), (Su.shape[0], cols))
        lhs_rows = Su_local.T @ (G @ Su)  # [cols, W] row block
        # dp-average so the assembled matrix is dp-invariant (each dp shard
        # contributed its own scenario 0) — one more ICI collective.
        lhs_rows = jax.lax.pmean(lhs_rows, dp_axis)
        return res.cost, mean_cost, lhs_rows

    return jax.jit(step)(spec_b, U0s)
