"""Round-5 same-run A/B: affine line search + collapsed generic backward.

Measures, within ONE process on the real chip (only same-run A/Bs are valid
— the tunnel's speed drifts ~2x by hour):

  1. flagship posorn H=100 B=9216: ls='scan' (round-4 committed path) vs
     ls='affine' (one double-rollout scan + scan-free trials);
  2. posorn 2nd-order H=400 B=2048: round-4 generic _gains_value was
     replaced by the exact collapsed form (this script has no old/new knob
     for it — the collapse is unconditional — so this row's A/B is scan vs
     affine LS on top of the collapsed backward);
  3. AL H=400 B=4096 (100 it staged): scan vs affine LS.

Usage: python bench_r05_ab.py [flagship|second|al|objframe] ...
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def _time(fn, sync, repeats=3):
    out = fn()
    sync(out)
    best = float("inf")
    for _ in range(repeats):
        t0 = time.time()
        out = fn()
        sync(out)
        best = min(best, time.time() - t0)
    return best, out


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    print(f"device: {jax.devices()[0]}", file=sys.stderr)

    from ilqr_planner_tpu.utils.calibprobe import calibration_probe
    calib = calibration_probe()
    print(f"calib_s: {calib:.4f}", file=sys.stderr)

    from __graft_entry__ import Q0, _panda_spec
    from ilqr_planner_tpu.solvers.fleet import make_fleet_solver

    which = sys.argv[1:] or ["flagship"]

    def sync(res):
        np.asarray(res.cost)

    if "flagship" in which:
        spec = _panda_spec(100, 49, 99, jnp.float32)
        B = 9216
        rng = np.random.default_rng(0)
        q0s = (np.asarray(Q0)[None] + 0.05 * rng.normal(size=(B, 7))).astype(
            np.float32)
        U0s = jnp.zeros((B, 99, 7), jnp.float32)
        x0s = jnp.asarray(q0s)
        for mode in ("scan", "affine"):
            solver = make_fleet_solver(spec, 10, ls=mode)
            t0 = time.time()
            res = solver(x0s, U0s)
            sync(res)
            print(f"flagship ls={mode}: first {time.time()-t0:.1f}s",
                  file=sys.stderr)
            best, res = _time(lambda: solver(x0s, U0s), sync)
            costs = np.asarray(res.cost)
            print(f"flagship ls={mode}: {best*1e3:.1f} ms -> "
                  f"{B/best:,.0f} solves/s, median cost "
                  f"{np.median(costs):.2e}, conv {np.mean(costs<1e-4):.1%}, "
                  f"median it {np.median(np.asarray(res.iterations))}")

    if "second" in which:
        import bench_table as bt
        run_fn, B, ref = bt._row_second_order(jnp)
        # scan vs affine through the fleet knob: rebuild solvers directly
        from ilqr_planner_tpu.systems.keypoints import PosOrnKeypoint
        H = 400
        qd_a = np.diag([1, 1, 1, .1, .1, .1, 1, 1, 1, 0, 0, 0])
        qd_b = np.diag([1, 1, 1, .1, .1, .1, 1, 1, 1, .1, .1, .1])
        kps = [PosOrnKeypoint(bt.T1_POS, bt.T1_ORN, qd_a, H // 2 - 1,
                              dposition=[0, 0, 0],
                              dorientation=[0, 0, 0, 0]),
               PosOrnKeypoint(bt.T2_POS, bt.T2_ORN, qd_b, H - 1,
                              dposition=[0, 0, 0],
                              dorientation=[0, 0, 0, 0])]
        spec = bt._build_spec("posorn", kps, H, 2, dt=0.01,
                              dq_max=np.ones(7) * 10, dq_min=-np.ones(7) * 10)
        B = 2048
        q0s = bt._q0s(B)
        x0s = jnp.asarray(np.concatenate([q0s, np.zeros_like(q0s)], axis=-1))
        U0s = jnp.zeros((B, H - 1, 7), jnp.float32)
        for mode in ("scan", "affine"):
            solver = make_fleet_solver(spec, 15, ls=mode)
            t0 = time.time()
            res = solver(x0s, U0s)
            sync(res)
            print(f"second ls={mode}: first {time.time()-t0:.1f}s",
                  file=sys.stderr)
            best, res = _time(lambda: solver(x0s, U0s), sync)
            costs = np.asarray(res.cost)
            print(f"second ls={mode}: {best*1e3:.1f} ms -> "
                  f"{B/best:,.0f} solves/s, median cost "
                  f"{np.median(costs):.2e}, median it "
                  f"{np.median(np.asarray(res.iterations))}")

    if "al" in which:
        import bench_table as bt
        from ilqr_planner_tpu.solvers.al_ilqr import Constraints
        from ilqr_planner_tpu.solvers.fleet import make_fleet_solver_al
        from ilqr_planner_tpu.systems.keypoints import PosOrnKeypoint
        H = 400
        kps = [PosOrnKeypoint(bt.T1_POS, bt.T1_ORN, np.diag(bt.QD6), 199),
               PosOrnKeypoint(bt.T2_POS, bt.T2_ORN, np.diag(bt.QD6), 399)]
        spec = bt._build_spec("posorn", kps, H, 1, dt=0.01)
        A = np.zeros((14, 14), np.float32)
        A[5, 5] = 1.0
        b = np.zeros(14, np.float32)
        b[5] = 2.0
        cons = Constraints.uniform(jnp.asarray(A), jnp.asarray(b), H)
        B = 4096
        q0s = bt._q0s(B)
        x0s = jnp.asarray(q0s)
        U0s = jnp.zeros((B, H - 1, 7), jnp.float32)
        lam0 = jnp.asarray(b)
        for mode in ("scan", "affine"):
            solver = make_fleet_solver_al(spec, cons, 100, 5, 0.25, 1.1,
                                          ls=mode)
            t0 = time.time()
            res = solver(x0s, U0s, lam0)
            sync(res)
            print(f"al ls={mode}: first {time.time()-t0:.1f}s",
                  file=sys.stderr)
            best, res = _time(lambda: solver(x0s, U0s, lam0), sync)
            costs = np.asarray(res.cost)
            print(f"al ls={mode}: {best*1e3:.1f} ms -> "
                  f"{B/best:,.0f} solves/s, median cost "
                  f"{np.median(costs):.2e}, median it "
                  f"{np.median(np.asarray(res.iterations))}")

    if "objframe" in which:
        import bench_table as bt
        run_fn, B, ref = bt._row_objframe_h600(jnp)
        best, res = _time(run_fn, sync)
        costs = np.asarray(res.cost)
        print(f"objframe (solve_batch auto): {best*1e3:.1f} ms -> "
              f"{B/best:,.0f} solves/s, median cost {np.median(costs):.2e}, "
              f"median it {np.median(np.asarray(res.iterations))}")


if __name__ == "__main__":
    main()
