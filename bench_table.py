"""Throughput table over the BASELINE.md workloads on one TPU chip.

Each row solves a fleet of perturbed scenarios of one reference workload
concurrently and reports solves/s/chip vs the reference's single-core wall
time (BASELINE.md; numbers stored in the reference tutorial notebooks).

Usage:
    python bench_table.py [--rows name1,name2] [--out BENCH_TABLE.json]

Per-row JSON lines go to stdout; diagnostics to stderr; the aggregate table
is written to --out (default BENCH_TABLE.json at the repo root).
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

from __graft_entry__ import (Q0, T1_ORN, T1_POS, T2_ORN, T2_POS, URDF,
                             _panda_spec)

QD6 = [1, 1, 1, 0.1, 0.1, 0.1]
REPEATS = 5


def _B(default):
    """Row batch size, overridable via BENCH_ROW_B for sweeps."""
    return int(os.environ.get("BENCH_ROW_B", default))


def _q0s(B, sigma=0.05, seed=0):
    rng = np.random.default_rng(seed)
    return (np.asarray(Q0)[None] + sigma * rng.normal(size=(B, 7))).astype(
        np.float32)


def _row_flagship(jnp):
    """Pos+orn H=100, recursive iLQR 10 it (POS_ORN_SYS.ipynb cell 15)."""
    from ilqr_planner_tpu.parallel import solve_batch

    spec = _panda_spec(100, 49, 99, jnp.float32)
    B = _B(18432)  # round-5 sweep: 81.5k/s at 18432 vs 79.3k at 9216
    q0s = _q0s(B)
    ov = {"q0": jnp.asarray(q0s), "x0": jnp.asarray(q0s)}
    U0s = jnp.zeros((B, 99, 7), jnp.float32)

    def run():
        return solve_batch(spec, ov, U0s, 10)

    return run, B, 19.2e-3


def _build_spec(kind, kps, horizon, nb_deriv, rt_dim=7, dt=0.1, q0=None,
                robot=None, dtype=None, **kw):
    import jax.numpy as jnp

    from ilqr_planner_tpu.models import Robot, chain_from_urdf
    from ilqr_planner_tpu.systems.spec import make_spec

    dtype = dtype or jnp.float32
    if robot is None:
        robot = Robot.from_chain(chain_from_urdf(
            URDF, "panda_link0", "panda_tip", dtype=np.dtype(dtype)))
    qmax = np.ones(7) * np.pi * 10
    return make_spec(kind, robot, kps, np.ones(rt_dim) * 1e-5, horizon,
                     nb_deriv, dt=dt, q0=Q0 if q0 is None else q0,
                     q_max=qmax, q_min=-qmax, dtype=dtype, **kw)


def _row_second_order(jnp):
    """Pos+orn 2nd order H=400, iLQR 15 it (POS_ORN_SYS_2ND.ipynb cell 11,
    410 ms single-core)."""
    from ilqr_planner_tpu.parallel import solve_batch
    from ilqr_planner_tpu.systems.keypoints import PosOrnKeypoint

    H = 400
    qd_a = np.diag([1, 1, 1, .1, .1, .1, 1, 1, 1, 0, 0, 0])
    qd_b = np.diag([1, 1, 1, .1, .1, .1, 1, 1, 1, .1, .1, .1])
    kps = [PosOrnKeypoint(T1_POS, T1_ORN, qd_a, H // 2 - 1,
                          dposition=[0, 0, 0], dorientation=[0, 0, 0, 0]),
           PosOrnKeypoint(T2_POS, T2_ORN, qd_b, H - 1,
                          dposition=[0, 0, 0], dorientation=[0, 0, 0, 0])]
    spec = _build_spec("posorn", kps, H, 2, dt=0.01,
                       dq_max=np.ones(7) * 10, dq_min=-np.ones(7) * 10)
    B = _B(4096)  # round-5 sweep: 5,230/s at 4096 vs 4,873 at 2048
    q0s = _q0s(B)
    x0s = np.concatenate([q0s, np.zeros_like(q0s)], axis=-1)
    ov = {"q0": jnp.asarray(q0s), "x0": jnp.asarray(x0s)}
    U0s = jnp.zeros((B, H - 1, 7), jnp.float32)

    def run():
        return solve_batch(spec, ov, U0s, 15)

    return run, B, 410e-3


def _row_time_optimal(jnp):
    """Pos+orn time-optimal H=100, iLQR 20 it (POS_ORN_TIME_SYS.ipynb
    cell 11, 37.7 ms single-core)."""
    from ilqr_planner_tpu.parallel import solve_batch
    from ilqr_planner_tpu.systems.keypoints import SpacetimeKeypoint

    H = 100
    kps = [SpacetimeKeypoint(T1_POS, T1_ORN, np.diag(QD6 + [0]), 49, 2.0),
           SpacetimeKeypoint(T2_POS, T2_ORN, np.diag(QD6 + [0.1]), 99, 5.0)]
    spec = _build_spec("posorn_time", kps, H, 1, rt_dim=8, dt=None,
                       q0=np.zeros(7))
    B = _B(2048)
    rng = np.random.default_rng(1)
    q0s = (0.05 * rng.normal(size=(B, 7))).astype(np.float32)  # around 0
    x0s = np.concatenate([q0s, np.zeros((B, 1), np.float32)], axis=-1)
    ov = {"q0": jnp.asarray(q0s), "x0": jnp.asarray(x0s)}
    U0 = np.tile(np.array([0.0] * 7 + [0.01], np.float32), (H - 1, 1))
    U0s = jnp.asarray(np.tile(U0[None], (B, 1, 1)))

    def run():
        return solve_batch(spec, ov, U0s, 20)

    return run, B, 37.7e-3


def _row_al_h400(jnp):
    """Pos+orn H=400 with state bound x5 <= 2, AL-iLQR 100 it
    (POS_ORN_SYS_AL_ILQR.ipynb cell 14, 727 ms single-core)."""
    from ilqr_planner_tpu.solvers.al_ilqr import Constraints
    from ilqr_planner_tpu.systems.keypoints import PosOrnKeypoint

    H = 400
    kps = [PosOrnKeypoint(T1_POS, T1_ORN, np.diag(QD6), 199),
           PosOrnKeypoint(T2_POS, T2_ORN, np.diag(QD6), 399)]
    spec = _build_spec("posorn", kps, H, 1, dt=0.01)
    A = np.zeros((14, 14), np.float32)
    A[5, 5] = 1.0
    b = np.zeros(14, np.float32)
    b[5] = 2.0
    cons = Constraints.uniform(jnp.asarray(A), jnp.asarray(b), H)
    B = _B(8192)  # round-5 sweep: 2,687/s at 8192 vs 2,543 at 4096
    q0s = _q0s(B)
    ov = {"q0": jnp.asarray(q0s), "x0": jnp.asarray(q0s)}
    U0s = jnp.zeros((B, H - 1, 7), jnp.float32)

    def run():
        # Straggler-aware two-stage schedule: identical results to the
        # direct 100-iteration solve (see solve_batch_al_staged).
        from ilqr_planner_tpu.parallel import solve_batch_al_staged
        return solve_batch_al_staged(spec, cons, jnp.asarray(b), ov, U0s,
                                     100, 5, 0.25, 1.1, first_stage=45,
                                     bucket=512)

    return run, B, 727e-3


def _row_sequential_h600(jnp):
    """Two object frames (SequentialSystem) H=600, iLQR 10 it
    (POS_ORN_MULTI_SYS.ipynb cell 23, 159 ms single-core)."""
    from ilqr_planner_tpu.models import Robot, chain_from_urdf
    from ilqr_planner_tpu.ops import so3
    from ilqr_planner_tpu.parallel import solve_batch
    from ilqr_planner_tpu.systems.keypoints import PosOrnKeypoint
    from ilqr_planner_tpu.systems.spec import make_spec, sequential_spec

    H, dt = 600, 0.01
    robot = Robot.from_chain(chain_from_urdf(
        URDF, "panda_link0", "panda_tip", dtype=np.dtype(np.float32)))
    obj1 = np.eye(4)
    obj1[:3, :3] = np.asarray(so3.quat_to_mat(np.array(
        [0.63758403393523, 0.2994657314658187, 0.6042309402208079,
         -0.37244039285286973])))
    obj1[:3, 3] = [0.62, 0.05, 0.34]
    obj2 = np.eye(4)
    obj2[:3, :3] = np.asarray(so3.quat_to_mat(np.array(
        [-0.03647984, 0.94060485, 0.33742794, 0.00860923])))
    obj2[:3, 3] = [0.32, 0.05, 0.54]
    qmax = np.ones(7) * np.pi * 10
    qd = np.diag([1, 1, 1, 0, 0, 0])
    cmd = np.ones(7, np.float32) * 1e-5
    sub1 = make_spec("posorn", robot.with_frame(obj1),
                     [PosOrnKeypoint([0, 0, -0.15], [1, 0, 0, 0], qd, H // 2)],
                     cmd, H, 1, dt=dt, q0=Q0, q_max=qmax, q_min=-qmax,
                     dtype=jnp.float32)
    sub2 = make_spec("posorn", robot.with_frame(obj2),
                     [PosOrnKeypoint([0.1, 0.1, -0.1], [1, 0, 0, 0], qd, H - 1)],
                     cmd, H, 1, dt=dt, q0=Q0, q_max=qmax, q_min=-qmax,
                     dtype=jnp.float32)
    spec = sequential_spec((sub1, sub2), cmd, dtype=jnp.float32)
    B = _B(1024)
    q0s = _q0s(B, sigma=0.02)
    ov = {"x0": jnp.asarray(q0s)}
    U0s = jnp.zeros((B, H - 1, 7), jnp.float32)

    def run():
        return solve_batch(spec, ov, U0s, 10)

    return run, B, 159e-3


def _row_batch_gn(jnp):
    """BatchILQR H=100 10 it (POS_ORN_SYS.ipynb cell 16, 803 ms
    single-core) — the scan-free Woodbury path."""
    from ilqr_planner_tpu.parallel import solve_batch_gn

    spec = _panda_spec(100, 49, 99, jnp.float32)
    B = _B(4096)
    q0s = _q0s(B)
    ov = {"q0": jnp.asarray(q0s), "x0": jnp.asarray(q0s)}
    u0s = jnp.zeros((B, 99 * 7), jnp.float32)

    def run():
        return solve_batch_gn(spec, (49, 99), ov, u0s, 10)

    return run, B, 803e-3


def _row_batch_cp(jnp):
    """BatchILQRCP K=2 H=100 10 it (POS_ORN_SYS.ipynb cell 14, 58.4 ms
    single-core)."""
    from ilqr_planner_tpu.ops import primitives
    from ilqr_planner_tpu.parallel import solve_batch_gn

    spec = _panda_spec(100, 49, 99, jnp.float32)
    psi = np.kron(primitives.build_psi_unitstep(99, 2),
                  np.eye(7)).astype(np.float32)
    B = _B(4096)
    q0s = _q0s(B)
    ov = {"q0": jnp.asarray(q0s), "x0": jnp.asarray(q0s)}
    u0s = jnp.zeros((B, 99 * 7), jnp.float32)

    def run():
        return solve_batch_gn(spec, (49, 99), ov, u0s, 10, psi=psi)

    return run, B, 58.4e-3


def _row_planar2d(jnp):
    """2D planar 3-link, task-space position tracking, recursive iLQR 10 it,
    H=100 (BASELINE.json configs[0]; reference sim 2DRobot.cpp:13-70 with
    the FD pi*1e-3 Jacobian — the reference stores no wall time for it)."""
    from ilqr_planner_tpu.models import Robot
    from ilqr_planner_tpu.models.planar import PlanarRobot
    from ilqr_planner_tpu.parallel import solve_batch
    from ilqr_planner_tpu.systems.keypoints import PointKeypoint
    from ilqr_planner_tpu.systems.spec import make_spec

    H = 100
    rob = Robot.from_planar(PlanarRobot(lengths=jnp.asarray(
        np.array([1.0, 0.8, 0.5], np.float32))))
    kps = [PointKeypoint([1.2, 0.9], np.eye(2), 49),
           PointKeypoint([0.5, 1.6], np.eye(2), 99)]
    spec = make_spec("point", rob, kps, np.ones(3) * 1e-5, H, 1, dt=0.1,
                     q0=np.array([0.5, -0.2, 0.8]), dtype=jnp.float32)
    B = _B(4096)
    rng = np.random.default_rng(2)
    q0s = (np.array([0.5, -0.2, 0.8])[None]
           + 0.05 * rng.normal(size=(B, 3))).astype(np.float32)
    ov = {"q0": jnp.asarray(q0s), "x0": jnp.asarray(q0s)}
    U0s = jnp.zeros((B, H - 1, 3), jnp.float32)

    def run():
        return solve_batch(spec, ov, U0s, 10)

    return run, B, None


def _row_joint_h100(jnp):
    """Joint-space H=100, recursive iLQR 10 it (JOINT_SPACE_SYS.ipynb
    cell 15, 16.2 ms single-core)."""
    from ilqr_planner_tpu.parallel import solve_batch
    from ilqr_planner_tpu.systems.keypoints import AngularKeypoint

    H = 100
    kps = [AngularKeypoint(np.asarray(Q0) + 0.3, np.eye(7), 49),
           AngularKeypoint(np.asarray(Q0) - 0.2, np.eye(7), 99)]
    spec = _build_spec("joint", kps, H, 1)
    B = _B(4608)
    q0s = _q0s(B, seed=3)
    ov = {"q0": jnp.asarray(q0s), "x0": jnp.asarray(q0s)}
    U0s = jnp.zeros((B, H - 1, 7), jnp.float32)

    def run():
        return solve_batch(spec, ov, U0s, 10)

    return run, B, 16.2e-3


def _row_joint_time_h100(jnp):
    """Joint-space time-optimal H=100, recursive iLQR 10 it
    (JOINT_SPACE_SYS_TIME.ipynb cell 15, 33.9 ms single-core)."""
    from ilqr_planner_tpu.parallel import solve_batch
    from ilqr_planner_tpu.systems.keypoints import AngularTimeKeypoint

    H = 100
    kps = [AngularTimeKeypoint(np.asarray(Q0) + 0.15, np.diag([1.0] * 7 + [0]),
                               49, 2.0),
           AngularTimeKeypoint(np.asarray(Q0) - 0.1,
                               np.diag([1.0] * 7 + [0.1]), 99, 5.0)]
    spec = _build_spec("joint_time", kps, H, 1, rt_dim=8, dt=None)
    B = _B(2048)
    q0s = _q0s(B, sigma=0.02, seed=4)
    x0s = np.concatenate([q0s, np.zeros((B, 1), np.float32)], axis=-1)
    ov = {"q0": jnp.asarray(q0s), "x0": jnp.asarray(x0s)}
    # sqrt-dt seed 0.1 (initial dt = 0.01 s): the 0.01 seed of the posorn
    # row leaves this joint-space workload too little time signal and it
    # stalls (measured: cost ~0.6 after 10 it vs 5e-6 with 0.1)
    U0 = np.tile(np.array([0.0] * 7 + [0.1], np.float32), (H - 1, 1))
    U0s = jnp.asarray(np.tile(U0[None], (B, 1, 1)))

    def run():
        return solve_batch(spec, ov, U0s, 10)

    return run, B, 33.9e-3


def _row_hybrid_h500(jnp):
    """Hybrid joint-space + task-space SequentialSystem H=500, recursive
    iLQR 10 it (HYBRID_SYS.ipynb cell 17, 147 ms single-core)."""
    from ilqr_planner_tpu.models import Robot, chain_from_urdf
    from ilqr_planner_tpu.parallel import solve_batch
    from ilqr_planner_tpu.systems.keypoints import (AngularKeypoint,
                                                    PosOrnKeypoint)
    from ilqr_planner_tpu.systems.spec import make_spec, sequential_spec

    H, dt = 500, 0.01
    robot = Robot.from_chain(chain_from_urdf(
        URDF, "panda_link0", "panda_tip", dtype=np.dtype(np.float32)))
    qmax = np.ones(7) * np.pi * 10
    cmd = np.ones(7, np.float32) * 1e-5
    sub_joint = make_spec(
        "joint", robot, [AngularKeypoint(np.asarray(Q0) + 0.2, np.eye(7) * 0.1,
                                         H // 2)],
        cmd, H, 1, dt=dt, q0=Q0, q_max=qmax, q_min=-qmax, dtype=jnp.float32)
    sub_task = make_spec(
        "posorn", robot, [PosOrnKeypoint(T2_POS, T2_ORN, np.diag(QD6), H - 1)],
        cmd, H, 1, dt=dt, q0=Q0, q_max=qmax, q_min=-qmax, dtype=jnp.float32)
    spec = sequential_spec((sub_joint, sub_task), cmd, dtype=jnp.float32)
    B = _B(8192)  # round-5 sweep: 21,488/s at 8192 vs 13,105 at 1024
    q0s = _q0s(B, sigma=0.02, seed=5)
    ov = {"x0": jnp.asarray(q0s)}
    U0s = jnp.zeros((B, H - 1, 7), jnp.float32)

    def run():
        return solve_batch(spec, ov, U0s, 10)

    return run, B, 147e-3


def _row_objframe_h600(jnp):
    """Single object frame H=600, recursive iLQR 10 it
    (POS_ORN_SYS_OBJ_FRAME.ipynb cell 19, 78.5 ms single-core)."""
    from ilqr_planner_tpu.models import Robot, chain_from_urdf
    from ilqr_planner_tpu.ops import so3
    from ilqr_planner_tpu.parallel import solve_batch
    from ilqr_planner_tpu.systems.keypoints import PosOrnKeypoint
    from ilqr_planner_tpu.systems.spec import make_spec

    H, dt = 600, 0.01
    robot = Robot.from_chain(chain_from_urdf(
        URDF, "panda_link0", "panda_tip", dtype=np.dtype(np.float32)))
    obj = np.eye(4)
    obj[:3, :3] = np.asarray(so3.quat_to_mat(np.array(
        [0.63758403393523, 0.2994657314658187, 0.6042309402208079,
         -0.37244039285286973])))
    obj[:3, 3] = [0.62, 0.05, 0.34]
    qmax = np.ones(7) * np.pi * 10
    spec = make_spec(
        "posorn", robot.with_frame(obj),
        [PosOrnKeypoint([0, 0, -0.15], [1, 0, 0, 0],
                        np.diag([1, 1, 1, 0, 0, 0]), H - 1)],
        np.ones(7, np.float32) * 1e-5, H, 1, dt=dt, q0=Q0, q_max=qmax,
        q_min=-qmax, dtype=jnp.float32)
    # B=4096: measured round 5 (12,290 vs 11,089 solves/s at B=1024 —
    # larger batches amortize the per-step launch overhead of H=600)
    B = _B(4096)
    q0s = _q0s(B, sigma=0.02, seed=6)
    ov = {"x0": jnp.asarray(q0s), "q0": jnp.asarray(q0s)}
    U0s = jnp.zeros((B, H - 1, 7), jnp.float32)

    def run():
        return solve_batch(spec, ov, U0s, 10)

    return run, B, 78.5e-3


ROWS = {
    "flagship_posorn_h100_ilqr10": _row_flagship,
    "posorn2nd_h400_ilqr15": _row_second_order,
    "timeopt_h100_ilqr20": _row_time_optimal,
    "al_h400_100it": _row_al_h400,
    "sequential_2frames_h600_ilqr10": _row_sequential_h600,
    "batch_gn_h100_10it": _row_batch_gn,
    "batch_cp_h100_10it": _row_batch_cp,
    "planar2d_h100_ilqr10": _row_planar2d,
    "joint_h100_ilqr10": _row_joint_h100,
    "joint_time_h100_ilqr10": _row_joint_time_h100,
    "hybrid_h500_ilqr10": _row_hybrid_h500,
    "objframe_h600_ilqr10": _row_objframe_h600,
}


def run_row(name, builder, jnp, first_call_only=False):
    from ilqr_planner_tpu.utils.compilemeter import CompileMeter

    run, B, ref_s = builder(jnp)
    t0 = time.time()
    with CompileMeter() as cm:
        res = run()
        costs = np.asarray(res.cost)
    compile_s = time.time() - t0
    csplit = cm.report(wall_s=compile_s)
    print(f"{name}: B={B} compile+first {compile_s:.1f}s "
          f"(xla {csplit['xla_compile_s']}s, other/tunnel "
          f"{csplit['other_s']}s)", file=sys.stderr)
    if first_call_only:
        # warm-start probe mode: report only the fresh-process first call
        # (persistent-cache hit) — see --warm
        entry = {"row": name, "first_call_s": round(compile_s, 1),
                 "compile_split": csplit}
        print(json.dumps(entry))
        sys.stdout.flush()
        return entry
    times = []
    for _ in range(REPEATS):
        t0 = time.time()
        res = run()
        costs = np.asarray(res.cost)
        times.append(time.time() - t0)
    iters = np.asarray(res.iterations)
    best = min(times)
    sps = B / best
    entry = {
        "row": name,
        "batch": B,
        "solves_per_s": round(sps, 1),
        "repeat_times_s": [round(t, 4) for t in times],
        "compile_s": round(compile_s, 1),
        "compile_split": csplit,
        "median_cost": float(np.median(costs)),
        # iters-to-converge (BASELINE.json metric): median executed solver
        # iterations per scenario (early stop freezes converged lanes)
        "median_iters": float(np.median(iters)),
        "ref_wall_s": ref_s,
        "vs_baseline": (round(sps * ref_s, 1) if ref_s is not None else None),
    }
    print(json.dumps(entry))
    sys.stdout.flush()
    return entry


def _warm_measure(names):
    """Re-measure each row's FIRST call in a fresh subprocess: with the
    persistent compilation cache populated by the cold run, this is the
    first-solve latency a new process actually pays (cache load + transfer,
    no XLA compile). One subprocess at a time — the tunnel stalls under
    concurrent clients."""
    import subprocess

    out = {}
    for name in names:
        t0 = time.time()
        proc = subprocess.run(
            [sys.executable, __file__, "--rows", name, "--first-call-only"],
            capture_output=True, text=True, timeout=1800)
        wall = time.time() - t0
        entry = None
        for line in (proc.stdout or "").splitlines():
            try:
                cand = json.loads(line)
                if cand.get("row") == name:
                    entry = cand
            except json.JSONDecodeError:
                continue
        if entry is None:
            print(f"warm[{name}]: FAILED rc={proc.returncode} "
                  f"{(proc.stderr or '')[-300:]}", file=sys.stderr)
            continue
        entry["process_wall_s"] = round(wall, 1)
        out[name] = entry
        print(f"warm[{name}]: first call {entry['first_call_s']}s "
              f"(xla {entry['compile_split']['xla_compile_s']}s, process "
              f"{wall:.0f}s)", file=sys.stderr)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", default=None)
    ap.add_argument("--out", default="/root/repo/BENCH_TABLE.json")
    ap.add_argument("--first-call-only", action="store_true",
                    help="time compile+first solve only, print one JSON line")
    ap.add_argument("--warm-only", action="store_true",
                    help="measure each row's warm first call (fresh process, "
                         "persistent-cache hit) and merge into --out. The "
                         "parent never opens a device client — the tunnel "
                         "tolerates only one client at a time — so run this "
                         "as a SEPARATE invocation after the cold table run.")
    args = ap.parse_args()

    if args.warm_only:
        out_path = args.out or "/root/repo/BENCH_TABLE.json"
        data = json.load(open(out_path))
        names = (args.rows.split(",") if args.rows else
                 [r["row"] for r in data.get("rows", []) if "error" not in r])
        warm = _warm_measure(names)
        for r in data.get("rows", []):
            if r.get("row") in warm:
                w = warm[r["row"]]
                r["warm_first_call_s"] = w["first_call_s"]
                r["warm_compile_split"] = w["compile_split"]
                r["warm_process_wall_s"] = w["process_wall_s"]
        json.dump(data, open(out_path, "w"), indent=1)
        print(f"merged warm measurements into {out_path}", file=sys.stderr)
        return

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    dev = jax.devices()[0]
    print(f"device: {dev}", file=sys.stderr)

    names = list(ROWS) if args.rows is None else args.rows.split(",")

    if args.first_call_only:
        for name in names:
            run_row(name, ROWS[name], jnp, first_call_only=True)
        return

    from ilqr_planner_tpu.utils.calibprobe import (CALIB_NOMINAL_S,
                                                   calibration_probe)
    calib_s = calibration_probe()
    print(f"calibration probe: {calib_s*1e3:.1f} ms (nominal "
          f"{CALIB_NOMINAL_S*1e3:.1f} ms)", file=sys.stderr)

    table = []
    for name in names:
        try:
            table.append(run_row(name, ROWS[name], jnp))
        except Exception as e:  # keep going: one bad row != no table
            print(f"{name}: FAILED {type(e).__name__}: {e}", file=sys.stderr)
            table.append({"row": name, "error": str(e)})


    out = {"device": str(dev), "calib_s": round(calib_s, 4),
           "calib_nominal_s": CALIB_NOMINAL_S, "rows": table}
    if args.out:
        # merge with any rows recorded by earlier (partial) runs
        import os
        if os.path.exists(args.out):
            try:
                old = json.load(open(args.out))
                have = {r["row"] for r in table}
                table[:0] = [r for r in old.get("rows", [])
                             if r["row"] not in have]
                out["rows"] = table
            except Exception:
                pass
        json.dump(out, open(args.out, "w"), indent=1)
        print(f"wrote {args.out}", file=sys.stderr)


if __name__ == "__main__":
    main()
