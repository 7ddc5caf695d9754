"""Real 2-process jax.distributed evidence (SURVEY §5 distributed backend).

Launches two coordinated OS processes, each owning 4 virtual CPU devices,
federated by jax.distributed.initialize into one 8-device global 'dp' mesh.
solve_batch_sharded runs the scenario fleet across both processes and a
jit-inserted collective reduces the mean cost across the process boundary
(the multi-host analogue of the reference's single-process solve — the
reference has no distributed anything, SURVEY §2).
"""

import os
import subprocess
import sys

import pytest

_WORKER = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "_multihost_worker.py")


def test_two_process_distributed_solve():
    port = 29517
    env = dict(os.environ)
    # The worker sets its own JAX_PLATFORMS/XLA_FLAGS before importing jax;
    # scrub inherited flags so the 8-virtual-device conftest setting doesn't
    # leak into the 4-device-per-process workers.
    env.pop("XLA_FLAGS", None)
    env.pop("JAX_PLATFORMS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, _WORKER, str(pid), "2", str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, env=env,
            text=True,
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=540)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append((p.returncode, out, err))

    for rc, out, err in outs:
        assert rc == 0, f"worker failed rc={rc}\nstdout:\n{out}\nstderr:\n{err}"
        assert "MULTIHOST_OK" in out, f"missing marker\nstdout:\n{out}\nstderr:\n{err}"

    # Both processes agree on the globally reduced metric.
    means = []
    for rc, out, err in outs:
        line = [ln for ln in out.splitlines() if "MULTIHOST_OK" in ln][0]
        means.append(float(line.split("mean_cost=")[1].split()[0]))
    assert means[0] == pytest.approx(means[1], rel=1e-6)
