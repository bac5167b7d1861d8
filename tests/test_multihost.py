"""Two-process multi-host smoke test on a CPU Gloo backend.

Spawns two real OS processes (tests/multihost_worker.py), each with 4
virtual CPU devices, joined into one 8-device global mesh via
``jax.distributed`` — the same entry points that drive a multi-host TPU
pod over DCN (``parallel/multihost.py``). Verifies:

* the jitted sharded rollout (with cross-process all-reduce metric
  reduction) runs to completion on both processes;
* both processes compute byte-identical replicated global metrics;
* the host-sharded CSV sinks jointly cover every global batch lane exactly
  once (host 0 writes lanes 0-7, host 1 writes 8-15).
"""

import os
import socket
import subprocess
import sys

import pytest

WORKER = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                      "multihost_worker.py")


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _clean_env():
    # Drop the axon sitecustomize (PYTHONPATH) so the workers run on plain
    # local CPU; the worker sets JAX_PLATFORMS/XLA_FLAGS itself.
    env = {
        k: v
        for k, v in os.environ.items()
        if k not in ("PYTHONPATH", "JAX_PLATFORMS", "XLA_FLAGS")
    }
    return env


@pytest.mark.parametrize("n", [2, 4])
def test_multi_process_mesh(tmp_path, n):
    port = _free_port()
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, str(port), str(n), str(i),
             str(tmp_path)],
            env=_clean_env(),
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
        )
        for i in range(n)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("multihost worker timed out")
        outs.append(out.decode())
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {i} failed:\n{out}"
        assert f"worker {i} ok" in out

    # Replicated global reductions agree byte-for-byte across hosts.
    globals_ = [
        open(tmp_path / f"global_host{i}.txt").read() for i in range(n)
    ]
    assert len(set(globals_)) == 1

    # The per-host CSV sinks partition the global lane space exactly.
    lanes = {}
    for i in range(n):
        path = tmp_path / f"rollout_host{i}.csv"
        rows = open(path).read().strip().splitlines()
        assert rows[0] == "step;lane;episode_return;hidden_return;env_t"
        for row in rows[1:]:
            fields = row.split(";")
            lane = int(fields[1])
            assert lane not in lanes, f"lane {lane} written twice"
            lanes[lane] = (i, fields)
    assert sorted(lanes) == list(range(16))
    # Each host wrote its own contiguous 16/n-lane block.
    local = 16 // n
    for k in range(16):
        assert lanes[k][0] == k // local, (k, lanes[k][0])
