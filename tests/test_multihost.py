"""Multi-host ray-DP: a real 2-process jax.distributed run on localhost
(2 x 4 virtual CPU devices), asserting both processes complete one global
train step and agree on the loss and post-step parameters."""

import os
import re
import socket
import subprocess
import sys

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


pytestmark = pytest.mark.slow  # full-suite acceptance lane


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _run_two_process() -> list:
    port = _free_port()
    procs = []
    for pid in range(2):
        env = dict(os.environ)
        env.update(
            JAX_PLATFORMS="cpu",
            XLA_FLAGS="--xla_force_host_platform_device_count=4",
            JAX_COORDINATOR_ADDRESS=f"127.0.0.1:{port}",
            JAX_NUM_PROCESSES="2",
            JAX_PROCESS_ID=str(pid),
            JAX_PLATFORM_NAME="cpu",
            NEURALUDF_FUSED_CORE="0",
        )
        env.pop("JAX_PLATFORMS_OVERRIDDEN", None)
        procs.append(
            subprocess.Popen(
                [sys.executable, "-m", "neuraludf_tpu.parallel.multihost", "--self-test"],
                cwd=ROOT, env=env,
                stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            )
        )
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=540)
        outs.append(out)
    return [(p.returncode, out) for p, out in zip(procs, outs)]


def test_two_process_ray_dp():
    results = _run_two_process()
    if any(rc != 0 for rc, _ in results):
        # the coordination-service shutdown barrier can time out when the
        # host is saturated and one process compiles much slower than the
        # other; one retry distinguishes that scheduling flake from a real
        # distributed-step failure
        results = _run_two_process()
    outs = [out for _, out in results]
    for rc, out in results:
        assert rc == 0, out[-3000:]

    rows = {}
    for out in outs:
        m = re.search(
            r"MULTIHOST_OK process=(\d+) loss=([\d.eE+-]+) digest=([\d.eE+-]+) devices=(\d+)",
            out,
        )
        assert m, out[-3000:]
        rows[int(m.group(1))] = (float(m.group(2)), float(m.group(3)), int(m.group(4)))

    assert set(rows) == {0, 1}
    assert rows[0][2] == 8  # 2 processes x 4 virtual devices
    # same loss and same replicated parameter digest on both hosts
    assert abs(rows[0][0] - rows[1][0]) < 1e-6, rows
    assert abs(rows[0][1] - rows[1][1]) < 1e-4, rows


def test_shard_scans_partition():
    from neuraludf_tpu.parallel.multihost import shard_scans

    dirs = [f"scan{i}" for i in range(8)]
    parts = [shard_scans(dirs, p, 3) for p in range(3)]
    assert sorted(sum(parts, [])) == sorted(dirs)  # disjoint + complete
    # round-robin: balanced shares (differ by at most 1)
    assert max(len(p) for p in parts) - min(len(p) for p in parts) <= 1
    # no host goes empty unless n_scans < n_processes
    assert all(parts)
    assert shard_scans(["a"], 1, 2) == []  # fewer scans than hosts
