"""Multi-host execution tests: real 2-process runs.

The reference's only scale-out was launching more shell processes
(reference run.sh:29-40); here that fan-out is first-class:

- `cli.sweep --hosts N --host-id i` statically partitions the (image, K)
  grid across cooperating processes on a shared filesystem,
- `jax.distributed` + `JobScheduler.from_runtime()` does the same from the
  runtime's process topology.

Both are exercised with two actual OS processes (CPU backend).
"""

from __future__ import annotations

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_SWEEP = """
import sys, jax
jax.config.update("jax_platforms", "cpu")
from lbdrn_msic_tpu.cli import sweep
sys.exit(sweep.main(sys.argv[1:]))
"""

_DIST = """
import sys, jax
jax.config.update("jax_platforms", "cpu")
from lbdrn_msic_tpu.parallel.distributed import JobScheduler, initialize_cluster
initialize_cluster()  # JAX_COORDINATOR_ADDRESS / _NUM_PROCESSES / _PROCESS_ID
assert jax.process_count() == 2, jax.process_count()
s = JobScheduler.from_runtime()
print("MINE", s.process_id, ",".join(s.mine([f"j{i}" for i in range(7)])))
"""


def _env():
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    return env


@pytest.mark.slow
def test_two_process_sweep_partition(tmp_path):
    """Two sweep processes with --hosts 2 split the (image, K) grid and
    together produce the complete artifact set, none duplicated."""
    from lbdrn_msic_tpu.io.tiff import write_tiff
    from lbdrn_msic_tpu.utils.synth import synth_scene

    paths = []
    for s in (1, 2):
        p = tmp_path / f"img{s}.tif"
        write_tiff(str(p), synth_scene(32, 32, channels=2, seed=s))
        paths.append(str(p))
    out = tmp_path / "out"

    flags = [
        "-i", *paths, "-o", str(out), "--k-min", "4", "--k-max", "5",
        "-bc", "16", "-nl", "1", "-e", "1", "-bs", "1024", "--hosts", "2",
    ]
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", _SWEEP, *flags, "--host-id", str(i)],
            env=_env(), cwd=REPO,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for i in range(2)
    ]
    outs = [p.communicate(timeout=420)[0] for p in procs]
    for p, o in zip(procs, outs):
        assert p.returncode == 0, o[-2000:]

    # all four (image, K) run dirs exist exactly once, each fully decoded
    run_dirs = sorted(d for d in os.listdir(out))
    assert len(run_dirs) == 4, run_dirs
    for d in run_dirs:
        assert os.path.exists(out / d / "decode.txt"), d
    # disjoint partition: each process encoded only its share
    enc = [o.count("[sweep] encode") for o in outs]
    assert enc == [2, 2], enc


@pytest.mark.slow
def test_two_process_jax_distributed(tmp_path):
    """jax.distributed across two real processes: initialize_cluster wires
    the cluster from env, and JobScheduler.from_runtime splits jobs."""
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]

    procs = []
    for i in range(2):
        env = _env()
        env.update(
            JAX_COORDINATOR_ADDRESS=f"127.0.0.1:{port}",
            JAX_NUM_PROCESSES="2",
            JAX_PROCESS_ID=str(i),
        )
        procs.append(
            subprocess.Popen(
                [sys.executable, "-c", _DIST], env=env, cwd=REPO,
                stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            )
        )
    outs = [p.communicate(timeout=300)[0] for p in procs]
    for p, o in zip(procs, outs):
        assert p.returncode == 0, o[-2000:]
    mine = {}
    for o in outs:
        for line in o.splitlines():
            if line.startswith("MINE"):
                _, pid, jobs = line.split(" ", 2)
                mine[int(pid)] = jobs.split(",")
    assert set(mine) == {0, 1}
    got = sorted(mine[0] + mine[1])
    assert got == sorted(f"j{i}" for i in range(7))
    assert not (set(mine[0]) & set(mine[1]))
