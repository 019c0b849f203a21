"""Two-process jax.distributed smoke test (SURVEY §2.6 multi-host goal).

Spawns two CPU processes with 4 virtual devices each, forms a global
8-device DP mesh, assembles a global batch from per-host shards
(``host_local_batch_to_global``) and runs one real train step; asserts both
hosts print the same post-update parameter digest (replicated params stayed
in sync through the GSPMD all-reduce)."""

import os
import socket
import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _run_two_process(mode: str) -> list[str]:
    port = _free_port()
    coordinator = f"127.0.0.1:{port}"
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    flags = [
        f
        for f in env.get("XLA_FLAGS", "").split()
        if not f.startswith("--xla_force_host_platform_device_count")
    ]
    flags.append("--xla_force_host_platform_device_count=4")
    env["XLA_FLAGS"] = " ".join(flags)
    env["PYTHONPATH"] = f"{REPO}{os.pathsep}" + env.get("PYTHONPATH", "")

    worker = REPO / "tests" / "multihost_worker.py"
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), coordinator, "2", str(pid), mode],
            env=env, cwd=REPO,
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        )
        for pid in (0, 1)
    ]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        assert p.returncode == 0, f"worker failed:\n{out}\n{err[-3000:]}"
        outs.append(out)

    digests = []
    for out in outs:
        lines = [l for l in out.splitlines() if l.startswith("PARAMS_DIGEST ")]
        assert lines, out
        digests.append(lines[0].split()[1])
    assert digests[0] == digests[1], digests
    return outs


@pytest.mark.slow
def test_two_process_dp_step():
    _run_two_process("step")


@pytest.mark.slow
def test_two_process_training_loop():
    """The PRODUCTION loop multi-host: per-process local shards, global
    assembly inside loop.train, 3 steps with on-device augmentation; both
    hosts end with identical replicated params."""
    _run_two_process("loop")


@pytest.mark.slow
def test_two_process_training_loop_with_ring():
    """Multi-host x device ring (VERDICT r03 weak #6): the loop's default
    feed path — replicated HBM pool, per-host feeder shards assembled into
    global chunks, LOCKSTEP refresh on both hosts — through 3 real steps;
    identical post-update digests prove the ring state never diverged."""
    _run_two_process("ring_loop")
