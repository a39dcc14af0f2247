"""Multi-host (multi-process) layer: two CPU processes with Gloo
collectives run the distributed BA solver over one global (dp, sp) mesh
— the DCN axis of SURVEY §5.8 exercised without TPU hardware.

The test spawns 2 worker processes (tests/_multihost_worker.py), each
owning 2 virtual devices; the reduced-camera-system psum crosses the
process boundary.  Skips with a reason if this jax build cannot start
the multi-process CPU runtime."""

import os
import socket
import subprocess
import sys

import pytest


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _run_workers(worker_name: str, ok_token: str, timeout: float = 540):
    worker = os.path.join(os.path.dirname(__file__), worker_name)
    coord = f"127.0.0.1:{_free_port()}"
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    env.pop("XLA_FLAGS", None)   # worker sets its own device count
    procs = [subprocess.Popen(
        [sys.executable, worker, coord, "2", str(pid)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env,
        text=True) for pid in range(2)]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=timeout)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    joined = "\n---\n".join(outs)
    if any("MULTIHOST_UNSUPPORTED" in o for o in outs):
        pytest.skip(f"multi-process CPU runtime unavailable: {joined[-500:]}")
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} rc={p.returncode}\n{joined}"
        assert ok_token in out, f"worker {pid}:\n{joined}"
    return outs


def test_two_process_cpu_distributed_ba():
    _run_workers("_multihost_worker.py", "MULTIHOST_OK")


def test_two_process_fused_tracking_dp_dcn_silent():
    """Fused vo_scan with the dp stream axis spanning 2 processes:
    per-stream parity with single-process runs, plus the DCN-silence
    proof — no collective in the compiled tracking program crosses the
    process boundary (VERDICT r4 item 2; parallel/multihost.py design
    claim)."""
    outs = _run_workers("_multihost_track_worker.py",
                        "MULTIHOST_TRACK_OK", timeout=540)
    for out in outs:
        assert "cross_process=0" in out, out
