"""Two-process multi-host smoke: real jax.distributed over a coordinator.

Spawns 2 CPU processes (2 virtual devices each) running
tests/_multihost_worker.py: a data-parallel grad step whose reduction
crosses the process boundary, plus checkpoint save/restore on process 0.
This covers the DCN/multi-process half of SURVEY §5.8 that the in-process
8-device mesh tests cannot (VERDICT weak #7)."""

import os
import socket
import subprocess
import sys

import pytest


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_two_process_dp_step_and_checkpoint(tmp_path):
    port = _free_port()
    worker = os.path.join(os.path.dirname(__file__), "_multihost_worker.py")
    env = dict(os.environ,
               XLA_FLAGS="--xla_force_host_platform_device_count=2",
               JAX_PLATFORMS="cpu")
    env.pop("PYTHONPATH", None)  # never set (breaks axon plugin registration)
    # sitecustomize eagerly registers the axon TPU backend when this is set,
    # which initializes XLA before jax.distributed.initialize can run
    env.pop("PALLAS_AXON_POOL_IPS", None)
    procs = [subprocess.Popen(
        [sys.executable, worker, str(pid), "2", str(port), str(tmp_path)],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
        for pid in range(2)]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=240)
            outs.append(out)
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.fail(f"multihost workers hung; partial output: {outs}")

    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"pid {pid} failed:\n{out}"
        assert "MULTIHOST_OK" in out, out
    # both processes computed the same global loss
    l0 = outs[0].split("loss=")[1].split()[0]
    l1 = outs[1].split("loss=")[1].split()[0]
    assert l0 == l1, (l0, l1)


def test_initialize_multihost_explicit_failure_propagates():
    """Explicit-arg init must fail fast, not silently fall back."""
    import jax

    from ditto_tts_tpu.parallel.mesh import initialize_multihost
    if jax.process_count() > 1:  # pragma: no cover
        pytest.skip("already distributed")
    with pytest.raises(Exception):
        # process_id out of range -> coordination client must reject it
        initialize_multihost("localhost:1", num_processes=2, process_id=7)
