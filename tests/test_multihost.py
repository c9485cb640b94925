"""Multi-host runtime smoke test: 2 real processes form a JAX process group.

Exercises parallel.mesh.maybe_init_distributed (the RS_COORDINATOR env
contract) end-to-end on the CPU backend: both processes initialize the
distributed runtime, build the shared 1-D mesh, and reduce a value across
hosts with a compiled psum — the multi-node story the reference never had
(SURVEY.md section 2.2).
"""

import os
import socket
import subprocess
import sys

import pytest

_WORKER = r"""
import os, sys
import jax
jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.environ["RS_REPO"])
from robosat_tpu.parallel.mesh import create_mesh, shard_batch

import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

mesh = create_mesh()  # calls maybe_init_distributed via RS_* env
assert jax.process_count() == 2, jax.process_count()
assert len(jax.devices()) == 2 * jax.local_device_count()

# Reduce across hosts: shard a global batch over the mesh, psum it.
@jax.jit
def total(x):
    return jax.numpy.sum(x)

with mesh:
    pid = jax.process_index()
    local = np.full((jax.local_device_count(), 1), pid + 1, np.float32)
    global_shape = (2 * jax.local_device_count(), 1)
    arr = jax.make_array_from_process_local_data(
        NamedSharding(mesh, P("data", None)), local, global_shape
    )
    result = float(total(arr))

# Process 0 contributes 1 per device, process 1 contributes 2 per device.
expected = 3.0 * jax.local_device_count()
assert result == expected, (result, expected)
print("MULTIHOST_OK", jax.process_index())
"""


def test_two_process_group_reduces_across_hosts(tmp_path):
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    procs = []
    for pid in (0, 1):
        env = dict(os.environ)
        env.update(
            RS_REPO=repo,
            RS_COORDINATOR="127.0.0.1:{}".format(port),
            RS_NUM_PROCESSES="2",
            RS_PROCESS_ID=str(pid),
        )
        # Each process gets one CPU device (no virtual-device flag).
        env.pop("XLA_FLAGS", None)
        procs.append(
            subprocess.Popen(
                [sys.executable, "-c", _WORKER],
                env=env,
                stdout=subprocess.PIPE,
                stderr=subprocess.PIPE,
                cwd=str(tmp_path),
            )
        )

    outs = []
    for p in procs:
        out, err = p.communicate(timeout=150)
        outs.append((p.returncode, out.decode(), err.decode()))
    for code, out, err in outs:
        assert code == 0, err[-2000:]
        assert "MULTIHOST_OK" in out


def test_single_host_untouched(monkeypatch):
    """Without RS_COORDINATOR the distributed runtime is never initialized."""
    from robosat_tpu.parallel import mesh

    monkeypatch.delenv("RS_COORDINATOR", raising=False)
    mesh.maybe_init_distributed()  # no-op, must not raise
    assert not mesh._distributed_initialized
