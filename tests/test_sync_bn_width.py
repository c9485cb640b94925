"""Sync-BN train step at mesh width 8: the shipped default BN semantics
(sync_bn = true, global-batch statistics) proven beyond the suite's 2-device
mesh.

The full-suite mesh stays at 2 virtual devices (tests/conftest.py: XLA:CPU's
spinning rendezvous livelocks ~110 interleaved all-reduces on this 1-core
host), so this test runs in a SUBPROCESS with its own 8-device CPU platform
and a deliberately BN-light model (one batch norm => ~4 collectives per
step) — wide-mesh collective semantics without the livelock.

Sync-BN's contract is mesh-size invariance: global-batch statistics make the
step's math independent of how the batch is sharded, so the 8-way step must
reproduce the single-device step to fp-reduction tolerance (the reference's
per-replica DataParallel BN, by contrast, is width-dependent —
robosat/tools/train.py:69; see parallel/steps.make_train_step).
"""

import os
import subprocess
import sys

_WORKER = r"""
import os, sys
os.environ["XLA_FLAGS"] = (
    "--xla_force_host_platform_device_count=8"
    " --xla_cpu_collective_call_warn_stuck_timeout_seconds=300"
    " --xla_cpu_collective_call_terminate_timeout_seconds=3600"
    " --xla_cpu_collective_timeout_seconds=3600"
)
import jax
jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, os.environ["RS_REPO"])

import jax.numpy as jnp
import numpy as np
import optax

from robosat_tpu.models.layers import bn_apply, bn_init, conv_apply, conv_init, init_rng
from robosat_tpu.ops.losses import cross_entropy_loss
from robosat_tpu.parallel.mesh import create_mesh
from robosat_tpu.parallel.steps import make_train_step


class ToyBNModel:
    # conv -> BN -> relu -> conv head: one BN, so a sync-BN step carries
    # only a handful of collectives at width 8.

    @staticmethod
    def init(seed):
        rng = init_rng(seed)
        params = {"conv1": conv_init(rng, 3, 3, 3, 8), "head": conv_init(rng, 1, 1, 8, 2)}
        params["bn"], bn_state = bn_init(8)
        return params, {"bn": bn_state}

    @staticmethod
    def apply(params, state, x, train):
        out = conv_apply(params["conv1"], x, stride=1)
        out, bn_state = bn_apply(params["bn"], state["bn"], out, train)
        out = jax.nn.relu(out)
        return conv_apply(params["head"], out, stride=1), {"bn": bn_state}


model = ToyBNModel()
assert len(jax.devices()) == 8, jax.devices()

rng = np.random.default_rng(0)
images = rng.integers(0, 256, (16, 32, 32, 3), dtype=np.uint8)
masks = (rng.random((16, 32, 32)) < 0.3).astype(np.int32)
key = jax.random.PRNGKey(0)

def run(mesh):
    params, state = model.init(0)
    optimizer = optax.adam(1e-3)
    opt_state = optimizer.init(params)
    step = make_train_step(
        model, lambda l, t, w: cross_entropy_loss(l, t, w), optimizer,
        weight=np.array([1.0, 2.0], np.float32), mesh=mesh, augment=False, sync_bn=True,
    )
    losses = []
    for _ in range(2):
        params, state, opt_state, loss, counts = step(params, state, opt_state, key, images, masks)
        losses.append(float(loss))
    return losses, params, state

mesh = create_mesh()
assert mesh.devices.size == 8, mesh
wide_losses, wide_params, wide_state = run(mesh)
single_losses, single_params, single_state = run(None)

# Global-batch BN makes the step mesh-size invariant.
np.testing.assert_allclose(wide_losses, single_losses, rtol=1e-5, atol=1e-6)
for (pa, pb) in [(wide_params, single_params), (wide_state, single_state)]:
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5), pa, pb
    )
assert all(np.isfinite(wide_losses))
print("SYNCBN8_OK", wide_losses)
"""


def test_sync_bn_width8_matches_single_device(tmp_path):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env["RS_REPO"] = repo
    env.pop("XLA_FLAGS", None)
    env.pop("RS_COORDINATOR", None)
    proc = subprocess.run(
        [sys.executable, "-c", _WORKER],
        env=env,
        capture_output=True,
        timeout=600,
        cwd=str(tmp_path),
    )
    assert proc.returncode == 0, proc.stderr.decode()[-3000:]
    assert b"SYNCBN8_OK" in proc.stdout
