"""Mesh/sharding tests on the virtual multi-device CPU mesh.

Validates the DataParallel replacement (SURVEY.md section 2.2): a train step
sharded over the mesh must produce the same math as the same step on one
device — gradients reduce over the mesh, BN uses global-batch statistics.
The mesh is 2 virtual devices on this harness (see tests/conftest.py: more
device threads than cores livelocks XLA:CPU's spinning collective
rendezvous); the sharding semantics proven here are device-count-invariant.
"""

import jax
import numpy as np
import optax
import pytest

from robosat_tpu.models import unet
from robosat_tpu.ops.losses import get_loss
from robosat_tpu.parallel.mesh import create_mesh, replicate, shard_batch
from robosat_tpu.parallel.steps import make_eval_step, make_predict_step, make_train_step


@pytest.fixture(scope="module")
def setup():
    params, state = unet.init(0, num_classes=2)
    rng = np.random.default_rng(0)
    images = rng.integers(0, 255, (8, 64, 64, 3), dtype=np.uint8)
    masks = rng.integers(0, 2, (8, 64, 64)).astype(np.int32)
    return params, state, images, masks


def test_virtual_mesh_available():
    assert len(jax.devices()) >= 2, "conftest must provide a multi-device CPU mesh"


def test_train_step_mesh_matches_single_device(setup):
    params, state, images, masks = setup
    loss_fn = get_loss("CrossEntropy")
    weight = np.array([1.0, 2.0], np.float32)
    # SGD: the update is linear in the gradient, so single-device and sharded
    # updates agree to fp tolerance. (Adam's first step is ~sign(grad)*lr and
    # amplifies reassociation noise on near-zero gradients to 2*lr.)
    optimizer = optax.sgd(1e-3)

    rng = jax.random.PRNGKey(42)

    # Single device (first CPU device).
    step1 = make_train_step(unet, loss_fn, optimizer, weight=weight, mesh=None, augment=False)
    p1, s1, o1, loss1, counts1 = step1(params, state, optimizer.init(params), rng, images, masks)

    # Multi-device mesh, batch sharded.
    mesh = create_mesh()
    step8 = make_train_step(unet, loss_fn, optimizer, weight=weight, mesh=mesh, augment=False)
    p8 = replicate(mesh, params)
    s8 = replicate(mesh, state)
    o8 = replicate(mesh, optimizer.init(params))
    p8, s8, o8, loss8, counts8 = step8(p8, s8, o8, rng, shard_batch(mesh, images), shard_batch(mesh, masks))

    # rel 5e-5: fp32 reassociation of the sharded loss reduction moves the
    # scalar by ~1e-5 relative; semantic failures (per-shard BN, missing
    # grad psum) move it by percent and break the checks below anyway.
    assert float(loss1) == pytest.approx(float(loss8), rel=5e-5)
    # Confusion counts: a pixel sitting exactly at the argmax margin can flip
    # with the sharded reduction order (fp reassociation through sync-BN), so
    # allow a couple of boundary pixels out of ~32k while pinning the total
    # (a flipped prediction moves counts within a true-label row).
    c1, c8 = np.asarray(counts1, np.int64), np.asarray(counts8, np.int64)
    assert c1.sum() == c8.sum()
    assert np.abs(c1 - c8).sum() <= 8, "confusion counts diverged: {} vs {}".format(c1, c8)

    # The update direction must agree. Element-wise closeness is too strict:
    # grads through train-mode BN at random init are ill-conditioned, and fp32
    # reassociation across shards perturbs individual elements by tens of
    # percent even though both runs sit equally far from an fp64 oracle
    # (verified while writing this test). A *semantic* sharding bug (per-shard
    # BN stats, missing gradient reduction) breaks the direction globally.
    delta1 = np.concatenate(
        [(np.asarray(a) - np.asarray(b)).ravel() for a, b in zip(jax.tree_util.tree_leaves(p1), jax.tree_util.tree_leaves(params))]
    )
    delta8 = np.concatenate(
        [(np.asarray(a) - np.asarray(b)).ravel() for a, b in zip(jax.tree_util.tree_leaves(p8), jax.tree_util.tree_leaves(params))]
    )
    cos = float(np.dot(delta1, delta8) / (np.linalg.norm(delta1) * np.linalg.norm(delta8) + 1e-30))
    assert cos > 0.999, "sharded update direction diverged: cos={}".format(cos)

    # BN running stats: global-batch statistics must match, proving sync-BN.
    bn1 = np.asarray(s1["encoder"]["bn1"]["mean"])
    bn8 = np.asarray(s8["encoder"]["bn1"]["mean"])
    np.testing.assert_allclose(bn1, bn8, atol=1e-5)


def test_eval_step_mesh(setup):
    params, state, images, masks = setup
    loss_fn = get_loss("CrossEntropy")
    mesh = create_mesh()
    step = make_eval_step(unet, loss_fn, weight=np.array([1.0, 1.0], np.float32), mesh=mesh)
    loss, counts = step(replicate(mesh, params), replicate(mesh, state), shard_batch(mesh, images), shard_batch(mesh, masks))
    assert np.isfinite(float(loss))
    assert int(np.asarray(counts).sum()) == 8 * 64 * 64


def test_predict_step_mesh_overlap_crop(setup):
    params, state, _, _ = setup
    mesh = create_mesh()
    step = make_predict_step(unet, mesh=mesh, overlap=32)
    raw = np.zeros((8, 128, 128, 3), np.uint8)
    out = np.asarray(step(replicate(mesh, params), replicate(mesh, state), shard_batch(mesh, raw)))
    assert out.shape == (8, 64, 64)
    assert out.dtype == np.uint8


def test_augmented_train_step_runs_on_mesh(setup):
    """The full train step (with on-device augmentation) compiles and runs
    sharded — the dryrun_multichip path."""
    params, state, images, masks = setup
    optimizer = optax.adam(1e-4)
    mesh = create_mesh()
    step = make_train_step(unet, get_loss("Lovasz"), optimizer, mesh=mesh, augment=True)
    p, s, o, loss, counts = step(
        replicate(mesh, params),
        replicate(mesh, state),
        replicate(mesh, optimizer.init(params)),
        jax.random.PRNGKey(0),
        shard_batch(mesh, images),
        shard_batch(mesh, masks),
    )
    assert np.isfinite(float(loss))


def test_local_bn_train_step_reference_semantics(setup):
    """sync_bn=False = the reference's nn.DataParallel behavior: each replica
    normalizes its own shard, gradients/losses/stats average at step end.
    With every shard fed IDENTICAL samples, the local-BN sharded step must
    match the single-device step on one shard exactly (all per-shard math is
    the same, the trailing pmeans average equal values)."""
    params, state, images, masks = setup
    n_dev = len(jax.devices())
    loss_fn = get_loss("CrossEntropy")
    optimizer = optax.sgd(1e-3)

    # One shard's worth of data, tiled to every device.
    per = 2
    shard_imgs, shard_masks = images[:per], masks[:per]
    tiled_imgs = np.concatenate([shard_imgs] * n_dev, axis=0)
    tiled_masks = np.concatenate([shard_masks] * n_dev, axis=0)

    step1 = make_train_step(unet, loss_fn, optimizer, mesh=None, augment=False)
    p1, s1, o1, loss1, counts1 = step1(
        params, state, optimizer.init(params), jax.random.PRNGKey(0), shard_imgs, shard_masks
    )

    mesh = create_mesh()
    stepL = make_train_step(unet, loss_fn, optimizer, mesh=mesh, augment=False, sync_bn=False)
    pL, sL, oL, lossL, countsL = stepL(
        replicate(mesh, params),
        replicate(mesh, state),
        replicate(mesh, optimizer.init(params)),
        jax.random.PRNGKey(0),
        shard_batch(mesh, tiled_imgs),
        shard_batch(mesh, tiled_masks),
    )

    assert float(loss1) == pytest.approx(float(lossL), rel=1e-5)
    np.testing.assert_array_equal(np.asarray(countsL), n_dev * np.asarray(counts1))
    np.testing.assert_allclose(
        np.asarray(s1["encoder"]["bn1"]["mean"]), np.asarray(sL["encoder"]["bn1"]["mean"]), atol=1e-5
    )
    delta1 = np.concatenate(
        [(np.asarray(a) - np.asarray(b)).ravel() for a, b in zip(jax.tree_util.tree_leaves(p1), jax.tree_util.tree_leaves(params))]
    )
    deltaL = np.concatenate(
        [(np.asarray(a) - np.asarray(b)).ravel() for a, b in zip(jax.tree_util.tree_leaves(pL), jax.tree_util.tree_leaves(params))]
    )
    cos = float(np.dot(delta1, deltaL) / (np.linalg.norm(delta1) * np.linalg.norm(deltaL) + 1e-30))
    assert cos > 0.999, "local-BN update direction diverged: cos={}".format(cos)


def test_spatial_predict_step_halo_exchange(setup):
    """Whole-AOI prediction with the H axis sharded over the mesh must be
    bit-identical to the single-device forward — GSPMD's halo exchange at
    shard boundaries replaces host-side overlap stitching."""
    from robosat_tpu.parallel.mesh import replicated
    from robosat_tpu.parallel.steps import make_spatial_predict_step

    params, state, _, _ = setup
    mesh = create_mesh()
    n_dev = len(jax.devices())
    H = 64 * 2 * n_dev  # divisible by 64 and by the mesh size
    raw = np.random.default_rng(3).integers(0, 255, (1, H, 128, 3), dtype=np.uint8)

    sharded_step = make_spatial_predict_step(unet, mesh, overlap=32)
    out_sharded = np.asarray(
        sharded_step(replicate(mesh, params), replicate(mesh, state), jax.device_put(raw))
    )

    single = make_predict_step(unet, mesh=None, overlap=32, fused_head=True, fold_bn=True, s2d=True)
    out_single = np.asarray(single(params, state, raw))

    assert out_sharded.shape == (1, H - 64, 64)
    np.testing.assert_array_equal(out_sharded, out_single)
