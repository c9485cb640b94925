"""BN-folded inference path must match the eval-mode forward."""

import jax
import numpy as np
import pytest

from robosat_tpu.models import unet
from robosat_tpu.parallel.steps import make_predict_step


@pytest.fixture(scope="module")
def trained_like_params():
    """Params/state with non-trivial BN statistics (as after training)."""
    params, state = unet.init(3, num_classes=2)
    rng = np.random.default_rng(0)

    def perturb(tree):
        return jax.tree_util.tree_map(lambda a: np.asarray(a) + rng.normal(0, 0.05, np.shape(a)).astype(np.float32), tree)

    state = jax.tree_util.tree_map(
        lambda a: np.abs(np.asarray(a) + rng.normal(0, 0.1, np.shape(a)).astype(np.float32)) + 0.01, state
    )
    return params, state


def test_folded_logits_match_eval(trained_like_params):
    params, state = trained_like_params
    x = np.random.default_rng(1).normal(size=(1, 64, 64, 3)).astype(np.float32)

    ref, _ = jax.jit(lambda p, s, v: unet.apply(p, s, v, train=False))(params, state, x)
    folded = unet.fold(params, state)
    got = jax.jit(unet.apply_folded)(folded, x)

    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-3, atol=1e-4)


def test_predict_step_fold_matches_unfolded(trained_like_params):
    params, state = trained_like_params
    raw = np.random.default_rng(2).integers(0, 255, (2, 64, 64, 3), np.uint8)

    step_ref = make_predict_step(unet, overlap=8, fold_bn=False)
    step_fold = make_predict_step(unet, overlap=8, fold_bn=True)
    a = np.asarray(step_ref(params, state, raw))
    b = np.asarray(step_fold(params, state, raw))

    diff = np.abs(a.astype(int) - b.astype(int))
    assert (diff <= 1).all()  # knife-edge pixels may move one quantization bin
    assert (diff == 0).mean() > 0.995


def test_predict_step_fold_plus_fused_head(trained_like_params):
    params, state = trained_like_params
    raw = np.random.default_rng(3).integers(0, 255, (2, 64, 64, 3), np.uint8)

    step_ref = make_predict_step(unet, overlap=0, fold_bn=False, fused_head=False)
    step_all = make_predict_step(unet, overlap=0, fold_bn=True, fused_head=True)
    a = np.asarray(step_ref(params, state, raw))
    b = np.asarray(step_all(params, state, raw))

    diff = np.abs(a.astype(int) - b.astype(int))
    assert (diff <= 1).all()
    assert (diff == 0).mean() > 0.995
