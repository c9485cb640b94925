"""The fused upsample+conv rewrite must match the naive path numerically."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from robosat_tpu.models.layers import conv_apply, fused_upsample_conv3x3, upsample_nearest_2x


@pytest.mark.parametrize("seed", [0, 1])
@pytest.mark.parametrize("shape", [(2, 8, 8, 16), (1, 5, 7, 8)])
def test_fused_matches_naive(seed, shape):
    rng = np.random.default_rng(seed)
    n, h, w, cin = shape
    cout = 12
    x = jnp.asarray(rng.normal(size=shape).astype(np.float32))
    params = {"w": jnp.asarray(rng.normal(size=(3, 3, cin, cout)).astype(np.float32) * 0.1)}

    naive = conv_apply(params, upsample_nearest_2x(x), stride=1)
    fused = fused_upsample_conv3x3(params, x)

    assert fused.shape == (n, 2 * h, 2 * w, cout)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(naive), rtol=1e-5, atol=1e-5)


def test_fused_gradients_match_naive():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(1, 6, 6, 4)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(3, 3, 4, 8)).astype(np.float32) * 0.1)

    def loss_naive(w, x):
        return jnp.sum(conv_apply({"w": w}, upsample_nearest_2x(x), stride=1) ** 2)

    def loss_fused(w, x):
        return jnp.sum(fused_upsample_conv3x3({"w": w}, x) ** 2)

    gw_n, gx_n = jax.grad(loss_naive, argnums=(0, 1))(w, x)
    gw_f, gx_f = jax.grad(loss_fused, argnums=(0, 1))(w, x)

    np.testing.assert_allclose(np.asarray(gw_f), np.asarray(gw_n), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gx_f), np.asarray(gx_n), rtol=1e-4, atol=1e-4)
