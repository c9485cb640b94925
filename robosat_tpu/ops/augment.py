"""On-device joint image+mask augmentation and normalization.

Replaces the reference's host-side PIL transform pipeline
(robosat/transforms.py + robosat/tools/train.py:246-260: ConvertImageMode ->
Resize -> CenterCrop -> HFlip(0.5) -> 3x Rotation(0.5, 90deg) -> ToTensor ->
Normalize) with a fused on-device stage: raw uint8 batches stream to the TPU
and the flips/rotations/normalization trace into the train step, so the host
does decode + batch assembly only.

Randomness is explicit: one PRNG key per step, split per sample — replacing
the reference's global `random.random()` (robosat/transforms.py:151,181,218).
"""

from functools import partial

import jax
import jax.numpy as jnp

# ImageNet statistics (robosat/tools/train.py:246).
IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


def normalize(images, mean=IMAGENET_MEAN, std=IMAGENET_STD, dtype=jnp.float32):
    """uint8 (or float [0,255]) NHWC -> normalized float NHWC."""
    x = images.astype(dtype) / 255.0
    mean = jnp.asarray(mean, dtype)
    std = jnp.asarray(std, dtype)
    return (x - mean) / std


def _rot90_k(x, k):
    """Rotate an HW... array by k*90 degrees CCW (static k)."""
    if k == 0:
        return x
    if k == 1:
        return jnp.flip(jnp.swapaxes(x, 0, 1), 0)
    if k == 2:
        return jnp.flip(jnp.flip(x, 0), 1)
    return jnp.flip(jnp.swapaxes(x, 0, 1), 1)


def _apply_dihedral(image, mask, flip, k):
    """Apply (optional hflip, k*90deg rotation) jointly to one sample."""
    image = jnp.where(flip, jnp.flip(image, axis=1), image)
    mask = jnp.where(flip, jnp.flip(mask, axis=1), mask)
    image = jax.lax.switch(k, [partial(_rot90_k, k=i) for i in range(4)], image)
    mask = jax.lax.switch(k, [partial(_rot90_k, k=i) for i in range(4)], mask)
    return image, mask


def augment_batch(rng, images, masks, p_flip=0.5, p_rot=0.5):
    """Joint random hflip + three independent 90-degree rotations, per sample.

    Matches the reference's augmentation distribution
    (robosat/tools/train.py:253-256: JointRandomHorizontalFlip(0.5) then three
    JointRandomRotation(0.5, 90)): the rotation count is Binomial(3, 0.5) mod 4.

    Args:
      rng: PRNG key for this batch.
      images: NHWC array (any dtype; square H == W required for rotations).
      masks: NHW integer array.
    """
    n = images.shape[0]
    k_flip, k_rot = jax.random.split(rng)
    flips = jax.random.bernoulli(k_flip, p_flip, (n,))
    rots = jnp.sum(jax.random.bernoulli(k_rot, p_rot, (n, 3)).astype(jnp.int32), axis=1) % 4
    return jax.vmap(_apply_dihedral)(images, masks, flips, rots)


def resize_image(image, size, method):
    """Resize an HWC/HW array to (size, size); bilinear images, nearest masks."""
    if image.ndim == 3:
        shape = (size, size, image.shape[-1])
    else:
        shape = (size, size)
    return jax.image.resize(image, shape, method=method)


def center_crop(image, size):
    """Center-crop the spatial dims to (size, size)."""
    h, w = image.shape[0], image.shape[1]
    top = (h - size) // 2
    left = (w - size) // 2
    return image[top : top + size, left : left + size]
