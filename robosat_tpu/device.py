"""Accelerator selection.

The model config's `cuda` key (config/model-unet.toml:9 in the reference)
is interpreted as "use the accelerator": true runs on the TPU platform, false
pins JAX to host CPU. Must be called before the first JAX computation.
"""

import jax


def configure_accelerator(use_accelerator):
    """Pin JAX to CPU unless the config requests the accelerator.

    Note: an explicit config update is required — the TPU plugin overrides the
    JAX_PLATFORMS environment variable during registration.
    """
    if not use_accelerator:
        jax.config.update("jax_platforms", "cpu")
    return jax.devices()
