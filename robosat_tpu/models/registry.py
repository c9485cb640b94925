"""Pluggable model registry.

The reference hard-codes one architecture (robosat/unet.py). The registry
keeps the same default while allowing additional segmentation families behind
the same train/predict CLI (the "pluggable backbone" stretch goal in
BASELINE.json).

A model entry is a module-like object with:
  init(rng, num_classes, **kw) -> (params, state)
  apply(params, state, x, train) -> (logits, new_state)
"""

from robosat_tpu.models import deeplab, fastnet, segformer, unet

_REGISTRY = {}


def register_model(name, module):
    _REGISTRY[name] = module


def get_model(name="unet"):
    try:
        return _REGISTRY[name]
    except KeyError:
        raise ValueError(
            "unknown model '{}'; available: {}".format(name, ", ".join(sorted(_REGISTRY)))
        ) from None


register_model("unet", unet)
register_model("deeplabv3plus", deeplab)
register_model("segformer", segformer)
register_model("fast", fastnet)
