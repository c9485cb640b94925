"""robosat-tpu: a TPU-native (JAX/XLA/Pallas/pjit) framework for extracting vector
features (buildings, parking lots, roads) from aerial and satellite imagery.

Built from scratch with the capabilities of mapbox/robosat (reference:
robosat/__init__.py:8, v1.2.0): dataset preparation from OpenStreetMap + tile
servers, binary-segmentation U-Net training (ResNet-50 encoder) on TPU meshes,
per-tile probability prediction, and mask -> GeoJSON post-processing.

External contracts kept from the reference: the ``rs <tool>`` CLI with its 15
subcommands, two-TOML config shape, Slippy Map ``z/x/y.ext`` tile directories,
quantized-probability PNGs, palette masks, and GeoJSON outputs.
"""

__version__ = "0.1.0"
