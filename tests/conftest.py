"""Test configuration: force JAX onto a virtual multi-device CPU mesh.

Mirrors the reference's CPU-only CI (reference .travis.yml:26-37) while also
exercising multi-chip sharding without TPU hardware, per SURVEY.md section 4.
Must run before anything imports jax.

Two virtual devices, not eight: XLA:CPU device threads SPIN at collective
rendezvous, so on this 1-core harness N-1 spinners starve the thread doing
compute between collectives — an 8-device sync-BN train step (~110
interleaved all-reduces) degrades from 8 s of compute to >30 minutes and
then hits the runtime's 40 s rendezvous termination ("Fatal Python error").
Two devices prove the same sharding/collective math (gradient psum, global-
batch BN, batch sharding) at ~6x overhead instead of ~200x. The driver's
dryrun_multichip still exercises wider meshes via the low-collective
local-BN step.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags = (flags + " --xla_force_host_platform_device_count=2").strip()
# XLA:CPU's collective rendezvous spins, and its default termination timeout
# is 40 s: on a 1-core harness the N-1 spinning device threads starve the one
# doing compute between collectives, stragglers miss the window, and the
# runtime hard-aborts the process ("Exiting to ensure a consistent program
# state"). Raise the timeouts so sharded train steps are merely slow.
if "collective_call_terminate_timeout" not in flags:
    flags += (
        " --xla_cpu_collective_call_warn_stuck_timeout_seconds=300"
        " --xla_cpu_collective_call_terminate_timeout_seconds=3600"
        " --xla_cpu_collective_timeout_seconds=3600"
    )
os.environ["XLA_FLAGS"] = flags

# The axon TPU plugin overrides JAX_PLATFORMS during registration; an explicit
# config update after import is the only reliable way to pin tests to CPU.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: the suite compiles the full model graph many
# times (train/eval/predict x mesh layouts); caching makes re-runs fast.
#
# The cache key does NOT include host CPU features, and XLA:CPU persists AOT
# machine code: loading an entry compiled on a differently-featured VM (this
# harness migrates between machine types) aborts with SIGILL/"Fatal Python
# error" mid-suite. Fingerprint the host's instruction-set flags into the
# directory name so a migrated VM starts a fresh CPU cache instead of
# executing foreign AOT code. (.jax_cache itself stays for TPU programs,
# which execute on the device, not the host.)
import hashlib  # noqa: E402


def _host_fingerprint():
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    return hashlib.sha256(" ".join(sorted(line.split())).encode()).hexdigest()[:12]
    except OSError:
        pass
    import platform

    return hashlib.sha256(platform.processor().encode()).hexdigest()[:12]


_cache_dir = os.path.join(
    os.path.dirname(__file__), os.pardir, ".jax_cache_cpu_{}".format(_host_fingerprint())
)
jax.config.update("jax_compilation_cache_dir", os.path.abspath(_cache_dir))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402
from PIL import Image  # noqa: E402

from robosat_tpu.colors import make_palette  # noqa: E402


def _deterministic_image(seed, size=512):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(size, size, 3), dtype=np.uint8)


def _blob_mask(seed, size=512):
    """A synthetic binary label mask with a few rectangular blobs."""
    rng = np.random.default_rng(seed)
    mask = np.zeros((size, size), dtype=np.uint8)
    for _ in range(3):
        x0, y0 = rng.integers(0, size - 64, size=2)
        w, h = rng.integers(48, 160, size=2)
        mask[y0 : y0 + h, x0 : x0 + w] = 1
    return mask


# Tile ids used by the synthetic fixtures (z/x/y).
FIXTURE_TILES = [(18, 69623, 104945), (18, 69623, 104946), (18, 69624, 104945)]


@pytest.fixture(scope="session")
def slippy_fixtures(tmp_path_factory):
    """A synthetic slippy-map dataset: images/, labels/, tiles.csv.

    Generated (not copied from the reference) so tests pin the directory
    walking, palette, and alignment contracts without binary fixtures.
    """
    root = tmp_path_factory.mktemp("slippy")
    images = root / "images"
    labels = root / "labels"

    for i, (z, x, y) in enumerate(FIXTURE_TILES):
        img_dir = images / str(z) / str(x)
        img_dir.mkdir(parents=True, exist_ok=True)
        Image.fromarray(_deterministic_image(i)).save(img_dir / "{}.png".format(y))

        lbl_dir = labels / str(z) / str(x)
        lbl_dir.mkdir(parents=True, exist_ok=True)
        mask = Image.fromarray(_blob_mask(i), mode="P")
        mask.putpalette(make_palette("denim", "orange"))
        mask.save(lbl_dir / "{}.png".format(y))

    csv_path = root / "tiles.csv"
    csv_path.write_text("".join("{},{},{}\n".format(x, y, z) for z, x, y in FIXTURE_TILES))
    return root
