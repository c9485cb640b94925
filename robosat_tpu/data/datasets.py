"""Slippy-map datasets, numpy-first.

Same dataset contracts as the reference (robosat/datasets.py:16-136) with
images/masks as numpy arrays: the host does decode + optional resize/crop
only, and augmentation/normalization run on-device inside the jitted step
(robosat_tpu.ops.augment). Indexable + length, so they plug into the threaded
prefetch loader (robosat_tpu.data.loader).
"""

import collections
import threading

import numpy as np
from PIL import Image

from robosat_tpu.tiles import buffer_tile_image, tiles_from_slippy_map


def _decode_rgb(path):
    """Decode a tile to (H, W, 3) uint8: native codec fast path (C++ over
    zlib/libjpeg-turbo/libwebp, GIL-released — robosat_tpu.native.imagecodec)
    with PIL fallback for anything it declines."""
    from robosat_tpu.native import imagecodec

    decoded = imagecodec.decode_rgb(path)
    if decoded is None:
        with Image.open(path) as img:
            decoded = np.asarray(img.convert("RGB"))
    return decoded


class SlippyMapTiles:
    """Tiles from one slippy-map directory, sorted by (x, y, z) like the
    reference's tile sort (robosat/datasets.py:27)."""

    def __init__(self, root, mode="RGB", size=None):
        self.mode = mode
        self.size = size
        self.tiles = sorted(tiles_from_slippy_map(root), key=lambda t: t[0])

    def __len__(self):
        return len(self.tiles)

    def __getitem__(self, i):
        tile, path = self.tiles[i]
        img = Image.open(path).convert(self.mode)
        if self.size is not None and img.size != (self.size, self.size):
            resample = Image.NEAREST if self.mode == "P" else Image.BILINEAR
            img = img.resize((self.size, self.size), resample)
        return np.asarray(img), tile


class SlippyMapTilesConcatenation:
    """Aligned (inputs..., target) tiles from multiple slippy-map directories.

    Returns (images NHWC-stacked along channels, mask HW, tile); raises if the
    directories are not tile-aligned (robosat/datasets.py:58-75).
    """

    def __init__(self, inputs, target, size=None):
        self.inputs = [SlippyMapTiles(path, mode="RGB", size=size) for path in inputs]
        self.target = SlippyMapTiles(target, mode="P", size=size)

        assert len({len(ds) for ds in self.inputs}) == 1, "same number of tiles in all image directories"
        assert len(self.target) == len(self.inputs[0]), "same number of tiles in images and label directories"

    def __len__(self):
        return len(self.target)

    def __getitem__(self, i):
        images, tiles = zip(*(ds[i] for ds in self.inputs))
        mask, mask_tile = self.target[i]

        assert len(set(tiles)) == 1, "all images are for the same tile"
        assert tiles[0] == mask_tile, "image tile is the same as label tile"

        return np.concatenate(images, axis=-1), mask.astype(np.int32), tiles[0]


def _shard_slice(items, shard):
    """The `i`-th of `n` contiguous blocks of a deterministic item list.

    Contiguous (not strided) so a shard keeps the column-major traversal
    locality the decode LRU relies on, and so the union over all shards is
    exactly the full list with no overlap. `tiles_from_slippy_map` yields in
    sorted (z, x, y) order, making the split stable across processes/hosts —
    the basis of `rs predict --shard i/n` (each worker writes a disjoint
    slice of the same slippy-map output tree; the reference's analogous
    embarrassingly-parallel pattern is its download worker pool,
    robosat/tools/download.py:33-38).
    """
    i, n = shard
    if not (0 <= i < n):
        raise ValueError("shard index {} out of range for {} shards".format(i, n))
    lo = i * len(items) // n
    hi = (i + 1) * len(items) // n
    return items[lo:hi]


class BufferedSlippyMapDirectory:
    """Tiles composited with `overlap` pixels of 3x3-neighbor context.

    Contract parity: robosat/datasets.py:83-136 (assertions included); the
    overlap crop happens on-device in the predict step rather than here.
    """

    def __init__(self, root, size=512, overlap=32, cache_tiles=256, transform=None, shard=None):
        assert overlap >= 0
        # The reference asserts size >= 256 (robosat/datasets.py:104); relaxed
        # to the model's minimum so small tiles remain testable on CPU.
        assert size >= 32

        self.size = size
        self.overlap = overlap
        self.transform = transform
        self.tiles = list(tiles_from_slippy_map(root))
        # Neighbor context always comes from the FULL directory, so sharding
        # only the center-tile list below keeps every shard's output
        # byte-identical to the corresponding slice of an unsharded run.
        self._by_tile = dict(self.tiles)
        if shard is not None:
            self.tiles = _shard_slice(self.tiles, shard)

        # Buffering reads every tile up to 9x (once as center, 8x as a
        # neighbor). An LRU over decoded tiles turns that into ~1 decode per
        # tile for the sorted column-major traversal (the reference re-opens
        # and re-decodes through PIL each time, robosat/tiles.py:162-227).
        self._cache = collections.OrderedDict()
        self._cache_limit = cache_tiles
        self._lock = threading.Lock()

    def __len__(self):
        return len(self.tiles)

    def _load_cached(self, path):
        with self._lock:
            if path in self._cache:
                self._cache.move_to_end(path)
                return self._cache[path]
        decoded = _decode_rgb(path)
        with self._lock:
            self._cache[path] = decoded
            if len(self._cache) > self._cache_limit:
                self._cache.popitem(last=False)
        return decoded

    def __getitem__(self, i):
        tile, _ = self.tiles[i]
        image = buffer_tile_image(
            tile, self._by_tile, overlap=self.overlap, tile_size=self.size, load=self._load_cached
        )
        if self.transform is not None:
            image = self.transform(image)
        return image, tile

    def unbuffer(self, probs):
        o = self.overlap
        if o == 0:
            return probs
        _, h, w = probs.shape
        return probs[:, o : h - o, o : w - o]


class StripBufferedSlippyMapDirectory:
    """Column strips of K vertically-consecutive tiles, buffered jointly.

    The TPU-native upgrade of per-tile overlap buffering (SURVEY.md section 5
    "long-context" analog): K tiles predict as ONE (K*size + 2*overlap) tall
    image, so interior tiles share real context instead of re-computing
    halos — compute overhead drops from (1+2o/s)^2 - 1 (~27% at 512/32) to
    ~2o/(K*s) + 2o/s, and each device dispatch carries K tiles. Outputs are
    bit-identical to per-tile buffering (convolutions are translation
    invariant and the mosaic provides exactly the tiles that exist).

    Items: (strip image HWC uint8, (column tiles list, valid count)).
    """

    def __init__(self, root, size=512, overlap=32, strip=8, cache_tiles=256, shard=None):
        assert overlap >= 0 and strip >= 1
        assert size >= 32
        self._shard = shard

        self.size = size
        self.overlap = overlap
        self.strip = strip
        self.tiles = list(tiles_from_slippy_map(root))
        self._by_tile = dict(self.tiles)

        self._cache = collections.OrderedDict()
        self._cache_limit = cache_tiles
        self._lock = threading.Lock()

        # Runs of consecutive y within each (z, x) column, chunked to strips.
        self.strips = []
        by_column = collections.defaultdict(list)
        for tile, _ in self.tiles:
            by_column[(tile.z, tile.x)].append(tile.y)
        for (z, x), ys in sorted(by_column.items()):
            ys.sort()
            run = [ys[0]]
            for y in ys[1:]:
                if y == run[-1] + 1:
                    run.append(y)
                else:
                    self._chunk_run(z, x, run)
                    run = [y]
            self._chunk_run(z, x, run)
        if self._shard is not None:
            # Shard whole strips (built from the full tile list, so strip
            # boundaries are shard-invariant and outputs stay byte-identical
            # to the unsharded run's corresponding slice).
            self.strips = _shard_slice(self.strips, self._shard)

    def _chunk_run(self, z, x, run):
        from robosat_tpu.geo.tilemath import Tile

        for start in range(0, len(run), self.strip):
            chunk = run[start : start + self.strip]
            self.strips.append([Tile(x, y, z) for y in chunk])

    def __len__(self):
        return len(self.strips)

    def _load_cached(self, path):
        with self._lock:
            if path in self._cache:
                self._cache.move_to_end(path)
                return self._cache[path]
        decoded = _decode_rgb(path)
        with self._lock:
            self._cache[path] = decoded
            if len(self._cache) > self._cache_limit:
                self._cache.popitem(last=False)
        return decoded

    def __getitem__(self, i):
        from robosat_tpu.geo.tilemath import Tile

        strip_tiles = self.strips[i]
        k, s, o = self.strip, self.size, self.overlap
        first = strip_tiles[0]
        valid = len(strip_tiles)

        composite = np.zeros((k * s + 2 * o, s + 2 * o, 3), dtype=np.uint8)
        # All tiles overlapping the buffered strip window.
        for ty in range(first.y - 1, first.y + valid + 1):
            for tx in (first.x - 1, first.x, first.x + 1):
                path = self._by_tile.get(Tile(tx, ty, first.z))
                if path is None:
                    continue
                img = self._load_cached(path)[:s, :s]
                # Tile origin in composite coordinates.
                oy = o + (ty - first.y) * s
                ox = o + (tx - first.x) * s
                dst_y0, dst_y1 = max(oy, 0), min(oy + s, composite.shape[0])
                dst_x0, dst_x1 = max(ox, 0), min(ox + s, composite.shape[1])
                if dst_y0 >= dst_y1 or dst_x0 >= dst_x1:
                    continue
                composite[dst_y0:dst_y1, dst_x0:dst_x1] = img[
                    dst_y0 - oy : dst_y1 - oy, dst_x0 - ox : dst_x1 - ox
                ]

        return composite, (strip_tiles, valid)
