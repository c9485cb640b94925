"""Shared OSM extraction helpers: batched feature storage and way predicates.

Contract parity: robosat/osm/core.py (chunked `out-<uuid>.geojson` files,
closed->=4-node polygon predicate).
"""

import os
import uuid

from robosat_tpu.geo import geojson


class FeatureStorage:
    """Buffers GeoJSON features and flushes them in uniquely-named chunks.

    Call `flush()` at the end for the final partial batch.
    """

    def __init__(self, out, batch):
        assert batch > 0
        self.out = out
        self.batch = batch
        self.features = []

    def add(self, feature):
        if len(self.features) >= self.batch:
            self.flush()
        self.features.append(feature)

    def flush(self):
        if not self.features:
            return

        base, ext = os.path.splitext(self.out)
        path = "{}-{}{}".format(base, uuid.uuid4().hex, ext)
        with open(path, "w") as fp:
            geojson.dump(geojson.feature_collection(self.features), fp)

        self.features.clear()


def is_polygon(way):
    """True if a way is closed with at least four nodes (counting the
    repeated closing node). Geometry may still be invalid (self-crossing)."""
    if not way.is_closed():
        return False
    if len(way.nodes) < 4:
        return False
    return True
