"""Building extraction from OSM ways.

Contract parity: robosat/osm/building.py (building=* minus invisible types
and underground/underwater locations, validity-checked polygons).
"""

import sys

from robosat_tpu.geo import geojson
from robosat_tpu.geo.geometry import shape
from robosat_tpu.osm.core import FeatureStorage, is_polygon
from robosat_tpu.osm.pbf import SimpleHandler


class BuildingHandler(SimpleHandler):
    # building=* values not visible in satellite imagery.
    building_filter = {
        "construction",
        "houseboat",
        "static_caravan",
        "stadium",
        "conservatory",
        "digester",
        "greenhouse",
        "ruins",
    }

    # location=* values not visible in satellite imagery.
    location_filter = {"underground", "underwater"}

    def __init__(self, out, batch):
        super().__init__()
        self.storage = FeatureStorage(out, batch)

    def way(self, w):
        if not is_polygon(w):
            return
        if "building" not in w.tags:
            return
        if w.tags["building"] in self.building_filter:
            return
        if w.tags.get("location") in self.location_filter:
            return

        geometry = geojson.polygon_geometry([[(n.lon, n.lat) for n in w.nodes]])
        if shape(geometry).is_valid:
            self.storage.add(geojson.feature(geometry))
        else:
            print("Warning: invalid feature: https://www.openstreetmap.org/way/{}".format(w.id), file=sys.stderr)

    def flush(self):
        self.storage.flush()
