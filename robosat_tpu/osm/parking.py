"""Parking-lot extraction from OSM ways.

Contract parity: robosat/osm/parking.py (amenity=parking minus types not
visible from above, validity-checked polygons).
"""

import sys

from robosat_tpu.geo import geojson
from robosat_tpu.geo.geometry import shape
from robosat_tpu.osm.core import FeatureStorage, is_polygon
from robosat_tpu.osm.pbf import SimpleHandler


class ParkingHandler(SimpleHandler):
    # parking=* values that are not visible in satellite imagery.
    parking_filter = {"underground", "sheds", "carports", "garage_boxes"}

    def __init__(self, out, batch):
        super().__init__()
        self.storage = FeatureStorage(out, batch)

    def way(self, w):
        if not is_polygon(w):
            return
        if w.tags.get("amenity") != "parking":
            return
        if w.tags.get("parking") in self.parking_filter:
            return

        geometry = geojson.polygon_geometry([[(n.lon, n.lat) for n in w.nodes]])
        if shape(geometry).is_valid:
            self.storage.add(geojson.feature(geometry))
        else:
            print("Warning: invalid feature: https://www.openstreetmap.org/way/{}".format(w.id), file=sys.stderr)

    def flush(self):
        self.storage.flush()
