"""Host-side geospatial core: tile math, projections, geometry, indexing.

These modules replace the reference's third-party native geo stack (mercantile,
pyproj/PROJ, shapely/GEOS, rtree/libspatialindex, rasterio/GDAL, supermercado)
with self-contained implementations, since the data-prep and vectorization
paths are offline host code; the TPU compute path lives in robosat_tpu.ops and
robosat_tpu.models.
"""
