"""PySpark-native spatial-join + tiling engine with vectortiles semantics.

A brand-new engine (not a port) re-expressing the capabilities of
fosskers/vectortiles — Mapbox Vector Tile encode/decode — as a distributed
Spark pipeline: Iceberg-style image+caption tables in, spatial indexing /
joins / kNN / raster→vector in the middle, per-tile MVT bytes out.
"""

__version__ = "0.1.0"
