"""geocoding_ray — a Ray-Data-native offline geocoding & data-processing engine.

Re-implements the query semantics of the reference crate georust/geocoding
(/root/reference, Rust: src/lib.rs, src/opencage.rs, src/openstreetmap.rs,
src/geoadmin.rs) as distributed spatial-join pipelines over Arrow batches:

* Reverse geocoding (``Reverse::reverse``, lib.rs:92-100): point -> formatted
  address via a broadcast packed R-tree of admin polygons + point-in-polygon,
  with kNN fallback to nearest place centroids (GeoAdmin tolerance semantics,
  geoadmin.rs:260-306).
* Forward geocoding (``Forward::forward``, lib.rs:126-134): free text ->
  ranked candidate points via tokenize + join against a gazetteer table
  (GeoAdmin SearchServer semantics, geoadmin.rs:158-202).

All heavy geometry is from-scratch vectorized NumPy over Arrow buffers —
no shapely/h3/geopandas. See SURVEY.md for the full operator mapping.
"""

__version__ = "0.1.0"
