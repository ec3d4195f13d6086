"""Geometry / index kernels (pure NumPy, from scratch).

The reference delegates all spatial work to remote services; the engine
computes it locally. These kernels play the role of the services' internal
indexes (OpenCage's geohash annotation opencage.rs:594, GeoAdmin's
geom_quadindex geoadmin.rs:378).
"""
