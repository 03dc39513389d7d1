"""Floorplan stitching: fuse per-pano layouts into final room shapes.

Parity: salve/stitching/ — dense 1024-point boundaries from MHNet
floor_boundary + uncertainty, room grouping by layout overlap,
confidence-weighted multi-pano shape fusion (reproject every pano's
boundary into a reference pano, keep the lowest-uncertainty wall per
texture column), and final refinement/union.

The reference leaned on Shapely/GEOS for polygons and scipy interpolate;
here polygons are plain (N,2) arrays with numpy predicates (ray casting,
segment intersection) — vectorized over all 1024 boundary columns at once.
"""
