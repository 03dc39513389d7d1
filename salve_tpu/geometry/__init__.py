"""Pure-math geometry core: Lie groups, point-set registration, polygons.

Everything here is either plain NumPy (host-side convenience wrappers) or
jit/vmap-friendly JAX (batched device kernels). No C++ geometry libraries
(GTSAM/Shapely/OpenCV) are used anywhere in this package.
"""
