"""SfM baseline adapters (OpenSfM / OpenMVG / ICP) for comparison evals.

Parity: salve/baselines/ — the reference shells out to external OpenSfM /
OpenMVG binaries and parses their outputs via GTSAM types, and registers
point clouds with Open3D's C++ ICP. Here the parsers are pure Python/NumPy
on salve_tpu's Pose3, and ICP is a batched JAX fixed-iteration solver.
"""
