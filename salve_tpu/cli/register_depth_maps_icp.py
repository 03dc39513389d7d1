"""CLI: register backprojected pano depth maps with ICP (parity: scripts/register_depth_maps_icp.py).

The Open3D colored-ICP baseline becomes the JAX multi-scale ICP in
salve_tpu.baselines.icp.
"""

from __future__ import annotations

import click
import numpy as np

from salve_tpu.baselines.icp import register_colored_point_clouds
from salve_tpu.rendering.bev_pair import load_depth_mm, load_pano_rgb


def backproject_pano(depth_fpath: str, rgb_fpath: str) -> np.ndarray:
    """(N,6) xyzrgb cloud from a cached depth map + pano image."""
    import jax.numpy as jnp

    from salve_tpu.ops.backproject import backproject_depth

    depth = load_depth_mm(depth_fpath)
    rgb = load_pano_rgb(rgb_fpath)
    xyz, colors, valid = backproject_depth(
        jnp.asarray(depth), jnp.asarray(rgb), (-np.inf, np.inf)
    )
    xyz, colors, valid = np.asarray(xyz), np.asarray(colors), np.asarray(valid)
    return np.hstack([xyz[valid], colors[valid]])


@click.command(help="Register two backprojected pano point clouds with colored ICP.")
@click.option("--depth_fpath_1", type=click.Path(exists=True), required=True)
@click.option("--rgb_fpath_1", type=click.Path(exists=True), required=True)
@click.option("--depth_fpath_2", type=click.Path(exists=True), required=True)
@click.option("--rgb_fpath_2", type=click.Path(exists=True), required=True)
@click.option("--save_fpath", type=str, default=None, help="Where to save the 4x4 transform (npy).")
def run_register_depth_maps_icp(
    depth_fpath_1, rgb_fpath_1, depth_fpath_2, rgb_fpath_2, save_fpath
) -> None:
    cloud1 = backproject_pano(depth_fpath_1, rgb_fpath_1)
    cloud2 = backproject_pano(depth_fpath_2, rgb_fpath_2)
    tTs = register_colored_point_clouds(cloud1, cloud2)
    click.echo(f"Estimated transform (2T1):\n{np.array_str(tTs, precision=4)}")
    if save_fpath:
        np.save(save_fpath, tTs)


if __name__ == "__main__":
    run_register_depth_maps_icp()
