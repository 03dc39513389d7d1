"""CLI: visualize a backprojected depth map as a BEV scatter + texture map
(parity: scripts/visualize_backprojected_depthmap.py)."""

from __future__ import annotations

import click
import numpy as np


@click.command(help="Backproject a cached depth map and render its BEV texture maps.")
@click.option("--depth_fpath", type=click.Path(exists=True), required=True)
@click.option("--rgb_fpath", type=click.Path(exists=True), required=True)
@click.option("--save_fpath", type=str, default="backprojected_bev.png")
def run_visualize_backprojected_depthmap(depth_fpath, rgb_fpath, save_fpath) -> None:
    import jax.numpy as jnp
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from salve_tpu.ops import bev as bev_ops
    from salve_tpu.ops.backproject import backproject_depth
    from salve_tpu.rendering.bev_pair import load_depth_mm, load_pano_rgb

    depth = load_depth_mm(depth_fpath)
    rgb = load_pano_rgb(rgb_fpath)

    fig = plt.figure(figsize=(12, 6))
    for i, (title, z_range) in enumerate(
        [("floor", (-np.inf, -1.0)), ("ceiling", (0.5, np.inf))]
    ):
        xyz, colors, valid = backproject_depth(
            jnp.asarray(depth), jnp.asarray(rgb), z_range
        )
        img = np.asarray(bev_ops.render_bev_image(xyz, colors, valid))
        plt.subplot(1, 2, i + 1)
        plt.imshow(img)
        plt.title(title)
    plt.tight_layout()
    plt.savefig(save_fpath, dpi=200)
    click.echo(f"Saved to {save_fpath}")


if __name__ == "__main__":
    run_visualize_backprojected_depthmap()
