"""3D pose-graph visualization tests (parity: salve/visualization/utils.py)."""

import numpy as np

from salve_tpu.geometry.poses import Pose3
from salve_tpu.geometry.rotations3d import rot3_rzryrx
from salve_tpu.utils.colormap import get_redgreen_colormap
from salve_tpu.visualization import pose_viz


def _pose(theta: float, t):
    return Pose3(rot3_rzryrx(0.0, 0.0, theta), np.asarray(t, dtype=float))


class TestRedGreenColormap:
    def test_endpoints_and_shape(self):
        cm = get_redgreen_colormap(5)
        assert cm.shape == (5, 3) and cm.dtype == np.uint8
        np.testing.assert_array_equal(cm[0], [255, 0, 0])  # red
        np.testing.assert_array_equal(cm[-1], [0, 255, 0])  # green

    def test_single_and_empty(self):
        assert get_redgreen_colormap(1).shape == (1, 3)
        assert get_redgreen_colormap(0).shape == (0, 3)


class TestColormappedSpheres:
    def test_skips_none_poses(self):
        poses = [_pose(0, [0, 0, 0]), None, _pose(0.5, [1, 2, 0])]
        pts, rgb = pose_viz.get_colormapped_spheres(poses)
        assert pts.shape == (2, 3) and rgb.shape == (2, 3)
        np.testing.assert_allclose(pts[1], [1, 2, 0])
        np.testing.assert_array_equal(rgb[0], [255, 0, 0])
        np.testing.assert_array_equal(rgb[1], [0, 255, 0])

    def test_all_none(self):
        pts, rgb = pose_viz.get_colormapped_spheres([None, None])
        assert pts.shape == (0, 3) and rgb.shape == (0, 3)


class TestCoordinateFrames:
    def test_axes_follow_rotation(self):
        """x-axis of a 90-deg-about-z camera points along world +y."""
        wTc = _pose(np.pi / 2, [1.0, 0.0, 0.0])
        segs = pose_viz.coordinate_frame_segments(wTc, axis_length=2.0)
        assert len(segs) == 3
        np.testing.assert_allclose(segs[0][0], [1, 0, 0], atol=1e-12)
        np.testing.assert_allclose(segs[0][1], [1, 2, 0], atol=1e-12)  # +y
        np.testing.assert_allclose(segs[2][1], [1, 0, 2], atol=1e-12)  # z stays z


class TestPlot3dPoses:
    def test_saves_png(self, tmp_path):
        gt = [_pose(0.1 * i, [i, 0, 0]) for i in range(4)]
        est = [_pose(0.1 * i + 0.05, [i, 0.2, 0]) for i in range(3)] + [None]
        out = tmp_path / "poses.png"
        pose_viz.plot_3d_poses(gt, est, save_fpath=str(out), title="test")
        assert out.exists() and out.stat().st_size > 1000

    def test_sfm_eval_flag_exposed(self):
        import inspect

        from salve_tpu.baselines.sfm_eval import (
            measure_algorithm_localization_accuracy,
        )

        sig = inspect.signature(measure_algorithm_localization_accuracy)
        assert "visualize_3d" in sig.parameters
