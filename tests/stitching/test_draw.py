"""Stitching draw helpers render without error and return sane geometry."""

import numpy as np
import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt

from salve_tpu.stitching import draw
from salve_tpu.stitching.models import Point2d, Pose


def _square(cx=0.0, cy=0.0, r=1.0):
    return [
        Point2d(cx - r, cy - r), Point2d(cx + r, cy - r),
        Point2d(cx + r, cy + r), Point2d(cx - r, cy + r),
    ]


def test_draw_all_room_shapes_with_given_poses_and_shapes(tmp_path):
    predictions = {"a": _square(), "b": _square()}
    poses = {
        "a": Pose(position=Point2d(0.0, 0.0), rotation=0.0),
        "b": Pose(position=Point2d(3.0, 0.0), rotation=90.0),
    }
    out = tmp_path / "groups.png"
    axis, fig = draw.draw_all_room_shapes_with_given_poses_and_shapes(
        str(out), predictions, poses, groups=[["a"], ["b"]]
    )
    assert out.exists() and out.stat().st_size > 0
    plt.close("all")


def test_draw_all_room_shapes_with_poses_returns_global_polys(tmp_path):
    shapes = {"a": _square(), "b": _square()}
    poses = {
        "a": Pose(position=Point2d(0.0, 0.0), rotation=0.0),
        "b": Pose(position=Point2d(5.0, 0.0), rotation=0.0),
    }
    out = tmp_path / "rooms.png"
    polys = draw.draw_all_room_shapes_with_poses(str(out), shapes, poses)
    assert out.exists()
    assert len(polys) == 2
    # Second square translated by +5 in x.
    assert np.allclose(sorted(polys[1][:, 0]), sorted(polys[0][:, 0] + 5.0))
    plt.close("all")


def test_draw_dwo_xy_top_down_canvas(tmp_path):
    fig, axis = plt.subplots()
    dwos = {
        0: [(Point2d(0, 0), Point2d(1, 0), "door"),
            (Point2d(1, 1), Point2d(1, 2), "window")],
        1: [(Point2d(-1, 0), Point2d(-1, 1), "opening")],
    }
    out = tmp_path / "dwos.png"
    draw.draw_dwo_xy_top_down_canvas(axis, fig, str(out), dwos)
    assert len(axis.lines) == 3
    assert out.exists() and out.stat().st_size > 0
    plt.close("all")


def test_existing_helpers_draw_on_axis():
    fig, axis = plt.subplots()
    draw.draw_shape_in_top_down_canvas(axis, _square(), "black")
    draw.draw_shape_in_top_down_canvas_fill(axis, _square(), "red")
    draw.draw_camera_in_top_down_canvas(
        axis, Pose(position=Point2d(0, 0), rotation=0.0), "blue"
    )
    draw.draw_dwo_in_top_down_canvas(axis, Point2d(0, 0), Point2d(1, 0), "green")
    assert len(axis.lines) >= 2
    plt.close("all")
