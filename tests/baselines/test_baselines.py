"""Tests for baseline parsers and JAX ICP."""

import numpy as np
import pytest

from salve_tpu.baselines import icp, openmvg, opensfm
from salve_tpu.geometry.rotations3d import (
    axis_angle_to_matrix,
    matrix_to_axis_angle,
    rot3_rzryrx,
)


class TestRotations3d:
    def test_axis_angle_roundtrip(self) -> None:
        rng = np.random.default_rng(0)
        for _ in range(5):
            r = rng.normal(0, 1, 3)
            R = axis_angle_to_matrix(r)
            assert np.allclose(R @ R.T, np.eye(3), atol=1e-10)
            assert np.isclose(np.linalg.det(R), 1.0)
            r2 = matrix_to_axis_angle(R)
            assert np.allclose(axis_angle_to_matrix(r2), R, atol=1e-9)

    def test_zero_angle(self) -> None:
        assert np.allclose(axis_angle_to_matrix(np.zeros(3)), np.eye(3))

    def test_rzryrx(self) -> None:
        R = rot3_rzryrx(np.pi / 2, 0, 0)
        # Rotation about x by 90deg: y -> z.
        assert np.allclose(R @ np.array([0, 1, 0]), [0, 0, 1], atol=1e-12)


class TestOpenSfMParser:
    def test_parse_synthetic(self, tmp_path) -> None:
        import json

        r = np.array([0.1, -0.2, 0.3])
        t = [1.0, 2.0, 3.0]
        obj = [
            {
                "cameras": {
                    "cam0": {"projection_type": "spherical", "width": 2048, "height": 1024}
                },
                "shots": {
                    "floor_01_partial_room_01_pano_7.jpg": {
                        "rotation": r.tolist(),
                        "translation": t,
                    }
                },
                "points": {
                    "0": {"coordinates": [0, 1, 2], "color": [255, 0, 0]},
                },
            }
        ]
        fpath = tmp_path / "reconstruction.json"
        fpath.write_text(json.dumps(obj))

        recons = opensfm.load_opensfm_reconstructions_from_json(str(fpath))
        assert len(recons) == 1
        rec = recons[0]
        assert 7 in rec.pose_dict
        # wTc = (cTw)^-1
        R_ctw = axis_angle_to_matrix(r)
        wTc = rec.pose_dict[7]
        assert np.allclose(wTc.R, R_ctw.T, atol=1e-10)
        assert np.allclose(wTc.t, -R_ctw.T @ np.array(t), atol=1e-10)
        assert rec.points.shape == (1, 3)
        assert rec.camera.projection_type == "SPHERICAL"

    def test_missing_file(self) -> None:
        assert opensfm.load_opensfm_reconstructions_from_json("/nonexistent.json") == []


class TestOpenMVGParser:
    def test_parse_synthetic(self, tmp_path) -> None:
        import json

        R = rot3_rzryrx(0.1, 0.2, 0.3)
        center = [1.0, -1.0, 0.5]
        data = {
            "sfm_data_version": "0.3",
            "intrinsics": [],
            "views": [
                {
                    "key": 0,
                    "value": {
                        "ptr_wrapper": {
                            "data": {"filename": "floor_01_partial_room_02_pano_4.jpg"}
                        }
                    },
                }
            ],
            "extrinsics": [
                {"key": 0, "value": {"rotation": R.tolist(), "center": center}}
            ],
        }
        fpath = tmp_path / "sfm_data.json"
        fpath.write_text(json.dumps(data))

        recons = openmvg.load_openmvg_reconstructions_from_json(str(fpath), "0000", "floor_01")
        assert len(recons) == 1
        wTc = recons[0].pose_dict[4]
        # wTc = (R, -R c)^-1 -> translation should be the camera center.
        assert np.allclose(wTc.t, center, atol=1e-10)

    def test_find_seed_pair(self, tmp_path) -> None:
        for i in [3, 4, 9]:
            (tmp_path / f"floor_01_partial_room_01_pano_{i}.jpg").write_bytes(b"")
        s1, s2 = openmvg.find_seed_pair(str(tmp_path))
        assert s1.endswith("pano_3.jpg") and s2.endswith("pano_4.jpg")


class TestICP:
    def _make_cloud(self, n=3000, seed=0):
        rng = np.random.default_rng(seed)
        # Box-like indoor structure: 3 walls + floor.
        pts = []
        pts.append(np.c_[rng.uniform(0, 4, n // 4), np.zeros(n // 4), rng.uniform(0, 2, n // 4)])
        pts.append(np.c_[np.zeros(n // 4), rng.uniform(0, 3, n // 4), rng.uniform(0, 2, n // 4)])
        pts.append(np.c_[rng.uniform(0, 4, n // 4), rng.uniform(0, 3, n // 4), np.zeros(n // 4)])
        pts.append(np.c_[np.full(n // 4, 4.0), rng.uniform(0, 3, n // 4), rng.uniform(0, 2, n // 4)])
        return np.vstack(pts)

    def test_recovers_known_transform(self) -> None:
        src = self._make_cloud()
        R_true = rot3_rzryrx(0.0, 0.0, np.deg2rad(3.0))
        t_true = np.array([0.05, -0.03, 0.02])
        tgt = src @ R_true.T + t_true

        T = icp.register_point_clouds(src, tgt, max_correspondence_distance=0.3)
        assert np.allclose(T[:3, :3], R_true, atol=0.01)
        assert np.allclose(T[:3, 3], t_true, atol=0.02)

    def test_colored_recovers_transform(self) -> None:
        src = self._make_cloud()
        rng = np.random.default_rng(1)
        colors = rng.uniform(0, 1, (src.shape[0], 3))
        R_true = rot3_rzryrx(0.0, 0.0, np.deg2rad(2.0))
        t_true = np.array([0.03, 0.02, -0.01])
        tgt = src @ R_true.T + t_true

        T = icp.register_colored_point_clouds(
            np.hstack([src, colors]), np.hstack([tgt, colors])
        )
        assert np.allclose(T[:3, :3], R_true, atol=0.02)
        assert np.allclose(T[:3, 3], t_true, atol=0.03)

    def test_voxel_downsample(self) -> None:
        pts = np.array([[0.0, 0, 0], [0.01, 0, 0], [1.0, 1, 1]])
        out = icp.voxel_downsample(pts, 0.1)
        assert out.shape[0] == 2
