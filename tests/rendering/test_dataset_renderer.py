"""Integration test: dataset-scale BEV rendering on a synthetic building."""

import glob
from pathlib import Path

import numpy as np
import pytest

from salve_tpu.geometry.sim2 import Sim2
from salve_tpu.rendering.dataset_renderer import render_building_floor_pairs


@pytest.fixture()
def synthetic_building(tmp_path):
    """Fake ZInD building: 2 panos + depth cache + 1 hypothesis pair."""
    import imageio.v2 as imageio

    bid, floor_id = "9999", "floor_01"
    pano_dir = tmp_path / "zind" / bid / "panos"
    pano_dir.mkdir(parents=True)
    depth_dir = tmp_path / "depth" / bid
    depth_dir.mkdir(parents=True)

    rng = np.random.default_rng(0)
    for i in [3, 5]:
        stem = f"{floor_id}_partial_room_01_pano_{i}"
        rgb = rng.integers(0, 255, (1024, 2048, 3), dtype=np.uint8)
        imageio.imwrite(str(pano_dir / f"{stem}.jpg"), rgb)
        depth = rng.integers(1500, 4000, (512, 1024)).astype(np.uint16)
        imageio.imwrite(str(depth_dir / f"{stem}.depth.png"), depth)

    hyp_dir = tmp_path / "hyp" / bid / floor_id / "gt_alignment_approx"
    hyp_dir.mkdir(parents=True)
    Sim2.from_theta_deg(15.0, np.array([0.5, -0.3])).save_as_json(
        str(hyp_dir / "3_5__door_0_0_identity.json")
    )
    return {
        "raw_dataset_dir": str(tmp_path / "zind"),
        "depth_save_root": str(tmp_path / "depth"),
        "hypotheses_save_root": str(tmp_path / "hyp"),
        "bev_save_root": str(tmp_path / "bev"),
        "building_id": bid,
        "floor_id": floor_id,
    }


class TestRenderBuildingFloorPairs:
    def test_renders_and_resumes(self, synthetic_building) -> None:
        import imageio.v2 as imageio

        sb = synthetic_building
        n = render_building_floor_pairs(
            depth_save_root=sb["depth_save_root"],
            bev_save_root=sb["bev_save_root"],
            hypotheses_save_root=sb["hypotheses_save_root"],
            raw_dataset_dir=sb["raw_dataset_dir"],
            building_id=sb["building_id"],
            floor_id=sb["floor_id"],
        )
        # 1 hypothesis x 2 surfaces
        assert n == 2
        out_files = sorted(
            glob.glob(f"{sb['bev_save_root']}/gt_alignment_approx/9999/*.jpg")
        )
        assert len(out_files) == 4  # 2 surfaces x 2 panos
        # Filename grammar round-trips through the Stage C discovery parser.
        from salve_tpu.dataset.bev_pairs import pair_idx_from_fpath, pano_id_from_fpath

        assert pair_idx_from_fpath(out_files[0]) == 0
        assert {pano_id_from_fpath(f) for f in out_files} == {3, 5}
        img = imageio.imread(out_files[0])
        assert img.shape == (501, 501, 3)
        assert img.sum() > 0

        # Second run: everything cached -> zero new renders.
        n2 = render_building_floor_pairs(
            depth_save_root=sb["depth_save_root"],
            bev_save_root=sb["bev_save_root"],
            hypotheses_save_root=sb["hypotheses_save_root"],
            raw_dataset_dir=sb["raw_dataset_dir"],
            building_id=sb["building_id"],
            floor_id=sb["floor_id"],
        )
        assert n2 == 0


class TestRenderBuildingFloorPairsWarp:
    def test_warp_arm_matches_direct_contract(self, synthetic_building) -> None:
        """use_warp=True writes the same file set; img2 (identity render) is
        pixel-identical to the direct arm and img1 carries warped content.

        Pixel drift of the warped img1 vs the direct render is measured in
        tests/parity/test_warp_drift.py; here we pin the file contract.
        """
        import imageio.v2 as imageio

        sb = synthetic_building
        kwargs = dict(
            depth_save_root=sb["depth_save_root"],
            hypotheses_save_root=sb["hypotheses_save_root"],
            raw_dataset_dir=sb["raw_dataset_dir"],
            building_id=sb["building_id"],
            floor_id=sb["floor_id"],
        )
        n_direct = render_building_floor_pairs(
            bev_save_root=sb["bev_save_root"] + "_direct", use_warp=False, **kwargs
        )
        n_warp = render_building_floor_pairs(
            bev_save_root=sb["bev_save_root"] + "_warp", use_warp=True, **kwargs
        )
        assert n_warp == n_direct == 2

        direct = sorted(
            glob.glob(f"{sb['bev_save_root']}_direct/gt_alignment_approx/9999/*.jpg")
        )
        warp = sorted(
            glob.glob(f"{sb['bev_save_root']}_warp/gt_alignment_approx/9999/*.jpg")
        )
        assert [Path(f).name for f in warp] == [Path(f).name for f in direct]
        for fd, fw in zip(direct, warp):
            im_d, im_w = imageio.imread(fd), imageio.imread(fw)
            assert im_w.shape == im_d.shape == (501, 501, 3)
            assert im_w.sum() > 0
            if "pano_5" in Path(fd).name:  # img2: identity render, same math
                assert np.array_equal(im_w, im_d)

        # Resume contract holds for the warp arm too.
        n2 = render_building_floor_pairs(
            bev_save_root=sb["bev_save_root"] + "_warp", use_warp=True, **kwargs
        )
        assert n2 == 0


class TestRenderLayoutPairs:
    def test_renders_writes_and_resumes(self, tmp_path) -> None:
        """_render_layout_pairs: batched rasterize -> checked JPG writes."""
        import types

        import imageio.v2 as imageio

        from salve_tpu.common.pano_data import PanoData
        from salve_tpu.common.wdo import WDO
        from salve_tpu.rendering.dataset_renderer import _render_layout_pairs

        room = np.array([[-2.0, -2.0], [2.0, -2.0], [2.0, 2.0], [-2.0, 2.0]])
        door = WDO(
            global_Sim2_local=Sim2.identity(),
            pt1=(2.0, -0.5),
            pt2=(2.0, 0.5),
            bottom_z=0,
            top_z=2,
            type="doors",
        )
        nodes = {
            i: PanoData(
                id=i,
                global_Sim2_local=Sim2.identity(),
                room_vertices_local_2d=room,
                image_path=f"panos/floor_01_partial_room_01_pano_{i}.jpg",
                label="room",
                doors=[door],
            )
            for i in (3, 5)
        }
        pose_graph = types.SimpleNamespace(nodes=nodes)

        hyp_dir = tmp_path / "hyp"
        hyp_dir.mkdir()
        pair_fpath = str(hyp_dir / "3_5__door_0_0_identity.json")
        Sim2.from_theta_deg(30.0, np.array([1.0, 0.0])).save_as_json(pair_fpath)
        img_fpaths = {
            i: f"/fake/floor_01_partial_room_01_pano_{i}.jpg" for i in (3, 5)
        }

        n = _render_layout_pairs(
            [pair_fpath],
            img_fpaths,
            str(tmp_path / "layout"),
            "gt_alignment_approx",
            "9999",
            pose_graph,
        )
        assert n == 1
        out_files = sorted(
            glob.glob(f"{tmp_path}/layout/gt_alignment_approx/9999/*.jpg")
        )
        assert len(out_files) == 2  # floor surface x 2 panos
        img = imageio.imread(out_files[0])
        assert img.shape == (501, 501, 3)
        assert img.sum() > 0

        # Pano outside the pose graph -> skipped, not crashed; existing
        # outputs -> resumed.
        missing = str(hyp_dir / "3_9__door_0_0_identity.json")
        Sim2.identity().save_as_json(missing)
        n2 = _render_layout_pairs(
            [pair_fpath, missing],
            img_fpaths,
            str(tmp_path / "layout"),
            "gt_alignment_approx",
            "9999",
            pose_graph,
        )
        assert n2 == 0


class TestWriteJpg:
    def test_byte_identical_to_imageio(self, tmp_path) -> None:
        """cv2 and imageio/PIL share libjpeg settings at quality 95 — the
        corpus writer swap must not change a single byte of the contract."""
        import imageio.v2 as imageio

        from salve_tpu.rendering.dataset_renderer import write_jpg

        img = np.random.default_rng(0).integers(0, 255, (501, 501, 3)).astype(np.uint8)
        write_jpg(str(tmp_path / "a.jpg"), img)
        imageio.imwrite(str(tmp_path / "b.jpg"), img, quality=95)
        assert (tmp_path / "a.jpg").read_bytes() == (tmp_path / "b.jpg").read_bytes()

    def test_encode_bytes_matches_file_write(self, tmp_path) -> None:
        """encode_jpg_bytes (the identity-render byte cache) must produce
        exactly the bytes write_jpg would put on disk — the warp corpus's
        img2 files stay byte-identical with encode-once reuse."""
        from salve_tpu.rendering.dataset_renderer import encode_jpg_bytes, write_jpg

        img = np.random.default_rng(1).integers(0, 255, (501, 501, 3)).astype(np.uint8)
        write_jpg(str(tmp_path / "a.jpg"), img)
        assert encode_jpg_bytes(img) == (tmp_path / "a.jpg").read_bytes()


class TestDepthCache:
    def test_missing_cache_raises_without_model(self, tmp_path) -> None:
        from salve_tpu.depth.cache import infer_depth_if_nonexistent

        with pytest.raises(FileNotFoundError):
            infer_depth_if_nonexistent(str(tmp_path), "0000", "floor_01_pano_3.jpg")

    def test_registered_model_fills_cache(self, tmp_path) -> None:
        import imageio.v2 as imageio

        from salve_tpu.depth import cache

        img_fpath = tmp_path / "floor_01_partial_room_01_pano_7.jpg"
        imageio.imwrite(
            str(img_fpath), np.zeros((1024, 2048, 3), dtype=np.uint8)
        )
        cache.register_depth_model(lambda rgb: np.full((512, 1024), 2.5))
        try:
            out = cache.infer_depth_if_nonexistent(str(tmp_path / "d"), "0000", str(img_fpath))
            depth = imageio.imread(out)
            assert depth.dtype == np.uint16
            assert (depth == 2500).all()
        finally:
            cache.register_depth_model(None)
