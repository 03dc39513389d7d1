"""Dataset-scale BEV rendering driver (parity: scripts/render_dataset_bev.py).

Where the reference forked one multiprocessing worker per building (or per
pano pair), here each floor's hypothesis pairs are rendered in device
batches against a shared on-device pano bank: unique panos are decoded and
resized once (host thread pool), staged to HBM once, and every hypothesis
pair / surface type streams through the jitted batch renderer. Output
files, the filename grammar, and the existence-check resume behavior are
byte-compatible with the reference.
"""

from __future__ import annotations

import glob
import logging
import os
from concurrent.futures import ThreadPoolExecutor
from pathlib import Path
from typing import Dict, List, Optional, Tuple

import numpy as np

from salve_tpu.dataset.zind_partition import DATASET_SPLITS
from salve_tpu.depth.cache import infer_depth_if_nonexistent
from salve_tpu.geometry.sim2 import Sim2
from salve_tpu.rendering import bev_pair, layout as layout_render

logger = logging.getLogger(__name__)

DEFAULT_BATCH_SIZE = 8
# The warp path's per-hypothesis cost is one Sim(2) resample instead of a
# full splat+fill render, so it sustains much larger device batches.
WARP_BATCH_SIZE = 64


def resolve_corpus_warp_default() -> bool:
    """Warp default for the file-contract (corpus) renderer: ON for TPU.

    The fused inference path promoted warp in round 3 after an end-to-end
    A/B (ACCURACY_r03 warp_ab: 99.3% label agreement, identical Stage-D
    reconstruction). The corpus A/B (training on warp-rendered vs
    direct-rendered JPGs, ACCURACY_r04 warp_corpus_ab) closed the remaining
    gap, so the TPU production default is warp here too.
    SALVE_TPU_DISABLE_WARP=1 forces direct renders everywhere.
    """
    from salve_tpu.pipeline.fused_inference import resolve_warp_default

    return resolve_warp_default()


def panoid_from_fpath(fpath: str) -> int:
    return int(Path(fpath).stem.split("_")[-1])


def write_jpg(fpath: str, img: "np.ndarray", quality: int = 95) -> None:
    """JPEG write via cv2 (libjpeg), imageio/PIL fallback.

    Both encoders produce BYTE-IDENTICAL files at the same quality (same
    libjpeg settings; asserted in tests/rendering/test_dataset_renderer.py),
    but cv2 encodes 3.6x faster (8.3 vs 29.9 ms for a 501px render) — on
    the 1-core host, encode is a real slice of Stage B wall-clock.
    """
    try:
        import cv2

        if not cv2.imwrite(fpath, img[..., ::-1], [cv2.IMWRITE_JPEG_QUALITY, quality]):
            raise IOError(f"cv2.imwrite failed for {fpath}")
    except ImportError:
        import imageio.v2 as imageio

        imageio.imwrite(fpath, img, quality=quality)


def encode_jpg_bytes(img: "np.ndarray", quality: int = 95) -> bytes:
    """In-memory JPEG encode, byte-identical to write_jpg's file output."""
    try:
        import cv2

        ok, buf = cv2.imencode(
            ".jpg", img[..., ::-1], [cv2.IMWRITE_JPEG_QUALITY, quality]
        )
        if not ok:
            raise IOError("cv2.imencode failed")
        return buf.tobytes()
    except ImportError:
        import io

        import imageio.v2 as imageio

        with io.BytesIO() as f:
            imageio.imwrite(f, img, format="jpg", quality=quality)
            return f.getvalue()


def _pano_fpaths_for_building(raw_dataset_dir: str, building_id: str) -> Dict[int, str]:
    img_fpaths = glob.glob(f"{raw_dataset_dir}/{building_id}/panos/*.jpg")
    return {panoid_from_fpath(fp): fp for fp in img_fpaths}


def render_building_floor_pairs(
    depth_save_root: str,
    bev_save_root: str,
    hypotheses_save_root: str,
    raw_dataset_dir: str,
    building_id: str,
    floor_id: str,
    layout_save_root: Optional[str] = None,
    render_modalities: List[str] = ["rgb_texture"],
    floor_pose_graph=None,
    batch_size: int = DEFAULT_BATCH_SIZE,
    io_workers: int = 8,
    use_warp: Optional[bool] = None,
) -> int:
    """Render all hypothesis pairs for one building floor. Returns #pairs rendered."""
    if use_warp is None:
        use_warp = resolve_corpus_warp_default()
    img_fpaths_dict = _pano_fpaths_for_building(raw_dataset_dir, building_id)
    num_rendered = 0

    label_fpaths = {
        label_type: sorted(
            glob.glob(f"{hypotheses_save_root}/{building_id}/{floor_id}/{label_type}/*.json")
        )
        for label_type in ["gt_alignment_approx", "incorrect_alignment"]
    }

    if "rgb_texture" in render_modalities and any(label_fpaths.values()):
        from salve_tpu.utils import profiler

        # Both label types share one pano bank (identical panos, identical
        # device renders) — staging it once per floor halves the dominant
        # fixed cost of small buildings (the per-pano splat bank renders).
        with profiler.stage_timer("render/texture_pairs"):
            num_rendered += _render_texture_pairs_batched(
                label_fpaths,
                img_fpaths_dict,
                depth_save_root,
                bev_save_root,
                building_id,
                batch_size,
                io_workers,
                use_warp,
            )

    if "layout" in render_modalities and floor_pose_graph is not None:
        for label_type, pair_fpaths in label_fpaths.items():
            if pair_fpaths:
                num_rendered += _render_layout_pairs(
                    pair_fpaths,
                    img_fpaths_dict,
                    layout_save_root,
                    label_type,
                    building_id,
                    floor_pose_graph,
                )
    return num_rendered


def _parse_pair_fpath(pair_fpath: str) -> Tuple[int, int, int, str]:
    """(pair_idx, i1, i2, pair_uuid) from a hypothesis JSON path."""
    stem = Path(pair_fpath).stem
    i1, i2 = (int(x) for x in stem.split("_")[:2])
    pair_uuid = stem.split("__")[-1]
    return i1, i2, pair_uuid


def _render_texture_pairs_batched(
    label_fpaths: Dict[str, List[str]],
    img_fpaths_dict: Dict[int, str],
    depth_save_root: str,
    bev_save_root: str,
    building_id: str,
    batch_size: int,
    io_workers: int,
    use_warp: bool = False,
) -> int:
    """RGB texture modality: both surfaces + both label types, batched on
    device against ONE shared pano bank.

    With ``use_warp`` (the TPU production default, resolve_corpus_warp_default)
    each pano is fully rendered ONCE per surface — a standard-extent identity
    render (every pair's img2 verbatim) plus an extended-extent warp source
    bank — and each hypothesis's img1 is a single Sim(2) resample of the
    bank (ops/warp.py). Hypotheses outnumber panos ~100x on real floors, so
    this removes the per-hypothesis splat+fill render entirely. Output
    filenames / formats are identical to the direct arm; pixel drift vs the
    direct render is the warp drift measured in tests/parity/test_warp_drift.py
    and validated end-to-end in ACCURACY_r03/r04 warp A/Bs.
    """
    # Work items: (hyp Sim2 fpath, i1, i2, surface, out1, out2), skipping
    # pairs whose outputs already exist (resume contract). gt and incorrect
    # label types differ only in hypothesis lists and output directory, so
    # their work shares the floor's pano bank below.
    work = []
    needed_panos = set()
    for label_type, pair_fpaths in label_fpaths.items():
        if not pair_fpaths:
            continue
        building_bev_save_dir = f"{bev_save_root}/{label_type}/{building_id}"
        os.makedirs(building_bev_save_dir, exist_ok=True)
        for pair_idx, pair_fpath in enumerate(pair_fpaths):
            i1, i2, pair_uuid = _parse_pair_fpath(pair_fpath)
            if i1 not in img_fpaths_dict or i2 not in img_fpaths_dict:
                continue
            for surface_type in ["floor", "ceiling"]:
                fname1 = bev_pair.bev_fname_from_img_fpath(
                    pair_idx, pair_uuid, surface_type, img_fpaths_dict[i1]
                )
                fname2 = bev_pair.bev_fname_from_img_fpath(
                    pair_idx, pair_uuid, surface_type, img_fpaths_dict[i2]
                )
                out1 = f"{building_bev_save_dir}/{fname1}"
                out2 = f"{building_bev_save_dir}/{fname2}"
                if Path(out1).exists() and Path(out2).exists():
                    continue
                work.append((pair_fpath, i1, i2, surface_type, out1, out2))
                needed_panos.update([i1, i2])
    if not work:
        return 0

    from salve_tpu.utils import profiler
    import time as _time

    # Stage the pano bank (unique panos only): depth + resized rgb.
    _t0 = _time.time()
    pano_ids = sorted(needed_panos)
    id2bank = {pid: k for k, pid in enumerate(pano_ids)}

    def load_pano(pid: int):
        img_fpath = img_fpaths_dict[pid]
        depth_fpath = infer_depth_if_nonexistent(depth_save_root, building_id, img_fpath)
        return bev_pair.load_depth_mm(depth_fpath), bev_pair.load_pano_rgb(img_fpath)

    with ThreadPoolExecutor(max_workers=io_workers) as pool:
        loaded = list(pool.map(load_pano, pano_ids))
    depths = np.stack([d for d, _ in loaded])
    rgbs = np.stack([c for _, c in loaded]).astype(np.float32)
    profiler.record_stage("render/pano_load", _time.time() - _t0)

    # Bucket the pano-bank size: the jitted bank renders compile per input
    # shape, and floors carry anywhere from 2 to 30+ panos — padding P to a
    # multiple of 8 bounds the number of distinct compiles over a dataset
    # run to a handful instead of one multi-minute compile per building
    # (pad entries have zero depth -> no valid points, and no pair ever
    # indexes them).
    p_pad = -len(pano_ids) % 8
    if p_pad:
        depths = np.concatenate([depths, np.zeros((p_pad, *depths.shape[1:]), depths.dtype)])
        rgbs = np.concatenate([rgbs, np.zeros((p_pad, *rgbs.shape[1:]), rgbs.dtype)])

    # Stage the bank on device ONCE; per-batch uploads are then just the
    # (B,2) indices and (B,2,2)/(B,2) poses.
    import jax.numpy as jnp

    depths_d = jnp.asarray(depths)
    rgbs_d = jnp.asarray(rgbs)

    warp_banks, ident_banks = {}, {}
    ident_jpg_cache: Dict[Tuple[str, int], bytes] = {}
    if use_warp:
        from salve_tpu.ops import warp as warp_ops

        _t0 = _time.time()
        render_cfg = bev_pair.BEVRenderConfig()
        bank_px = 2 * render_cfg.img_px
        batch_size = max(batch_size, WARP_BATCH_SIZE)
        for surface_type in ("floor", "ceiling"):
            z_range = bev_pair._z_range_for_surface(surface_type)
            # One full render per pano per surface: the identity render (img2
            # for every hypothesis touching this pano) and the 2x-extent warp
            # source (packed rgb888 so the per-hypothesis gather is 1 word).
            # Fetched to the HOST once per building: the corpus output is
            # host-side JPGs anyway, and warping host-side moves ~N_panos
            # images across the device->host link instead of ~N_hypotheses
            # (through the axon tunnel the per-pair fetch, not the render,
            # bounds the corpus path — BENCH_NOTES round 4).
            # Slice off the compile-bucketing pad rows before the fetch —
            # no pair ever indexes them.
            warp_banks[surface_type] = np.asarray(
                warp_ops.pack_rgb888(
                    warp_ops.render_identity_bank_extended(
                        depths_d, rgbs_d, z_range, render_cfg, bank_px
                    )
                )[: len(pano_ids)]
            )
            ident_banks[surface_type] = np.asarray(
                bev_pair.render_identity_batched(
                    depths_d, rgbs_d, z_range, render_cfg
                )[: len(pano_ids)]
            )
        profiler.record_stage("render/warp_bank_stage", _time.time() - _t0)

        # Encode each identity render ONCE per (surface, pano). Every
        # hypothesis pair re-writes the SAME img2 bytes (the identity render
        # of its pano 2) under a pair-specific filename; hypotheses
        # outnumber panos ~100x, so caching the encoded bytes removes ~half
        # of all JPEG encodes from the corpus path — the dominant host cost
        # on a 1-core machine (BENCH_NOTES round 4: ~60-70 ms/item, mostly
        # encode). Byte-identical output: same encoder, same input pixels.
        _t0 = _time.time()
        for surface_type in ("floor", "ceiling"):
            bank = ident_banks[surface_type]
            for k in range(len(pano_ids)):
                ident_jpg_cache[(surface_type, k)] = encode_jpg_bytes(bank[k])
        profiler.record_stage("render/ident_encode", _time.time() - _t0)

    writer_pool = ThreadPoolExecutor(max_workers=io_workers)
    write_futures: list = []
    count = 0

    def write_bytes(fpath: str, data: bytes) -> None:
        with open(fpath, "wb") as f:
            f.write(data)

    def encode_and_write(fpath: str, img) -> None:
        # quality=95: default JPEG quality (75) adds ~5/255 of noise,
        # comparable to the aligned-vs-misaligned texture signal the
        # verifier trains on (BENCH_NOTES round-2 root-cause hunt).
        t0 = _time.time()
        write_jpg(fpath, img)
        profiler.record_stage("render/jpg_encode", _time.time() - t0)

    def flush(pending):
        """Fetch a dispatched device batch and queue its JPG writes."""
        chunk, imgs1_d, imgs2_d, bank_k2 = pending
        imgs1 = np.asarray(imgs1_d)
        imgs2 = None if imgs2_d is None else np.asarray(imgs2_d)
        for k, w in enumerate(chunk):
            write_futures.append(writer_pool.submit(encode_and_write, w[4], imgs1[k]))
            if bank_k2 is not None:
                # Warp path: img2 is the pano's identity render — write the
                # cached bytes instead of re-encoding.
                write_futures.append(
                    writer_pool.submit(
                        write_bytes, w[5], ident_jpg_cache[(w[3], int(bank_k2[k]))]
                    )
                )
            else:
                write_futures.append(
                    writer_pool.submit(encode_and_write, w[5], imgs2[k])
                )

    # One-batch lookahead: batch k's device->host transfer overlaps batch
    # k+1's on-device render (JAX dispatch is asynchronous).
    pending = None
    for surface_type in ["floor", "ceiling"]:
        surf_work = [w for w in work if w[3] == surface_type]
        for start in range(0, len(surf_work), batch_size):
            chunk = surf_work[start : start + batch_size]
            _t0 = _time.time()
            pair_indices = np.array(
                [[id2bank[w[1]], id2bank[w[2]]] for w in chunk], dtype=np.int32
            )
            sims = [Sim2.from_json(w[0]) for w in chunk]
            rotations = np.stack([s.rotation for s in sims]).astype(np.float32)
            translations = np.stack([s.translation for s in sims]).astype(np.float32)
            profiler.record_stage("render/hyp_parse", _time.time() - _t0)
            # Pad the tail chunk to the full batch shape (identity poses on
            # bank slot 0): one compiled program per surface, no per-tail
            # recompiles. flush() only iterates the real rows.
            n_pad = batch_size - len(chunk)
            if n_pad:
                pair_indices = np.concatenate(
                    [pair_indices, np.zeros((n_pad, 2), np.int32)]
                )
                rotations = np.concatenate(
                    [rotations, np.tile(np.eye(2, dtype=np.float32), (n_pad, 1, 1))]
                )
                translations = np.concatenate(
                    [translations, np.zeros((n_pad, 2), np.float32)]
                )

            if use_warp:
                from salve_tpu.ops import warp as warp_ops

                # Host-side warp from the once-fetched banks: no device
                # dispatch, no per-pair transfer. Bit-exactness vs the
                # device gather warp is tested in
                # tests/parity/test_warp_drift.py (host mirror).
                _t0 = _time.time()
                imgs1_h = warp_ops.warp_bank_sim2_nn_host(
                    warp_banks[surface_type],
                    rotations,
                    translations * bev_pair.HOHO_S_ZIND_SCALE_FACTOR,
                    bank_idx=pair_indices[:, 0],
                )
                profiler.record_stage("render/host_warp", _time.time() - _t0)
                flush((chunk, imgs1_h, None, pair_indices[:, 1]))
                count += len(chunk)
                continue

            imgs1_d, imgs2_d = bev_pair.render_bev_pairs_batch_device(
                depths_d, rgbs_d, pair_indices, rotations, translations,
                surface_type,
            )
            # Kick the device->host copies off immediately so they overlap
            # the NEXT batch's render (np.asarray alone would start the
            # transfer only inside flush, serializing render and fetch).
            for arr in (imgs1_d, imgs2_d):
                if hasattr(arr, "copy_to_host_async"):
                    arr.copy_to_host_async()
            if pending is not None:
                flush(pending)
            pending = (chunk, imgs1_d, imgs2_d, None)
            count += len(chunk)
    if pending is not None:
        flush(pending)
    writer_pool.shutdown(wait=True)
    # Surface any write failure (ENOSPC, bad dtype, ...): a silently missing
    # JPG would later shrink the dataset (bev_pairs skips incomplete tuples)
    # with no error anywhere.
    for fut in write_futures:
        fut.result()
    return count


def _render_layout_pairs(
    pair_fpaths: List[str],
    img_fpaths_dict: Dict[int, str],
    layout_save_root: str,
    label_type: str,
    building_id: str,
    floor_pose_graph,
) -> int:
    """Layout modality: rasterized room layouts ('floor' surface only)."""
    import imageio.v2 as imageio

    building_layout_save_dir = f"{layout_save_root}/{label_type}/{building_id}"
    os.makedirs(building_layout_save_dir, exist_ok=True)

    # Gather the per-pair layout jobs host-side, render them all in batched
    # device dispatches (rendering/layout.py:rasterize_layout_batch) — the
    # naive two-dispatches-per-pair path is dispatch-latency-bound at
    # dataset scale.
    jobs, out_fpaths = [], []
    count = 0
    for pair_idx, pair_fpath in enumerate(pair_fpaths):
        i1, i2, pair_uuid = _parse_pair_fpath(pair_fpath)
        if i1 not in floor_pose_graph.nodes or i2 not in floor_pose_graph.nodes:
            continue
        if i1 not in img_fpaths_dict or i2 not in img_fpaths_dict:
            continue
        fname1 = bev_pair.bev_fname_from_img_fpath(
            pair_idx, pair_uuid, "floor", img_fpaths_dict[i1]
        )
        fname2 = bev_pair.bev_fname_from_img_fpath(
            pair_idx, pair_uuid, "floor", img_fpaths_dict[i2]
        )
        out1 = f"{building_layout_save_dir}/{fname1}"
        out2 = f"{building_layout_save_dir}/{fname2}"
        if Path(out1).exists() and Path(out2).exists():
            continue
        i2Ti1 = Sim2.from_json(pair_fpath)
        job1, job2 = layout_render.layout_pair_inputs(
            i2Ti1, floor_pose_graph.nodes[i1], floor_pose_graph.nodes[i2]
        )
        jobs += [job1, job2]
        out_fpaths += [out1, out2]
        count += 1

    if jobs:
        # Stream each fetched chunk straight to the writer pool: JPG encode
        # + disk IO overlap the next chunk's device render and transfer.
        # quality=95: the layout modality is near-binary art (thin pure-RGB
        # W/D/O lines on white fill) — exactly what default-quality JPEG
        # degrades most; keep it consistent with the RGB texture path.
        write_futures = []
        with ThreadPoolExecutor(max_workers=8) as pool:

            def write_chunk(start, imgs):
                for k in range(imgs.shape[0]):
                    write_futures.append(
                        pool.submit(write_jpg, out_fpaths[start + k], imgs[k])
                    )

            layout_render.rasterize_layout_batch(jobs, on_chunk=write_chunk)
        for fut in write_futures:  # surface write failures, never shrink silently
            fut.result()
    return count


def render_pairs(
    depth_save_root: str,
    bev_save_root: str,
    raw_dataset_dir: str,
    hypotheses_save_root: str,
    layout_save_root: Optional[str],
    render_modalities: List[str],
    split: Optional[str] = None,
    building_id: Optional[str] = None,
    mhnet_predictions_data_root: Optional[str] = None,
    batch_size: int = DEFAULT_BATCH_SIZE,
    use_warp: Optional[bool] = None,
) -> int:
    """Render all pairs of a split or single building (parity :120)."""
    from salve_tpu.dataset import hnet_prediction_loader

    if building_id is not None:
        building_ids = [building_id]
    else:
        building_ids = sorted(DATASET_SPLITS[split])

    total = 0
    for bid in building_ids:
        floor_dirs = sorted(glob.glob(f"{hypotheses_save_root}/{bid}/floor*"))
        if not floor_dirs:
            continue

        floor_pose_graphs = None
        if "layout" in render_modalities:
            floor_pose_graphs = hnet_prediction_loader.load_inferred_floor_pose_graphs(
                building_id=bid,
                raw_dataset_dir=raw_dataset_dir,
                predictions_data_root=mhnet_predictions_data_root,
            )

        for floor_dir in floor_dirs:
            floor_id = Path(floor_dir).name
            fpg = floor_pose_graphs.get(floor_id) if floor_pose_graphs else None
            total += render_building_floor_pairs(
                depth_save_root=depth_save_root,
                bev_save_root=bev_save_root,
                hypotheses_save_root=hypotheses_save_root,
                raw_dataset_dir=raw_dataset_dir,
                building_id=bid,
                floor_id=floor_id,
                layout_save_root=layout_save_root,
                render_modalities=render_modalities,
                floor_pose_graph=fpg,
                batch_size=batch_size,
                use_warp=use_warp,
            )
    return total
