"""Stage-A byte parity: run the *reference* exporter against salve_tpu's.

SURVEY.md §7 milestone #1 / VERDICT round-1 item #3(ii): hypothesis JSONs for
the fixture buildings must be byte-identical between the reference pipeline
(scripts/export_alignment_hypotheses.py) and salve_tpu's exporter.

The reference's native dependencies (gtsam, shapely, rdp, ...) are not
installed here; tests/parity/fake_deps provides import-compatible shims that
delegate to salve_tpu's own solvers (which are separately validated against
true GTSAM numeric fixtures in tests/geometry/). Both pipelines therefore
share primitive fits, and a byte diff isolates divergence in everything
around them: parsing, handedness flip, pair enumeration, candidate
generation, pruning, labeling tolerances, filename grammar, JSON formatting.
"""

from __future__ import annotations

import importlib.util
import pathlib
import sys

import pytest

REPO_ROOT = pathlib.Path(__file__).resolve().parents[2]
FAKE_DEPS = pathlib.Path(__file__).resolve().parent / "fake_deps"
REFERENCE_ROOT = pathlib.Path("/root/reference")
ZIND_ROOT = REFERENCE_ROOT / "tests" / "test_data" / "ZInD"
PREDICTIONS_ROOT = REFERENCE_ROOT / "tests" / "test_data" / "ZInD_HorizonNet_predictions"


@pytest.fixture(scope="module")
def reference_exporter():
    """Import the reference exporter with fake native deps on sys.path."""
    if not REFERENCE_ROOT.exists():
        pytest.skip("reference repo unavailable")
    import matplotlib

    matplotlib.use("Agg")
    for p in (str(FAKE_DEPS), str(REFERENCE_ROOT)):
        if p not in sys.path:
            sys.path.insert(0, p)
    script = REFERENCE_ROOT / "scripts" / "export_alignment_hypotheses.py"
    spec = importlib.util.spec_from_file_location("ref_export_alignment_hypotheses", script)
    module = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(module)
    return module


def _tree(root: pathlib.Path):
    return sorted(p.relative_to(root) for p in root.rglob("*.json"))


def _assert_trees_byte_identical(ref_root: pathlib.Path, ours_root: pathlib.Path):
    ref_files = _tree(ref_root)
    our_files = _tree(ours_root)
    only_ref = set(ref_files) - set(our_files)
    only_ours = set(our_files) - set(ref_files)
    assert not only_ref and not only_ours, (
        f"file sets differ: {len(only_ref)} only in reference "
        f"(e.g. {sorted(only_ref)[:3]}), {len(only_ours)} only in ours "
        f"(e.g. {sorted(only_ours)[:3]})"
    )
    mismatched = [
        str(rel)
        for rel in ref_files
        if (ref_root / rel).read_bytes() != (ours_root / rel).read_bytes()
    ]
    assert not mismatched, (
        f"{len(mismatched)}/{len(ref_files)} files differ byte-wise, "
        f"e.g. {mismatched[:5]}"
    )
    assert len(ref_files) > 0, "parity harness produced no files at all"


@pytest.mark.parametrize("building_id", ["0000", "1210"])
def test_gt_mode_byte_parity(reference_exporter, tmp_path, building_id):
    """GT-WDO mode: reference exporter output == salve_tpu exporter output, byte-wise."""
    from salve_tpu.hypotheses import export as our_export

    ref_out = tmp_path / "ref"
    our_out = tmp_path / "ours"
    annot = ZIND_ROOT / building_id / "zind_data.json"

    reference_exporter.export_single_building_wdo_alignment_hypotheses(
        hypotheses_save_root=str(ref_out),
        building_id=building_id,
        json_annot_fpath=str(annot),
        raw_dataset_dir=str(ZIND_ROOT),
        use_inferred_wdos_layout=False,
    )
    our_export.export_single_building_wdo_alignment_hypotheses(
        hypotheses_save_root=str(our_out),
        building_id=building_id,
        json_annot_fpath=str(annot),
        raw_dataset_dir=str(ZIND_ROOT),
        use_inferred_wdos_layout=False,
    )
    _assert_trees_byte_identical(ref_out, our_out)


def test_inferred_mode_byte_parity(reference_exporter, tmp_path):
    """Inferred-WDO mode (MHNet predictions) on building 0000, byte-wise."""
    import json

    from salve_tpu.hypotheses import export as our_export

    ref_out = tmp_path / "ref"
    our_out = tmp_path / "ours"
    annot = ZIND_ROOT / "0000" / "zind_data.json"

    # The reference loader requires a vanishing_angle/<building>.json (a JSON
    # array indexed by pano id) that the fixture tree does not ship; build a
    # predictions root with the real horizon_net predictions plus a synthetic
    # vanishing-angle file (values are carried through to PanoData but do not
    # affect Stage-A hypothesis math).
    predictions_root = tmp_path / "predictions"
    predictions_root.mkdir()
    (predictions_root / "horizon_net").symlink_to(PREDICTIONS_ROOT / "horizon_net")
    pano_ids = [
        int(p.stem.rsplit("_", 1)[1])
        for p in (PREDICTIONS_ROOT / "horizon_net" / "0000").glob("*.json")
    ]
    angles = [((7 * i) % 13) - 6.0 for i in range(max(pano_ids) + 1)]
    va_dir = predictions_root / "vanishing_angle"
    va_dir.mkdir()
    (va_dir / "0000.json").write_text(json.dumps(angles))

    # The reference also requires one pano JPG per GT pano id to exist
    # (salve/dataset/zind_data.py:42-49); Stage A never opens the images, so
    # empty placeholder files satisfy the path resolution.
    raw_root = tmp_path / "zind"
    (raw_root / "0000" / "panos").mkdir(parents=True)
    (raw_root / "0000" / "zind_data.json").symlink_to(annot)
    for i in range(60):
        (raw_root / "0000" / "panos" / f"floor_01_pano_{i}.jpg").touch()

    reference_exporter.export_single_building_wdo_alignment_hypotheses(
        hypotheses_save_root=str(ref_out),
        building_id="0000",
        json_annot_fpath=str(annot),
        raw_dataset_dir=str(raw_root),
        use_inferred_wdos_layout=True,
        mhnet_predictions_data_root=str(predictions_root),
    )
    our_export.export_single_building_wdo_alignment_hypotheses(
        hypotheses_save_root=str(our_out),
        building_id="0000",
        json_annot_fpath=str(annot),
        raw_dataset_dir=str(raw_root),
        use_inferred_wdos_layout=True,
        mhnet_predictions_data_root=str(predictions_root),
    )
    _assert_trees_byte_identical(ref_out, our_out)
