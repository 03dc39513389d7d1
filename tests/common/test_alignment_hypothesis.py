"""Alignment-hypothesis de-duplication tests (reference tests/common/test_alignment_hypothesis.py)."""

import numpy as np

from salve_tpu.common.alignment_hypothesis import AlignmentHypothesis, prune_to_unique_sim2_objs
from salve_tpu.geometry.sim2 import Sim2


def test_prune_to_unique_sim2_objs() -> None:
    """Four hypotheses (three sharing one Sim(2)) de-duplicate to two."""
    wR1, wt1, ws1 = np.eye(2), np.array([0, 1]), 1.5
    wR2, wt2, ws2 = np.array([[0, 1], [1, 0]]), np.array([1, 2]), 3.0

    def make(R, t, s, i, j):
        return AlignmentHypothesis(
            i2Ti1=Sim2(R, t, s),
            wdo_alignment_object="window",
            i1_wdo_idx=i,
            i2_wdo_idx=j,
            configuration="identity",
        )

    hypotheses = [
        make(wR1, wt1, ws1, 1, 5),
        make(wR1, wt1, ws1, 2, 6),
        make(wR2, wt2, ws2, 3, 7),
        make(wR1, wt1, ws1, 4, 8),
    ]
    pruned = prune_to_unique_sim2_objs(hypotheses)
    assert len(pruned) == 2
    assert pruned[0].i2Ti1.scale == 1.5
    assert pruned[1].i2Ti1.scale == 3.0
