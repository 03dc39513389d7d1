"""Graph-utility tests (fixtures from reference tests/utils/test_graph_utils.py)."""

import numpy as np

from salve_tpu.utils import graph_utils


def test_find_connected_components_with_singleton() -> None:
    """Two clusters: one with 3 nodes, one singleton not in any edge."""
    ccs = graph_utils.find_connected_components(edges=[(2, 3), (3, 4)], nodes=[1, 2, 3, 4])
    assert {frozenset(c) for c in ccs} == {frozenset({1}), frozenset({2, 3, 4})}
    # Ours orders largest-first (get_nodes_in_largest_connected_component relies on it).
    assert len(ccs[0]) == 3


def test_find_connected_components_four_clusters() -> None:
    """Two 2-node CCs and two singletons."""
    ccs = graph_utils.find_connected_components(edges=[(1, 2), (5, 6)], nodes=[1, 2, 3, 4, 5, 6])
    assert {frozenset(c) for c in ccs} == {
        frozenset({1, 2}),
        frozenset({3}),
        frozenset({4}),
        frozenset({5, 6}),
    }


def test_analyze_cc_distribution() -> None:
    """PDF/CDF ordered largest CC to smallest, singletons included."""
    pdf, cdf = graph_utils.analyze_cc_distribution(nodes=[1, 2, 3, 4, 5, 6], edges=[(1, 2), (5, 6)])
    assert np.allclose(pdf, [2 / 6, 2 / 6, 1 / 6, 1 / 6])
    assert np.allclose(cdf, [2 / 6, 4 / 6, 5 / 6, 6 / 6])


def test_largest_connected_component() -> None:
    nodes = graph_utils.get_nodes_in_largest_connected_component([(2, 3), (3, 4), (7, 8)])
    assert set(nodes) == {2, 3, 4}
