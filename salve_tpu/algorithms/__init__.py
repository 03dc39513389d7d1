"""Graph back-end: edge filtering, spanning trees, pose-graph optimization."""
