"""gtsfm.visualization.open3d_vis_utils placeholder (import-only)."""
