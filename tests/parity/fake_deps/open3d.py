"""open3d import placeholder (imported transitively, never exercised on Stage A)."""
