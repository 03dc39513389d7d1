"""Host-side data structures shared across pipeline stages."""
