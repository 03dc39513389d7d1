"""gtsfm placeholder for the parity harness (imported, not exercised on Stage A)."""
