"""Fake shapely package for the Stage-A byte-parity harness (see geometry.py)."""
