"""Fused multi-stage device pipelines.

The reference's stages communicate only via the filesystem (SURVEY.md §1:
"the dataflow graph is a directory convention"). That contract is preserved
by the per-stage CLIs — but at inference time nothing requires the BEV
texture maps to ever leave the chip. This package fuses Stage B rendering
with Stage C verification into one device-resident pipeline: hypotheses in,
confidences out, zero image IO.
"""
