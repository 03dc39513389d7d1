"""Stage A: pairwise relative-pose hypothesis generation from W/D/O alignments."""
