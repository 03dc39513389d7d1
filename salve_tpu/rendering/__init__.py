"""Stage B orchestration: BEV texture-map generation for hypothesis pairs.

Host side handles file IO (pano JPGs, cached depth PNGs, output texture
maps) and the reference-compatible filename grammar; all pixel work runs
on device through salve_tpu.ops kernels, batched across hypothesis pairs.
"""
