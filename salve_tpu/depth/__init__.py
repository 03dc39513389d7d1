"""Monocular depth for equirectangular panos (HoHoNet-equivalent role).

The reference treats depth as a cached artifact: u16 millimeter PNGs under
{depth_save_root}/{building_id}/{pano_stem}.depth.png, produced once by
HoHoNet (salve/utils/hohonet_inference.py:14) and re-used forever. This
package keeps that exact cache contract and makes the producer pluggable:
a registered JAX depth model, or pre-computed PNGs from any source.
"""

from salve_tpu.depth.cache import (  # noqa: F401
    depth_fpath_for_pano,
    infer_depth_if_nonexistent,
    register_depth_model,
)
