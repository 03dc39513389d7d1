"""Tango color palette (parity: salve/utils/colormap.py)."""

import numpy as np


def get_tango_colormap(rgb: bool = True) -> np.ndarray:
    """(N,3) uint8 palette of visually distinctive colors (Tango-based)."""
    color_list = np.array(
        [
            [252, 233, 79], [196, 160, 0], [252, 175, 62], [206, 92, 0],
            [233, 185, 110], [193, 125, 17], [143, 89, 2], [138, 226, 52],
            [78, 154, 6], [114, 159, 207], [32, 74, 135], [173, 127, 168],
            [92, 53, 102], [239, 41, 41], [164, 0, 0], [136, 138, 133],
            [85, 87, 83], [46, 52, 54],
        ],
        dtype=np.uint8,
    )
    if not rgb:
        color_list = color_list[:, ::-1]
    return color_list
