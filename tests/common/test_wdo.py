"""WDO data-structure tests (fixtures from reference tests/common/test_wdo.py)."""

import numpy as np

from salve_tpu.common.wdo import WDO


def test_get_wd_normal_2d_horizontal() -> None:
    """Flat horizontal window: normal points along +y."""
    wd = WDO(global_Sim2_local=None, pt1=(-2, 0), pt2=(2, 0), bottom_z=-1, top_z=1, type="window")
    assert np.allclose(wd.get_wd_normal_2d(), np.array([0, 1]))


def test_get_wd_normal_2d_diagonal() -> None:
    """Upwards diagonal (y=x) window: normal is (-1, 1)/sqrt(2)."""
    wd = WDO(global_Sim2_local=None, pt1=(0, 0), pt2=(3, 3), bottom_z=-1, top_z=1, type="window")
    assert np.allclose(wd.get_wd_normal_2d(), np.array([-1, 1]) / np.sqrt(2))


def test_rotated_version_flips_normal() -> None:
    """Seen from the other side of the doorway, the normal is negated."""
    wd = WDO(global_Sim2_local=None, pt1=(0, 0), pt2=(3, 3), bottom_z=-1, top_z=1, type="door")
    assert np.allclose(wd.get_rotated_version().get_wd_normal_2d(), -wd.get_wd_normal_2d())
