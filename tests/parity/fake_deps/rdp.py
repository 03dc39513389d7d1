"""rdp shim delegating to salve_tpu's Ramer-Douglas-Peucker implementation."""

import numpy as np

from salve_tpu.geometry import simplify


def rdp(points, epsilon: float) -> np.ndarray:
    return simplify.rdp(np.asarray(points, dtype=np.float64), epsilon=epsilon)
