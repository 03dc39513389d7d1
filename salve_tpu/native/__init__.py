"""Native (C++) host-side runtime components.

The TPU compute path is JAX/XLA/Pallas; the host IO around it is native
where it is hot: a libjpeg thread-pool batch loader replaces the
reference's 15 torch DataLoader worker processes.
"""

from salve_tpu.native.loader import decode_resize_batch, native_loader_available  # noqa: F401
