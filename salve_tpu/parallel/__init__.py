"""Device-mesh utilities and sharded train/infer steps.

TPU-native replacement for the reference's parallelism story
(SURVEY.md section 2.8): where the reference used torch.nn.DataParallel
single-process scatter/gather (salve/train_utils.py:214-216) and
multiprocessing.Pool fork-join, we use a jax.sharding.Mesh with pjit —
batches sharded over the 'data' axis, parameters replicated, gradient
all-reduce riding ICI via XLA-inserted psums.
"""

from salve_tpu.parallel.mesh import (  # noqa: F401
    make_mesh,
    replicate,
    shard_batch,
)
