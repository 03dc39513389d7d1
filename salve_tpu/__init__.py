"""salve_tpu — a TPU-native (JAX/XLA/Pallas) floorplan-reconstruction framework.

Re-implements the capabilities of SALVe (zillow/salve, ECCV 2022) with a
TPU-first design: batched/vmapped geometric kernels instead of per-pair
GTSAM/Shapely calls, Pallas + XLA kernels for BEV texture-map rendering
instead of OpenCV/Qhull/torch, a Flax early-fusion verifier trained with
pjit data-parallelism instead of torch DataParallel, and an on-device
Gauss-Newton Pose(2) pose-graph optimizer instead of GTSAM factor graphs.

Package layout:
    geometry/    pure-JAX Lie-group math: Sim(2), SE(2)/Sim(3) fits, polygons
    common/      host-side data structures (PanoData, PoseGraph2d, reports)
    ops/         Pallas/XLA device kernels (BEV splat, interpolation, raster)
    models/      Flax models (early-fusion ResNet verifier, depth net)
    algorithms/  graph back-end (cycle consistency, spanning tree, PGO)
    dataset/     ZInD + ModifiedHorizonNet prediction loaders
    stitching/   floorplan stitching + shape refinement
    baselines/   OpenSfM/OpenMVG/ICP comparison adapters
    parallel/    device-mesh utilities, sharded train/infer steps
    utils/       IO, logging, config
    cli/         command-line drivers (flag-compatible with the reference)
"""

__version__ = "0.1.0"
