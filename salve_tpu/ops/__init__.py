"""Device kernels (XLA/Pallas) for the BEV texture-map rendering path.

These replace the reference's native C/C++/CUDA substrate with on-device
TPU equivalents:

    backproject  equirect depth -> colored point cloud      (was: numpy loops)
    bev          z-order splat + sparse->dense interpolation (was: numpy
                 grid loops + scipy/Qhull griddata + torch conv2d)
    raster       polygon fill / thick anti-aliased polylines (was: OpenCV
                 cv2.fillPoly / cv2.line)

All kernels are jit-compiled with static shapes and masked validity, so an
entire hypothesis batch renders as one XLA program on the MXU/VPU.
"""
