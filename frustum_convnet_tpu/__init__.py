"""frustum_convnet_tpu — a TPU-native (JAX/XLA/Pallas) frustum-based 3D detection framework.

A from-scratch rebuild of the capabilities of Frustum ConvNet
(Gorilla-Lab-SCUT/frustum-convnet, IROS 2019): frustum extraction from 2D
detections, sliding frustum-section aggregation of point features at multiple
strides, a fully-convolutional 1D detection head with heading-bin / size-template
box coding, rotated 3D NMS, the two-stage refinement cascade, and KITTI /
SUN-RGBD evaluation — redesigned for TPU: static shapes, channels-last layouts,
pjit data parallelism over a device mesh, and Pallas kernels on the hot path.
"""

__version__ = "0.1.0"
