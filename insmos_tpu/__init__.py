"""InsMOS-TPU: TPU-native instance-aware moving object segmentation.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
nubot-nudt/InsMOS (IROS 2023): label every LiDAR point of a scan as
unlabeled / static / moving using a sliding window of pose-aligned scans
and an embedded 3D detector, with instance-aware feature fusion.

Layout
------
- ``insmos_tpu.config``    typed config (parity with reference config/config.yaml)
- ``insmos_tpu.data``      KITTI IO, window assembly, augmentation (host side)
- ``insmos_tpu.sparse``    fixed-capacity sparse-voxel engine (the MinkowskiEngine
                           + spconv replacement), pure JAX/XLA + Pallas kernels
- ``insmos_tpu.ops``       device ops: rotated IoU, NMS, points-in-boxes, gaussians
- ``insmos_tpu.nn``        networks: MotionNet-4D, UNetV2-3D, BEV backbone, CenterHead
- ``insmos_tpu.train``     losses, metrics, optimizer, checkpointing, train/eval steps
- ``insmos_tpu.parallel``  device meshes and shardings (pjit data parallelism)
- ``insmos_tpu.cli``       train / predict_mos / refine / evaluate_mos entry points
"""

__version__ = "0.1.0"
