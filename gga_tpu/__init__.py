"""gga_tpu: a TPU-native (JAX/XLA/Pallas/pjit) framework for weakly supervised
3D object detection, with the capabilities of GGA (ECCV'24, built on
MMDetection3D dev-1.0).

Layer map (mirrors SURVEY.md section 1, redesigned TPU-first):

- ``gga_tpu.core``     geometry: boxes, rotations, projections, rotated IoU,
                       NMS, gaussian heatmaps (jittable jnp + host numpy).
- ``gga_tpu.ops``      compute kernels: voxelization, pillar scatter, sparse
                       3D convolution, point ops (XLA + Pallas).
- ``gga_tpu.models``   flax models: voxel encoders, middle encoders,
                       backbones, necks, dense heads, detectors; registry.
- ``gga_tpu.data``     KITTI/SUN-RGBD backends, GGA weak-label generation,
                       input pipelines with static padded shapes.
- ``gga_tpu.eval``     KITTI AP (11/40 pt), indoor AP, submission writers.
- ``gga_tpu.parallel`` device meshes and sharding rules (pjit data parallel
                       over ICI/DCN).
- ``gga_tpu.train``    optax optimizers/schedules, train loop, orbax
                       checkpoints, hooks.
- ``gga_tpu.config``   python-dict config system with ``_base_`` inheritance
                       and dot-path CLI overrides.
"""

__version__ = '0.1.0'
