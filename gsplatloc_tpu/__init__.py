"""gsplatloc_tpu — a TPU-native differentiable Gaussian-splatting localization framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of GsplatLoc
(reference: /root/reference, Atticuszz/GsplatLoc): ultra-precise RGB-D camera
localization by gradient-based pose optimization through a differentiable
3D Gaussian depth renderer, plus a classical ICP/GICP registration suite.

Layer map (TPU-first, see SURVEY.md):
  ops/       — numerics substrate + rasterizer (pure-JAX oracle and Pallas TPU kernels)
  models/    — Gaussian scene init + camera pose parameterization
  opt/       — per-parameter Adam + jitted on-device pose tracking loop
  data/      — Replica/TUM loaders, frame-pair parser, synthetic scenes
  parallel/  — device-mesh sharding of the rasterizer (shard_map over tiles)
  eval/      — eT/eR/ATE/AAE metrics, logging, res.json + table emission
  tracking/  — sequence tracking runner + ICP baseline suite
  native/    — C++ point-cloud library (KdTree/kNN/normals/voxel/ICP/GICP)
"""

__version__ = "0.1.0"
