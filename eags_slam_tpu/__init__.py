"""EAGS-SLAM-TPU: a TPU-native RGB-D Gaussian-Splatting SLAM framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
EnderMandS/EAGS-SLAM (edge-assisted Gaussian-splatting SLAM):

- coarse-to-fine tracking: an edge-based visual odometry frontend
  (Canny edges + distance-transform direct alignment, `eags_slam_tpu.vo`)
  seeds a render-based Gaussian pose refinement (`eags_slam_tpu.slam.tracker`);
- edge-assisted Gaussian seeding (`eags_slam_tpu.core.gaussians`);
- submap-based mapping with a differentiable tile-binned splat rasterizer
  (`eags_slam_tpu.ops.rasterizer`) replacing both CUDA rasterizers of the
  reference;
- parallel loop closure (place recognition + rendering-based registration +
  pose-graph optimization, `eags_slam_tpu.lc`) dispatched asynchronously,
  optionally on a dedicated device-mesh slice (`eags_slam_tpu.parallel`).

Everything on the compute path is jit-compiled JAX with static shapes:
Gaussian submaps are fixed-capacity arrays with alive-masks, tracker/mapper
iterations are `lax`-compiled loops, and cross-device work uses
`jax.sharding.Mesh` + `shard_map` collectives over ICI.
"""

__version__ = "0.1.0"
