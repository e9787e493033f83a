"""splat_tpu — TPU-native differentiable Gaussian splatting with motion-blur and
rolling-shutter compensation.

A from-scratch JAX/Pallas re-design of the capabilities of SpectacularAI/3dgs-deblur
("Gaussian Splatting on the Move", arXiv 2403.13327): a splatfacto-style 3D Gaussian
splatting trainer whose camera model integrates per-frame linear/angular velocities
over the exposure window (motion blur = averaged sub-frame renders, rolling shutter =
per-scanline time offsets applied through screen-space Gaussian velocities).

Layer map (cf. SURVEY.md §1, TPU mapping):
  ops/       — projection / tiling / rasterization math: pure-jnp oracle + Pallas kernels
  cameras/   — camera pytrees, pose & velocity optimizers, spline camera paths
  data/      — transforms.json dataparser (reference data contract), PLY, image cache
  models/    — the splatfacto-equivalent model + densification strategy
  engine/    — training loop, eval metrics, config tree
  parallel/  — device-mesh sharding of the render/train step
"""

__version__ = "0.1.0"
