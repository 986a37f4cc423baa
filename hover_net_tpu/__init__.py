"""hover_net_tpu: a TPU-native (JAX/XLA/Pallas/pjit) HoVer-Net framework.

A from-scratch re-design of the capabilities of vqdang/hover_net
(simultaneous nuclear instance segmentation and classification in H&E
histology) for TPU hardware:

- the Preact-ResNet50 encoder + NP/HV/TP dense-decoder model is a Flax
  module compiled by XLA (NHWC, static shapes, bfloat16-capable);
- the watershed/CCL post-processing runs batched on device over tile
  stacks instead of per-tile on host CPU;
- tile/WSI inference is a double-buffered host->HBM pipeline;
- training is data-parallel over a `jax.sharding.Mesh`.

Reference behaviours are cited as `file:line` into the upstream repo
throughout the code base so parity can be audited.
"""

__version__ = "0.1.0"
