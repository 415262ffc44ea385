"""swnerf_tpu — a TPU-native (JAX/XLA/Pallas/pjit) scale-aware NeRF framework.

A ground-up rebuild of the capabilities of daihangpku/SW-NeRF (PyTorch,
single-GPU) as an idiomatic TPU framework:

* one functional volumetric render core (`swnerf_tpu.render`) parameterized by
  a *field function*, replacing the four copy-paste render engines of the
  reference (nerf/run.py, d_nerf/run_dnerf.py, t_nerf/run_tnerf.py,
  multires_dnerf/multires_dnerf.py);
* pure-pytree models (`swnerf_tpu.models`): vanilla NeRF, D-NeRF
  (deformation field), T-NeRF (time-conditioned field), MultiRes pyramid
  fields;
* TPU kernels (`swnerf_tpu.ops.pallas`): fused positional-encode + MLP +
  alpha-composite ray-march and an inverse-CDF `sample_pdf` kernel — the
  TPU-native equivalents of the reference's CUDA `torchsearchsorted`
  extension and its Python `chunk`/`netchunk` loops;
* data-parallel ray sharding over an ICI device mesh
  (`swnerf_tpu.parallel`);
* compatibility shells (`swnerf_tpu.utils.config`,
  `swnerf_tpu.train.checkpoint`): the reference's config-txt CLI flags and
  torch `.tar` checkpoint schemas are preserved.
"""

__version__ = "0.1.0"
