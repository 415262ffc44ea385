"""Pallas TPU kernels: the native-kernel layer of the framework.

Pallas plays the role CUDA plays in the reference (the bundled
``torchsearchsorted`` extension, d_nerf/torchsearchsorted/ — SURVEY.md §2.5):

* ``sample_pdf_pallas`` — fused inverse-CDF importance sampling
  (pdf -> cdf -> right-side search -> gather -> lerp) in one VMEM pass;
* ``sample_pdf_merge_pallas`` — the same plus the sorted coarse+fine depth
  union (gather-free rank merge) in the same pass;
* ``fused_raymarch`` — positional encode + NeRF MLP + alpha-composite for a
  ray tile with VMEM-resident weights.
"""

from swnerf_tpu.ops.pallas.raymarch import (
    fused_field_raw,
    fused_time_net,
    fused_trunk,
    supports_config,
    supports_time_net,
)
from swnerf_tpu.ops.pallas.sample_pdf import (
    sample_pdf_merge_pallas,
    sample_pdf_pallas,
)

__all__ = [
    "fused_field_raw",
    "fused_time_net",
    "fused_trunk",
    "sample_pdf_merge_pallas",
    "sample_pdf_pallas",
    "supports_config",
    "supports_time_net",
]
