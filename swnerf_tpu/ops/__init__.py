"""Math core: positional encoding, ray generation, sampling, compositing."""

from swnerf_tpu.ops.embedding import positional_encoding, embedding_dim, make_embedder
from swnerf_tpu.ops.rays import get_rays, get_rays_np, ndc_rays
from swnerf_tpu.ops.sampling import (
    merge_z_vals,
    sample_along_rays,
    sample_pdf,
    sample_pdf_merge,
)
from swnerf_tpu.ops.volume import composite

__all__ = [
    "positional_encoding",
    "embedding_dim",
    "make_embedder",
    "get_rays",
    "get_rays_np",
    "ndc_rays",
    "sample_along_rays",
    "sample_pdf",
    "merge_z_vals",
    "sample_pdf_merge",
    "composite",
]
