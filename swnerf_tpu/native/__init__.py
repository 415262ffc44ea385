"""Native (C++) host-side components, bound via ctypes.

The reference vendors one native piece — the torchsearchsorted CPU/CUDA
extension (SURVEY.md §2.5). Its TPU-era split here:
  * device path: Pallas kernels (swnerf_tpu/ops/pallas/);
  * host path: this C++ library (searchsorted.cpp), compiled on demand with
    g++ (no pybind11/torch build machinery needed).
"""

from swnerf_tpu.native.searchsorted import (
    native_available,
    searchsorted,
)

__all__ = ["searchsorted", "native_available"]
