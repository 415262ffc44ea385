"""LPIPS (Learned Perceptual Image Patch Similarity) in JAX.

The reference hard-depends on the ``lpips`` package with pretrained
AlexNet/VGG backbones (nerf/run.py:49-61 LPIPS(alex); d_nerf metrics.ipynb
LPIPS-vgg). Pretrained weights need network egress, which this environment
does not have — so this module implements the full LPIPS computation
natively (backbone feature extraction, channel-unit-normalization, squared
diff, learned 1x1 linear heads, spatial average, layer sum) and loads the
weights from user-provided torch state-dict files:

  * backbone: a torchvision ``alexnet``/``vgg16`` state dict
    (``features.N.weight``/``bias`` keys);
  * linear heads: the lpips package's ``alex.pth``/``vgg.pth``
    (``linN.model.1.weight`` keys, shape [1, C, 1, 1]).

Point ``SWNERF_LPIPS_DIR`` at a directory holding
``{alexnet.pth, alex.pth}`` and/or ``{vgg16.pth, vgg.pth}`` and
``utils.metrics.lpips`` uses this implementation automatically.

Input convention matches our torch-package wrapper (utils/metrics.py):
images are fed to the scaling layer as-is — the reference passes [0, 1]
tensors without ``normalize=True`` (a reference quirk we preserve).

The architecture/plumbing is pinned against a from-scratch torch oracle
with random weights in tests/test_lpips.py, so only the weight files
themselves are trusted at runtime.
"""

from __future__ import annotations

import functools
import os
from typing import Optional, Sequence

import numpy as np

# LPIPS scaling layer constants (richzhang/PerceptualSimilarity
# lpips/lpips.py ScalingLayer).
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)

# torchvision feature-module layouts: (layer_idx -> conv spec) and the
# indices (in the Sequential) after whose ReLU LPIPS taps features.
_ALEX_CONVS = [
    # (in, out, kernel, stride, padding)
    (3, 64, 11, 4, 2),
    (64, 192, 5, 1, 2),
    (192, 384, 3, 1, 1),
    (384, 256, 3, 1, 1),
    (256, 256, 3, 1, 1),
]
# Pools sit after taps 0 and 1 (and after 4, beyond the last tap).
_ALEX_POOL_AFTER = {0, 1}
_ALEX_FEATURE_IDX = [0, 3, 6, 8, 10]  # Sequential indices of the convs

_VGG_CONVS = [
    (3, 64, 3, 1, 1), (64, 64, 3, 1, 1),
    (64, 128, 3, 1, 1), (128, 128, 3, 1, 1),
    (128, 256, 3, 1, 1), (256, 256, 3, 1, 1), (256, 256, 3, 1, 1),
    (256, 512, 3, 1, 1), (512, 512, 3, 1, 1), (512, 512, 3, 1, 1),
    (512, 512, 3, 1, 1), (512, 512, 3, 1, 1), (512, 512, 3, 1, 1),
]
_VGG_FEATURE_IDX = [0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28]
_VGG_TAPS = [1, 3, 6, 9, 12]  # conv ordinals after which LPIPS taps
_VGG_POOL_AFTER = {1, 3, 6, 9}  # 2x2/2 pools between blocks


def _conv(x, w, b, stride: int, pad: int):
    import jax

    out = jax.lax.conv_general_dilated(
        x, w, window_strides=(stride, stride),
        padding=[(pad, pad), (pad, pad)],
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )
    return out + b.reshape(1, -1, 1, 1)


def _maxpool(x, k: int, s: int):
    import jax
    import jax.numpy as jnp

    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 1, k, k), (1, 1, s, s), "VALID"
    )


def _alex_features(params, x):
    import jax.numpy as jnp

    feats = []
    for i, (_ci, _co, _k, stride, pad) in enumerate(_ALEX_CONVS):
        w, b = params[f"conv{i}"]
        x = jnp.maximum(_conv(x, w, b, stride, pad), 0.0)
        feats.append(x)
        if i in _ALEX_POOL_AFTER:
            x = _maxpool(x, 3, 2)
    return feats


def _vgg_features(params, x):
    import jax.numpy as jnp

    feats = []
    for i, (_ci, _co, _k, stride, pad) in enumerate(_VGG_CONVS):
        w, b = params[f"conv{i}"]
        x = jnp.maximum(_conv(x, w, b, stride, pad), 0.0)
        if i in _VGG_TAPS:
            feats.append(x)
        if i in _VGG_POOL_AFTER:
            x = _maxpool(x, 2, 2)
    return feats


def _unit_normalize(x, eps: float = 1e-10):
    import jax.numpy as jnp

    norm = jnp.sqrt(jnp.sum(x**2, axis=1, keepdims=True))
    return x / (norm + eps)


def lpips_forward(params, net: str, img0, img1):
    """Both images NCHW float32; returns [N] LPIPS distances."""
    import jax.numpy as jnp

    shift = jnp.asarray(_SHIFT).reshape(1, 3, 1, 1)
    scale = jnp.asarray(_SCALE).reshape(1, 3, 1, 1)
    extract = _alex_features if net == "alex" else _vgg_features
    f0 = extract(params, (img0 - shift) / scale)
    f1 = extract(params, (img1 - shift) / scale)
    total = 0.0
    for layer, (a, b) in enumerate(zip(f0, f1)):
        diff = (_unit_normalize(a) - _unit_normalize(b)) ** 2
        lin = params[f"lin{layer}"]  # [C] non-negative weights
        val = jnp.sum(diff * lin.reshape(1, -1, 1, 1), axis=1, keepdims=True)
        total = total + jnp.mean(val, axis=(2, 3))[:, 0]
    return total


def load_backbone_params(path: str, net: str):
    """torchvision alexnet/vgg16 state dict -> JAX param dict (f32 numpy)."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=False)
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    idx = _ALEX_FEATURE_IDX if net == "alex" else _VGG_FEATURE_IDX
    params = {}
    for i, fi in enumerate(idx):
        w = sd[f"features.{fi}.weight"]
        b = sd[f"features.{fi}.bias"]
        params[f"conv{i}"] = (
            np.asarray(w, np.float32), np.asarray(b, np.float32)
        )
    return params


def load_linear_params(path: str):
    """lpips alex.pth/vgg.pth -> {linN: [C]} (1x1 conv weights squeezed)."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=False)
    params = {}
    n = 0
    while f"lin{n}.model.1.weight" in sd:
        w = np.asarray(sd[f"lin{n}.model.1.weight"], np.float32)
        params[f"lin{n}"] = w.reshape(-1)
        n += 1
    if n == 0:
        raise ValueError(f"no linN.model.1.weight keys in {path}")
    return params


_NET_FILES = {
    "alex": ("alexnet.pth", "alex.pth"),
    "vgg": ("vgg16.pth", "vgg.pth"),
}
_CHANNELS = {"alex": [64, 192, 384, 256, 256], "vgg": [64, 128, 256, 512, 512]}


class LPIPSJax:
    """Callable LPIPS metric. Weights from explicit paths or a directory
    laid out as ``{alexnet.pth, alex.pth}`` / ``{vgg16.pth, vgg.pth}``."""

    def __init__(self, net: str = "alex", backbone_path: Optional[str] = None,
                 lin_path: Optional[str] = None, weights_dir: Optional[str] = None):
        assert net in ("alex", "vgg"), net
        if weights_dir is not None:
            bb, ln = _NET_FILES[net]
            backbone_path = backbone_path or os.path.join(weights_dir, bb)
            lin_path = lin_path or os.path.join(weights_dir, ln)
        self.net = net
        self.params = load_backbone_params(backbone_path, net)
        self.params.update(load_linear_params(lin_path))
        n_taps = len(_CHANNELS[net])
        if not all(f"lin{i}" in self.params for i in range(n_taps)):
            raise ValueError("linear-head count does not match the backbone taps")
        self._jit = None

    def __call__(self, gt: np.ndarray, pred: np.ndarray) -> float:
        """HWC (or NHWC) images; returns the (mean) LPIPS distance."""
        import jax
        import jax.numpy as jnp

        if self._jit is None:
            self._jit = jax.jit(functools.partial(lpips_forward, self.params, self.net))
        g = np.asarray(gt, np.float32)
        p = np.asarray(pred, np.float32)
        if g.ndim == 3:
            g, p = g[None], p[None]
        g = jnp.asarray(g).transpose(0, 3, 1, 2)
        p = jnp.asarray(p).transpose(0, 3, 1, 2)
        return float(np.mean(np.asarray(self._jit(g, p))))


@functools.lru_cache(maxsize=2)
def from_env(net: str = "alex") -> Optional[LPIPSJax]:
    """LPIPSJax from SWNERF_LPIPS_DIR if the weight files exist, else None."""
    d = os.environ.get("SWNERF_LPIPS_DIR")
    if not d:
        return None
    bb, ln = _NET_FILES[net]
    if not (os.path.exists(os.path.join(d, bb)) and os.path.exists(os.path.join(d, ln))):
        return None
    return LPIPSJax(net=net, weights_dir=d)
