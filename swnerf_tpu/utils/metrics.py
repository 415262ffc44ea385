"""Evaluation metrics: PSNR, SSIM, (gated) LPIPS.

Capability parity with the reference eval path (nerf/run.py:49-61
calculate_metrics): skimage ``peak_signal_noise_ratio``,
``structural_similarity(win_size=7, channel_axis=2, data_range=...)`` and
LPIPS(alex). skimage/lpips are not in this image, so PSNR/SSIM are
implemented here to skimage's exact algorithm (uniform 7x7 filter, sample
covariance normalization, border crop); LPIPS is gated on the optional
``lpips`` package and reported as None when unavailable.
"""

from __future__ import annotations

from typing import Optional

import numpy as np


def to8b(x: np.ndarray) -> np.ndarray:
    """[0,1] float -> uint8 (reference utils.py:14)."""
    return (255 * np.clip(x, 0, 1)).astype(np.uint8)


def psnr(gt: np.ndarray, pred: np.ndarray, data_range: Optional[float] = None) -> float:
    """skimage.metrics.peak_signal_noise_ratio semantics."""
    gt = np.asarray(gt, dtype=np.float64)
    pred = np.asarray(pred, dtype=np.float64)
    if data_range is None:
        data_range = gt.max() - gt.min()
    err = np.mean((gt - pred) ** 2)
    return float(10.0 * np.log10((data_range**2) / err))


def _uniform_filter(x: np.ndarray, size: int) -> np.ndarray:
    """Separable moving average, matching scipy.ndimage.uniform_filter with
    the default 'reflect' boundary mode."""
    pad = size // 2
    out = x
    for axis in range(x.ndim):
        padded = np.pad(
            out,
            [(pad, pad) if a == axis else (0, 0) for a in range(x.ndim)],
            mode="reflect",
        )
        c = np.cumsum(padded, axis=axis, dtype=np.float64)
        zero = np.zeros_like(np.take(c, [0], axis=axis))
        c = np.concatenate([zero, c], axis=axis)
        hi = np.take(c, np.arange(size, c.shape[axis]), axis=axis)
        lo = np.take(c, np.arange(0, c.shape[axis] - size), axis=axis)
        out = (hi - lo) / size
    return out


def ssim(
    gt: np.ndarray,
    pred: np.ndarray,
    data_range: Optional[float] = None,
    win_size: int = 7,
    channel_axis: Optional[int] = None,
    K1: float = 0.01,
    K2: float = 0.03,
) -> float:
    """skimage.metrics.structural_similarity with gaussian_weights=False."""
    gt = np.asarray(gt, dtype=np.float64)
    pred = np.asarray(pred, dtype=np.float64)
    if data_range is None:
        data_range = gt.max() - gt.min()

    if channel_axis is not None:
        vals = [
            ssim(
                np.take(gt, c, axis=channel_axis),
                np.take(pred, c, axis=channel_axis),
                data_range=data_range,
                win_size=win_size,
                K1=K1,
                K2=K2,
            )
            for c in range(gt.shape[channel_axis])
        ]
        return float(np.mean(vals))

    ndim = gt.ndim
    NP = win_size**ndim
    cov_norm = NP / (NP - 1)

    ux = _uniform_filter(gt, win_size)
    uy = _uniform_filter(pred, win_size)
    uxx = _uniform_filter(gt * gt, win_size)
    uyy = _uniform_filter(pred * pred, win_size)
    uxy = _uniform_filter(gt * pred, win_size)
    vx = cov_norm * (uxx - ux * ux)
    vy = cov_norm * (uyy - uy * uy)
    vxy = cov_norm * (uxy - ux * uy)

    C1 = (K1 * data_range) ** 2
    C2 = (K2 * data_range) ** 2
    S = ((2 * ux * uy + C1) * (2 * vxy + C2)) / (
        (ux**2 + uy**2 + C1) * (vx + vy + C2)
    )

    pad = (win_size - 1) // 2
    crop = tuple(slice(pad, s - pad) for s in S.shape)
    return float(S[crop].mean())


_LPIPS_MODELS: dict = {}  # net name -> torch lpips.LPIPS instance

# Written next to any null lpips value so downstream consumers of
# metrics.json know the schema delta is deliberate, not a bug (the reference
# hard-depends on the lpips package + pretrained AlexNet/VGG weights, which
# need network egress; this environment has neither).
LPIPS_UNAVAILABLE_NOTE = (
    "lpips unavailable: the optional 'lpips' package (pretrained AlexNet/VGG "
    "weights) is not installed in this environment; install it, or point "
    "SWNERF_LPIPS_DIR at torchvision backbone + lpips linear-head state "
    "dicts for the native JAX implementation (utils/lpips_jax.py), to "
    "populate this column (reference nerf/run.py:49-61 uses LPIPS(alex))."
)


def lpips_available(net: str = "alex") -> bool:
    try:
        import lpips as _  # noqa: F401
        import torch as _t  # noqa: F401

        return True
    except ImportError:
        from swnerf_tpu.utils import lpips_jax

        try:
            return lpips_jax.from_env(net) is not None
        except Exception:
            # e.g. torch absent (the weight loader needs it) or unreadable
            # weight files — treat as unavailable, not a crash.
            return False


def lpips(gt: np.ndarray, pred: np.ndarray, net: str = "alex") -> Optional[float]:
    """LPIPS(net) via the optional ``lpips`` package, else the native JAX
    implementation with SWNERF_LPIPS_DIR-provided weights
    (utils/lpips_jax.py), else None (recorded as null in metrics.json —
    the reference hard-depends on the package, nerf/run.py:11,54)."""
    try:
        import lpips as lpips_pkg
        import torch
    except ImportError:
        from swnerf_tpu.utils import lpips_jax

        try:
            model = lpips_jax.from_env(net)
        except Exception:
            return None
        if model is None:
            return None
        return model(np.asarray(gt), np.clip(np.asarray(pred), 0, 1))
    if net not in _LPIPS_MODELS:
        _LPIPS_MODELS[net] = lpips_pkg.LPIPS(net=net)
    model = _LPIPS_MODELS[net]
    with torch.no_grad():
        g = torch.tensor(np.asarray(gt)).permute(2, 0, 1).unsqueeze(0).float()
        p = torch.tensor(np.clip(np.asarray(pred), 0, 1)).permute(2, 0, 1).unsqueeze(0).float()
        return float(model(g, p))


def calculate_metrics(gt: np.ndarray, pred: np.ndarray):
    """Per-frame (psnr, ssim, lpips) — reference calculate_metrics
    (nerf/run.py:49-61): pred clipped to [0,1], data_range from gt."""
    pred = np.clip(pred, 0.0, 1.0)
    dr = float(gt.max() - gt.min())
    return (
        psnr(gt, pred, data_range=dr),
        ssim(gt, pred, data_range=dr, win_size=7, channel_axis=2),
        lpips(gt, pred),
    )
