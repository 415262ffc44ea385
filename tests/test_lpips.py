"""Native JAX LPIPS (utils/lpips_jax.py) vs a from-scratch torch oracle.

Pretrained weights cannot be downloaded in this environment, so the test
pins the *architecture and plumbing* with random weights saved in the
exact torchvision / lpips-package state-dict formats the runtime loader
consumes; the oracle rebuilds LPIPS from its published definition
(scaling layer -> backbone relu taps -> channel unit-normalize -> squared
diff -> 1x1 linear heads -> spatial mean -> layer sum) in torch."""

import numpy as np
import pytest
import torch
import torch.nn as nn

from swnerf_tpu.utils.lpips_jax import (
    _ALEX_CONVS,
    _ALEX_FEATURE_IDX,
    _VGG_CONVS,
    _VGG_FEATURE_IDX,
    LPIPSJax,
    _SHIFT,
    _SCALE,
)


def _torch_alex_features():
    return nn.Sequential(
        nn.Conv2d(3, 64, 11, 4, 2), nn.ReLU(), nn.MaxPool2d(3, 2),
        nn.Conv2d(64, 192, 5, 1, 2), nn.ReLU(), nn.MaxPool2d(3, 2),
        nn.Conv2d(192, 384, 3, 1, 1), nn.ReLU(),
        nn.Conv2d(384, 256, 3, 1, 1), nn.ReLU(),
        nn.Conv2d(256, 256, 3, 1, 1), nn.ReLU(), nn.MaxPool2d(3, 2),
    )


def _torch_vgg_features():
    layers, cin = [], 3
    for block, (n, cout) in enumerate([(2, 64), (2, 128), (3, 256), (3, 512), (3, 512)]):
        for _ in range(n):
            layers += [nn.Conv2d(cin, cout, 3, 1, 1), nn.ReLU()]
            cin = cout
        layers.append(nn.MaxPool2d(2, 2))
    return nn.Sequential(*layers)


_TAP_AFTER = {  # ReLU indices in the Sequential after which LPIPS taps
    "alex": [1, 4, 7, 9, 11],
    "vgg": [3, 8, 15, 22, 29],
}
_CHANS = {"alex": [64, 192, 384, 256, 256], "vgg": [64, 128, 256, 512, 512]}


def _oracle(net, feats_mod, lins, img0, img1):
    """LPIPS forward per its published definition, in torch."""
    shift = torch.tensor(_SHIFT).view(1, 3, 1, 1)
    scale = torch.tensor(_SCALE).view(1, 3, 1, 1)

    def taps(x):
        out = []
        for i, m in enumerate(feats_mod):
            x = m(x)
            if i in _TAP_AFTER[net]:
                out.append(x)
        return out

    def unit(x):
        return x / (torch.sqrt(torch.sum(x**2, dim=1, keepdim=True)) + 1e-10)

    with torch.no_grad():
        f0 = taps((img0 - shift) / scale)
        f1 = taps((img1 - shift) / scale)
        total = 0.0
        for (a, b), w in zip(zip(f0, f1), lins):
            d = (unit(a) - unit(b)) ** 2
            val = torch.sum(d * w.view(1, -1, 1, 1), dim=1, keepdim=True)
            total = total + val.mean(dim=(2, 3))
    return float(total.mean())


@pytest.mark.parametrize("net", ["alex", "vgg"])
def test_lpips_matches_torch_oracle(net, tmp_path):
    torch.manual_seed(0)
    feats = _torch_alex_features() if net == "alex" else _torch_vgg_features()
    feature_idx = _ALEX_FEATURE_IDX if net == "alex" else _VGG_FEATURE_IDX
    convs = _ALEX_CONVS if net == "alex" else _VGG_CONVS
    assert len(feature_idx) == len(convs)

    # Save the backbone in torchvision's state-dict format.
    sd = {}
    conv_mods = [m for m in feats if isinstance(m, nn.Conv2d)]
    for fi, m in zip(feature_idx, conv_mods):
        sd[f"features.{fi}.weight"] = m.weight.detach().clone()
        sd[f"features.{fi}.bias"] = m.bias.detach().clone()
    bb_path = tmp_path / "backbone.pth"
    torch.save(sd, str(bb_path))

    # Random non-negative linear heads in the lpips-package format.
    lins = [torch.rand(c) * 0.1 for c in _CHANS[net]]
    lin_sd = {
        f"lin{i}.model.1.weight": w.view(1, -1, 1, 1).clone()
        for i, w in enumerate(lins)
    }
    lin_path = tmp_path / "lin.pth"
    torch.save(lin_sd, str(lin_path))

    size = 64 if net == "alex" else 32
    rng = np.random.default_rng(1)
    gt = rng.uniform(0, 1, (size, size, 3)).astype(np.float32)
    pred = np.clip(gt + rng.normal(0, 0.1, gt.shape), 0, 1).astype(np.float32)

    model = LPIPSJax(net=net, backbone_path=str(bb_path), lin_path=str(lin_path))
    ours = model(gt, pred)

    t0 = torch.tensor(gt).permute(2, 0, 1).unsqueeze(0)
    t1 = torch.tensor(pred).permute(2, 0, 1).unsqueeze(0)
    ref = _oracle(net, feats, lins, t0, t1)
    assert ours == pytest.approx(ref, rel=1e-4), (ours, ref)
    assert model(gt, gt) == pytest.approx(0.0, abs=1e-6)


def test_metrics_lpips_uses_env_weights(tmp_path, monkeypatch):
    """utils.metrics.lpips picks up SWNERF_LPIPS_DIR automatically."""
    torch.manual_seed(0)
    feats = _torch_alex_features()
    sd = {}
    conv_mods = [m for m in feats if isinstance(m, nn.Conv2d)]
    for fi, m in zip(_ALEX_FEATURE_IDX, conv_mods):
        sd[f"features.{fi}.weight"] = m.weight.detach().clone()
        sd[f"features.{fi}.bias"] = m.bias.detach().clone()
    torch.save(sd, str(tmp_path / "alexnet.pth"))
    lin_sd = {
        f"lin{i}.model.1.weight": (torch.rand(c) * 0.1).view(1, -1, 1, 1)
        for i, c in enumerate(_CHANS["alex"])
    }
    torch.save(lin_sd, str(tmp_path / "alex.pth"))

    from swnerf_tpu.utils import lpips_jax, metrics

    monkeypatch.setenv("SWNERF_LPIPS_DIR", str(tmp_path))
    lpips_jax.from_env.cache_clear()
    try:
        assert metrics.lpips_available()
        rng = np.random.default_rng(2)
        gt = rng.uniform(0, 1, (64, 64, 3)).astype(np.float32)
        pred = np.clip(gt + 0.05, 0, 1)
        val = metrics.lpips(gt, pred)
        assert val is not None and np.isfinite(val) and val > 0
        _, _, l2 = metrics.calculate_metrics(gt, pred)
        assert l2 == pytest.approx(val, rel=1e-5)
    finally:
        lpips_jax.from_env.cache_clear()
