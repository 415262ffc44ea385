"""Fused T-NeRF (ELU) Pallas kernel: forward + gradient parity vs the jnp
field, plus the widened (2 lane-block) deformation-MLP input that serves
MultiRes level 0 (channel (20,8,20) -> 123+17 = 140 input lanes)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from swnerf_tpu.models.tnerf import (
    TNeRFConfig,
    apply_tnerf,
    init_tnerf_params,
    make_tnerf_field,
)
from swnerf_tpu.ops.embedding import positional_encoding
from swnerf_tpu.ops.pallas.raymarch import fused_tnerf, supports_tnerf


def _setup(depth=8, multires=10, multires_views=4):
    cfg = TNeRFConfig(netdepth=depth, multires=multires, multires_views=multires_views)
    params = init_tnerf_params(jax.random.PRNGKey(0), cfg)
    return cfg, params


def _embs(rng_np, cfg, n):
    pe = rng_np.standard_normal((n, cfg.in_feat)).astype(np.float32)
    ve = rng_np.standard_normal((n, cfg.dir_feat)).astype(np.float32)
    te = rng_np.standard_normal((n, cfg.time_feat)).astype(np.float32)
    return jnp.asarray(pe), jnp.asarray(ve), jnp.asarray(te)


class TestFusedTNeRF:
    def test_supports_shipped_config(self):
        cfg, _ = _setup()
        assert supports_tnerf(cfg)
        # two skips (depth > 2*skip_layer) not covered
        assert not supports_tnerf(TNeRFConfig(netdepth=12))
        assert not supports_tnerf(TNeRFConfig(netdepth=8, multires=25))  # in0 > 128

    @pytest.mark.parametrize("n", [64, 500])
    def test_forward_matches_jnp(self, rng_np, n):
        cfg, params = _setup()
        pe, ve, te = _embs(rng_np, cfg, n)
        want = np.asarray(apply_tnerf(params, cfg, pe, ve, te))
        got = np.asarray(
            fused_tnerf(params, cfg, pe, ve, te, block=256, interpret=True)
        )
        np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-5)
        # The ReLU color head really clamps (some negatives pre-clip).
        assert (got[:, :3] >= 0).all()

    def test_gradients_match_jnp(self, rng_np):
        cfg, params = _setup(depth=4, multires=4, multires_views=2)
        pe, ve, te = _embs(rng_np, cfg, 96)
        tgt = jnp.asarray(rng_np.standard_normal((96, 4)).astype(np.float32))

        def loss_jnp(p):
            return jnp.mean((apply_tnerf(p, cfg, pe, ve, te) - tgt) ** 2)

        def loss_fused(p):
            return jnp.mean(
                (fused_tnerf(p, cfg, pe, ve, te, block=96, interpret=True) - tgt) ** 2
            )

        g1 = jax.grad(loss_jnp)(params)
        g2 = jax.grad(loss_fused)(params)
        for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4, rtol=2e-4)

    def test_field_integration(self, rng_np, monkeypatch):
        """make_tnerf_field(fused=True) == fused=False through the Field API."""
        monkeypatch.setenv("SWNERF_FUSED_DTYPE", "f32")
        cfg = TNeRFConfig(netdepth=4, multires=4, multires_views=2)
        f_ref = make_tnerf_field(cfg, fused=False)
        f_fused = make_tnerf_field(cfg, fused=True, fused_interpret=True)
        params = f_ref.init(jax.random.PRNGKey(1))
        pts = jnp.asarray(rng_np.uniform(-1, 1, (8, 16, 3)).astype(np.float32))
        vd = jnp.asarray(rng_np.standard_normal((8, 3)).astype(np.float32))
        vd = vd / jnp.linalg.norm(vd, axis=-1, keepdims=True)
        t = jnp.full((8, 1), 0.37)
        a, _ = f_ref.apply(params, pts, vd, t)
        b, _ = f_fused.apply(params, pts, vd, t)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4, rtol=1e-5)


class TestWideTimeNet:
    def test_multires_level0_timenet(self, rng_np):
        """The MultiRes level-0 deformation MLP (pos 20 freqs + time 8 freqs
        -> 123 + 17 = 140 input lanes) now runs fused (was an XLA fallback
        when the kernel only packed one 128-lane block)."""
        from swnerf_tpu.models.dnerf import DNeRFConfig, apply_time_net, init_time_net_params
        from swnerf_tpu.ops.pallas.raymarch import fused_time_net, supports_time_net

        cfg = DNeRFConfig(
            netdepth=4, netwidth=256, skips=(2,), multires=20, multires_views=20,
            multires_time=8,
        )
        assert cfg.input_ch + cfg.input_ch_time == 140
        assert supports_time_net(cfg)
        tp = init_time_net_params(jax.random.PRNGKey(3), cfg)
        pe = jnp.asarray(rng_np.standard_normal((80, cfg.input_ch)).astype(np.float32))
        te = jnp.asarray(rng_np.standard_normal((80, cfg.input_ch_time)).astype(np.float32))
        want = np.asarray(apply_time_net(tp, cfg, pe, te))
        got = np.asarray(fused_time_net(tp, cfg, pe, te, block=80, interpret=True))
        np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-5)

        tgt = jnp.asarray(rng_np.standard_normal((80, 3)).astype(np.float32))

        def loss_jnp(p):
            return jnp.mean((apply_time_net(p, cfg, pe, te) - tgt) ** 2)

        def loss_fused(p):
            return jnp.mean(
                (fused_time_net(p, cfg, pe, te, block=80, interpret=True) - tgt) ** 2
            )

        g1 = jax.grad(loss_jnp)(tp)
        g2 = jax.grad(loss_fused)(tp)
        for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4, rtol=2e-4)
