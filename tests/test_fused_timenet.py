"""Fused D-NeRF deformation-MLP kernel: forward + gradient parity."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from swnerf_tpu.models import DNeRFConfig
from swnerf_tpu.models.dnerf import apply_time_net, init_time_net_params
from swnerf_tpu.ops.pallas.raymarch import fused_time_net, supports_time_net


def _setup(multires=6, D=4):
    cfg = DNeRFConfig(netdepth=D, netwidth=256, skips=(1,), multires=multires, multires_views=2)
    tp = init_time_net_params(jax.random.PRNGKey(0), cfg)
    return cfg, tp


class TestFusedTimeNet:
    def test_supports(self):
        cfg, _ = _setup()
        assert supports_time_net(cfg)
        assert supports_time_net(DNeRFConfig())  # flagship: 63 + 21 = 84
        assert not supports_time_net(DNeRFConfig(netwidth=200))

    @pytest.mark.parametrize("n", [50, 700])
    def test_forward_matches_jnp(self, rng_np, n):
        cfg, tp = _setup()
        pe = rng_np.standard_normal((n, cfg.input_ch)).astype(np.float32)
        te = rng_np.standard_normal((n, cfg.input_ch_time)).astype(np.float32)
        want = np.asarray(apply_time_net(tp, cfg, jnp.asarray(pe), jnp.asarray(te)))
        got = np.asarray(
            fused_time_net(tp, cfg, jnp.asarray(pe), jnp.asarray(te), block=256, interpret=True)
        )
        np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-5)

    def test_gradients_match_jnp(self, rng_np):
        cfg, tp = _setup(multires=4, D=3)
        pe = jnp.asarray(rng_np.standard_normal((64, cfg.input_ch)).astype(np.float32))
        te = jnp.asarray(rng_np.standard_normal((64, cfg.input_ch_time)).astype(np.float32))
        tgt = jnp.asarray(rng_np.standard_normal((64, 3)).astype(np.float32))

        def loss_jnp(p, pe):
            return jnp.mean((apply_time_net(p, cfg, pe, te) - tgt) ** 2)

        def loss_fused(p, pe):
            return jnp.mean(
                (fused_time_net(p, cfg, pe, te, block=64, interpret=True) - tgt) ** 2
            )

        g1, ge1 = jax.grad(loss_jnp, argnums=(0, 1))(tp, pe)
        g2, ge2 = jax.grad(loss_fused, argnums=(0, 1))(tp, pe)
        for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4, rtol=1e-4)
        np.testing.assert_allclose(np.asarray(ge1), np.asarray(ge2), atol=2e-4, rtol=1e-4)

    def test_identity_embed_matches_jnp(self, rng_np):
        """MultiRes level 3 (channel_list (-1,-1,-1)): identity embeds, so
        the deformation MLP's input is [x(3), t(1)] (VERDICT r1 gap)."""
        cfg = DNeRFConfig(netdepth=4, netwidth=256, skips=(1,), i_embed=-1)
        assert cfg.input_ch == 3 and cfg.input_ch_time == 1
        assert supports_time_net(cfg)
        tp = init_time_net_params(jax.random.PRNGKey(0), cfg)
        pe = rng_np.uniform(-1, 1, (64, 3)).astype(np.float32)
        te = rng_np.uniform(0, 1, (64, 1)).astype(np.float32)
        want = np.asarray(apply_time_net(tp, cfg, jnp.asarray(pe), jnp.asarray(te)))
        got = np.asarray(
            fused_time_net(tp, cfg, jnp.asarray(pe), jnp.asarray(te), block=64, interpret=True)
        )
        np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-5)

    def test_skip_ignores_time_lanes(self, rng_np):
        """The skip concat re-injects embed(x) only (model.py:128-134): the
        fused result must be invariant to which time embedding the skip rows
        would see — verified by matching the jnp path that concatenates
        pts_emb only."""
        cfg, tp = _setup(multires=6, D=4)  # skip at layer 1
        pe = rng_np.standard_normal((32, cfg.input_ch)).astype(np.float32)
        te1 = rng_np.standard_normal((32, cfg.input_ch_time)).astype(np.float32)
        want = np.asarray(apply_time_net(tp, cfg, jnp.asarray(pe), jnp.asarray(te1)))
        got = np.asarray(
            fused_time_net(tp, cfg, jnp.asarray(pe), jnp.asarray(te1), block=32, interpret=True)
        )
        np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-5)


class TestFusedTimeNetPts:
    """In-kernel-encode variant (fused_time_net_pts): raw pts + times in,
    [embed(x)|embed(t)] built inside the kernel."""

    def _check(self, cfg, n=70, seed=0):
        from swnerf_tpu.ops.embedding import positional_encoding
        from swnerf_tpu.ops.pallas.raymarch import fused_time_net_pts

        rng = np.random.default_rng(seed)
        tp = init_time_net_params(jax.random.PRNGKey(0), cfg)
        pts = jnp.asarray(rng.uniform(-2, 2, (n, 4, 3)).astype(np.float32))
        t = jnp.asarray(rng.uniform(0, 1, (n, 1, 1)).astype(np.float32))
        tb = jnp.broadcast_to(t, pts.shape[:-1] + (1,))
        pe = positional_encoding(pts, cfg.nf_pts)
        te = positional_encoding(tb, cfg.nf_time)
        want = np.asarray(apply_time_net(tp, cfg, pe, te))
        got = np.asarray(
            fused_time_net_pts(tp, cfg, pts, t, block=64, interpret=True)
        )
        np.testing.assert_allclose(got, want, atol=3e-4, rtol=1e-4)
        return tp, pts, t, want

    def test_forward_matches_jnp(self):
        cfg, _ = _setup()
        self._check(cfg)

    def test_two_lane_block_embedding(self):
        """MultiRes level 0 (pos 20 freqs + time 8 freqs = 140 dims) needs
        the widened [8, 256] xt constants."""
        cfg = DNeRFConfig(netdepth=4, netwidth=256, skips=(1,), multires=20,
                          multires_views=20, multires_time=8)
        assert cfg.input_ch + cfg.input_ch_time == 140
        self._check(cfg)

    def test_identity_embed(self):
        cfg = DNeRFConfig(netdepth=4, netwidth=256, skips=(1,), i_embed=-1)
        self._check(cfg)

    def test_param_grads_match_jnp(self):
        from swnerf_tpu.ops.embedding import positional_encoding
        from swnerf_tpu.ops.pallas.raymarch import fused_time_net_pts

        cfg, tp = _setup(multires=4, D=3)
        rng = np.random.default_rng(1)
        pts = jnp.asarray(rng.uniform(-2, 2, (40, 3)).astype(np.float32))
        t = jnp.asarray(rng.uniform(0, 1, (40, 1)).astype(np.float32))
        tgt = jnp.asarray(rng.standard_normal((40, 3)).astype(np.float32))

        def loss_jnp(p):
            pe = positional_encoding(pts, cfg.nf_pts)
            te = positional_encoding(t, cfg.nf_time)
            return jnp.mean((apply_time_net(p, cfg, pe, te) - tgt) ** 2)

        def loss_fused(p):
            dx = fused_time_net_pts(p, cfg, pts, t, block=64, interpret=True)
            return jnp.mean((dx - tgt) ** 2)

        g1 = jax.grad(loss_jnp)(tp)
        g2 = jax.grad(loss_fused)(tp)
        for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=2e-4, rtol=1e-4)
