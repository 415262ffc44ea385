"""Fused Pallas MLP trunk: forward + gradient parity vs the jnp trunk."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from swnerf_tpu.models import VanillaNeRFConfig, make_vanilla_field
from swnerf_tpu.models.vanilla import apply_vanilla_trunk, init_vanilla_params
from swnerf_tpu.ops.embedding import positional_encoding
from swnerf_tpu.ops.pallas.raymarch import (
    build_embed_consts,
    fused_field_raw,
    fused_trunk,
    supports_config,
)


def _setup(multires=10, multires_views=4, D=8):
    cfg = VanillaNeRFConfig(netdepth=D, netwidth=256, multires=multires, multires_views=multires_views)
    params = init_vanilla_params(jax.random.PRNGKey(0), cfg)
    return cfg, params


class TestFusedTrunk:
    def test_supports_flagship(self):
        cfg, _ = _setup()
        assert supports_config(cfg)
        assert not supports_config(VanillaNeRFConfig(netwidth=200))
        assert not supports_config(VanillaNeRFConfig(use_viewdirs=False))

    @pytest.mark.parametrize("n", [64, 1024, 1500])
    def test_forward_matches_jnp(self, rng_np, n):
        cfg, params = _setup()
        emb = rng_np.standard_normal((n, cfg.input_ch)).astype(np.float32)
        vemb = rng_np.standard_normal((n, cfg.input_ch_views)).astype(np.float32)
        want = np.asarray(apply_vanilla_trunk(params, cfg, jnp.asarray(emb), jnp.asarray(vemb)))
        got = np.asarray(
            fused_trunk(params, cfg, jnp.asarray(emb), jnp.asarray(vemb), block=512, interpret=True)
        )
        np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-5)

    def test_batched_shapes(self, rng_np):
        cfg, params = _setup()
        emb = rng_np.standard_normal((4, 7, cfg.input_ch)).astype(np.float32)
        vemb = rng_np.standard_normal((4, 7, cfg.input_ch_views)).astype(np.float32)
        out = fused_trunk(params, cfg, jnp.asarray(emb), jnp.asarray(vemb), block=128, interpret=True)
        assert out.shape == (4, 7, 4)

    def test_gradients_match_jnp(self, rng_np):
        cfg, params = _setup(multires=4, multires_views=2, D=4)
        # small depth keeps the interpret-mode test fast
        object.__setattr__  # noqa
        emb = rng_np.standard_normal((96, cfg.input_ch)).astype(np.float32)
        vemb = rng_np.standard_normal((96, cfg.input_ch_views)).astype(np.float32)
        tgt = rng_np.standard_normal((96, 4)).astype(np.float32)

        def loss_jnp(p):
            return jnp.mean((apply_vanilla_trunk(p, cfg, jnp.asarray(emb), jnp.asarray(vemb)) - tgt) ** 2)

        def loss_fused(p):
            return jnp.mean(
                (fused_trunk(p, cfg, jnp.asarray(emb), jnp.asarray(vemb), block=128, interpret=True) - tgt) ** 2
            )

        g1 = jax.grad(loss_jnp)(params)
        g2 = jax.grad(loss_fused)(params)
        for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4, rtol=1e-4)

    def test_need_input_grads_false(self, rng_np):
        """need_input_grads=False: parameter gradients unchanged, input
        cotangents exactly zero (the training path detaches positions, so
        the skipped matmuls were dead work)."""
        cfg, params = _setup(multires=4, multires_views=2, D=4)
        emb = jnp.asarray(rng_np.standard_normal((96, cfg.input_ch)).astype(np.float32))
        vemb = jnp.asarray(rng_np.standard_normal((96, cfg.input_ch_views)).astype(np.float32))
        tgt = jnp.asarray(rng_np.standard_normal((96, 4)).astype(np.float32))

        def loss(p, e, v, din):
            out = fused_trunk(p, cfg, e, v, block=96, interpret=True,
                              need_input_grads=din)
            return jnp.mean((out - tgt) ** 2)

        g_full = jax.grad(loss)(params, emb, vemb, True)
        g_skip = jax.grad(loss)(params, emb, vemb, False)
        for a, b in zip(jax.tree.leaves(g_full), jax.tree.leaves(g_skip)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
        de, dv = jax.grad(loss, argnums=(1, 2))(params, emb, vemb, False)
        assert float(jnp.abs(de).max()) == 0.0
        assert float(jnp.abs(dv).max()) == 0.0

    def test_embed_consts_match_positional_encoding(self, rng_np):
        """emb = x8 @ E0 + sin(x8 @ S + PHASE) * MASK reproduces the jnp
        encoder exactly (identity + interleaved sin/cos per freq)."""
        for F, dims in [(10, 3), (4, 3), (1, 3)]:
            E0, S, PH, MK = build_embed_consts(F, dims)
            x = rng_np.standard_normal((17, dims)).astype(np.float32)
            x8 = np.zeros((17, 8), np.float32)
            x8[:, :dims] = x
            got = x8 @ E0 + np.sin(x8 @ S + PH) * MK
            want = np.asarray(positional_encoding(jnp.asarray(x), F))
            # atol: fp32 argument reduction at 2^9·x rad makes cos-as-
            # sin(t+pi/2) differ from cos(t) by O(1e-4) — same order as the
            # direct encoder's own fp32 error at those frequencies.
            np.testing.assert_allclose(got[:, : want.shape[1]], want, atol=3e-4)
            np.testing.assert_allclose(got[:, want.shape[1] :], 0.0, atol=0)

    def test_raw_variant_matches_jnp_field(self, rng_np):
        cfg, params = _setup(multires=6, multires_views=3, D=4)
        pts = rng_np.uniform(-1, 1, (96, 3)).astype(np.float32)
        vd = rng_np.standard_normal((96, 3)).astype(np.float32)
        vd /= np.linalg.norm(vd, axis=-1, keepdims=True)
        pe = positional_encoding(jnp.asarray(pts), cfg.nf_pts)
        ve = positional_encoding(jnp.asarray(vd), cfg.nf_views)
        want = np.asarray(apply_vanilla_trunk(params, cfg, pe, ve))
        got = np.asarray(
            fused_field_raw(params, cfg, jnp.asarray(pts), jnp.asarray(vd),
                            block=128, interpret=True)
        )
        np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-5)

    def test_raw_variant_gradients(self, rng_np):
        cfg, params = _setup(multires=4, multires_views=2, D=3)
        pts = jnp.asarray(rng_np.uniform(-1, 1, (64, 3)).astype(np.float32))
        vd = jnp.asarray(rng_np.standard_normal((64, 3)).astype(np.float32))
        tgt = jnp.asarray(rng_np.standard_normal((64, 4)).astype(np.float32))

        def loss_jnp(p, pts):
            pe = positional_encoding(pts, cfg.nf_pts)
            ve = positional_encoding(vd, cfg.nf_views)
            return jnp.mean((apply_vanilla_trunk(p, cfg, pe, ve) - tgt) ** 2)

        def loss_raw(p, pts):
            return jnp.mean(
                (fused_field_raw(p, cfg, pts, vd, block=64, interpret=True) - tgt) ** 2
            )

        g1, gp1 = jax.grad(loss_jnp, argnums=(0, 1))(params, pts)
        g2, gp2 = jax.grad(loss_raw, argnums=(0, 1))(params, pts)
        for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4, rtol=1e-4)
        # gradient w.r.t. the raw points flows through the in-kernel encoder
        np.testing.assert_allclose(np.asarray(gp1), np.asarray(gp2), atol=2e-4, rtol=1e-4)

    def test_identity_embed_matches_jnp(self, rng_np):
        """MultiRes level 3 uses the identity embedder (channel_list
        (-1,-1,-1), reference multires_dnerf.py:665-668): input_ch = 3.
        The fused trunk must cover it (VERDICT r1 gap)."""
        cfg = VanillaNeRFConfig(netdepth=4, netwidth=256, skips=(1,), i_embed=-1)
        assert cfg.input_ch == 3 and cfg.input_ch_views == 3
        assert supports_config(cfg)
        params = init_vanilla_params(jax.random.PRNGKey(0), cfg)
        emb = rng_np.uniform(-1, 1, (96, 3)).astype(np.float32)
        vemb = rng_np.standard_normal((96, 3)).astype(np.float32)
        want = np.asarray(apply_vanilla_trunk(params, cfg, jnp.asarray(emb), jnp.asarray(vemb)))
        got = np.asarray(
            fused_trunk(params, cfg, jnp.asarray(emb), jnp.asarray(vemb), block=96, interpret=True)
        )
        np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-5)

    def test_field_integration(self, rng_np, monkeypatch):
        """make_vanilla_field(fused=True) renders identically to fused=False."""
        monkeypatch.setenv("SWNERF_FUSED_DTYPE", "f32")
        cfg = VanillaNeRFConfig(netdepth=4, netwidth=256, multires=4, multires_views=2)
        f_ref = make_vanilla_field(cfg)
        f_fused = make_vanilla_field(cfg, fused=True, fused_interpret=True)
        params = f_ref.init(jax.random.PRNGKey(1))
        pts = jnp.asarray(rng_np.uniform(-1, 1, (8, 16, 3)).astype(np.float32))
        vd = jnp.asarray(rng_np.standard_normal((8, 3)).astype(np.float32))
        vd = vd / jnp.linalg.norm(vd, axis=-1, keepdims=True)
        a, _ = f_ref.apply(params, pts, vd)
        b, _ = f_fused.apply(params, pts, vd)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4, rtol=1e-5)
