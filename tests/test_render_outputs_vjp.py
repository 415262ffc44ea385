"""The differentiable fused render pass (external-cotangent backward,
train/fused_step.py make_render_outputs + ops/pallas/render_fused.py
``perray_ct``): values AND parameter/position gradients must match the
plain autodiff path for an arbitrary loss on rgb/acc/depth — the mode that
backs MultiRes' pyramid-reconstruction objective."""

import numpy as np
import jax
import jax.numpy as jnp

from swnerf_tpu.models.vanilla import VanillaNeRFConfig, make_vanilla_field
from swnerf_tpu.ops.embedding import positional_encoding
from swnerf_tpu.render import RenderConfig
from swnerf_tpu.render.core import Rays, render_rays
from swnerf_tpu.train.fused_step import _dists_scaled, make_render_outputs


def _setup(n=32, S=8, seed=0):
    cfg = VanillaNeRFConfig(netdepth=3, netwidth=128, skips=(1,), multires=4,
                            multires_views=2)
    field = make_vanilla_field(cfg, fused=False)
    params = field.init(jax.random.PRNGKey(0))
    rng = np.random.default_rng(seed)
    d = rng.standard_normal((n, 3)).astype(np.float32)
    d[:, 2] = -np.abs(d[:, 2]) - 1.0
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    o = np.zeros((n, 3), np.float32)
    o[:, 2] = 4.0
    z = np.sort(rng.uniform(2.0, 6.0, (n, S)).astype(np.float32), -1)
    return cfg, field, params, jnp.asarray(o), jnp.asarray(d), jnp.asarray(z)


class TestRenderOutputsVJP:
    def test_values_and_grads_match_autodiff(self):
        cfg, field, params, o, d, z = _setup()
        n = o.shape[0]
        rays = Rays(o, d, d, jnp.full((n,), 2.0), jnp.full((n,), 6.0), None)
        rcfg = RenderConfig(n_samples=z.shape[1], n_importance=0, perturb=0.0,
                            raw_noise_std=0.0, white_bkgd=True)
        vd_emb = positional_encoding(d, cfg.nf_views)
        dists = _dists_scaled(z, d)
        noise = jnp.zeros(z.shape)
        render_out = make_render_outputs(cfg, True, tile=8, interpret=True,
                                         compute_dtype=jnp.float32)

        wr = jnp.asarray(np.random.default_rng(1).standard_normal((n, 3)).astype(np.float32))

        def loss_fused(p, shift):
            pts = (o + shift)[:, None, :] + d[:, None, :] * z[..., None]
            out = render_out(p, pts, vd_emb, z, dists, noise)
            return (jnp.sum(out["rgb"] * wr) + jnp.sum(jnp.sin(out["acc"]))
                    + jnp.sum(out["depth"] ** 2) * 0.01)

        def loss_plain(p, shift):
            out = render_rays(field, p, rays._replace(origins=o + shift),
                              rcfg, rng=None, z_vals=z)
            return (jnp.sum(out["rgb"] * wr) + jnp.sum(jnp.sin(out["acc"]))
                    + jnp.sum(out["depth"] ** 2) * 0.01)

        shift = jnp.zeros((n, 3))
        lf = float(loss_fused(params, shift))
        lp = float(loss_plain(params, shift))
        assert abs(lf - lp) < 1e-3 * max(1.0, abs(lp))

        gf_p, gf_s = jax.grad(loss_fused, argnums=(0, 1))(params, shift)
        gp_p, gp_s = jax.grad(loss_plain, argnums=(0, 1))(params, shift)
        for a, b in zip(jax.tree.leaves(gf_p), jax.tree.leaves(gp_p)):
            a, b = np.asarray(a), np.asarray(b)
            np.testing.assert_allclose(a, b, atol=2e-4 * max(1.0, np.abs(b).max()))
        # Position gradients: the fused dpts chain through the in-kernel
        # encode vs autodiff through positional_encoding.
        np.testing.assert_allclose(
            np.asarray(gf_s), np.asarray(gp_s),
            atol=2e-4 * max(1.0, np.abs(np.asarray(gp_s)).max()),
        )

    def test_weights_detached_path_unaffected(self):
        """The weights output is zero-tangent by contract; its consumers
        stop_gradient it anyway — confirm taking a loss through weights
        yields zero grads rather than garbage."""
        cfg, field, params, o, d, z = _setup(n=16)
        vd_emb = positional_encoding(d, cfg.nf_views)
        render_out = make_render_outputs(cfg, True, tile=8, interpret=True,
                                         compute_dtype=jnp.float32)

        def loss(p):
            pts = o[:, None, :] + d[:, None, :] * z[..., None]
            out = render_out(p, pts, vd_emb, z, _dists_scaled(z, d),
                             jnp.zeros(z.shape))
            return jnp.sum(out["weights"])

        g = jax.grad(loss)(params)
        for leaf in jax.tree.leaves(g):
            assert float(jnp.abs(leaf).max()) == 0.0
