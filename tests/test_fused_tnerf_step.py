"""The single-pass fused T-NeRF train step (in-kernel [embed(xyz)|embed(t)]
encoding, ELU trunk, ReLU color head, compositing + MSE + backward in one
Pallas kernel) vs the autodiff render_rays path: same RNG stream, same loss,
same parameter updates (interpret mode, f32).

Reference semantics: t_nerf/run_tnerf.py:329 (n_importance forced 0),
:675-690 (plain MSE loss)."""

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from swnerf_tpu.models.tnerf import TNeRFConfig, make_tnerf_field
from swnerf_tpu.render import RenderConfig, render_rays
from swnerf_tpu.render.core import Rays
from swnerf_tpu.train import make_optimizer
from swnerf_tpu.train.fused_step import (
    make_fused_tnerf_step,
    supports_fused_tnerf_step,
)
from swnerf_tpu.train.loop import TrainState, init_train_state, mse, mse_to_psnr


def _rays(n=32, seed=0):
    rng = np.random.default_rng(seed)
    d = rng.standard_normal((n, 3)).astype(np.float32)
    d[:, 2] = -np.abs(d[:, 2]) - 1.0
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    o = np.zeros((n, 3), np.float32)
    o[:, 2] = 4.0
    t = rng.uniform(0.0, 1.0, (n, 1)).astype(np.float32)
    rays = Rays(jnp.asarray(o), jnp.asarray(d), jnp.asarray(d),
                jnp.full((n,), 2.0), jnp.full((n,), 6.0), jnp.asarray(t))
    target = jnp.asarray(rng.uniform(0, 1, (n, 3)).astype(np.float32))
    return rays, target


def _make_ref_step(field, rcfg, optimizer):
    """make_dnerf_step's inner semantics (run_dnerf.py:151) on a plain
    (state, rays, target, rng) signature, no TV loss (T-NeRF CLI path)."""

    def loss_fn(params, rays, target, rng):
        out = render_rays(field, params["coarse"], rays, rcfg, rng=rng)
        img_loss = mse(out["rgb"], target)
        metrics = {"loss": img_loss, "psnr": mse_to_psnr(img_loss),
                   "total_loss": img_loss}
        return img_loss, metrics

    def step(state, rays, target, rng):
        step_rng = jax.random.fold_in(rng, state.step)
        grads, metrics = jax.grad(loss_fn, has_aux=True)(
            state.params, rays, target, step_rng
        )
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(state.step + 1, params, opt_state), metrics

    return step


def _setup(noise=0.7, perturb=1.0, white_bkgd=True, tile=8):
    cfg = TNeRFConfig(netdepth=4, net_dim=128, skip_layer=2, multires=4,
                      multires_views=2)
    field = make_tnerf_field(cfg, fused=False)
    rcfg = RenderConfig(n_samples=8, n_importance=0, perturb=perturb,
                        white_bkgd=white_bkgd, raw_noise_std=noise)
    opt = make_optimizer(lrate=5e-3)
    params = {"coarse": field.init(jax.random.PRNGKey(0)), "fine": None}
    state = init_train_state(params, opt)
    ref_step = _make_ref_step(field, rcfg, opt)
    fused_step = make_fused_tnerf_step(
        cfg, rcfg, opt, rays_per_tile=tile, interpret=True,
        compute_dtype=jnp.float32,
    )
    return cfg, rcfg, state, ref_step, fused_step


def _compare_one_step(state, ref_step, fused_step, rays, target, atol=2e-4):
    key = jax.random.PRNGKey(42)
    s_ref, m_ref = ref_step(state, rays, target, key)
    s_fused, m_fused = fused_step(state, rays, target, key)
    for k in m_ref:
        assert float(m_ref[k]) == pytest.approx(float(m_fused[k]), rel=5e-3), k
    ref_leaves = jax.tree.leaves(s_ref.params)
    fused_leaves = jax.tree.leaves(s_fused.params)
    assert len(ref_leaves) == len(fused_leaves)
    for a, b in zip(ref_leaves, fused_leaves):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=atol)


class TestFusedTNeRFStep:
    def test_supports(self):
        cfg = TNeRFConfig()
        rcfg = RenderConfig(n_samples=8, n_importance=0)
        assert supports_fused_tnerf_step(cfg, rcfg)
        assert not supports_fused_tnerf_step(
            cfg, RenderConfig(n_samples=8, n_importance=8)
        )
        assert not supports_fused_tnerf_step(TNeRFConfig(net_dim=100), rcfg)

    def test_step_parity(self):
        _, _, state, ref_step, fused_step = _setup()
        rays, target = _rays(32)
        _compare_one_step(state, ref_step, fused_step, rays, target)

    def test_step_parity_no_noise_black_bkgd(self):
        _, _, state, ref_step, fused_step = _setup(
            noise=0.0, perturb=0.0, white_bkgd=False
        )
        rays, target = _rays(32)
        _compare_one_step(state, ref_step, fused_step, rays, target)

    def test_sub8_tile_and_padding(self):
        """rays_per_tile < 8 (masked row writes) + N not divisible by 8."""
        _, _, state, ref_step, fused_step = _setup(tile=4)
        rays, target = _rays(27)
        _compare_one_step(state, ref_step, fused_step, rays, target)

    def test_shard_map_matches_single_device(self):
        from swnerf_tpu.parallel.mesh import RAYS_AXIS, make_mesh, shard_map_train_step

        cfg = TNeRFConfig(netdepth=4, net_dim=128, skip_layer=2, multires=4,
                          multires_views=2)
        rcfg = RenderConfig(n_samples=8, n_importance=0, perturb=0.0,
                            white_bkgd=True, raw_noise_std=0.0)
        opt = make_optimizer(lrate=5e-3)
        field = make_tnerf_field(cfg, fused=False)
        params = {"coarse": field.init(jax.random.PRNGKey(0)), "fine": None}
        state = init_train_state(params, opt)
        rays, target = _rays(32)
        key = jax.random.PRNGKey(7)

        single = make_fused_tnerf_step(cfg, rcfg, opt, interpret=True,
                                       compute_dtype=jnp.float32)
        s_single, m_single = single(state, rays, target, key)

        mesh = make_mesh(jax.devices()[:8])
        sharded = shard_map_train_step(
            make_fused_tnerf_step(cfg, rcfg, opt, interpret=True,
                                  compute_dtype=jnp.float32,
                                  axis_name=RAYS_AXIS),
            mesh,
        )
        s_shard, m_shard = jax.jit(sharded)(state, rays, target, key)
        assert float(m_single["total_loss"]) == pytest.approx(
            float(m_shard["total_loss"]), rel=1e-5
        )
        for a, b in zip(jax.tree.leaves(s_single.params),
                        jax.tree.leaves(s_shard.params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4)

    def test_multi_step_trains(self):
        _, _, state, _, fused_step = _setup(noise=0.5)
        rays, target = _rays(32)
        key = jax.random.PRNGKey(3)
        first = None
        for _ in range(20):
            state, metrics = fused_step(state, rays, target, key)
            if first is None:
                first = float(metrics["total_loss"])
        last = float(metrics["total_loss"])
        assert np.isfinite(last) and last < first, (first, last)
