"""The fused D-NeRF train step (custom-vjp canonical render-loss kernels
with in-kernel input gradients, composed under jax.grad with the
deformation MLP, zero_canonical mask and TV loss) vs the autodiff
render_rays path: same RNG stream, same loss, same parameter updates
(interpret mode, f32).

Reference semantics: run_dnerf.py:354-480 (render), :690-727 (TV)."""

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from swnerf_tpu.models.dnerf import DNeRFConfig, make_dnerf_field
from swnerf_tpu.render import RenderConfig, render_rays
from swnerf_tpu.render.core import Rays
from swnerf_tpu.train import make_optimizer
from swnerf_tpu.train.fused_step import (
    make_fused_dnerf_step,
    supports_fused_dnerf_step,
)
from swnerf_tpu.train.loop import TrainState, init_train_state, mse, mse_to_psnr


def _rays(n=32, seed=0, with_t0=True):
    rng = np.random.default_rng(seed)
    d = rng.standard_normal((n, 3)).astype(np.float32)
    d[:, 2] = -np.abs(d[:, 2]) - 1.0
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    o = np.zeros((n, 3), np.float32)
    o[:, 2] = 4.0
    t = rng.uniform(0.0, 1.0, (n, 1)).astype(np.float32)
    if with_t0:
        t[: n // 4] = 0.0  # exercise the zero_canonical mask
    rays = Rays(jnp.asarray(o), jnp.asarray(d), jnp.asarray(d),
                jnp.full((n,), 2.0), jnp.full((n,), 6.0), jnp.asarray(t))
    target = jnp.asarray(rng.uniform(0, 1, (n, 3)).astype(np.float32))
    return rays, target


def _make_ref_step(field, rcfg, optimizer, add_tv, tv_w, fine_field=None):
    """make_dnerf_step's inner semantics (run_dnerf.py:151) on a plain
    (state, rays, target, neighbor_time, rng) signature."""

    def loss_fn(params, rays, target, neighbor_time, rng):
        out = render_rays(field, params["coarse"], rays, rcfg, rng=rng,
                          fine_params=params.get("fine"), fine_field=fine_field)
        img_loss = mse(out["rgb"], target)
        loss = img_loss
        metrics = {"loss": img_loss, "psnr": mse_to_psnr(img_loss)}
        if add_tv:
            z_vals = jax.lax.stop_gradient(out["z_vals"])
            n = rays.origins.shape[0]
            rays_n = rays._replace(
                times=jnp.full((n, 1), neighbor_time, jnp.float32)
            )
            out_n = render_rays(field, params["coarse"], rays_n, rcfg, rng=rng,
                                fine_params=params.get("fine"), z_vals=z_vals,
                                fine_field=fine_field)
            tv = jnp.sum((out["aux"]["dx"] - out_n["aux"]["dx"]) ** 2) * tv_w
            loss = loss + tv
            metrics["tv"] = tv
        if "rgb0" in out:
            l0 = mse(out["rgb0"], target)
            loss = loss + l0
            metrics["psnr0"] = mse_to_psnr(l0)
        metrics["total_loss"] = loss
        return loss, metrics

    def step(state, rays, target, neighbor_time, rng):
        step_rng = jax.random.fold_in(rng, state.step)
        grads, metrics = jax.grad(loss_fn, has_aux=True)(
            state.params, rays, target, neighbor_time, step_rng
        )
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(state.step + 1, params, opt_state), metrics

    return step


def _cfg(zero_canonical=True):
    return DNeRFConfig(netdepth=3, netwidth=128, skips=(1,), multires=4,
                       multires_views=2, zero_canonical=zero_canonical)


def _setup(n_importance=8, add_tv=True, tv_w=1e-2, two_nets=False,
           zero_canonical=True, noise=0.7, perturb=1.0, tiles=(8, 4)):
    cfg = _cfg(zero_canonical)
    field = make_dnerf_field(cfg, fused=False)
    # coarse_contributes mirrors create_dnerf (run_dnerf.py): shared-model
    # fine -> the coarse pass only guides sampling (stop_gradient, no mse0);
    # two-model -> the coarse net trains via mse0.
    rcfg = RenderConfig(n_samples=8, n_importance=n_importance, perturb=perturb,
                        white_bkgd=True, raw_noise_std=noise,
                        coarse_contributes=two_nets)
    opt = make_optimizer(lrate=5e-3)
    params = {
        "coarse": field.init(jax.random.PRNGKey(0)),
        "fine": field.init(jax.random.PRNGKey(1)) if (n_importance and two_nets) else None,
    }
    state = init_train_state(params, opt)
    ref_step = _make_ref_step(field, rcfg, opt, add_tv, tv_w)
    fused_step = make_fused_dnerf_step(
        cfg, rcfg, opt, fcfg=cfg if (n_importance and two_nets) else None,
        add_tv_loss=add_tv, tv_loss_weight=tv_w, interpret=True,
        compute_dtype=jnp.float32,
        rays_per_tile_coarse=tiles[0], rays_per_tile_fine=tiles[1],
    )
    return state, ref_step, fused_step


def _compare_one_step(state, ref_step, fused_step, rays, target, atol=3e-4):
    key = jax.random.PRNGKey(42)
    nt = jnp.float32(0.37)
    s_ref, m_ref = ref_step(state, rays, target, nt, key)
    s_fused, m_fused = fused_step(state, rays, target, nt, key)
    for k in m_ref:
        assert float(m_ref[k]) == pytest.approx(
            float(m_fused[k]), rel=5e-3, abs=1e-6
        ), k
    ref_leaves = jax.tree.leaves(s_ref.params)
    fused_leaves = jax.tree.leaves(s_fused.params)
    assert len(ref_leaves) == len(fused_leaves)
    for a, b in zip(ref_leaves, fused_leaves):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=atol)


class TestFusedDNeRFStep:
    def test_supports(self):
        rcfg = RenderConfig(n_samples=8, n_importance=8)
        assert supports_fused_dnerf_step(_cfg(), _cfg(), rcfg)
        assert not supports_fused_dnerf_step(
            DNeRFConfig(netwidth=100), None, rcfg
        )

    def test_hierarchical_shared_model_tv(self):
        """The bouncingballs shape: shared coarse/fine model + TV loss."""
        state, ref_step, fused_step = _setup()
        rays, target = _rays(32)
        _compare_one_step(state, ref_step, fused_step, rays, target)

    def test_two_model_fine(self):
        state, ref_step, fused_step = _setup(two_nets=True)
        rays, target = _rays(32)
        _compare_one_step(state, ref_step, fused_step, rays, target)

    def test_no_tv_no_zero_canonical(self):
        state, ref_step, fused_step = _setup(add_tv=False, zero_canonical=False,
                                             noise=0.0, perturb=0.0)
        rays, target = _rays(32)
        _compare_one_step(state, ref_step, fused_step, rays, target)

    def test_coarse_only_tv(self):
        state, ref_step, fused_step = _setup(n_importance=0)
        rays, target = _rays(32)
        _compare_one_step(state, ref_step, fused_step, rays, target)

    def test_sub8_tiles_and_padding(self):
        # Slightly looser atol: the revisited-block grad accumulation order
        # differs, and Adam's sqrt(v)+eps normalization amplifies the f32
        # reassociation on near-zero grads.
        state, ref_step, fused_step = _setup(tiles=(4, 2))
        rays, target = _rays(27)
        _compare_one_step(state, ref_step, fused_step, rays, target, atol=8e-4)

    def test_shard_map_matches_single_device(self):
        """8-way rays mesh: MSE terms pmean, TV global-sum pre-scaling."""
        from swnerf_tpu.parallel.mesh import RAYS_AXIS, make_mesh, shard_map_train_step

        cfg = _cfg()
        field = make_dnerf_field(cfg, fused=False)
        rcfg = RenderConfig(n_samples=8, n_importance=8, perturb=0.0,
                            white_bkgd=True, raw_noise_std=0.0,
                            coarse_contributes=False)
        opt = make_optimizer(lrate=5e-3)
        params = {"coarse": field.init(jax.random.PRNGKey(0)), "fine": None}
        state = init_train_state(params, opt)
        rays, target = _rays(32)
        key = jax.random.PRNGKey(7)
        nt = jnp.float32(0.61)

        single = make_fused_dnerf_step(cfg, rcfg, opt, add_tv_loss=True,
                                       tv_loss_weight=1e-2, interpret=True,
                                       compute_dtype=jnp.float32)
        s_single, m_single = single(state, rays, target, nt, key)

        mesh = make_mesh(jax.devices()[:8])
        sharded = shard_map_train_step(
            make_fused_dnerf_step(cfg, rcfg, opt, add_tv_loss=True,
                                  tv_loss_weight=1e-2, interpret=True,
                                  compute_dtype=jnp.float32,
                                  axis_name=RAYS_AXIS),
            mesh, n_extra_rep=1,
        )
        s_shard, m_shard = jax.jit(sharded)(state, rays, target, nt, key)
        for k in ("loss", "tv", "total_loss"):
            assert float(m_single[k]) == pytest.approx(
                float(m_shard[k]), rel=1e-4, abs=1e-8
            ), k
        for a, b in zip(jax.tree.leaves(s_single.params),
                        jax.tree.leaves(s_shard.params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4)

    def test_multi_step_trains(self):
        state, _, fused_step = _setup(noise=0.5)
        rays, target = _rays(32)
        key = jax.random.PRNGKey(3)
        first = None
        for _ in range(15):
            state, metrics = fused_step(state, rays, target, jnp.float32(0.4), key)
            if first is None:
                first = float(metrics["total_loss"])
        last = float(metrics["total_loss"])
        assert np.isfinite(last) and last < first, (first, last)
