"""The two-kernel fused train step vs the autodiff reference path: same RNG
stream, same loss, same parameter updates (interpret mode, f32)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from swnerf_tpu.data.synthetic import render_gt
from swnerf_tpu.models import VanillaNeRFConfig, make_vanilla_field
from swnerf_tpu.render import Rays, RenderConfig
from swnerf_tpu.train import make_optimizer, make_train_step
from swnerf_tpu.train.fused_step import make_fused_train_step, supports_fused_step
from swnerf_tpu.train.loop import init_train_state


def _rays(n=32, seed=0):
    rng = np.random.default_rng(seed)
    d = rng.standard_normal((n, 3)).astype(np.float32)
    d[:, 2] = -np.abs(d[:, 2]) - 1.0
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    o = np.zeros((n, 3), np.float32)
    o[:, 2] = 4.0
    rays = Rays(jnp.asarray(o), jnp.asarray(d), jnp.asarray(d),
                jnp.full((n,), 2.0), jnp.full((n,), 6.0), None)
    return rays, render_gt(rays, n_samples=32)


def _setup(n_importance, white_bkgd=True, noise=0.7, two_nets=True, perturb=1.0,
           tiles=(8, 8)):
    cfg = VanillaNeRFConfig(netdepth=3, netwidth=128, skips=(1,), multires=4,
                            multires_views=2)
    field = make_vanilla_field(cfg, fused=False)
    rcfg = RenderConfig(n_samples=8, n_importance=n_importance, perturb=perturb,
                        white_bkgd=white_bkgd, raw_noise_std=noise)
    opt = make_optimizer(lrate=5e-3)
    params = {
        "coarse": field.init(jax.random.PRNGKey(0)),
        "fine": field.init(jax.random.PRNGKey(1)) if (n_importance and two_nets) else None,
    }
    state = init_train_state(params, opt)
    ref_step = make_train_step(field, rcfg, opt)
    fused_step = make_fused_train_step(
        cfg, rcfg, opt, fcfg=cfg if (n_importance and two_nets) else None,
        interpret=True, compute_dtype=jnp.float32,
        rays_per_tile_coarse=tiles[0], rays_per_tile_fine=tiles[1],
    )
    return cfg, rcfg, state, ref_step, fused_step


def _compare_one_step(state, ref_step, fused_step, rays, target, atol):
    key = jax.random.PRNGKey(42)
    s_ref, m_ref = ref_step(state, rays, target, key)
    s_fused, m_fused = fused_step(state, rays, target, key)
    assert float(m_ref["total_loss"]) == pytest.approx(
        float(m_fused["total_loss"]), rel=2e-4
    )
    for k in m_ref:
        assert float(m_ref[k]) == pytest.approx(float(m_fused[k]), rel=5e-3), k
    ref_leaves = jax.tree.leaves(s_ref.params)
    fused_leaves = jax.tree.leaves(s_fused.params)
    assert len(ref_leaves) == len(fused_leaves)
    for a, b in zip(ref_leaves, fused_leaves):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=atol)


class TestFusedStep:
    def test_supports(self):
        cfg = VanillaNeRFConfig(netdepth=3, netwidth=128, skips=(1,), multires=4,
                                multires_views=2)
        rcfg = RenderConfig(n_samples=8, n_importance=8)
        assert supports_fused_step(cfg, cfg, rcfg)
        assert not supports_fused_step(
            VanillaNeRFConfig(netwidth=100), None, rcfg
        )

    def test_hierarchical_two_nets(self):
        _, _, state, ref_step, fused_step = _setup(n_importance=8)
        rays, target = _rays(32)
        _compare_one_step(state, ref_step, fused_step, rays, target, atol=2e-4)

    def test_hierarchical_shared_net(self):
        """fine params slot None -> coarse net serves both passes; grads sum."""
        _, _, state, ref_step, fused_step = _setup(n_importance=8, two_nets=False)
        rays, target = _rays(32)
        _compare_one_step(state, ref_step, fused_step, rays, target, atol=2e-4)

    def test_coarse_only_no_noise_black_bkgd(self):
        _, _, state, ref_step, fused_step = _setup(
            n_importance=0, white_bkgd=False, noise=0.0, perturb=0.0
        )
        rays, target = _rays(32)
        _compare_one_step(state, ref_step, fused_step, rays, target, atol=2e-4)

    @pytest.mark.parametrize("tiles", [(4, 2), (2, 4)])
    def test_sub8_ray_tiles(self, tiles):
        """rays_per_tile < 8: the (8,128) per-ray blocks are revisited over
        8/R grid steps with masked row writes (Mosaic sublane minimum —
        needed so the fine pass (S=192) fits VMEM at small tiles)."""
        _, _, state, ref_step, fused_step = _setup(n_importance=8, tiles=tiles)
        rays, target = _rays(20)  # also exercises ray padding to 24/16-row blocks
        _compare_one_step(state, ref_step, fused_step, rays, target, atol=2e-4)

    def test_ray_count_padding(self):
        """N not divisible by rays_per_tile: padded rays contribute nothing."""
        _, _, state, ref_step, fused_step = _setup(n_importance=8)
        rays, target = _rays(27)  # pads to 32 coarse (R=8) / 28 fine (R=4)
        _compare_one_step(state, ref_step, fused_step, rays, target, atol=2e-4)

    def test_shard_map_matches_single_device(self):
        """The mesh path for the fused step: Pallas kernels can't be GSPMD-
        partitioned, so shard_map runs them per ray-shard and the step
        pmean-reduces grads/metrics (axis_name). Deterministic config
        (perturb=0, noise=0) -> the 8-way sharded update must match the
        single-device one up to reduction reassociation."""
        from swnerf_tpu.parallel.mesh import RAYS_AXIS, make_mesh, shard_map_train_step

        cfg = VanillaNeRFConfig(netdepth=3, netwidth=128, skips=(1,), multires=4,
                                multires_views=2)
        field = make_vanilla_field(cfg, fused=False)
        rcfg = RenderConfig(n_samples=8, n_importance=8, perturb=0.0,
                            white_bkgd=True, raw_noise_std=0.0)
        opt = make_optimizer(lrate=5e-3)
        params = {"coarse": field.init(jax.random.PRNGKey(0)),
                  "fine": field.init(jax.random.PRNGKey(1))}
        state = init_train_state(params, opt)
        rays, target = _rays(32)
        key = jax.random.PRNGKey(7)

        single = make_fused_train_step(cfg, rcfg, opt, fcfg=cfg, interpret=True,
                                       compute_dtype=jnp.float32)
        s_single, m_single = single(state, rays, target, key)

        mesh = make_mesh(jax.devices()[:8])
        sharded = shard_map_train_step(
            make_fused_train_step(cfg, rcfg, opt, fcfg=cfg, interpret=True,
                                  compute_dtype=jnp.float32, axis_name=RAYS_AXIS),
            mesh,
        )
        s_shard, m_shard = jax.jit(sharded)(state, rays, target, key)

        assert float(m_single["total_loss"]) == pytest.approx(
            float(m_shard["total_loss"]), rel=1e-5
        )
        for a, b in zip(jax.tree.leaves(s_single.params), jax.tree.leaves(s_shard.params)):
            # pmean over 8 shards reassociates the f32 reductions, and Adam's
            # sqrt(v)+eps normalization amplifies that on near-zero grads
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4)

    def test_multi_step_trains(self):
        _, _, state, ref_step, fused_step = _setup(n_importance=8, noise=0.5)
        rays, target = _rays(32)
        key = jax.random.PRNGKey(3)
        first = None
        for _ in range(20):
            state, metrics = fused_step(state, rays, target, key)
            if first is None:
                first = float(metrics["total_loss"])
        last = float(metrics["total_loss"])
        assert np.isfinite(last) and last < first, (first, last)


def test_default_tiles_width_adaptive():
    """v5e tile defaults flip at W>256 (benchmarks/tpu_w512_step.py:
    rc4/rf2 wins at W=512, rc16/rf8 at the production W=256)."""
    from swnerf_tpu.models import VanillaNeRFConfig
    from swnerf_tpu.train.fused_step import default_train_tiles

    w256 = VanillaNeRFConfig(netwidth=256)
    w512 = VanillaNeRFConfig(netwidth=512)
    assert default_train_tiles(w256, w256) == ("16", "8")
    assert default_train_tiles(w512, w512) == ("4", "2")
    # a wide fine net alone is enough to flip the regime
    assert default_train_tiles(w256, w512) == ("4", "2")
