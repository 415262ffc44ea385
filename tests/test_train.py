"""Training-layer tests: LR schedule golden values, overfit sanity, and
data-parallel equivalence on the simulated 8-device mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from swnerf_tpu.data.synthetic import render_gt
from swnerf_tpu.models import VanillaNeRFConfig, make_vanilla_field
from swnerf_tpu.parallel import make_mesh, shard_batch, shard_train_step
from swnerf_tpu.render import Rays, RenderConfig
from swnerf_tpu.train import (
    exp_decay_schedule,
    make_optimizer,
    make_train_step,
)
from swnerf_tpu.train.loop import init_train_state


def _ray_batch(n=128, seed=0):
    rng = np.random.default_rng(seed)
    d = rng.standard_normal((n, 3)).astype(np.float32)
    d[:, 2] = -np.abs(d[:, 2]) - 1.0
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    o = np.zeros((n, 3), np.float32)
    o[:, 2] = 4.0
    rays = Rays(
        origins=jnp.asarray(o),
        directions=jnp.asarray(d),
        viewdirs=jnp.asarray(d),
        near=jnp.full((n,), 2.0),
        far=jnp.full((n,), 6.0),
        times=None,
    )
    target = render_gt(rays, n_samples=64)
    return rays, target


def _tiny_setup(n_importance=0):
    mcfg = VanillaNeRFConfig(netdepth=4, netwidth=64, skips=(2,), multires=6, multires_views=2)
    field = make_vanilla_field(mcfg)
    cfg = RenderConfig(n_samples=24, n_importance=n_importance, perturb=1.0, white_bkgd=True)
    opt = make_optimizer(lrate=5e-3, lrate_decay=250)
    params = {
        "coarse": field.init(jax.random.PRNGKey(0)),
        "fine": field.init(jax.random.PRNGKey(1)) if n_importance else None,
    }
    state = init_train_state(params, opt)
    step = make_train_step(field, cfg, opt)
    return field, cfg, opt, state, step


class TestSchedule:
    def test_golden_values(self):
        s = exp_decay_schedule(5e-4, 250)
        assert float(s(0)) == pytest.approx(5e-4)
        assert float(s(250_000)) == pytest.approx(5e-5, rel=1e-6)
        assert float(s(125_000)) == pytest.approx(5e-4 * 0.1**0.5, rel=1e-6)

    def test_adam_lr_applied(self):
        """One Adam step from zero-moment on constant grads moves params by
        ~lr in the grad direction."""
        import optax

        opt = make_optimizer(lrate=1e-3, lrate_decay=250)
        p = {"w": jnp.zeros(4)}
        st = opt.init(p)
        g = {"w": jnp.ones(4)}
        up, st = opt.update(g, st, p)
        np.testing.assert_allclose(np.asarray(up["w"]), -1e-3, rtol=1e-4)


class TestOverfit:
    def test_loss_decreases(self):
        _, _, _, state, step = _tiny_setup()
        rays, target = _ray_batch()
        jstep = jax.jit(step)
        key = jax.random.PRNGKey(42)
        first = None
        for i in range(150):
            state, metrics = jstep(state, rays, target, key)
            if first is None:
                first = float(metrics["loss"])
        last = float(metrics["loss"])
        assert np.isfinite(last)
        assert last < first * 0.2, (first, last)

    def test_hierarchical_trains(self):
        _, _, _, state, step = _tiny_setup(n_importance=8)
        rays, target = _ray_batch()
        jstep = jax.jit(step)
        key = jax.random.PRNGKey(0)
        for _ in range(30):
            state, metrics = jstep(state, rays, target, key)
        assert np.isfinite(float(metrics["total_loss"]))
        assert "psnr0" in metrics
        assert int(state.step) == 30

    def test_hierarchical_fine_loss_decreases_with_noise(self):
        """The fine network can start ReLU-dead (all init densities < 0 —
        sigma ~= the alpha-head bias after trunk decay; a known vanilla-NeRF
        seed pathology the reference shares). The reference's recommended
        ``raw_noise_std=1e0`` regularizer unsticks it: with noise, the fine
        loss must strictly decrease."""
        import dataclasses

        from swnerf_tpu.render import RenderConfig
        from swnerf_tpu.models import VanillaNeRFConfig, make_vanilla_field
        from swnerf_tpu.train.loop import init_train_state

        mcfg = VanillaNeRFConfig(netdepth=4, netwidth=64, skips=(2,), multires=6, multires_views=2)
        field = make_vanilla_field(mcfg)
        cfg = RenderConfig(
            n_samples=16, n_importance=16, perturb=1.0, white_bkgd=True, raw_noise_std=1.0
        )
        opt = make_optimizer(lrate=5e-3, lrate_decay=250)
        params = {
            "coarse": field.init(jax.random.PRNGKey(0)),
            "fine": field.init(jax.random.PRNGKey(1)),  # a ReLU-dead seed
        }
        state = init_train_state(params, opt)
        jstep = jax.jit(make_train_step(field, cfg, opt))
        rays, target = _ray_batch()
        key = jax.random.PRNGKey(42)
        first = None
        for _ in range(120):
            state, metrics = jstep(state, rays, target, key)
            if first is None:
                first = float(metrics["loss"])
        assert float(metrics["loss"]) < first * 0.7, (first, float(metrics["loss"]))
        # And the fine params actually moved.
        moved = sum(
            float(jnp.abs(a - b).max())
            for a, b in zip(
                jax.tree.leaves(params["fine"]), jax.tree.leaves(state.params["fine"])
            )
        )
        assert moved > 0

    def test_safe_init_unsticks_dead_seed_without_noise(self, monkeypatch):
        """SWNERF_SAFE_INIT=1 folds the density-head bias positive
        (models/common.py density_bias_floor), removing the per-seed
        ReLU-death coin flip at the source. At the full-size architecture,
        PRNGKey(1) draws an init whose density is negative EVERYWHERE
        (sigma ~= the alpha-head bias after trunk decay) — without the
        raw_noise_std crutch its gradients are exactly zero. The default
        init is untouched (strict reference parity)."""
        from swnerf_tpu.render import RenderConfig
        from swnerf_tpu.models import VanillaNeRFConfig, make_vanilla_field
        from swnerf_tpu.train.loop import init_train_state

        mcfg = VanillaNeRFConfig()  # full 8x256: the decay mechanism bites
        field = make_vanilla_field(mcfg)
        cfg = RenderConfig(
            n_samples=8, n_importance=0, perturb=1.0, white_bkgd=True,
            raw_noise_std=0.0,  # no noise remedy
        )
        opt = make_optimizer(lrate=5e-3, lrate_decay=250)
        jstep = jax.jit(make_train_step(field, cfg, opt))
        rays, target = _ray_batch()
        key = jax.random.PRNGKey(42)

        def coarse_movement(params):
            state = init_train_state(jax.tree.map(jnp.asarray, params), opt)
            state, _ = jstep(state, rays, target, key)
            return sum(
                float(jnp.abs(a - b).max())
                for a, b in zip(
                    jax.tree.leaves(params["coarse"]),
                    jax.tree.leaves(state.params["coarse"]),
                )
            )

        dead_params = {"coarse": field.init(jax.random.PRNGKey(1)), "fine": None}
        sig = field.apply(dead_params["coarse"], jnp.zeros((4, 8, 3)) + 0.3,
                          jnp.ones((4, 3)) / jnp.sqrt(3.0))[0][..., 3]
        assert float(sig.max()) < 0.0  # ReLU-dead everywhere
        assert coarse_movement(dead_params) == 0.0

        monkeypatch.setenv("SWNERF_SAFE_INIT", "1")
        safe_params = {"coarse": field.init(jax.random.PRNGKey(1)), "fine": None}
        # Only the density-head bias differs from the dead init.
        assert float(
            jnp.abs(safe_params["coarse"]["alpha_linear"]["w"]
                    - dead_params["coarse"]["alpha_linear"]["w"]).max()
        ) == 0.0
        assert float(safe_params["coarse"]["alpha_linear"]["b"].min()) >= 0.1
        assert coarse_movement(safe_params) > 0.0


class TestTVLossGolden:
    def test_tv_value_matches_hand_recipe(self):
        """Pin the TV-loss semantics against an independently computed value
        (reference run_dnerf.py:690-725, shared-model mode):

          1. render the batch at its frame time t, keep the z_vals;
          2. re-evaluate the deformation dx at the SAME sample points with
             the neighbor time t_n (frozen z_vals — the reference's
             ``z_vals=extras['z_vals'].detach()`` pass-through, :702-710);
          3. tv = tv_loss_weight * SUM((dx - dx_n)^2)  (a sum, not a mean,
             over all [N_rand, S, 3] elements — run_dnerf.py:716-725).

        The expected value is recomputed here from numpy sampling math plus
        two direct field.apply calls — no render core, no train step."""
        import dataclasses

        from swnerf_tpu.models import DNeRFConfig, make_dnerf_field
        from swnerf_tpu.ops.rays import get_rays_at
        from swnerf_tpu.pipelines.common import Scene
        from swnerf_tpu.pipelines.run_dnerf import make_dnerf_step
        from swnerf_tpu.render import RenderConfig
        from swnerf_tpu.train.loop import init_train_state

        H = W = 4
        K = np.array([[4.0, 0, 2.0], [0, 4.0, 2.0], [0, 0, 1.0]])
        n_imgs, n_rand, n_samp = 3, 8, 6
        rng_np = np.random.default_rng(3)
        images = rng_np.uniform(0, 1, (n_imgs, H, W, 3)).astype(np.float32)
        poses = np.broadcast_to(np.eye(4, dtype=np.float32), (n_imgs, 4, 4)).copy()
        poses[:, 2, 3] = 4.0
        times = np.array([0.0, 0.5, 1.0], np.float32)
        scene = Scene(
            images=images, poses=poses, render_poses=poses, H=H, W=W,
            focal=4.0, K=K, near=2.0, far=6.0,
            i_train=np.arange(n_imgs), i_val=np.array([]), i_test=np.array([]),
            times=times,
        )

        mcfg = DNeRFConfig(
            netdepth=2, netwidth=16, skips=(), multires=2, multires_views=1,
            zero_canonical=True,
        )
        field = make_dnerf_field(mcfg)
        params = {"coarse": field.init(jax.random.PRNGKey(5)), "fine": None}

        # Deterministic everything: no jitter, no density noise, no fine pass.
        rcfg = RenderConfig(
            n_samples=n_samp, n_importance=0, perturb=0.0, raw_noise_std=0.0,
            use_viewdirs=True, white_bkgd=False,
        )
        w_tv = 0.123
        opt = make_optimizer(lrate=0.0, lrate_decay=250)
        step = make_dnerf_step(field, rcfg, opt, scene, True, w_tv)

        img_i, t_n = 1, 0.65  # frame time 0.5, interpolated neighbor 0.65
        pixels = np.stack(
            np.unravel_index(rng_np.choice(H * W, n_rand, replace=False), (H, W)), -1
        ).astype(np.int32)

        # ---- independent recipe (before the step donates the params) ----
        rays_o, rays_d = get_rays_at(jnp.asarray(pixels), H, W, K, poses[img_i][:3, :4])
        rays_o, rays_d = np.asarray(rays_o), np.asarray(rays_d)
        vd = rays_d / np.linalg.norm(rays_d, axis=-1, keepdims=True)
        t_lin = np.linspace(0.0, 1.0, n_samp, dtype=np.float32)
        z = 2.0 * (1.0 - t_lin) + 6.0 * t_lin  # perturb=0 stratified recipe
        pts = rays_o[:, None, :] + rays_d[:, None, :] * z[None, :, None]

        def dx_at(t):
            tcol = jnp.full((n_rand, 1), t, jnp.float32)
            _, aux = field.apply(params["coarse"], jnp.asarray(pts), jnp.asarray(vd), tcol)
            return np.asarray(aux["dx"])

        expected = w_tv * np.sum((dx_at(0.5) - dx_at(t_n)) ** 2)
        assert expected > 0  # the test must not trivially pass on zeros

        state = init_train_state(params, opt)
        _, metrics = step(
            state, jnp.asarray(images), jnp.asarray(poses), jnp.asarray(times),
            img_i, jnp.asarray(pixels), jnp.float32(t_n), jax.random.PRNGKey(0),
        )
        assert float(metrics["tv"]) == pytest.approx(float(expected), rel=1e-5)

    def test_tv_zero_at_canonical_time(self):
        """zero_canonical forces dx == 0 at t == 0 (model.py:144-146), so a
        TV pass between t=0 and neighbor 0 is exactly zero."""
        from swnerf_tpu.models import DNeRFConfig, make_dnerf_field

        mcfg = DNeRFConfig(netdepth=2, netwidth=16, skips=(), multires=2, multires_views=1)
        field = make_dnerf_field(mcfg)
        params = field.init(jax.random.PRNGKey(1))
        pts = jnp.asarray(np.random.default_rng(0).standard_normal((4, 3, 3)), jnp.float32)
        vd = pts[:, 0, :]
        _, aux = field.apply(params, pts, vd, jnp.zeros((4, 1)))
        np.testing.assert_array_equal(np.asarray(aux["dx"]), 0.0)


class TestDataParallel:
    def test_sharded_matches_single(self):
        """The psum-reduced 8-way sharded step equals the single-device step."""
        assert jax.device_count() >= 8
        _, _, _, state0, step = _tiny_setup()
        rays, target = _ray_batch(n=256)
        key = jax.random.PRNGKey(7)

        jstep = jax.jit(step)
        s_single = state0
        for _ in range(3):
            s_single, m_single = jstep(s_single, rays, target, key)

        mesh = make_mesh()
        pstep = shard_train_step(step, mesh, donate_state=False)
        s_par = jax.device_put(state0, jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec()))
        srays, stgt = shard_batch(mesh, (rays, target))
        for _ in range(3):
            s_par, m_par = pstep(s_par, srays, stgt, key)

        for a, b in zip(jax.tree.leaves(s_single.params), jax.tree.leaves(s_par.params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)
        assert float(m_single["loss"]) == pytest.approx(float(m_par["loss"]), abs=1e-5)

    def test_batch_sharding_layout(self):
        mesh = make_mesh()
        rays, target = _ray_batch(n=256)
        srays, stgt = shard_batch(mesh, (rays, target))
        assert len(srays.origins.sharding.device_set) == 8
