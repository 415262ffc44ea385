"""E2E + unit tests for SWNERF_AUTO_RESEED dead-init recovery.

The reference has no equivalent: a dead-density init draw (pre-ReLU sigma
< 0 at every sampled point => exactly-zero gradients) silently wastes the
whole training budget rendering the constant background (3/10 reference
runs on the textured dynamic gate, PARITY_TORCH.md 'Seed pathology'; the
reference's only remedy is the manual --raw_noise_std flag,
d_nerf/run_dnerf.py has no detection at all). Ours detects the flatline
(DeadInitWatchdog) and, with SWNERF_AUTO_RESEED=N, restarts with a
fold_in-derived init — bounded, deterministic, and only before the first
checkpoint exists.

Seed 315 is a verified dead draw AT TEST SCALE for the tiny D-NeRF config
below (max pre-ReLU sigma -0.645 over in-scene ray points at t in
{0,.5,1}); its fold_in(seed,1) recovery draw is alive (+0.98). Pinned by
the scan recorded in VALIDATION.md (round 5).
"""

import json
import os

import numpy as np
import pytest

DEAD_SEED = "315"

ARGS = [
    "--datadir", "",  # filled per-test
    "--dataset_type", "blender",
    "--white_bkgd", "--use_viewdirs",
    "--netdepth", "2", "--netwidth", "16",
    "--multires", "2", "--multires_views", "1",
    "--N_rand", "32", "--N_samples", "8",
    "--chunk", "256", "--testskip", "1",
    "--i_weights", "150", "--i_print", "10",
    "--i_video", "100000", "--i_testset", "100000", "--i_img", "100000",
    "--no_batching", "--nerf_type", "direct_temporal", "--raw_noise_std", "0",
]


@pytest.fixture(scope="module")
def textured_dyn_data(tmp_path_factory):
    from swnerf_tpu.data.synthetic import write_blender_scene

    root = str(tmp_path_factory.mktemp("reseed") / "data")
    write_blender_scene(root, n_train=6, n_val=1, n_test=2, size=16,
                        dynamic=True, scene="textured", white_bkgd=True)
    return root


def _max_sigma_of_ckpt(tar_path, datadir):
    """Max pre-ReLU density over in-scene ray sample points: the direct,
    minibatch-noise-free 'is the field alive' criterion (a dead draw's
    params are exactly frozen — zero gradients — so its sigma stays < 0)."""
    import argparse

    import jax
    import jax.numpy as jnp
    import torch

    from swnerf_tpu.models import DNeRFConfig, make_dnerf_field
    from swnerf_tpu.ops.rays import get_rays_np
    from swnerf_tpu.pipelines.common import load_scene
    from swnerf_tpu.train.checkpoint import state_dict_to_params

    scene = load_scene(argparse.Namespace(
        datadir=datadir, dataset_type="blender_dnerf", half_res=False,
        testskip=1, white_bkgd=True, render_test=False))
    pts_all = []
    for i in scene.i_train[:4]:
        rays_o, rays_d = get_rays_np(scene.H, scene.W, scene.focal,
                                     scene.poses[i, :3, :4])
        z = np.linspace(scene.near, scene.far, 8)
        pts_all.append(
            (rays_o[..., None, :] + rays_d[..., None, :] * z[None, None, :, None])
            .reshape(-1, 3))
    pts_np = np.concatenate(pts_all)
    sel = np.random.default_rng(0).choice(len(pts_np), 4096, replace=False)
    pts = jnp.asarray(pts_np[sel]).reshape(512, 8, 3)
    views = jnp.asarray(pts_np[sel][:512])
    views = views / jnp.linalg.norm(views, axis=-1, keepdims=True)

    cfg = DNeRFConfig(netdepth=2, netwidth=16, skips=(4,), multires=2,
                      multires_views=1, i_embed=0, use_viewdirs=True,
                      output_ch=4, zero_canonical=True)
    field = make_dnerf_field(cfg)
    ckpt = torch.load(tar_path, map_location="cpu", weights_only=False)
    params = state_dict_to_params("direct_temporal",
                                  ckpt["network_fn_state_dict"],
                                  field.init(jax.random.PRNGKey(0)))
    best = -np.inf
    for t in (0.0, 0.5, 1.0):
        raw = field.apply(params, pts, views, jnp.full((512, 1), t))
        raw = raw[0] if isinstance(raw, tuple) else raw
        best = max(best, float(jnp.max(raw[..., 3])))
    return best


class TestAutoReseedE2E:
    def test_dead_seed_detects_restarts_and_recovers(
        self, tmp_path, textured_dyn_data, monkeypatch, capsys
    ):
        from swnerf_tpu.pipelines.run_dnerf import train

        logs = tmp_path / "logs"
        monkeypatch.setenv("SWNERF_SEED", DEAD_SEED)
        monkeypatch.setenv("SWNERF_AUTO_RESEED", "1")
        monkeypatch.setenv("SWNERF_MAX_ITERS", "161")
        # Test-scale watchdog calibration (16px scene: floor ~12.5 dB,
        # minibatch-PSNR noise ~±1.5 dB vs the 400^2 defaults).
        monkeypatch.setenv("SWNERF_WATCHDOG_MIN_ITER", "30")
        monkeypatch.setenv("SWNERF_WATCHDOG_FLOOR", "14.0")
        monkeypatch.setenv("SWNERF_WATCHDOG_SPREAD", "3.0")

        args = list(ARGS)
        args[args.index("--datadir") + 1] = textured_dyn_data
        train(["--expname", "reseed", "--basedir", str(logs)] + args)

        out = capsys.readouterr().out
        # The dead draw was detected BEFORE the first checkpoint (i_weights
        # 150) and restarted exactly once with the fold_in-derived key.
        assert "[AUTO-RESEED] attempt 1/1" in out
        assert "restarting from iter 0" in out

        # Only the recovered attempt ever checkpoints: one tar, step 150.
        import torch

        tars = sorted((logs / "reseed").glob("*.tar"))
        assert [t.name for t in tars] == ["000150.tar"]
        ckpt = torch.load(str(tars[0]), map_location="cpu", weights_only=False)
        assert ckpt["global_step"] == 150

        # The recovered field is ALIVE: positive density somewhere in-scene.
        # Without the restart this is impossible — the dead draw's gradients
        # are exactly zero, so its max sigma stays frozen at -0.645.
        assert _max_sigma_of_ckpt(str(tars[0]), textured_dyn_data) > 0.0

        # Restart-scoped env is restored for the caller.
        assert os.environ.get("SWNERF_RESEED_ATTEMPT") is None

    def test_without_optin_only_warns_and_stays_dead(
        self, tmp_path, textured_dyn_data, monkeypatch, capsys
    ):
        from swnerf_tpu.pipelines.run_dnerf import train

        logs = tmp_path / "logs"
        monkeypatch.setenv("SWNERF_SEED", DEAD_SEED)
        monkeypatch.delenv("SWNERF_AUTO_RESEED", raising=False)
        monkeypatch.setenv("SWNERF_MAX_ITERS", "161")
        monkeypatch.setenv("SWNERF_WATCHDOG_MIN_ITER", "30")
        monkeypatch.setenv("SWNERF_WATCHDOG_FLOOR", "14.0")
        monkeypatch.setenv("SWNERF_WATCHDOG_SPREAD", "3.0")

        args = list(ARGS)
        args[args.index("--datadir") + 1] = textured_dyn_data
        train(["--expname", "dead", "--basedir", str(logs)] + args)

        out = capsys.readouterr().out
        assert "[WARN] PSNR has been flat" in out
        assert "[AUTO-RESEED]" not in out
        # The dead draw's params are frozen: density never comes alive.
        tars = sorted((logs / "dead").glob("*.tar"))
        assert [t.name for t in tars] == ["000150.tar"]
        assert _max_sigma_of_ckpt(str(tars[0]), textured_dyn_data) < 0.0


class TestAutoReseedUnit:
    def test_budget_exhaustion_reraises(self, monkeypatch):
        from swnerf_tpu.pipelines.common import DeadInitDetected, auto_reseed_loop

        monkeypatch.setenv("SWNERF_AUTO_RESEED", "1")
        calls = []

        def always_dead(argv):
            calls.append(os.environ.get("SWNERF_RESEED_ATTEMPT"))
            raise DeadInitDetected("dead")

        with pytest.raises(DeadInitDetected):
            auto_reseed_loop(always_dead, None)
        # Original attempt + exactly one restart, then the raise propagates.
        assert calls == [None, "1"]
        assert os.environ.get("SWNERF_RESEED_ATTEMPT") is None

    def test_seed_key_folds_attempt(self, monkeypatch):
        import jax

        from swnerf_tpu.pipelines.common import seed_key

        monkeypatch.setenv("SWNERF_SEED", "7")
        monkeypatch.delenv("SWNERF_RESEED_ATTEMPT", raising=False)
        base = seed_key()
        monkeypatch.setenv("SWNERF_RESEED_ATTEMPT", "2")
        folded = seed_key()
        assert not np.array_equal(np.asarray(base), np.asarray(folded))
        expect = jax.random.fold_in(jax.random.PRNGKey(7), 2)
        assert np.array_equal(np.asarray(folded), np.asarray(expect))

    def test_success_passes_through(self, monkeypatch):
        from swnerf_tpu.pipelines.common import auto_reseed_loop

        monkeypatch.delenv("SWNERF_AUTO_RESEED", raising=False)
        assert auto_reseed_loop(lambda argv: {"ok": argv}, "x") == {"ok": "x"}
