"""Pyramid ops tests + MultiRes pipeline e2e smoke test."""

import json
import os

import numpy as np
import jax.numpy as jnp
import pytest

from swnerf_tpu.ops.pyramid import (
    gaussian_blur,
    gaussian_kernel,
    generate_gaussian_pyramid,
    generate_laplacian_pyramid,
    reconstruct_from_pyramid,
)
from tests.test_config_data import _write_blender_dataset


class TestPyramid:
    def test_kernel_normalized(self):
        k = np.asarray(gaussian_kernel(3, 1.0))
        assert k.shape == (3, 3)
        assert k.sum() == pytest.approx(1.0, abs=1e-6)
        assert k[1, 1] == k.max()

    def test_blur_preserves_mean_and_shape(self, rng_np):
        x = rng_np.uniform(0, 1, (2, 16, 16, 3)).astype(np.float32)
        y = np.asarray(gaussian_blur(jnp.asarray(x)))
        assert y.shape == x.shape
        # Interior mean preserved (SAME padding distorts only borders).
        assert y[:, 4:-4, 4:-4].mean() == pytest.approx(x[:, 4:-4, 4:-4].mean(), abs=0.02)

    def test_pyramid_shapes(self, rng_np):
        x = rng_np.uniform(0, 1, (2, 32, 32, 3)).astype(np.float32)
        bands = generate_laplacian_pyramid(jnp.asarray(x), levels=4)
        assert [b.shape[1] for b in bands] == [32, 16, 8, 4]
        gauss = generate_gaussian_pyramid(jnp.asarray(x), levels=4)
        assert [g.shape[1] for g in gauss] == [32, 16, 8, 4]

    def test_reconstruction_inverts_decomposition(self, rng_np):
        """Laplacian decompose -> reconstruct is exact (the bands carry the
        full residual at every level)."""
        x = rng_np.uniform(0, 1, (1, 32, 32, 3)).astype(np.float32)
        bands = generate_laplacian_pyramid(jnp.asarray(x), levels=4)
        rec = np.asarray(reconstruct_from_pyramid(bands))
        np.testing.assert_allclose(rec, x, atol=1e-5)

    def test_band_energy_ordering(self, rng_np):
        """A smooth image concentrates energy in the low-pass band."""
        yy, xx = np.meshgrid(np.linspace(0, 1, 32), np.linspace(0, 1, 32), indexing="ij")
        smooth = np.stack([yy, xx, yy * xx], -1)[None].astype(np.float32)
        bands = generate_laplacian_pyramid(jnp.asarray(smooth), levels=3)
        energies = [float(jnp.mean(b**2)) for b in bands]
        assert energies[-1] > 10 * energies[0]


class TestMultiResPipeline:
    def test_two_phase_train_and_ckpt(self, tmp_path, monkeypatch):
        from swnerf_tpu.pipelines.run_multires import train

        data = tmp_path / "data"
        # 64x64 so 3 levels stay >= 16px and patches fit.
        _write_blender_dataset(str(data), n=4, size=64, dynamic=True)
        logs = tmp_path / "logs"

        monkeypatch.setenv("SWNERF_PHASE1_ITERS", "2")
        monkeypatch.setenv("SWNERF_MAX_ITERS", "5")
        args = [
            "--expname", "mr",
            "--basedir", str(logs),
            "--datadir", str(data),
            "--dataset_type", "blender",
            "--white_bkgd", "--use_viewdirs",
            "--nerf_type", "direct_temporal",
            "--netdepth", "2", "--netwidth", "16",
            "--N_rand", "16", "--N_samples", "4",
            "--chunk", "4096",
            "--testskip", "1",
            "--layer_num", "3",
            "--global_optimization_epoch", "2",
            "--i_weights", "4", "--i_print", "2",
            "--i_video", "100000", "--i_testset", "100000", "--i_img", "100000",
            "--no_batching",
        ]
        train(args)

        import torch

        ckpt = torch.load(str(logs / "mr" / "000004.tar"), map_location="cpu", weights_only=False)
        assert ckpt["global_step"] == 4
        for l in range(3):
            assert f"network_fn_{l}" in ckpt
            assert f"optimizer_{l}" in ckpt
            assert "_time_out.weight" in ckpt[f"network_fn_{l}"]
        # Level embeddings differ: level 0 pos-embed is 20 freqs (2*20*3+3
        # = 123 in), level 2 is 10 freqs (63 in).
        w0 = ckpt["network_fn_0"]["_occ.pts_linears.0.weight"]
        w2 = ckpt["network_fn_2"]["_occ.pts_linears.0.weight"]
        assert w0.shape[1] == 123 and w2.shape[1] == 63

        # log.txt has both phases.
        log = (logs / "mr" / "log.txt").read_text()
        assert "[PRETRAIN]" in log and "[GLOBAL OPT]" in log

        # resume continues from per-layer keys
        monkeypatch.setenv("SWNERF_MAX_ITERS", "6")
        monkeypatch.setenv("SWNERF_PHASE1_ITERS", "0")
        train(args)

        # Native msgpack snapshot: save at 8 (resuming from the .tar),
        # then resume FROM the msgpack (its list-of-levels payload).
        monkeypatch.setenv("SWNERF_CKPT_FORMAT", "native")
        monkeypatch.setenv("SWNERF_MAX_ITERS", "9")
        args8 = list(args)
        args8[args8.index("--i_weights") + 1] = "8"
        train(args8)
        assert (logs / "mr" / "000008.msgpack").exists()
        monkeypatch.setenv("SWNERF_MAX_ITERS", "10")
        m = train(args8)  # resumes at 8, runs step 9
        assert np.isfinite(m["total_loss"])

        # Re-invoking a finished run exits BEFORE phase 1 (no pretrain burn)
        # and returns the resumed step instead of {}.
        monkeypatch.setenv("SWNERF_PHASE1_ITERS", "100000")  # would hang if run
        monkeypatch.setenv("SWNERF_MAX_ITERS", "9")
        m = train(args8)
        assert m == {"global_step": 8.0}
        monkeypatch.setenv("SWNERF_PHASE1_ITERS", "0")

    def test_small_image_patch_clamp(self, tmp_path, monkeypatch):
        """Images smaller than the 32px base patch clamp it to the largest
        power of two that fits (the reference crashes there:
        multires_dnerf.py:726-733 slices a 32x32 target unconditionally)."""
        from swnerf_tpu.pipelines.run_multires import train

        data = tmp_path / "data"
        _write_blender_dataset(str(data), n=4, size=16, dynamic=True)
        logs = tmp_path / "logs"
        monkeypatch.setenv("SWNERF_PHASE1_ITERS", "1")
        monkeypatch.setenv("SWNERF_MAX_ITERS", "3")
        metrics = train([
            "--expname", "mrs", "--basedir", str(logs), "--datadir", str(data),
            "--dataset_type", "blender", "--white_bkgd", "--use_viewdirs",
            "--nerf_type", "direct_temporal",
            "--netdepth", "2", "--netwidth", "16",
            "--N_rand", "16", "--N_samples", "4",
            "--chunk", "4096", "--testskip", "1",
            "--layer_num", "3", "--global_optimization_epoch", "1",
            "--i_weights", "100000", "--i_print", "2",
            "--i_video", "100000", "--i_testset", "100000", "--i_img", "100000",
            "--no_batching",
        ])
        assert np.isfinite(metrics["total_loss"])

    def test_sharded_matches_single(self, tmp_path, monkeypatch):
        """Both phases under the 8-device rays mesh produce the same
        training trajectory as the single-device run (the other three
        trainers' equivalence guarantee, test_parallel_cli.py).

        Tolerance note: phase-2 patch batches are tiny (16 rays at the
        coarsest level), so some weights see near-zero gradients whose SIGN
        flips under cross-shard reduction reassociation — and Adam turns a
        sign flip into a full ±lr step (5e-4) for that element. Parameters
        therefore get a few-times-lr budget; the per-step LOSSES (the
        forward/grad agreement that matters) are held tight."""
        import json

        import torch

        from swnerf_tpu.pipelines.run_multires import train

        data = tmp_path / "data"
        _write_blender_dataset(str(data), n=4, size=64, dynamic=True)
        monkeypatch.setenv("SWNERF_PHASE1_ITERS", "2")
        monkeypatch.setenv("SWNERF_MAX_ITERS", "5")
        sds = {}
        for tag, par in (("par", "1"), ("single", "0")):
            monkeypatch.setenv("SWNERF_DATA_PARALLEL", par)
            logs = tmp_path / tag
            train([
                "--expname", "mr",
                "--basedir", str(logs),
                "--datadir", str(data),
                "--dataset_type", "blender",
                "--white_bkgd", "--use_viewdirs",
                "--nerf_type", "direct_temporal",
                "--netdepth", "2", "--netwidth", "16",
                "--N_rand", "16", "--N_samples", "4",
                "--chunk", "4096",
                "--testskip", "1",
                "--layer_num", "3",
                "--global_optimization_epoch", "2",
                "--i_weights", "4", "--i_print", "1",
                "--i_video", "100000", "--i_testset", "100000", "--i_img", "100000",
                "--no_batching",
            ])
            ckpt = torch.load(
                str(logs / "mr" / "000004.tar"), map_location="cpu", weights_only=False
            )
            sds[tag] = {
                f"{l}/{k}": np.asarray(v)
                for l in range(3)
                for k, v in ckpt[f"network_fn_{l}"].items()
            }
            sds[tag + "_metrics"] = [
                json.loads(line)
                for line in (logs / "mr" / "metrics.jsonl").read_text().strip().splitlines()
                if "global_loss" in line
            ]
        assert sds["par"].keys() == sds["single"].keys()
        # Step-1 losses (computed from IDENTICAL initial params) agree to
        # reduction-reassociation tolerance; later steps inherit the Adam
        # sign-flip drift and only need to stay in the same ballpark.
        assert len(sds["par_metrics"]) == len(sds["single_metrics"]) > 0
        first_p, first_s = sds["par_metrics"][0], sds["single_metrics"][0]
        assert first_p["step"] == 1
        for key in ("global_loss", "total_loss", "loss_layer_0"):
            np.testing.assert_allclose(
                first_p[key], first_s[key], rtol=1e-4, err_msg=f"step 1 {key}"
            )
        for mp, ms in zip(sds["par_metrics"], sds["single_metrics"]):
            np.testing.assert_allclose(
                mp["total_loss"], ms["total_loss"], rtol=0.2,
                err_msg=f"step {mp['step']} total_loss",
            )
        # Parameters within the Adam sign-flip budget (see docstring):
        # 4 joint steps x lr 5e-4.
        for k in sds["par"]:
            np.testing.assert_allclose(
                sds["par"][k], sds["single"][k], atol=4 * 5e-4, err_msg=k
            )

    def test_fused_phase2_matches_autodiff(self, monkeypatch):
        """The fused joint patch step (forward-only kernel + external-
        cotangent backward kernel per level + fused deformation net,
        make_phase2_step fused=True) reproduces the autodiff step's
        parameter updates — including an identity-embed (-1) level and the
        pyramid-reconstruction global term's gradients through the kernels'
        rgb outputs."""
        import argparse

        import jax
        import optax

        from swnerf_tpu.models import DNeRFConfig, make_dnerf_field
        from swnerf_tpu.pipelines.run_multires import (
            make_phase2_step, supports_fused_phase2,
        )
        from swnerf_tpu.render import RenderConfig
        from swnerf_tpu.train import make_optimizer

        monkeypatch.setenv("SWNERF_FUSED_STEP", "force-interpret")
        L = 2
        cfgs = [
            DNeRFConfig(netdepth=3, netwidth=128, skips=(1,), multires=4,
                        multires_views=2, multires_time=2),
            DNeRFConfig(netdepth=3, netwidth=128, skips=(1,), multires=-1,
                        multires_views=-1, multires_time=-1, i_embed=-1),
        ]
        fields = [make_dnerf_field(c, fused=False) for c in cfgs]
        rcfg = RenderConfig(n_samples=4, n_importance=0, perturb=1.0,
                            raw_noise_std=1.0, white_bkgd=True)
        assert all(supports_fused_phase2(f, rcfg) for f in fields)
        params_all = [
            {"coarse": f.init(jax.random.PRNGKey(i)), "fine": None}
            for i, f in enumerate(fields)
        ]
        opts = [make_optimizer() for _ in range(L)]
        opt_states = [o.init(p) for o, p in zip(opts, params_all)]
        pyr_hwf = [[16, 16, 14.0], [8, 8, 7.0]]
        patch_sizes = [4, 2]
        args = argparse.Namespace()

        rng = np.random.default_rng(0)
        pixels_all, targets_all = [], []
        for ps in patch_sizes:
            ys, xs = np.meshgrid(np.arange(ps), np.arange(ps), indexing="ij")
            pixels_all.append(jnp.asarray(np.stack([ys, xs], -1).reshape(-1, 2).astype(np.int32)))
            targets_all.append(jnp.asarray(rng.uniform(0, 1, (ps, ps, 3)).astype(np.float32)))
        target_full = targets_all[0]
        pose = jnp.asarray(np.eye(4, dtype=np.float32)[:3, :4].copy())
        key = jax.random.PRNGKey(3)

        outs = {}
        for tag, fused in (("fused", True), ("auto", False)):
            step = make_phase2_step(args, fields, opts, rcfg, pyr_hwf,
                                    patch_sizes, 2.0, 6.0, fused=fused)
            # Fresh copies per run: the step donates params/opt_states.
            np_, ns_, metrics = step(
                jax.tree.map(lambda x: jnp.asarray(x) + 0, params_all),
                jax.tree.map(lambda x: jnp.asarray(x) + 0, opt_states),
                pixels_all, targets_all, target_full, pose,
                jnp.float32(0.5), jnp.float32(1.0), key,
            )
            outs[tag] = (np_, {k: float(v) for k, v in metrics.items()})

        mf, ma = outs["fused"][1], outs["auto"][1]
        for k in ma:
            assert abs(mf[k] - ma[k]) < 1e-4 * max(1.0, abs(ma[k])), (k, mf[k], ma[k])
        for a, b in zip(jax.tree.leaves(outs["fused"][0]), jax.tree.leaves(outs["auto"][0])):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-5)

    def test_identity_level_channels(self):
        """Level 3 of the channel list is the identity embedder: first layer
        consumes raw (x) 3 dims + time 1 dim."""
        from swnerf_tpu.pipelines.run_multires import CHANNEL_LIST, _level_cfg

        class A:  # minimal args shim
            netdepth = 2
            netwidth = 16
            use_viewdirs = True
            N_importance = 0
            not_zero_canonical = False

        cfg = _level_cfg(A, CHANNEL_LIST[3])
        assert cfg.input_ch == 3 and cfg.input_ch_time == 1 and cfg.input_ch_views == 3
        cfg0 = _level_cfg(A, CHANNEL_LIST[0])
        assert cfg0.input_ch == 123 and cfg0.input_ch_time == 17
