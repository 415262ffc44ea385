"""E2E smoke tests for the D-NeRF and T-NeRF pipelines on a synthetic
dynamic blender dataset."""

import json
import os

import numpy as np
import pytest

from tests.test_config_data import _write_blender_dataset


def _dyn_args(data_root, log_root, extra=()):
    return [
        "--expname", "dyn",
        "--basedir", str(log_root),
        "--datadir", str(data_root),
        "--dataset_type", "blender",
        "--white_bkgd",
        "--use_viewdirs",
        "--netdepth", "2", "--netwidth", "16",
        "--multires", "2", "--multires_views", "1",
        "--N_rand", "16", "--N_samples", "6",
        "--chunk", "64",
        "--testskip", "1",
        "--i_weights", "8", "--i_print", "4",
        "--i_video", "100000", "--i_testset", "100000", "--i_img", "100000",
        "--precrop_iters_time", "3",
        "--no_batching",
    ] + list(extra)


@pytest.fixture
def dyn_dataset(tmp_path):
    data = tmp_path / "data"
    _write_blender_dataset(str(data), n=5, size=8, dynamic=True)
    return data


class TestDNeRFPipeline:
    def test_train_tv_ckpt(self, tmp_path, dyn_dataset, monkeypatch):
        from swnerf_tpu.pipelines.run_dnerf import train

        logs = tmp_path / "logs"
        monkeypatch.setenv("SWNERF_MAX_ITERS", "9")
        train(_dyn_args(dyn_dataset, logs, ["--nerf_type", "direct_temporal", "--add_tv_loss"]))

        import torch

        ckpt = torch.load(
            str(logs / "dyn" / "000008.tar"), map_location="cpu", weights_only=False
        )
        assert ckpt["global_step"] == 8
        sd = ckpt["network_fn_state_dict"]
        assert "_occ.pts_linears.0.weight" in sd and "_time_out.weight" in sd
        assert "network_fine_state_dict" not in ckpt
        recs = [
            json.loads(l)
            for l in (logs / "dyn" / "metrics.jsonl").read_text().strip().splitlines()
        ]
        assert any("tv" in r for r in recs)
        assert all(np.isfinite(r["total_loss"]) for r in recs if "total_loss" in r)

    def test_two_models_hierarchical(self, tmp_path, dyn_dataset, monkeypatch):
        from swnerf_tpu.pipelines.run_dnerf import train

        logs = tmp_path / "logs"
        monkeypatch.setenv("SWNERF_MAX_ITERS", "9")
        train(
            _dyn_args(
                dyn_dataset, logs,
                ["--nerf_type", "direct_temporal", "--N_importance", "4",
                 "--use_two_models_for_fine", "--netdepth_fine", "2", "--netwidth_fine", "16"],
            )
        )
        import torch

        ckpt = torch.load(
            str(logs / "dyn" / "000008.tar"), map_location="cpu", weights_only=False
        )
        assert "network_fine_state_dict" in ckpt

    def test_shared_model_fine_resume(self, tmp_path, dyn_dataset, monkeypatch):
        from swnerf_tpu.pipelines.run_dnerf import train

        logs = tmp_path / "logs"
        monkeypatch.setenv("SWNERF_MAX_ITERS", "9")
        train(_dyn_args(dyn_dataset, logs, ["--nerf_type", "direct_temporal", "--N_importance", "4"]))
        monkeypatch.setenv("SWNERF_MAX_ITERS", "11")
        train(_dyn_args(dyn_dataset, logs, ["--nerf_type", "direct_temporal", "--N_importance", "4"]))

    def test_native_ckpt_resume(self, tmp_path, dyn_dataset, monkeypatch):
        """SWNERF_CKPT_FORMAT=native through run_dnerf: the msgpack resume
        early-return must reproduce create_dnerf's full 8-tuple (its shape
        differs from the other trainers')."""
        from swnerf_tpu.pipelines.run_dnerf import create_dnerf, train
        from swnerf_tpu.utils.config import config_parser_dnerf

        logs = tmp_path / "logs"
        extra = ["--nerf_type", "direct_temporal", "--N_importance", "4"]
        monkeypatch.setenv("SWNERF_CKPT_FORMAT", "native")
        monkeypatch.setenv("SWNERF_MAX_ITERS", "9")
        train(_dyn_args(dyn_dataset, logs, extra))
        exp = logs / "dyn"
        assert (exp / "000008.msgpack").exists()
        assert not (exp / "000008.tar").exists()

        args = config_parser_dnerf().parse_args(_dyn_args(dyn_dataset, logs, extra))
        _, _, _, _, _, state, start, _ = create_dnerf(args)
        assert start == 8 and int(state.step) == 8

        monkeypatch.setenv("SWNERF_MAX_ITERS", "11")
        train(_dyn_args(dyn_dataset, logs, extra))

    def test_render_only_time_sweep(self, tmp_path, dyn_dataset, monkeypatch):
        from swnerf_tpu.pipelines.run_dnerf import train

        logs = tmp_path / "logs"
        monkeypatch.setenv("SWNERF_MAX_ITERS", "9")
        train(_dyn_args(dyn_dataset, logs, ["--nerf_type", "direct_temporal"]))
        monkeypatch.setenv("SWNERF_MAX_ITERS", "9")
        train(_dyn_args(dyn_dataset, logs, ["--nerf_type", "direct_temporal", "--render_only", "--render_factor", "2"]))
        tdir = logs / "dyn" / "time_only"
        assert tdir.exists()
        assert len([f for f in os.listdir(tdir) if f.endswith(".png")]) == 120
        vids = [f for f in os.listdir(logs / "dyn") if f.startswith("time_")]
        assert vids


class TestDNeRFFusedCLI:
    def test_fused_step_sharded_cli(self, tmp_path, dyn_dataset, monkeypatch):
        """run_dnerf's fused train step (custom-vjp canonical kernels + TV)
        under the 8-device mesh via force-interpret. Smallest supported
        shape: skips=(4,) pins netdepth >= 6, netwidth % 128 == 0."""
        from swnerf_tpu.pipelines.run_dnerf import train

        logs = tmp_path / "logs"
        monkeypatch.setenv("SWNERF_MAX_ITERS", "9")
        monkeypatch.setenv("SWNERF_FUSED_STEP", "force-interpret")
        monkeypatch.setenv("SWNERF_DATA_PARALLEL", "1")
        args = [a for a in _dyn_args(dyn_dataset, logs)]
        args[args.index("--netdepth") + 1] = "6"
        args[args.index("--netwidth") + 1] = "128"
        train(args + ["--nerf_type", "direct_temporal", "--N_iter", "20",
                      "--N_importance", "4", "--add_tv_loss",
                      "--tv_loss_weight", "1e-4"])
        recs = [
            json.loads(l)
            for l in (logs / "dyn" / "metrics.jsonl").read_text().strip().splitlines()
        ]
        losses = [r["total_loss"] for r in recs if "total_loss" in r]
        assert losses and all(np.isfinite(l) for l in losses)
        assert (logs / "dyn" / "000008.tar").exists()


class TestTNeRFPipeline:
    def test_train_ckpt_resume(self, tmp_path, dyn_dataset, monkeypatch):
        from swnerf_tpu.pipelines.run_tnerf import train

        logs = tmp_path / "logs"
        monkeypatch.setenv("SWNERF_MAX_ITERS", "9")
        train(_dyn_args(dyn_dataset, logs))
        import torch

        ckpt = torch.load(
            str(logs / "dyn" / "000008.tar"), map_location="cpu", weights_only=False
        )
        sd = ckpt["network_fn_state_dict"]
        assert "layers.0.0.weight" in sd and "color.0.bias" in sd
        assert "network_fine_state_dict" not in ckpt
        # resume
        monkeypatch.setenv("SWNERF_MAX_ITERS", "11")
        train(_dyn_args(dyn_dataset, logs))

    def test_fused_step_sharded_cli(self, tmp_path, dyn_dataset, monkeypatch):
        """run_tnerf's fused single-kernel train step under the 8-device
        mesh (force-interpret routes the Pallas kernel through interpret
        mode; shard_map executes it per ray-shard). Smallest supported
        shape: net_dim is pinned to 128 / skip_layer 4 by create_tnerf, so
        netdepth must be in [6, 8]."""
        from swnerf_tpu.pipelines.run_tnerf import train

        logs = tmp_path / "logs"
        monkeypatch.setenv("SWNERF_MAX_ITERS", "9")
        monkeypatch.setenv("SWNERF_FUSED_STEP", "force-interpret")
        monkeypatch.setenv("SWNERF_DATA_PARALLEL", "1")
        args = [a for a in _dyn_args(dyn_dataset, logs)]
        args[args.index("--netdepth") + 1] = "6"
        args[args.index("--netwidth") + 1] = "128"
        train(args)
        import json

        recs = [
            json.loads(l)
            for l in (logs / "dyn" / "metrics.jsonl").read_text().strip().splitlines()
        ]
        losses = [r["loss"] for r in recs if "loss" in r]
        assert losses and all(np.isfinite(l) for l in losses)
        assert (logs / "dyn" / "000008.tar").exists()

    def test_native_ckpt_resume(self, tmp_path, dyn_dataset, monkeypatch):
        """SWNERF_CKPT_FORMAT=native through run_tnerf's 6-tuple create."""
        from swnerf_tpu.pipelines.run_tnerf import create_tnerf, train
        from swnerf_tpu.utils.config import config_parser_dnerf

        logs = tmp_path / "logs"
        monkeypatch.setenv("SWNERF_CKPT_FORMAT", "native")
        monkeypatch.setenv("SWNERF_MAX_ITERS", "9")
        train(_dyn_args(dyn_dataset, logs))
        exp = logs / "dyn"
        assert (exp / "000008.msgpack").exists()
        assert not (exp / "000008.tar").exists()

        args = config_parser_dnerf().parse_args(_dyn_args(dyn_dataset, logs))
        _, _, _, state, start, _ = create_tnerf(args)
        assert start == 8 and int(state.step) == 8

        monkeypatch.setenv("SWNERF_MAX_ITERS", "11")
        train(_dyn_args(dyn_dataset, logs))

    def test_scan_dispatch_matches_per_step(self, tmp_path, dyn_dataset, monkeypatch):
        """K T-NeRF steps per lax.scan dispatch must reproduce the per-step
        loop exactly (fold_in(rng, step) keys are step-indexed)."""
        import torch

        from swnerf_tpu.pipelines.run_tnerf import train

        def run(sub, k):
            logs = tmp_path / sub
            monkeypatch.setenv("SWNERF_MAX_ITERS", "9")
            monkeypatch.setenv("SWNERF_STEPS_PER_DISPATCH", str(k))
            train(_dyn_args(dyn_dataset, logs))
            ckpt = torch.load(str(logs / "dyn" / "000008.tar"),
                              map_location="cpu", weights_only=False)
            return ckpt["network_fn_state_dict"]

        sd_scan = run("scan", 4)
        sd_step = run("step", 1)
        for key in sd_step:
            np.testing.assert_allclose(
                sd_scan[key].numpy(), sd_step[key].numpy(), atol=1e-6, err_msg=key
            )
