"""CLI-level data-parallelism tests: the four trainers shard their per-step
ray batch over the 8-device (simulated) mesh, and the sharded run produces
the same training trajectory as the single-device run.

The reference has no distribution at all (single cuda:0, SURVEY.md §2.7);
these tests pin the greenfield behavior: ``python -m
swnerf_tpu.pipelines.run_nerf`` on a multi-chip host trains on every chip.
"""

import json
import os

import numpy as np
import jax
import pytest
import torch

from tests.test_config_data import _write_blender_dataset
from tests.test_pipeline import _base_args


@pytest.fixture
def dataset(tmp_path):
    data = tmp_path / "data"
    _write_blender_dataset(str(data), n=3, size=8)
    return data


def _load_sd(path):
    ckpt = torch.load(str(path), map_location="cpu", weights_only=False)
    return {k: np.asarray(v) for k, v in ckpt["network_fn_state_dict"].items()}


def _train_vanilla(dataset, logs, monkeypatch, parallel: bool, extra=()):
    from swnerf_tpu.pipelines.run_nerf import train

    monkeypatch.setenv("SWNERF_MAX_ITERS", "11")
    monkeypatch.setenv("SWNERF_DATA_PARALLEL", "1" if parallel else "0")
    train(_base_args(dataset, logs, list(extra)))
    return _load_sd(logs / "tiny" / "000010.tar")


class TestShardedCLI:
    def test_mesh_policy(self, monkeypatch):
        from swnerf_tpu.parallel import data_parallel_mesh

        assert jax.device_count() >= 8
        mesh = data_parallel_mesh(1024)
        assert mesh is not None and mesh.devices.size == jax.device_count()
        monkeypatch.setenv("SWNERF_DATA_PARALLEL", "0")
        assert data_parallel_mesh(1024) is None

    def test_vanilla_pool_sharded_matches_single(self, tmp_path, dataset, monkeypatch):
        """use_batching path: 10 sharded steps == 10 single-device steps."""
        sd_par = _train_vanilla(dataset, tmp_path / "par", monkeypatch, True,
                                ["--N_importance", "4"])
        sd_single = _train_vanilla(dataset, tmp_path / "single", monkeypatch, False,
                                   ["--N_importance", "4"])
        assert sd_par.keys() == sd_single.keys()
        for k in sd_par:
            np.testing.assert_allclose(sd_par[k], sd_single[k], atol=2e-5, err_msg=k)

    def test_llff_ndc_pool_sharded_matches_single(self, tmp_path, monkeypatch):
        """LLFF dataset + NDC projection + pooled batching under the mesh —
        the fern-shaped combination (run.py:433-455,600-653): the rays are
        NDC-projected INSIDE the sharded jit, so the projection must
        partition over the rays axis like everything else."""
        from swnerf_tpu.data.synthetic import write_llff_scene
        from swnerf_tpu.pipelines.run_nerf import train

        data = tmp_path / "llff"
        write_llff_scene(str(data), n_images=6, size=8, n_samples=16)

        def run(tag, parallel):
            logs = tmp_path / tag
            monkeypatch.setenv("SWNERF_MAX_ITERS", "11")
            monkeypatch.setenv("SWNERF_DATA_PARALLEL", "1" if parallel else "0")
            train([
                "--expname", "tiny", "--basedir", str(logs),
                "--datadir", str(data), "--dataset_type", "llff",
                "--factor", "1", "--llffhold", "3",
                "--use_viewdirs",
                "--netdepth", "2", "--netwidth", "32",
                "--netdepth_fine", "2", "--netwidth_fine", "32",
                "--multires", "4", "--multires_views", "2",
                "--N_rand", "16", "--N_samples", "8", "--N_importance", "4",
                "--chunk", "64",
                "--i_weights", "10", "--i_print", "5",
                "--i_video", "100000", "--i_testset", "100000",
                "--precrop_iters", "0",
            ])
            return _load_sd(logs / "tiny" / "000010.tar")

        sd_par = run("par", True)
        sd_single = run("single", False)
        assert sd_par.keys() == sd_single.keys()
        for k in sd_par:
            np.testing.assert_allclose(sd_par[k], sd_single[k], atol=2e-5, err_msg=k)

    def test_vanilla_image_sharded_matches_single(self, tmp_path, dataset, monkeypatch):
        """no_batching path (per-image pixel sampling, precrop curriculum)."""
        sd_par = _train_vanilla(dataset, tmp_path / "par", monkeypatch, True,
                                ["--no_batching"])
        sd_single = _train_vanilla(dataset, tmp_path / "single", monkeypatch, False,
                                   ["--no_batching"])
        for k in sd_par:
            np.testing.assert_allclose(sd_par[k], sd_single[k], atol=2e-5, err_msg=k)

    def test_fused_step_sharded_cli(self, tmp_path, dataset, monkeypatch):
        """run_nerf's fused two-kernel train step under the 8-device mesh:
        SWNERF_FUSED_STEP=force-interpret routes the Pallas kernels through
        interpret mode so the CPU mesh executes them via shard_map (the
        GSPMD path can't partition Mosaic custom calls). Covers the
        kernels-under-a-mesh interaction end-to-end at the CLI surface."""
        from swnerf_tpu.pipelines.run_nerf import train

        monkeypatch.setenv("SWNERF_MAX_ITERS", "3")
        monkeypatch.setenv("SWNERF_FUSED_STEP", "force-interpret")
        monkeypatch.setenv("SWNERF_DATA_PARALLEL", "1")
        logs = tmp_path / "logs"
        m = train(_base_args(dataset, logs, [
            # smallest fused-supported shape: skips=(4,) needs netdepth >= 6,
            # netwidth % 128 == 0
            "--netdepth", "6", "--netwidth", "128",
            "--netdepth_fine", "6", "--netwidth_fine", "128",
            "--N_importance", "4", "--N_samples", "4",
            "--i_weights", "2",
        ]))
        assert np.isfinite(m["total_loss"])
        assert (logs / "tiny" / "000002.tar").exists()

    def test_precision_warm_start_schedule(self, tmp_path, dataset, monkeypatch, capsys):
        """SWNERF_FUSED_DTYPE_SCHEDULE=f32@K: the f32 autodiff step runs
        iters 1..K, then the fused step takes over — the mitigation for
        bf16's measured early-convergence lag (PERFORMANCE.md). On the CPU
        mesh force-interpret stands in for the real bf16 kernels; the test
        pins the dispatch plumbing (both paths advance the same TrainState
        across the switch, chunk boundaries respect K) at the CLI surface."""
        from swnerf_tpu.pipelines.run_nerf import train

        monkeypatch.setenv("SWNERF_MAX_ITERS", "9")
        monkeypatch.setenv("SWNERF_FUSED_STEP", "force-interpret")
        monkeypatch.setenv("SWNERF_FUSED_DTYPE_SCHEDULE", "f32@4")
        monkeypatch.setenv("SWNERF_DATA_PARALLEL", "1")
        logs = tmp_path / "logs"
        m = train(_base_args(dataset, logs, [
            "--netdepth", "6", "--netwidth", "128",
            "--netdepth_fine", "6", "--netwidth_fine", "128",
            "--N_importance", "4", "--N_samples", "4",
            "--i_weights", "8",
        ]))
        out = capsys.readouterr().out
        assert "Precision warm-start: f32 autodiff step through iter 4" in out
        assert np.isfinite(m["total_loss"])
        ckpt = torch.load(str(logs / "tiny" / "000008.tar"),
                          map_location="cpu", weights_only=False)
        assert ckpt["global_step"] == 8

    def test_warm_start_schedule_rejects_bad_spec(self, tmp_path, dataset, monkeypatch):
        from swnerf_tpu.pipelines.run_nerf import train

        monkeypatch.setenv("SWNERF_MAX_ITERS", "3")
        monkeypatch.setenv("SWNERF_FUSED_STEP", "force-interpret")
        monkeypatch.setenv("SWNERF_FUSED_DTYPE_SCHEDULE", "bf16@x")
        with pytest.raises(ValueError, match="SWNERF_FUSED_DTYPE_SCHEDULE"):
            train(_base_args(dataset, tmp_path / "logs", [
                "--netdepth", "6", "--netwidth", "128",
                "--netdepth_fine", "6", "--netwidth_fine", "128",
                "--N_importance", "4", "--N_samples", "4",
            ]))

    def test_uneven_batch_shards(self, tmp_path, dataset, monkeypatch):
        """N_rand not divisible by the device count still trains on the
        largest divisor mesh (e.g. N_rand=20 on 8 devices -> 5 chips; the
        reference bouncingballs config uses N_rand=500 -> 5 of 8)."""
        from swnerf_tpu.pipelines.run_nerf import train

        monkeypatch.setenv("SWNERF_MAX_ITERS", "7")
        monkeypatch.setenv("SWNERF_DATA_PARALLEL", "1")
        logs = tmp_path / "logs"
        args = [a if a != "16" else "20" for a in _base_args(dataset, logs)]
        train(args + ["--no_batching"])
        recs = [
            json.loads(l)
            for l in (logs / "tiny" / "metrics.jsonl").read_text().strip().splitlines()
        ]
        assert recs and all(np.isfinite(r["total_loss"]) for r in recs)


class TestMultiStepDispatch:
    """K train steps fused into one lax.scan dispatch must reproduce the
    per-step loop exactly (same fold_in(rng, step) keys, same artifacts on
    the same iterations)."""

    def _run(self, dataset, logs, monkeypatch, k, extra=()):
        from swnerf_tpu.pipelines.run_nerf import train

        monkeypatch.setenv("SWNERF_MAX_ITERS", "11")
        monkeypatch.setenv("SWNERF_STEPS_PER_DISPATCH", str(k))
        monkeypatch.setenv("SWNERF_DATA_PARALLEL", "0")
        train(_base_args(dataset, logs, list(extra)))
        return _load_sd(logs / "tiny" / "000010.tar")

    def test_pool_scan_matches_per_step(self, tmp_path, dataset, monkeypatch):
        sd_scan = self._run(dataset, tmp_path / "scan", monkeypatch, 4,
                            ["--N_importance", "4"])
        sd_step = self._run(dataset, tmp_path / "step", monkeypatch, 1,
                            ["--N_importance", "4"])
        for key in sd_scan:
            np.testing.assert_array_equal(sd_scan[key], sd_step[key], err_msg=key)

    def test_image_scan_matches_per_step(self, tmp_path, dataset, monkeypatch):
        sd_scan = self._run(dataset, tmp_path / "scan", monkeypatch, 4, ["--no_batching"])
        sd_step = self._run(dataset, tmp_path / "step", monkeypatch, 1, ["--no_batching"])
        for key in sd_scan:
            np.testing.assert_array_equal(sd_scan[key], sd_step[key], err_msg=key)

    def test_scan_with_mesh(self, tmp_path, dataset, monkeypatch):
        """Scan dispatch composes with the rays mesh (K batches sharded on
        axis 1) and still matches single-device single-step training."""
        from swnerf_tpu.pipelines.run_nerf import train

        monkeypatch.setenv("SWNERF_MAX_ITERS", "11")
        monkeypatch.setenv("SWNERF_STEPS_PER_DISPATCH", "5")
        monkeypatch.setenv("SWNERF_DATA_PARALLEL", "1")
        train(_base_args(dataset, tmp_path / "meshscan"))
        sd_mesh = _load_sd(tmp_path / "meshscan" / "tiny" / "000010.tar")
        sd_ref = self._run(dataset, tmp_path / "refrun", monkeypatch, 1)
        for key in sd_mesh:
            np.testing.assert_allclose(
                sd_mesh[key], sd_ref[key], atol=2e-5, err_msg=key
            )

    def test_dnerf_scan_matches_per_step(self, tmp_path, monkeypatch):
        from tests.test_config_data import _write_blender_dataset
        from swnerf_tpu.pipelines.run_dnerf import train

        data = tmp_path / "ddata"
        _write_blender_dataset(str(data), n=3, size=8, dynamic=True)
        dnerf_args = TestShardedDnerfFamily()._dnerf_args
        monkeypatch.setenv("SWNERF_MAX_ITERS", "11")
        monkeypatch.setenv("SWNERF_DATA_PARALLEL", "0")
        sds = {}
        for tag, k in (("scan", "4"), ("step", "1")):
            monkeypatch.setenv("SWNERF_STEPS_PER_DISPATCH", k)
            logs = tmp_path / tag
            train(dnerf_args(data, logs, ["--add_tv_loss"]))
            ckpt = torch.load(
                str(logs / "tiny" / "000010.tar"), map_location="cpu", weights_only=False
            )
            sds[tag] = {kk: np.asarray(v) for kk, v in ckpt["network_fn_state_dict"].items()}
        for key in sds["scan"]:
            np.testing.assert_array_equal(sds["scan"][key], sds["step"][key], err_msg=key)

    def test_chunking_respects_cadences(self):
        from swnerf_tpu.pipelines.common import chunk_until_event

        # i=1, print every 5: chunks 4@.. wait — k = 5 - ((1-1) % 5) = 5
        assert chunk_until_event(1, 1000, 20, (5,)) == 5
        assert chunk_until_event(6, 1000, 3, (5,)) == 3
        assert chunk_until_event(9, 1000, 3, (5,)) == 2  # stops AT 10
        assert chunk_until_event(999, 1000, 20, (10000,)) == 1  # n_iters cap
        assert chunk_until_event(1, 1000, 20, (0, 7)) == 7  # zero cadence ignored


class TestShardedDnerfFamily:
    def _dnerf_args(self, data_root, log_root, extra=()):
        return [
            "--expname", "tiny",
            "--basedir", str(log_root),
            "--datadir", str(data_root),
            "--dataset_type", "blender",
            "--nerf_type", "direct_temporal",
            "--white_bkgd", "--use_viewdirs",
            "--netdepth", "2", "--netwidth", "32",
            "--netdepth_fine", "2", "--netwidth_fine", "32",
            "--multires", "4", "--multires_views", "2",
            "--N_rand", "16", "--N_samples", "8", "--N_iter", "10",
            "--chunk", "64", "--testskip", "1",
            "--i_weights", "10", "--i_print", "5",
            "--i_video", "100000", "--i_testset", "100000", "--i_img", "100000",
            "--precrop_iters", "0",
        ] + list(extra)

    @pytest.fixture
    def dyn_dataset(self, tmp_path):
        data = tmp_path / "ddata"
        _write_blender_dataset(str(data), n=3, size=8, dynamic=True)
        return data

    def test_dnerf_sharded_matches_single(self, tmp_path, dyn_dataset, monkeypatch):
        from swnerf_tpu.pipelines.run_dnerf import train

        monkeypatch.setenv("SWNERF_MAX_ITERS", "11")
        sds = {}
        for tag, par in (("par", "1"), ("single", "0")):
            monkeypatch.setenv("SWNERF_DATA_PARALLEL", par)
            logs = tmp_path / tag
            train(self._dnerf_args(dyn_dataset, logs, ["--add_tv_loss"]))
            ckpt = torch.load(
                str(logs / "tiny" / "000010.tar"), map_location="cpu", weights_only=False
            )
            sds[tag] = {k: np.asarray(v) for k, v in ckpt["network_fn_state_dict"].items()}
        for k in sds["par"]:
            np.testing.assert_allclose(
                sds["par"][k], sds["single"][k], atol=2e-5, err_msg=k
            )
