"""Tensor (model) parallelism tests: Megatron-style alternating col/row
weight sharding over a 2-D (rays, model) mesh (parallel/tensor.py).

The reference has no distribution at all (single cuda:0, SURVEY.md §2.7);
TP is greenfield TPU capability for user-scaled ``--netwidth`` fields.
These tests pin (a) the spec assignment rules, (b) that the weights are
REALLY sharded on device (not silently replicated), and (c) that the
``SWNERF_TENSOR_PARALLEL=2`` CLI trains the same trajectory as the
single-device run.
"""

import numpy as np
import jax
import pytest
from jax.sharding import PartitionSpec as P

from tests.test_config_data import _write_blender_dataset
from tests.test_pipeline import _base_args


@pytest.fixture
def dataset(tmp_path):
    data = tmp_path / "data"
    _write_blender_dataset(str(data), n=3, size=8)
    return data


def _vanilla_params(W=32, D=8):
    from swnerf_tpu.models import VanillaNeRFConfig
    from swnerf_tpu.models.vanilla import init_vanilla_params

    cfg = VanillaNeRFConfig(netdepth=D, netwidth=W, multires=4, multires_views=2)
    return init_vanilla_params(jax.random.PRNGKey(0), cfg), cfg


class TestSpecs:
    def test_trunk_alternation_and_boundaries(self):
        """D=8, skip after layer 4: layer 0 col; the layer BEFORE the skip
        input (4) and the trunk's last layer (7) are row (their outputs
        must be replicated for the concat / the heads); the skip-input
        layer 5 is col again (its fan_in W+in_ch is never sharded)."""
        from swnerf_tpu.parallel import mlp_param_specs

        params, _ = _vanilla_params()
        specs = mlp_param_specs(params, n_model=2)
        tr = specs["pts_linears"]
        assert tr[0]["w"] == P(None, "model") and tr[0]["b"] == P("model")
        assert tr[1]["w"] == P("model", None) and tr[1]["b"] == P()
        assert tr[4]["w"] == P("model", None)  # segment end before the skip
        assert tr[5]["w"] == P(None, "model")  # skip-input layer re-starts col
        assert tr[7]["w"] == P("model", None)  # trunk end: heads need replicated h
        # Heads replicated.
        assert specs["alpha_linear"]["w"] == P()
        assert specs["rgb_linear"]["w"] == P()
        assert specs["feature_linear"]["w"] == P()

    def test_indivisible_dims_degrade_to_replicated(self):
        """views_linears fan_in (in_ch_views + W) doesn't divide the model
        axis -> that stack's row assignment degrades to replicated instead
        of erroring; same for any odd width."""
        from swnerf_tpu.parallel import mlp_param_specs

        params, _ = _vanilla_params(W=32)
        specs = mlp_param_specs(params, n_model=2)
        # single-layer stack, forced row, fan_in = 15+32 = 47 (odd) -> rep
        assert specs["views_linears"][0]["w"] == P()
        # A width no axis divides: everything replicated, nothing raises.
        params33, _ = _vanilla_params(W=33)
        specs33 = mlp_param_specs(params33, n_model=2)
        assert all(l["w"] == P() for l in specs33["pts_linears"][1:])

    def test_setup_requires_enough_devices(self):
        from swnerf_tpu.parallel import tensor_parallel_setup
        from swnerf_tpu.train import make_optimizer
        from swnerf_tpu.train.loop import init_train_state

        params, _ = _vanilla_params()
        state = init_train_state({"coarse": params, "fine": None}, make_optimizer())
        with pytest.raises(ValueError):
            tensor_parallel_setup(state, 64, jax.device_count() * 2)


class TestShardedState:
    def test_params_and_adam_moments_really_sharded(self):
        """After setup, the trunk weights and their Adam mu/nu live sharded
        over the model axis (per-shard byte footprint actually drops);
        heads and schedule state stay replicated."""
        from swnerf_tpu.parallel import MODEL_AXIS, tensor_parallel_setup
        from swnerf_tpu.train import make_optimizer
        from swnerf_tpu.train.loop import init_train_state

        params, _ = _vanilla_params()
        state = init_train_state({"coarse": params, "fine": None}, make_optimizer())
        mesh, shardings, state = tensor_parallel_setup(state, 64, 2, quiet=True)
        assert mesh.shape[MODEL_AXIS] == 2

        w0 = state.params["coarse"]["pts_linears"][0]["w"]
        assert w0.sharding.spec == P(None, MODEL_AXIS)
        # One shard holds half the columns.
        shard = w0.addressable_shards[0]
        assert shard.data.shape == (w0.shape[0], w0.shape[1] // 2)

        adam = state.opt_state[0]
        mu0 = adam.mu["coarse"]["pts_linears"][0]["w"]
        assert mu0.sharding.spec == P(None, MODEL_AXIS)
        assert adam.mu["coarse"]["alpha_linear"]["w"].sharding.spec == P()
        assert int(adam.count) == 0


class TestPartitionedCompute:
    def test_hlo_partitions_the_matmuls(self):
        """The compiled module must contain model-axis collectives and
        half-width dots — proof GSPMD partitioned the trunk instead of
        all-gathering the weights and computing replicated."""
        from swnerf_tpu.models.vanilla import apply_vanilla_trunk
        from swnerf_tpu.parallel import make_mesh_2d, param_shardings
        from jax.sharding import NamedSharding

        params, cfg = _vanilla_params(W=64)
        mesh = make_mesh_2d(4, 2)
        pshard = param_shardings(mesh, params)
        params_dev = jax.tree.map(jax.device_put, params, pshard)
        rep = NamedSharding(mesh, P())

        x = jax.random.normal(jax.random.PRNGKey(1), (32, cfg.input_ch))
        v = jax.random.normal(jax.random.PRNGKey(2), (32, cfg.input_ch_views))

        fn = jax.jit(
            lambda p, a, b: apply_vanilla_trunk(p, cfg, a, b),
            in_shardings=(pshard, rep, rep),
            out_shardings=rep,
        )
        txt = fn.lower(params_dev, x, v).compile().as_text()
        assert "all-reduce" in txt
        # A column-sharded [in, 64] layer runs as a per-device [in, 32] dot.
        assert "f32[32,32]" in txt or "32,32]{1,0} dot" in txt
        # And the math still matches the unsharded apply.
        ref = apply_vanilla_trunk(params, cfg, x, v)
        np.testing.assert_allclose(
            np.asarray(fn(params_dev, x, v)), np.asarray(ref), atol=1e-5
        )


class TestTensorParallelCLI:
    def _train(self, dataset, logs, monkeypatch, tp: int, extra=()):
        import torch

        from swnerf_tpu.pipelines.run_nerf import train

        monkeypatch.setenv("SWNERF_MAX_ITERS", "11")
        if tp > 1:
            monkeypatch.setenv("SWNERF_TENSOR_PARALLEL", str(tp))
        else:
            monkeypatch.delenv("SWNERF_TENSOR_PARALLEL", raising=False)
            monkeypatch.setenv("SWNERF_DATA_PARALLEL", "0")
        train(_base_args(dataset, logs, list(extra)))
        ckpt = torch.load(str(logs / "tiny" / "000010.tar"),
                          map_location="cpu", weights_only=False)
        return {k: np.asarray(v) for k, v in ckpt["network_fn_state_dict"].items()}

    def test_cli_tp2_matches_single(self, tmp_path, dataset, monkeypatch):
        """10 steps of SWNERF_TENSOR_PARALLEL=2 (2-way model x 4-way rays)
        == 10 single-device steps, to fp32 partial-sum reassociation."""
        extra = ["--netdepth", "8", "--N_importance", "4"]
        sd_tp = self._train(dataset, tmp_path / "tp", monkeypatch, 2, extra)
        sd_single = self._train(dataset, tmp_path / "single", monkeypatch, 0, extra)
        assert sd_tp.keys() == sd_single.keys()
        for k in sd_tp:
            np.testing.assert_allclose(sd_tp[k], sd_single[k], atol=2e-4, err_msg=k)

    def test_cli_tp2_w512_matches_single(self, tmp_path, dataset, monkeypatch):
        """The width TP exists FOR: at ``--netwidth 512`` (2x the reference
        production width, the regime where one chip's VMEM-resident fused
        kernel stops paying — PERFORMANCE.md 'TP rationale') the 2-way
        model sharding still reproduces the single-device 10-step
        trajectory. At W=512 every trunk fan_in/fan_out divides the model
        axis, so nothing silently degrades to replicated: assert that too."""
        from swnerf_tpu.parallel import mlp_param_specs

        params, _ = _vanilla_params(W=512, D=8)
        specs = mlp_param_specs(params, n_model=2)
        assert all(
            P() not in (l["w"],) for l in specs["pts_linears"]
        ), "W=512 trunk must be fully model-sharded"

        extra = ["--netwidth", "512", "--netwidth_fine", "512",
                 "--netdepth", "8", "--N_importance", "4"]
        sd_tp = self._train(dataset, tmp_path / "tp", monkeypatch, 2, extra)
        sd_single = self._train(dataset, tmp_path / "single", monkeypatch, 0, extra)
        assert sd_tp.keys() == sd_single.keys()
        assert sd_tp["pts_linears.0.weight"].shape == (512, 27)  # multires 4
        for k in sd_tp:
            np.testing.assert_allclose(sd_tp[k], sd_single[k], atol=2e-4, err_msg=k)

    def test_cli_tp2_dnerf_matches_single(self, tmp_path, monkeypatch):
        """SWNERF_TENSOR_PARALLEL=2 on run_dnerf (deformation + canonical
        nets BOTH model-sharded, TV loss on) == single-device."""
        import torch

        from swnerf_tpu.pipelines.run_dnerf import train

        data = tmp_path / "data"
        _write_blender_dataset(str(data), n=3, size=8, dynamic=True)
        base = [
            "--datadir", str(data), "--dataset_type", "blender",
            "--nerf_type", "direct_temporal", "--white_bkgd",
            "--use_viewdirs", "--netdepth", "8", "--netwidth", "32",
            "--multires", "4", "--multires_views", "2",
            "--N_rand", "16", "--N_samples", "8", "--chunk", "64",
            "--testskip", "1", "--add_tv_loss",
            "--i_weights", "10", "--i_print", "5",
            "--i_video", "100000", "--i_testset", "100000",
            "--i_img", "100000", "--precrop_iters", "0",
            "--precrop_iters_time", "0",
        ]
        monkeypatch.setenv("SWNERF_MAX_ITERS", "11")
        sds = {}
        for name, tp in (("tp", 2), ("single", 0)):
            if tp:
                monkeypatch.setenv("SWNERF_TENSOR_PARALLEL", str(tp))
            else:
                monkeypatch.delenv("SWNERF_TENSOR_PARALLEL", raising=False)
                monkeypatch.setenv("SWNERF_DATA_PARALLEL", "0")
            logs = tmp_path / name
            train(["--expname", "d", "--basedir", str(logs)] + base)
            ckpt = torch.load(str(logs / "d" / "000010.tar"),
                              map_location="cpu", weights_only=False)
            sds[name] = {k: np.asarray(v)
                         for k, v in ckpt["network_fn_state_dict"].items()}
        monkeypatch.delenv("SWNERF_DATA_PARALLEL", raising=False)
        assert sds["tp"].keys() == sds["single"].keys()
        for k in sds["tp"]:
            np.testing.assert_allclose(sds["tp"][k], sds["single"][k],
                                       atol=2e-4, err_msg=k)

    def test_cli_tp2_multires_matches_single(self, tmp_path, monkeypatch):
        """SWNERF_TENSOR_PARALLEL=2 on run_multires: every pyramid level's
        field + Adam moments model-shard over a shared 2-D mesh while the
        phase-1 pixel batches / phase-2 patches shard over rays. Both
        phases match the single-device trajectory; same Adam sign-flip
        tolerance story as test_multires.py::test_sharded_matches_single
        (tiny patch grads whose sign flips under reduction reassociation
        cost a full ±lr per element). Unlike that DP test, phase-2 step 1
        here is NOT computed from identical params: phase 1 already ran
        2 TP Adam steps per level, whose row-sharded partial-sum rounding
        Adam turns into O(lr) param moves — so step 1 only gets a few-1e-3
        relative budget (the bit-level TP math is pinned by
        test_cli_tp2_matches_single / test_hlo_partitions_the_matmuls)."""
        import json

        import torch

        from swnerf_tpu.pipelines.run_multires import train

        data = tmp_path / "data"
        _write_blender_dataset(str(data), n=4, size=64, dynamic=True)
        monkeypatch.setenv("SWNERF_PHASE1_ITERS", "2")
        monkeypatch.setenv("SWNERF_MAX_ITERS", "5")
        base = [
            "--datadir", str(data), "--dataset_type", "blender",
            "--white_bkgd", "--use_viewdirs",
            "--nerf_type", "direct_temporal",
            "--netdepth", "2", "--netwidth", "16",
            "--N_rand", "16", "--N_samples", "4",
            "--chunk", "4096", "--testskip", "1",
            "--layer_num", "3", "--global_optimization_epoch", "2",
            "--i_weights", "4", "--i_print", "1",
            "--i_video", "100000", "--i_testset", "100000",
            "--i_img", "100000", "--no_batching",
        ]
        sds = {}
        for tag, tp in (("tp", 2), ("single", 0)):
            if tp:
                monkeypatch.setenv("SWNERF_TENSOR_PARALLEL", str(tp))
            else:
                monkeypatch.delenv("SWNERF_TENSOR_PARALLEL", raising=False)
                monkeypatch.setenv("SWNERF_DATA_PARALLEL", "0")
            logs = tmp_path / tag
            train(["--expname", "mr", "--basedir", str(logs)] + base)
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
        monkeypatch.delenv("SWNERF_DATA_PARALLEL", raising=False)
        assert sds["tp"].keys() == sds["single"].keys()
        assert len(sds["tp_metrics"]) == len(sds["single_metrics"]) > 0
        first_p, first_s = sds["tp_metrics"][0], sds["single_metrics"][0]
        assert first_p["step"] == 1
        for key in ("global_loss", "total_loss", "loss_layer_0"):
            np.testing.assert_allclose(
                first_p[key], first_s[key], rtol=2e-2, err_msg=f"step 1 {key}"
            )
        for mp, ms in zip(sds["tp_metrics"], sds["single_metrics"]):
            np.testing.assert_allclose(
                mp["total_loss"], ms["total_loss"], rtol=0.2,
                err_msg=f"step {mp['step']} total_loss",
            )
        # 2 phase-1 + 4 joint Adam steps x lr 5e-4, two-sided (a sign-flipped
        # near-zero grad moves the two runs in OPPOSITE lr-sized directions).
        for k in sds["tp"]:
            np.testing.assert_allclose(
                sds["tp"][k], sds["single"][k], atol=2 * 6 * 5e-4, err_msg=k
            )

    def test_cli_tp_resume_roundtrip(self, tmp_path, dataset, monkeypatch):
        """A TP run checkpoints gathered weights; resuming re-shards them."""
        from swnerf_tpu.pipelines.run_nerf import train

        logs = tmp_path / "logs"
        extra = ["--netdepth", "8", "--i_weights", "5"]
        monkeypatch.setenv("SWNERF_TENSOR_PARALLEL", "2")
        monkeypatch.setenv("SWNERF_MAX_ITERS", "6")
        train(_base_args(dataset, logs, extra))
        monkeypatch.setenv("SWNERF_MAX_ITERS", "11")
        m = train(_base_args(dataset, logs, extra))  # resumes at 5
        assert np.isfinite(m["total_loss"])
