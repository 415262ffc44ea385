"""Checkpoint compatibility tests: .tar round trips, torch-forward parity,
and optimizer-state conversion."""

import os
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from swnerf_tpu.models import (
    DNeRFConfig,
    TNeRFConfig,
    VanillaNeRFConfig,
    make_dnerf_field,
    make_tnerf_field,
    make_vanilla_field,
)
from swnerf_tpu.train import make_optimizer, make_train_step
from swnerf_tpu.train.checkpoint import (
    adam_to_torch_dict,
    find_checkpoints,
    load_tar,
    params_to_state_dict,
    save_tar,
    state_dict_to_params,
    torch_dict_to_adam,
)
from swnerf_tpu.train.loop import init_train_state

torch = pytest.importorskip("torch")


def _tiny_vanilla():
    cfg = VanillaNeRFConfig(netdepth=3, netwidth=16, skips=(1,), multires=2, multires_views=1)
    field = make_vanilla_field(cfg)
    return cfg, field, field.init(jax.random.PRNGKey(0))


class TestStateDictRoundTrip:
    def test_vanilla(self):
        cfg, field, params = _tiny_vanilla()
        sd = params_to_state_dict("vanilla", params)
        assert "pts_linears.0.weight" in sd
        assert sd["pts_linears.0.weight"].shape == (16, cfg.input_ch)
        params2 = state_dict_to_params("vanilla", sd, params)
        for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(params2)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_dnerf_names(self):
        cfg = DNeRFConfig(netdepth=3, netwidth=16, skips=(1,), multires=2, multires_views=1)
        params = make_dnerf_field(cfg).init(jax.random.PRNGKey(0))
        sd = params_to_state_dict("direct_temporal", params)
        assert "_occ.pts_linears.0.weight" in sd
        assert "_time.0.weight" in sd
        assert "_time_out.bias" in sd
        p2 = state_dict_to_params("direct_temporal", sd, params)
        for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(p2)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_tnerf_names(self):
        cfg = TNeRFConfig(netdepth=6, net_dim=16, multires=2, multires_views=1)
        params = make_tnerf_field(cfg).init(jax.random.PRNGKey(0))
        sd = params_to_state_dict("tnerf", params)
        assert "layers.0.0.weight" in sd
        assert "density.0.weight" in sd and "color.0.bias" in sd
        p2 = state_dict_to_params("tnerf", sd, params)
        for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(p2)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


class TestTorchForwardParity:
    def test_vanilla_trunk_matches_torch(self):
        """Load our weights into an independently-built torch module with the
        reference architecture; forward outputs must match to fp32."""
        import torch.nn as tnn
        import torch.nn.functional as tF

        cfg, field, params = _tiny_vanilla()
        sd = params_to_state_dict("vanilla", params)

        class TorchTrunk(tnn.Module):
            def __init__(s):
                super().__init__()
                W, D, in_ch, in_v = cfg.netwidth, cfg.netdepth, cfg.input_ch, cfg.input_ch_views
                s.pts_linears = tnn.ModuleList(
                    [tnn.Linear(in_ch, W)]
                    + [
                        tnn.Linear(W + in_ch, W) if i in cfg.skips else tnn.Linear(W, W)
                        for i in range(D - 1)
                    ]
                )
                s.views_linears = tnn.ModuleList([tnn.Linear(in_v + W, W // 2)])
                s.feature_linear = tnn.Linear(W, W)
                s.alpha_linear = tnn.Linear(W, 1)
                s.rgb_linear = tnn.Linear(W // 2, 3)

            def forward(s, pts, views):
                h = pts
                for i, l in enumerate(s.pts_linears):
                    h = tF.relu(l(h))
                    if i in cfg.skips:
                        h = torch.cat([pts, h], -1)
                alpha = s.alpha_linear(h)
                feat = s.feature_linear(h)
                h = tF.relu(s.views_linears[0](torch.cat([feat, views], -1)))
                return torch.cat([s.rgb_linear(h), alpha], -1)

        tm = TorchTrunk()
        tm.load_state_dict({k: torch.from_numpy(v) for k, v in sd.items()})

        rng = np.random.default_rng(0)
        pts_emb = rng.standard_normal((20, cfg.input_ch)).astype(np.float32)
        views_emb = rng.standard_normal((20, cfg.input_ch_views)).astype(np.float32)

        with torch.no_grad():
            want = tm(torch.from_numpy(pts_emb), torch.from_numpy(views_emb)).numpy()

        from swnerf_tpu.models.vanilla import apply_vanilla_trunk

        got = np.asarray(
            apply_vanilla_trunk(params, cfg, jnp.asarray(pts_emb), jnp.asarray(views_emb))
        )
        np.testing.assert_allclose(got, want, atol=1e-5)


class TestTarIO:
    def test_full_checkpoint_roundtrip(self, tmp_path):
        cfg, field, params_c = _tiny_vanilla()
        params = {"coarse": params_c, "fine": field.init(jax.random.PRNGKey(1))}
        opt = make_optimizer(5e-4, 250)
        state = init_train_state(params, opt)

        # Take a few real steps so moments are nonzero.
        from swnerf_tpu.render import RenderConfig
        from tests.test_render import _make_rays

        rcfg = RenderConfig(n_samples=8, n_importance=4, perturb=0.0)
        step_fn = jax.jit(make_train_step(field, rcfg, opt))
        rays = _make_rays()
        target = jnp.zeros((16, 3))
        for _ in range(3):
            state, _ = step_fn(state, rays, target, jax.random.PRNGKey(0))

        groups = [("vanilla", "coarse"), ("vanilla", "fine")]
        path = str(tmp_path / "000003.tar")
        save_tar(
            path,
            {
                "global_step": int(state.step),
                "network_fn_state_dict": params_to_state_dict("vanilla", state.params["coarse"]),
                "network_fine_state_dict": params_to_state_dict("vanilla", state.params["fine"]),
                "optimizer_state_dict": adam_to_torch_dict(
                    state.opt_state, state.params, groups, lr=5e-4
                ),
            },
        )

        # torch can read it natively.
        ckpt_t = torch.load(path, map_location="cpu", weights_only=False)
        assert ckpt_t["global_step"] == 3
        assert isinstance(ckpt_t["network_fn_state_dict"]["pts_linears.0.weight"], torch.Tensor)
        assert 0 in ckpt_t["optimizer_state_dict"]["state"]

        # And we can restore an identical TrainState.
        ckpt = load_tar(path)
        params2 = {
            "coarse": state_dict_to_params("vanilla", ckpt["network_fn_state_dict"], params["coarse"]),
            "fine": state_dict_to_params("vanilla", ckpt["network_fine_state_dict"], params["fine"]),
        }
        opt_state2, step2 = torch_dict_to_adam(
            ckpt["optimizer_state_dict"], params2, groups, state.opt_state
        )
        assert step2 == 3
        for a, b in zip(jax.tree.leaves(state.params), jax.tree.leaves(params2)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree.leaves(state.opt_state), jax.tree.leaves(opt_state2)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=0)

        # Resuming training from the restored state matches exactly.
        from swnerf_tpu.train.loop import TrainState

        s1, m1 = step_fn(state, rays, target, jax.random.PRNGKey(9))
        s2, m2 = step_fn(
            TrainState(jnp.asarray(step2, jnp.int32), params2, opt_state2),
            rays,
            target,
            jax.random.PRNGKey(9),
        )
        for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-7)

    def test_native_checkpoint_roundtrip(self, tmp_path):
        from swnerf_tpu.train.checkpoint import load_native, save_native
        from swnerf_tpu.train.loop import init_train_state
        from swnerf_tpu.train import make_optimizer

        cfg, field, params_c = _tiny_vanilla()
        params = {"coarse": params_c, "fine": None}
        opt = make_optimizer()
        state = init_train_state(params, opt)
        p = str(tmp_path / "ckpt.msgpack")
        save_native(p, state, extra={"note": "x"})

        fresh = init_train_state(
            {"coarse": field.init(jax.random.PRNGKey(9)), "fine": None}, opt
        )
        restored, extra = load_native(p, fresh, {"note": ""})
        assert extra["note"] == "x"
        for a, b in zip(jax.tree.leaves(state), jax.tree.leaves(restored)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_orbax_checkpoint_roundtrip(self, tmp_path):
        from swnerf_tpu.train.checkpoint import load_orbax, save_orbax
        from swnerf_tpu.train.loop import init_train_state
        from swnerf_tpu.train import make_optimizer

        cfg, field, params_c = _tiny_vanilla()
        params = {"coarse": params_c, "fine": None}
        opt = make_optimizer()
        state = init_train_state(params, opt)
        p = str(tmp_path / "000007.orbax")
        save_orbax(p, state, extra={"global_step": 7})
        assert os.path.isdir(p)

        fresh = init_train_state(
            {"coarse": field.init(jax.random.PRNGKey(9)), "fine": None}, opt
        )
        restored, extra = load_orbax(p, fresh, {"global_step": 0})
        assert int(extra["global_step"]) == 7
        for a, b in zip(jax.tree.leaves(state), jax.tree.leaves(restored)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_ckpt_formats_parsing(self, monkeypatch):
        """The SWNERF_CKPT_FORMAT comma-set grammar + aliases, and the
        fail-fast on unknown names."""
        import pytest

        from swnerf_tpu.train.checkpoint import ckpt_formats, tar_enabled

        monkeypatch.setenv("SWNERF_CKPT_FORMAT", "both")
        assert ckpt_formats() == {"tar", "native"}
        monkeypatch.setenv("SWNERF_CKPT_FORMAT", "all")
        assert ckpt_formats() == {"tar", "native", "orbax"}
        monkeypatch.setenv("SWNERF_CKPT_FORMAT", "orbax,tar")
        assert ckpt_formats() == {"tar", "orbax"} and tar_enabled()
        monkeypatch.setenv("SWNERF_CKPT_FORMAT", "orbax")
        assert not tar_enabled()
        monkeypatch.setenv("SWNERF_CKPT_FORMAT", "zarr")
        with pytest.raises(ValueError, match="SWNERF_CKPT_FORMAT"):
            ckpt_formats()

    def test_find_checkpoints(self, tmp_path):
        d = tmp_path / "exp"
        d.mkdir()
        for n in ("000100.tar", "000050.tar"):
            (d / n).write_bytes(b"x")
        found = find_checkpoints(str(tmp_path), "exp")
        assert [f.split("/")[-1] for f in found] == ["000050.tar", "000100.tar"]
        assert find_checkpoints(str(tmp_path), "exp", ft_path="/some/x.tar") == ["/some/x.tar"]

    def test_find_checkpoints_mixed_formats(self, tmp_path):
        """Native .msgpack snapshots interleave by iteration; a .tar sorts
        after its same-iteration .msgpack sibling (compat bias), and .tmp
        partials are ignored."""
        d = tmp_path / "exp"
        d.mkdir()
        for n in ("000100.tar", "000100.msgpack", "000150.msgpack",
                  "000050.tar", "000200.msgpack.tmp"):
            (d / n).write_bytes(b"x")
        (d / "000175.orbax").mkdir()  # finalized orbax save (a directory)
        (d / "000180.orbax.orbax-checkpoint-tmp-12").mkdir()  # in-progress
        found = [f.split("/")[-1] for f in find_checkpoints(str(tmp_path), "exp")]
        assert found == ["000050.tar", "000100.msgpack", "000100.tar",
                         "000150.msgpack", "000175.orbax"]

    def test_find_checkpoints_numeric_order(self, tmp_path):
        """Iterations past the 06d padding must still order numerically
        ('1000000' > '990000' even though it sorts first lexicographically)."""
        d = tmp_path / "exp"
        d.mkdir()
        for n in ("990000.tar", "1000000.tar", "000500.tar"):
            (d / n).write_bytes(b"x")
        found = [f.split("/")[-1] for f in find_checkpoints(str(tmp_path), "exp")]
        assert found == ["000500.tar", "990000.tar", "1000000.tar"]

    def test_native_checkpoint_config_mismatch(self, tmp_path):
        """Resuming a native snapshot into a differently-configured model
        must raise a clear ValueError, not flax's opaque crash (missing
        subtree) or a silent mis-restore (same tree, wrong widths)."""
        import pytest
        from swnerf_tpu.train.checkpoint import load_native, save_native
        from swnerf_tpu.train.loop import init_train_state
        from swnerf_tpu.train import make_optimizer
        from swnerf_tpu.models import VanillaNeRFConfig, make_vanilla_field

        cfg, field, params_c = _tiny_vanilla()
        opt = make_optimizer()
        # Snapshot written WITH a fine net...
        state = init_train_state(
            {"coarse": params_c, "fine": field.init(jax.random.PRNGKey(1))}, opt
        )
        p = str(tmp_path / "ckpt.msgpack")
        save_native(p, state, extra={"global_step": 3})
        # ...resumed by a fine-less config: structure mismatch.
        fineless = init_train_state({"coarse": params_c, "fine": None}, opt)
        with pytest.raises(ValueError, match="mismatch"):
            load_native(p, fineless, {"global_step": 0})
        # Same tree shape but different layer widths: leaf-shape mismatch.
        wide_cfg = VanillaNeRFConfig(
            netdepth=cfg.netdepth, netwidth=cfg.netwidth * 2, skips=cfg.skips,
            multires=cfg.multires, multires_views=cfg.multires_views,
        )
        wfield = make_vanilla_field(wide_cfg)
        wide = init_train_state(
            {"coarse": wfield.init(jax.random.PRNGKey(0)),
             "fine": wfield.init(jax.random.PRNGKey(1))}, opt
        )
        with pytest.raises(ValueError, match="shape"):
            load_native(p, wide, {"global_step": 0})
