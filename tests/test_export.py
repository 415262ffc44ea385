"""AOT export (utils/export.py): serialize -> deserialize -> same pixels.

The artifact must reproduce the deterministic eval render bit-for-bit
(same program, same platform) and be self-contained (deserialization
never touches swnerf model code)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from swnerf_tpu.models import VanillaNeRFConfig, make_vanilla_field
from swnerf_tpu.models.dnerf import DNeRFConfig, make_dnerf_field
from swnerf_tpu.render import RenderConfig, Rays
from swnerf_tpu.render.core import render_rays
from swnerf_tpu.utils.export import export_renderer, load_renderer


def _rays(n, with_t=False, seed=0):
    rng = np.random.default_rng(seed)
    d = rng.standard_normal((n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    o = np.zeros((n, 3), np.float32)
    o[:, 2] = 4.0
    t = (
        jnp.asarray(rng.uniform(0, 1, (n, 1)).astype(np.float32))
        if with_t
        else None
    )
    return Rays(jnp.asarray(o), jnp.asarray(d), jnp.asarray(d),
                jnp.full((n,), 2.0), jnp.full((n,), 6.0), t)


class TestExportRenderer:
    def test_vanilla_roundtrip_matches_render_rays(self, tmp_path):
        cfg = VanillaNeRFConfig(netdepth=2, netwidth=16, skips=(),
                                multires=4, multires_views=2)
        rcfg = RenderConfig(n_samples=8, n_importance=8, perturb=1.0,
                            white_bkgd=True, raw_noise_std=1.0)
        field = make_vanilla_field(cfg, fused=False)
        params = {"coarse": field.init(jax.random.PRNGKey(0)),
                  "fine": field.init(jax.random.PRNGKey(1))}
        n = 32
        blob = export_renderer(field, params, rcfg, n)

        # File round-trip: the artifact is plain bytes.
        p = tmp_path / "renderer.jaxexport"
        p.write_bytes(blob)
        call = load_renderer(p.read_bytes())

        rays = _rays(n)
        rgb, disp, acc, depth = call(
            params, rays.origins, rays.directions, rays.viewdirs,
            rays.near, rays.far,
        )
        want = render_rays(field, params["coarse"], rays, rcfg.eval_mode(),
                           rng=None, fine_params=params["fine"])
        np.testing.assert_allclose(np.asarray(rgb), np.asarray(want["rgb"]), atol=1e-6)
        np.testing.assert_allclose(np.asarray(disp), np.asarray(want["disp"]), atol=1e-6)
        np.testing.assert_allclose(np.asarray(acc), np.asarray(want["acc"]), atol=1e-6)
        np.testing.assert_allclose(np.asarray(depth), np.asarray(want["depth"]), atol=1e-6)

    def test_dnerf_with_times(self):
        cfg = DNeRFConfig(netdepth=3, netwidth=16, skips=(1,), multires=2,
                          multires_views=1)
        rcfg = RenderConfig(n_samples=8, n_importance=0, perturb=0.0,
                            white_bkgd=True)
        field = make_dnerf_field(cfg, fused=False)
        params = {"coarse": field.init(jax.random.PRNGKey(0)), "fine": None}
        n = 16
        blob = export_renderer(field, params, rcfg, n, with_times=True)
        call = load_renderer(blob)

        rays = _rays(n, with_t=True)
        rgb, disp, acc, depth = call(
            params, rays.origins, rays.directions, rays.viewdirs,
            rays.near, rays.far, rays.times,
        )
        want = render_rays(field, params["coarse"], rays, rcfg.eval_mode(),
                           rng=None)
        np.testing.assert_allclose(np.asarray(rgb), np.asarray(want["rgb"]), atol=1e-6)
        assert np.isfinite(np.asarray(depth)).all()

    def test_wrong_batch_size_rejected(self):
        cfg = VanillaNeRFConfig(netdepth=2, netwidth=16, skips=(),
                                multires=4, multires_views=2)
        rcfg = RenderConfig(n_samples=8, n_importance=0, perturb=0.0)
        field = make_vanilla_field(cfg, fused=False)
        params = {"coarse": field.init(jax.random.PRNGKey(0)), "fine": None}
        call = load_renderer(export_renderer(field, params, rcfg, 16))
        rays = _rays(8)
        with pytest.raises(Exception):
            jax.block_until_ready(call(
                params, rays.origins, rays.directions, rays.viewdirs,
                rays.near, rays.far,
            ))


class TestExportModelCLI:
    def test_train_then_export_then_serve(self, tmp_path, monkeypatch):
        """e2e: train a few iters, export via the CLI, reload the blob and
        render the artifact's fixed-size batch from the trained params."""
        from tests.test_config_data import _write_blender_dataset
        from swnerf_tpu.pipelines.export_model import main as export_main
        from swnerf_tpu.pipelines.run_nerf import train

        data = tmp_path / "data"
        _write_blender_dataset(str(data), n=3, size=8)
        logs = tmp_path / "logs"
        base = [
            "--expname", "tiny", "--basedir", str(logs),
            "--datadir", str(data), "--dataset_type", "blender",
            "--white_bkgd", "--use_viewdirs",
            "--netdepth", "2", "--netwidth", "32",
            "--netdepth_fine", "2", "--netwidth_fine", "32",
            "--multires", "4", "--multires_views", "2",
            "--N_rand", "16", "--N_samples", "8", "--N_importance", "4",
            "--chunk", "64", "--testskip", "1",
            "--i_weights", "10", "--i_print", "5",
            "--i_video", "100000", "--i_testset", "100000",
            "--precrop_iters", "0",
        ]
        monkeypatch.setenv("SWNERF_MAX_ITERS", "11")
        train(base)

        out = tmp_path / "renderer.jaxexport"
        export_main(["--export_out", str(out), "--export_rays", "16"] + base)
        assert out.exists() and out.stat().st_size > 0

        # Serve: auto-resume the params the CLI exported against, call the
        # artifact.
        from swnerf_tpu.pipelines.run_nerf import create_vanilla
        from swnerf_tpu.utils.config import config_parser
        from swnerf_tpu.utils.export import load_renderer

        args = config_parser().parse_args(base)
        _, _, _, _, state, start, _ = create_vanilla(args)
        assert start == 10
        call = load_renderer(out.read_bytes())
        rays = _rays(16)
        rgb, disp, acc, depth = call(
            state.params, rays.origins, rays.directions, rays.viewdirs,
            rays.near, rays.far,
        )
        assert np.asarray(rgb).shape == (16, 3)
        assert np.isfinite(np.asarray(rgb)).all()
        assert np.isfinite(np.asarray(depth)).all()

    def test_export_dnerf_mode(self, tmp_path, monkeypatch):
        """--export_mode dnerf: trains a couple of iters, exports a
        time-conditioned artifact, serves it with the times operand."""
        from tests.test_config_data import _write_blender_dataset
        from swnerf_tpu.pipelines.export_model import main as export_main
        from swnerf_tpu.pipelines.run_dnerf import train

        data = tmp_path / "data"
        _write_blender_dataset(str(data), n=5, size=8, dynamic=True)
        logs = tmp_path / "logs"
        base = [
            "--expname", "dyn", "--basedir", str(logs),
            "--datadir", str(data), "--dataset_type", "blender",
            "--nerf_type", "direct_temporal", "--white_bkgd",
            "--use_viewdirs", "--netdepth", "2", "--netwidth", "16",
            "--multires", "2", "--multires_views", "1",
            "--N_rand", "16", "--N_samples", "6", "--chunk", "64",
            "--testskip", "1", "--i_weights", "8", "--i_print", "4",
            "--i_video", "100000", "--i_testset", "100000",
            "--i_img", "100000", "--precrop_iters_time", "0",
            "--no_batching",
        ]
        monkeypatch.setenv("SWNERF_MAX_ITERS", "9")
        train(base)

        out = tmp_path / "dnerf.jaxexport"
        export_main(["--export_out", str(out), "--export_rays", "8",
                     "--export_mode", "dnerf"] + base)

        from swnerf_tpu.pipelines.run_dnerf import create_dnerf
        from swnerf_tpu.utils.config import config_parser_dnerf
        from swnerf_tpu.utils.export import load_renderer

        args = config_parser_dnerf().parse_args(base)
        _, _, _, _, _, state, start, _ = create_dnerf(args)
        assert start == 8
        call = load_renderer(out.read_bytes())
        rays = _rays(8, with_t=True)
        rgb, disp, acc, depth = call(
            state.params, rays.origins, rays.directions, rays.viewdirs,
            rays.near, rays.far, rays.times,
        )
        assert np.asarray(rgb).shape == (8, 3)
        assert np.isfinite(np.asarray(rgb)).all()

    def test_export_tnerf_mode(self, tmp_path, monkeypatch):
        """--export_mode tnerf: single time-conditioned pass artifact."""
        from tests.test_config_data import _write_blender_dataset
        from swnerf_tpu.pipelines.export_model import main as export_main
        from swnerf_tpu.pipelines.run_tnerf import create_tnerf, train
        from swnerf_tpu.utils.config import config_parser_dnerf
        from swnerf_tpu.utils.export import load_renderer

        data = tmp_path / "data"
        _write_blender_dataset(str(data), n=5, size=8, dynamic=True)
        logs = tmp_path / "logs"
        base = [
            "--expname", "dyn", "--basedir", str(logs),
            "--datadir", str(data), "--dataset_type", "blender",
            "--white_bkgd", "--use_viewdirs",
            "--netdepth", "2", "--netwidth", "16",
            "--multires", "2", "--multires_views", "1",
            "--N_rand", "16", "--N_samples", "6", "--chunk", "64",
            "--testskip", "1", "--i_weights", "8", "--i_print", "4",
            "--i_video", "100000", "--i_testset", "100000",
            "--i_img", "100000", "--precrop_iters_time", "0",
            "--no_batching",
        ]
        monkeypatch.setenv("SWNERF_MAX_ITERS", "9")
        train(base)

        out = tmp_path / "tnerf.jaxexport"
        export_main(["--export_out", str(out), "--export_rays", "8",
                     "--export_mode", "tnerf"] + base)

        args = config_parser_dnerf().parse_args(base)
        _, _, _, state, start, _ = create_tnerf(args)
        assert start == 8
        call = load_renderer(out.read_bytes())
        rays = _rays(8, with_t=True)
        rgb, disp, acc, depth = call(
            state.params, rays.origins, rays.directions, rays.viewdirs,
            rays.near, rays.far, rays.times,
        )
        assert np.asarray(rgb).shape == (8, 3)
        assert np.isfinite(np.asarray(rgb)).all()


    def test_export_multires_mode(self, tmp_path, monkeypatch):
        """--export_mode multires: one artifact per pyramid level; each
        serves pixel-exact vs render_rays on that level's field/params."""
        from tests.test_config_data import _write_blender_dataset
        from swnerf_tpu.pipelines.export_model import main as export_main
        from swnerf_tpu.pipelines.run_multires import create_multires, train
        from swnerf_tpu.pipelines.common import load_scene
        from swnerf_tpu.utils.config import config_parser_dnerf
        from swnerf_tpu.utils.export import load_renderer

        data = tmp_path / "data"
        _write_blender_dataset(str(data), n=4, size=32, dynamic=True)
        logs = tmp_path / "logs"
        base = [
            "--expname", "mr", "--basedir", str(logs),
            "--datadir", str(data), "--dataset_type", "blender",
            "--white_bkgd", "--use_viewdirs",
            "--nerf_type", "direct_temporal",
            "--netdepth", "2", "--netwidth", "16",
            "--N_rand", "16", "--N_samples", "4", "--chunk", "4096",
            "--testskip", "1", "--layer_num", "2",
            "--global_optimization_epoch", "1",
            "--i_weights", "4", "--i_print", "2",
            "--i_video", "100000", "--i_testset", "100000",
            "--i_img", "100000", "--no_batching",
        ]
        monkeypatch.setenv("SWNERF_PHASE1_ITERS", "1")
        monkeypatch.setenv("SWNERF_MAX_ITERS", "5")
        train(base)

        out = tmp_path / "mr.jaxexport"
        paths = export_main(["--export_out", str(out), "--export_rays", "8",
                             "--export_mode", "multires"] + base)
        assert paths == [f"{out}.L0", f"{out}.L1"]

        args = config_parser_dnerf().parse_args(base)
        scene = load_scene(args)
        _, fields, params_all, _o, _os, _hwf, rcfg, start = create_multires(
            args, scene
        )
        assert start == 4
        rays = _rays(8, with_t=True)
        for layer, path in enumerate(paths):
            call = load_renderer(open(path, "rb").read())
            rgb, disp, acc, depth = call(
                params_all[layer], rays.origins, rays.directions,
                rays.viewdirs, rays.near, rays.far, rays.times,
            )
            # Reference must be JITTED: the level-0 multires embedding uses
            # 20 freqs (2^19-radian sin/cos args) where XLA:CPU's fused trig
            # range reduction differs from the eager per-op path by O(0.1).
            # A jitted reference matches to ~1 ULP, not bit-exactly: the
            # round-tripped StableHLO recompiles with its own fusion choices
            # (same atol=1e-6 contract as the other export tests above).
            ref = jax.jit(
                lambda p, r: render_rays(
                    fields[layer], p["coarse"], r, rcfg.eval_mode(), rng=None,
                    fine_params=p["fine"],
                )
            )(params_all[layer], rays)
            np.testing.assert_allclose(np.asarray(rgb), np.asarray(ref["rgb"]),
                                       atol=1e-6)
            assert np.isfinite(np.asarray(rgb)).all()


class TestCrossPlatform:
    def test_multi_platform_artifact_runs_on_cpu(self):
        """platforms=["cpu","tpu"]: one artifact lowered for both; the cpu
        branch executes here (the tpu branch ships in the same blob)."""
        cfg = VanillaNeRFConfig(netdepth=2, netwidth=16, skips=(),
                                multires=4, multires_views=2)
        rcfg = RenderConfig(n_samples=8, n_importance=0, perturb=0.0,
                            white_bkgd=True)
        field = make_vanilla_field(cfg, fused=False)
        params = {"coarse": field.init(jax.random.PRNGKey(0)), "fine": None}
        blob = export_renderer(field, params, rcfg, 8,
                               platforms=["cpu", "tpu"])
        call = load_renderer(blob)
        rays = _rays(8)
        rgb, _, _, _ = call(params, rays.origins, rays.directions,
                            rays.viewdirs, rays.near, rays.far)
        want = render_rays(field, params["coarse"], rays, rcfg.eval_mode(),
                           rng=None)
        np.testing.assert_allclose(np.asarray(rgb), np.asarray(want["rgb"]),
                                   atol=1e-6)
