"""Forward-only fused eval rendering (render/fused_eval.py) vs the plain
render_rays eval path: identical deterministic images (interpret mode,
f32)."""

import numpy as np
import jax
import jax.numpy as jnp

from swnerf_tpu.models import VanillaNeRFConfig, make_vanilla_field
from swnerf_tpu.render import RenderConfig
from swnerf_tpu.render.core import Rays, render_image


def _rays(n=100, seed=0):
    rng = np.random.default_rng(seed)
    d = rng.standard_normal((n, 3)).astype(np.float32)
    d[:, 2] = -np.abs(d[:, 2]) - 1.0
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    o = np.zeros((n, 3), np.float32)
    o[:, 2] = 4.0
    return Rays(jnp.asarray(o), jnp.asarray(d), jnp.asarray(d),
                jnp.full((n,), 2.0), jnp.full((n,), 6.0), None)


class TestFusedEval:
    def _fields(self):
        cfg = VanillaNeRFConfig(netdepth=3, netwidth=128, skips=(1,),
                                multires=4, multires_views=2)
        plain = make_vanilla_field(cfg, fused=False)
        assert plain.eval_pass is None
        fused = make_vanilla_field(cfg, fused=False, fused_interpret=True)
        assert fused.eval_pass is not None
        return cfg, plain, fused

    def test_matches_plain_path_hierarchical(self):
        cfg, plain, fused = self._fields()
        rcfg = RenderConfig(n_samples=8, n_importance=8, white_bkgd=True)
        params = plain.init(jax.random.PRNGKey(0))
        fine = plain.init(jax.random.PRNGKey(1))
        rays = _rays(100)  # chunk padding exercised (chunk=64)
        a = render_image(plain, params, rays, rcfg, chunk=64, fine_params=fine)
        b = render_image(fused, params, rays, rcfg, chunk=64, fine_params=fine)
        for k in ("rgb", "disp", "acc", "depth"):
            # rtol absorbs the kernel's segment-matmul reduction
            # reassociation in depth/acc (disp is their ratio).
            np.testing.assert_allclose(
                np.asarray(a[k]), np.asarray(b[k]), atol=1e-5, rtol=5e-4,
                err_msg=k,
            )

    def test_matches_plain_path_coarse_only_black(self):
        cfg, plain, fused = self._fields()
        rcfg = RenderConfig(n_samples=8, n_importance=0, white_bkgd=False)
        params = plain.init(jax.random.PRNGKey(0))
        rays = _rays(64)
        a = render_image(plain, params, rays, rcfg, chunk=64)
        b = render_image(fused, params, rays, rcfg, chunk=64)
        for k in ("rgb", "disp", "acc", "depth"):
            # rtol absorbs the kernel's segment-matmul reduction
            # reassociation in depth/acc (disp is their ratio).
            np.testing.assert_allclose(
                np.asarray(a[k]), np.asarray(b[k]), atol=1e-5, rtol=5e-4,
                err_msg=k,
            )

    def test_distinct_fine_field_dims(self):
        """A fine field with different dims routes through its own cfg."""
        cfg, plain, fused = self._fields()
        fcfg = VanillaNeRFConfig(netdepth=4, netwidth=128, skips=(1,),
                                 multires=4, multires_views=2)
        fine_plain = make_vanilla_field(fcfg, fused=False)
        rcfg = RenderConfig(n_samples=8, n_importance=8, white_bkgd=True)
        params = plain.init(jax.random.PRNGKey(0))
        fine = fine_plain.init(jax.random.PRNGKey(1))
        rays = _rays(64)
        a = render_image(plain, params, rays, rcfg, chunk=64, fine_params=fine,
                         fine_field=fine_plain)
        b = render_image(fused, params, rays, rcfg, chunk=64, fine_params=fine,
                         fine_field=fine_plain)
        np.testing.assert_allclose(
            np.asarray(a["rgb"]), np.asarray(b["rgb"]), atol=1e-5
        )

    def test_tnerf_time_conditioned(self):
        """T-NeRF eval pass: per-ray frame time through the kernel's
        [embed(xyz)|embed(t)] constants; matches the plain path."""
        from swnerf_tpu.models.tnerf import TNeRFConfig, make_tnerf_field

        cfg = TNeRFConfig(netdepth=4, net_dim=128, skip_layer=2, multires=4,
                          multires_views=2)
        plain = make_tnerf_field(cfg, fused=False)
        assert plain.eval_pass is None
        fused = make_tnerf_field(cfg, fused=False, fused_interpret=True)
        assert fused.eval_pass is not None and fused.eval_pass.supports_times
        rcfg = RenderConfig(n_samples=8, n_importance=0, white_bkgd=True)
        params = plain.init(jax.random.PRNGKey(0))
        base = _rays(64)
        t = jnp.asarray(
            np.random.default_rng(3).uniform(0, 1, (64, 1)).astype(np.float32)
        )
        rays = base._replace(times=t)
        a = render_image(plain, params, rays, rcfg, chunk=64)
        b = render_image(fused, params, rays, rcfg, chunk=64)
        for k in ("rgb", "disp", "acc", "depth"):
            np.testing.assert_allclose(
                np.asarray(a[k]), np.asarray(b[k]), atol=1e-5, rtol=5e-4,
                err_msg=k,
            )

    def test_dnerf_time_conditioned(self, monkeypatch):
        """D-NeRF eval pass: deformation net + canonical pts-mode kernel
        (interpret via the SWNERF_FUSED_STEP=force-interpret env, as the
        CLI wires it); matches the plain path incl. t==0 rays."""
        from swnerf_tpu.models.dnerf import DNeRFConfig, make_dnerf_field

        cfg = DNeRFConfig(netdepth=3, netwidth=128, skips=(1,), multires=4,
                          multires_views=2)
        plain = make_dnerf_field(cfg, fused=False)
        assert plain.eval_pass is None
        monkeypatch.setenv("SWNERF_FUSED_STEP", "force-interpret")
        fused = make_dnerf_field(cfg, fused=False)
        assert fused.eval_pass is not None and fused.eval_pass.supports_times
        rcfg = RenderConfig(n_samples=8, n_importance=8, white_bkgd=True)
        params = plain.init(jax.random.PRNGKey(0))
        fine = plain.init(jax.random.PRNGKey(1))
        base = _rays(64)
        t = np.random.default_rng(3).uniform(0, 1, (64, 1)).astype(np.float32)
        t[:16] = 0.0  # exercise the zero_canonical mask
        rays = base._replace(times=jnp.asarray(t))
        a = render_image(plain, params, rays, rcfg, chunk=64, fine_params=fine)
        b = render_image(fused, params, rays, rcfg, chunk=64, fine_params=fine)
        for k in ("rgb", "disp", "acc", "depth"):
            np.testing.assert_allclose(
                np.asarray(a[k]), np.asarray(b[k]), atol=1e-5, rtol=5e-4,
                err_msg=k,
            )

    def test_sharded_eval_pass_matches_single_device(self):
        """The fused eval pass under a rays mesh (shard_map over the tile
        axis, render/core.py) must produce pixel-identical output to the
        single-device fused eval — multi-chip eval keeps the kernel instead
        of falling back (VERDICT round-2 weak #3)."""
        from swnerf_tpu.parallel.mesh import data_parallel_mesh

        mesh = data_parallel_mesh(quiet=True)
        if mesh is None:
            import pytest

            pytest.skip("needs >1 device")
        cfg, plain, fused = self._fields()
        rcfg = RenderConfig(n_samples=8, n_importance=8, white_bkgd=True)
        params = plain.init(jax.random.PRNGKey(0))
        fine = plain.init(jax.random.PRNGKey(1))
        rays = _rays(200)  # non-multiple of chunk*ndev: padding exercised
        single = render_image(fused, params, rays, rcfg, chunk=16, fine_params=fine)
        sharded = render_image(
            fused, params, rays, rcfg, chunk=16, fine_params=fine, mesh=mesh
        )
        for k in ("rgb", "disp", "acc", "depth"):
            # Interpret-mode kernels are XLA ops: the lax.map and shard_map
            # compilations may reassociate reductions differently (~1e-7).
            np.testing.assert_allclose(
                np.asarray(single[k]), np.asarray(sharded[k]), atol=1e-5,
                rtol=1e-5, err_msg=k,
            )
        # And the plain path under the same mesh agrees numerically.
        ref = render_image(
            plain, params, rays, rcfg, chunk=16, fine_params=fine, mesh=mesh
        )
        np.testing.assert_allclose(
            np.asarray(ref["rgb"]), np.asarray(sharded["rgb"]), atol=1e-5,
            rtol=5e-4,
        )

    def test_sharded_tnerf_eval_pass(self):
        """Time-conditioned fused eval (T-NeRF) under the mesh."""
        from swnerf_tpu.models.tnerf import TNeRFConfig, make_tnerf_field
        from swnerf_tpu.parallel.mesh import data_parallel_mesh

        mesh = data_parallel_mesh(quiet=True)
        if mesh is None:
            import pytest

            pytest.skip("needs >1 device")
        cfg = TNeRFConfig(netdepth=4, net_dim=128, skip_layer=2, multires=4,
                          multires_views=2)
        fused = make_tnerf_field(cfg, fused=False, fused_interpret=True)
        rcfg = RenderConfig(n_samples=8, n_importance=0, white_bkgd=True)
        params = fused.init(jax.random.PRNGKey(0))
        base = _rays(64)
        t = jnp.asarray(
            np.random.default_rng(3).uniform(0, 1, (64, 1)).astype(np.float32)
        )
        rays = base._replace(times=t)
        single = render_image(fused, params, rays, rcfg, chunk=8)
        sharded = render_image(fused, params, rays, rcfg, chunk=8, mesh=mesh)
        for k in ("rgb", "disp", "acc", "depth"):
            # See test_sharded_eval_pass_matches_single_device: interpret-
            # mode compilations may reassociate reductions (~1e-7).
            np.testing.assert_allclose(
                np.asarray(single[k]), np.asarray(sharded[k]), atol=1e-5,
                rtol=1e-5, err_msg=k,
            )

    def test_eval_tile_invariance(self, monkeypatch):
        """Output is identical across SWNERF_FUSED_TILE_EVAL_* settings —
        the eval tiles are a pure scheduling knob (exercises both the
        masked sub-sublane path at small R and the plain path at R=chunk)."""
        cfg, plain, fused = self._fields()
        rcfg = RenderConfig(n_samples=8, n_importance=8, white_bkgd=True)
        params = plain.init(jax.random.PRNGKey(0))
        fine = plain.init(jax.random.PRNGKey(1))
        rays = _rays(64)
        outs = []
        for rc, rf in ((4, 2), (16, 8), (64, 64)):
            monkeypatch.setenv("SWNERF_FUSED_TILE_EVAL_COARSE", str(rc))
            monkeypatch.setenv("SWNERF_FUSED_TILE_EVAL_FINE", str(rf))
            f = make_vanilla_field(cfg, fused=False, fused_interpret=True)
            outs.append(render_image(f, params, rays, rcfg, chunk=64,
                                     fine_params=fine))
        for o in outs[1:]:
            for k in ("rgb", "disp", "acc", "depth"):
                np.testing.assert_allclose(
                    np.asarray(outs[0][k]), np.asarray(o[k]), atol=1e-6,
                    rtol=1e-6, err_msg=k,
                )

    def test_unsupported_fine_arch_falls_back(self):
        """A fine net the kernel can't express (netwidth % 128 != 0, legal
        in the reference CLI) must route the WHOLE render through the
        generic path instead of feeding the kernel a bad config."""
        cfg, plain, fused = self._fields()
        fcfg = VanillaNeRFConfig(netdepth=3, netwidth=96, skips=(1,),
                                 multires=4, multires_views=2)
        fine_plain = make_vanilla_field(fcfg, fused=False)
        rcfg = RenderConfig(n_samples=8, n_importance=8, white_bkgd=True)
        params = plain.init(jax.random.PRNGKey(0))
        fine = fine_plain.init(jax.random.PRNGKey(1))
        rays = _rays(64)
        a = render_image(plain, params, rays, rcfg, chunk=64, fine_params=fine,
                         fine_field=fine_plain)
        b = render_image(fused, params, rays, rcfg, chunk=64, fine_params=fine,
                         fine_field=fine_plain)
        np.testing.assert_allclose(
            np.asarray(a["rgb"]), np.asarray(b["rgb"]), atol=1e-6
        )


def test_eval_tiles_width_adaptive(monkeypatch):
    """Eval tile defaults flip at W>256 (benchmarks/tpu_eval_tiles.py 512:
    rc8/rf4 at 1405.6 ms/frame beats rc32/rf16 at 1541.5; at W=256 the
    rc32/rf16 default is the measured optimum). Env knobs override either
    regime, eval-specific winning over the shared train knobs."""
    from swnerf_tpu.models import VanillaNeRFConfig
    from swnerf_tpu.render.fused_eval import _eval_tiles

    for var in ("SWNERF_FUSED_TILE_EVAL_COARSE", "SWNERF_FUSED_TILE_EVAL_FINE",
                "SWNERF_FUSED_TILE_COARSE", "SWNERF_FUSED_TILE_FINE"):
        monkeypatch.delenv(var, raising=False)
    assert _eval_tiles(VanillaNeRFConfig(netwidth=256)) == (32, 16)
    assert _eval_tiles(VanillaNeRFConfig(netwidth=512)) == (8, 4)
    assert _eval_tiles(None) == (32, 16)
    monkeypatch.setenv("SWNERF_FUSED_TILE_COARSE", "64")
    assert _eval_tiles(VanillaNeRFConfig(netwidth=512)) == (64, 4)
    monkeypatch.setenv("SWNERF_FUSED_TILE_EVAL_COARSE", "16")
    assert _eval_tiles(VanillaNeRFConfig(netwidth=512)) == (16, 4)
