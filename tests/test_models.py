"""Model field tests: shapes, init distributions, parameter counts, and
reference-matching structural behavior."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from swnerf_tpu.models import (
    DNeRFConfig,
    TNeRFConfig,
    VanillaNeRFConfig,
    make_dnerf_field,
    make_nerf_original_field,
    make_tnerf_field,
    make_vanilla_field,
)


def _param_count(tree):
    return sum(int(np.prod(x.shape)) for x in jax.tree.leaves(tree))


class TestVanilla:
    def test_shapes_viewdirs(self):
        cfg = VanillaNeRFConfig()
        field = make_vanilla_field(cfg)
        params = field.init(jax.random.PRNGKey(0))
        pts = jnp.ones((5, 7, 3))
        vd = jnp.ones((5, 3)) / jnp.sqrt(3.0)
        raw, aux = field.apply(params, pts, vd)
        assert raw.shape == (5, 7, 4)
        assert aux == {}

    def test_shapes_no_viewdirs(self):
        cfg = VanillaNeRFConfig(use_viewdirs=False, output_ch=5)
        field = make_vanilla_field(cfg)
        params = field.init(jax.random.PRNGKey(0))
        raw, _ = field.apply(params, jnp.ones((3, 4, 3)), None)
        assert raw.shape == (3, 4, 5)

    def test_param_count_matches_torch(self):
        """Exact parameter count of the reference vallina_NeRF
        (model.py:10-37): D=8,W=256, input_ch=63, views 27, skips=[4]."""
        cfg = VanillaNeRFConfig()
        params = make_vanilla_field(cfg).init(jax.random.PRNGKey(0))
        # pts: 63*256+256 + 6*(256*256+256) + (256+63)*256+256 (skip layer)
        want_pts = (63 * 256 + 256) + 6 * (256 * 256 + 256) + ((256 + 63) * 256 + 256)
        want = (
            want_pts
            + ((27 + 256) * 128 + 128)  # views
            + (256 * 256 + 256)  # feature
            + (256 * 1 + 1)  # alpha
            + (128 * 3 + 3)  # rgb
        )
        assert _param_count(params) == want

    def test_init_distribution(self):
        """torch nn.Linear default: U(-1/sqrt(fan_in), 1/sqrt(fan_in))."""
        cfg = VanillaNeRFConfig()
        params = make_vanilla_field(cfg).init(jax.random.PRNGKey(0))
        w = np.asarray(params["pts_linears"][1]["w"])  # fan_in 256
        k = 1.0 / np.sqrt(256)
        assert np.abs(w).max() <= k
        assert np.abs(w).mean() == pytest.approx(k / 2, rel=0.05)

    def test_skip_concat_effect(self):
        """Zeroing the input must still influence output through the skip."""
        cfg = VanillaNeRFConfig()
        field = make_vanilla_field(cfg)
        params = field.init(jax.random.PRNGKey(0))
        vd = jnp.ones((1, 3))
        a, _ = field.apply(params, jnp.zeros((1, 2, 3)), vd)
        b, _ = field.apply(params, jnp.ones((1, 2, 3)) * 0.5, vd)
        assert not np.allclose(np.asarray(a), np.asarray(b))


class TestDNeRF:
    def test_zero_canonical(self):
        cfg = DNeRFConfig()
        field = make_dnerf_field(cfg)
        params = field.init(jax.random.PRNGKey(0))
        pts = jnp.linspace(-1, 1, 12).reshape(2, 2, 3)
        vd = jnp.ones((2, 3)) / jnp.sqrt(3.0)
        t0 = jnp.zeros((2, 1))
        raw0, aux0 = field.apply(params, pts, vd, t0)
        np.testing.assert_array_equal(np.asarray(aux0["dx"]), 0.0)
        # At t=0 with zero_canonical, output equals the canonical network
        # queried at the undeformed points.
        canon = make_nerf_original_field(cfg)
        raw_c, _ = canon.apply(params["canonical"], pts, vd, t0)
        np.testing.assert_allclose(np.asarray(raw0), np.asarray(raw_c), atol=1e-6)

    def test_nonzero_time_deforms(self):
        cfg = DNeRFConfig()
        field = make_dnerf_field(cfg)
        params = field.init(jax.random.PRNGKey(0))
        pts = jnp.linspace(-1, 1, 12).reshape(2, 2, 3)
        vd = jnp.ones((2, 3)) / jnp.sqrt(3.0)
        t = jnp.full((2, 1), 0.5)
        raw, aux = field.apply(params, pts, vd, t)
        assert raw.shape == (2, 2, 4)
        assert not np.allclose(np.asarray(aux["dx"]), 0.0)

    def test_not_zero_canonical(self):
        cfg = DNeRFConfig(zero_canonical=False)
        field = make_dnerf_field(cfg)
        params = field.init(jax.random.PRNGKey(0))
        pts = jnp.ones((1, 3, 3)) * 0.3
        vd = jnp.ones((1, 3))
        raw, aux = field.apply(params, pts, vd, jnp.zeros((1, 1)))
        # Without zero_canonical the deformation applies even at t=0.
        assert not np.allclose(np.asarray(aux["dx"]), 0.0)

    def test_kaiming_init_std(self):
        cfg = DNeRFConfig()
        params = make_dnerf_field(cfg).init(jax.random.PRNGKey(0))
        w = np.asarray(params["canonical"]["pts_linears"][1]["w"])  # fan_in 256
        assert w.std() == pytest.approx(np.sqrt(2.0 / 256), rel=0.1)
        # Time net uses torch-default uniform init.
        wt = np.asarray(params["time_net"]["layers"][1]["w"])
        assert np.abs(wt).max() <= 1.0 / np.sqrt(256) + 1e-7


class TestTNeRF:
    def test_shapes(self):
        cfg = TNeRFConfig()
        field = make_tnerf_field(cfg)
        params = field.init(jax.random.PRNGKey(0))
        raw, aux = field.apply(
            params,
            jnp.ones((3, 5, 3)),
            jnp.ones((3, 3)),
            jnp.full((3, 1), 0.25),
        )
        assert raw.shape == (3, 5, 4)
        # Colors are ReLU'd inside the model (model.py:183-186): >= 0.
        assert (np.asarray(raw[..., :3]) >= 0).all()

    def test_time_conditioning(self):
        cfg = TNeRFConfig()
        field = make_tnerf_field(cfg)
        params = field.init(jax.random.PRNGKey(0))
        pts = jnp.ones((2, 4, 3)) * 0.2
        vd = jnp.ones((2, 3))
        a, _ = field.apply(params, pts, vd, jnp.zeros((2, 1)))
        b, _ = field.apply(params, pts, vd, jnp.full((2, 1), 0.9))
        assert not np.allclose(np.asarray(a), np.asarray(b))

    def test_skip_layer_dims(self):
        """Layer skip_layer+1 takes the enlarged input (reference quirk)."""
        cfg = TNeRFConfig()
        params = make_tnerf_field(cfg).init(jax.random.PRNGKey(0))
        in0 = cfg.in_feat + cfg.time_feat
        assert params["layers"][0]["w"].shape[0] == in0
        assert params["layers"][5]["w"].shape[0] == cfg.net_dim + in0
        assert params["layers"][4]["w"].shape[0] == cfg.net_dim
