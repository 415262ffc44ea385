"""Golden tests for the math core against independent numpy oracles."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from swnerf_tpu.ops import (
    composite,
    embedding_dim,
    get_rays,
    get_rays_np,
    merge_z_vals,
    ndc_rays,
    positional_encoding,
    sample_along_rays,
    sample_pdf,
)
from tests.oracles import (
    embed_oracle,
    get_rays_oracle,
    raw2outputs_oracle,
    sample_pdf_oracle,
)


class TestEmbedding:
    @pytest.mark.parametrize("num_freqs,dims", [(10, 3), (4, 3), (10, 1), (1, 2)])
    def test_matches_oracle(self, rng_np, num_freqs, dims):
        x = rng_np.standard_normal((17, dims)).astype(np.float32)
        got = positional_encoding(jnp.asarray(x), num_freqs)
        want = embed_oracle(x, num_freqs)
        assert got.shape[-1] == embedding_dim(num_freqs, dims)
        np.testing.assert_allclose(np.asarray(got), want, atol=2e-6)

    def test_identity(self, rng_np):
        x = rng_np.standard_normal((5, 3)).astype(np.float32)
        got = positional_encoding(jnp.asarray(x), -1)
        np.testing.assert_array_equal(np.asarray(got), x)
        assert embedding_dim(-1, 3) == 3

    def test_batched_shapes(self, rng_np):
        x = rng_np.standard_normal((4, 7, 3)).astype(np.float32)
        got = positional_encoding(jnp.asarray(x), 10)
        assert got.shape == (4, 7, 63)
        # Matches the flattened version (the reference embeds flattened).
        flat = positional_encoding(jnp.asarray(x.reshape(-1, 3)), 10)
        np.testing.assert_allclose(np.asarray(got).reshape(-1, 63), np.asarray(flat))


class TestRays:
    def _c2w(self, rng_np):
        # A rotation + translation.
        theta = 0.7
        rot = np.array(
            [
                [np.cos(theta), 0, np.sin(theta)],
                [0, 1, 0],
                [-np.sin(theta), 0, np.cos(theta)],
            ],
            dtype=np.float32,
        )
        c2w = np.eye(4, dtype=np.float32)
        c2w[:3, :3] = rot
        c2w[:3, 3] = [0.1, -0.2, 4.0]
        return c2w

    def test_focal_matches_oracle(self, rng_np):
        c2w = self._c2w(rng_np)
        ro, rd = get_rays(12, 16, 20.0, c2w)
        ro_w, rd_w = get_rays_oracle(12, 16, 20.0, c2w)
        np.testing.assert_allclose(np.asarray(ro), ro_w, atol=1e-6)
        np.testing.assert_allclose(np.asarray(rd), rd_w, atol=1e-5)

    def test_K_matches_oracle(self, rng_np):
        c2w = self._c2w(rng_np)
        K = np.array([[20.0, 0, 8.0], [0, 22.0, 6.0], [0, 0, 1]], dtype=np.float32)
        ro, rd = get_rays(12, 16, K, c2w)
        ro_w, rd_w = get_rays_oracle(12, 16, K, c2w)
        np.testing.assert_allclose(np.asarray(rd), rd_w, atol=1e-5)

    def test_np_twin(self, rng_np):
        c2w = self._c2w(rng_np)
        ro, rd = get_rays(8, 10, 15.0, c2w)
        ro2, rd2 = get_rays_np(8, 10, 15.0, c2w)
        np.testing.assert_allclose(np.asarray(ro), ro2, atol=1e-6)
        np.testing.assert_allclose(np.asarray(rd), rd2, atol=1e-5)

    def test_ndc_near_plane(self, rng_np):
        c2w = self._c2w(rng_np)
        ro, rd = get_rays(8, 10, 15.0, c2w)
        # Make rays point forward (-z) so NDC is defined.
        no, nd = ndc_rays(8, 10, 15.0, 1.0, ro, rd)
        assert np.isfinite(np.asarray(no)).all()
        assert np.isfinite(np.asarray(nd)).all()


class TestSamplePdf:
    @pytest.mark.parametrize("n_rays,n_bins,n_samples", [(1, 2, 1), (7, 63, 128), (32, 5, 9)])
    def test_matches_oracle(self, rng_np, n_rays, n_bins, n_samples):
        bins = np.sort(rng_np.uniform(2.0, 6.0, (n_rays, n_bins)), -1).astype(np.float32)
        weights = rng_np.uniform(0.0, 1.0, (n_rays, n_bins - 1)).astype(np.float32)
        u = rng_np.uniform(0.0, 1.0, (n_rays, n_samples)).astype(np.float32)
        got = sample_pdf(jnp.asarray(bins), jnp.asarray(weights), n_samples, u=jnp.asarray(u))
        want = sample_pdf_oracle(bins, weights, u)
        np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)

    def test_edge_uniforms(self, rng_np):
        """u == 0 and u == 1 exercise the below/above clamps."""
        bins = np.linspace(2.0, 6.0, 9, dtype=np.float32)[None].repeat(3, 0)
        weights = rng_np.uniform(0.1, 1.0, (3, 8)).astype(np.float32)
        u = np.stack([np.zeros(4), np.ones(4), np.full(4, 0.5)]).astype(np.float32)
        got = np.asarray(
            sample_pdf(jnp.asarray(bins), jnp.asarray(weights), 4, u=jnp.asarray(u))
        )
        want = sample_pdf_oracle(bins, weights, u)
        np.testing.assert_allclose(got, want, atol=1e-5)
        assert (got >= 2.0 - 1e-5).all() and (got <= 6.0 + 1e-5).all()

    def test_zero_weights_guard(self):
        """All-zero weights hit the denom<1e-5 guard; output stays finite."""
        bins = jnp.linspace(0.0, 1.0, 11)[None].repeat(2, 0)
        weights = jnp.zeros((2, 10))
        u = jnp.full((2, 5), 0.3)
        got = sample_pdf(bins, weights, 5, u=u)
        assert np.isfinite(np.asarray(got)).all()

    def test_det_mode(self):
        bins = jnp.linspace(2.0, 6.0, 9)[None].repeat(2, 0)
        weights = jnp.ones((2, 8))
        got = np.asarray(sample_pdf(bins, weights, 16, det=True))
        u = np.broadcast_to(np.linspace(0.0, 1.0, 16), (2, 16))
        want = sample_pdf_oracle(np.asarray(bins), np.asarray(weights), u)
        np.testing.assert_allclose(got, want, atol=1e-5)

    def test_distribution(self):
        """Samples concentrate where the weights are."""
        bins = jnp.linspace(0.0, 1.0, 65)[None].repeat(4, 0)
        weights = jnp.zeros((4, 64)).at[:, 32:48].set(1.0)
        rng = jax.random.PRNGKey(0)
        s = np.asarray(sample_pdf(bins, weights, 256, rng=rng))
        frac_inside = ((s >= 0.5) & (s <= 0.75)).mean()
        assert frac_inside > 0.95


class TestStratified:
    def test_deterministic_linspace(self):
        near = jnp.full((5,), 2.0)
        far = jnp.full((5,), 6.0)
        z = sample_along_rays(None, near, far, 8, perturb=0.0)
        np.testing.assert_allclose(np.asarray(z[0]), np.linspace(2, 6, 8), atol=1e-6)

    def test_lindisp(self):
        near = jnp.full((2,), 1.0)
        far = jnp.full((2,), 10.0)
        z = np.asarray(sample_along_rays(None, near, far, 3, perturb=0.0, lindisp=True))
        want = 1.0 / (1.0 / 1.0 * (1 - np.array([0, 0.5, 1])) + 1.0 / 10.0 * np.array([0, 0.5, 1]))
        np.testing.assert_allclose(z[0], want, rtol=1e-6)

    def test_jitter_within_intervals(self):
        near = jnp.full((100,), 2.0)
        far = jnp.full((100,), 6.0)
        z = np.asarray(sample_along_rays(jax.random.PRNGKey(0), near, far, 16, perturb=1.0))
        base = np.linspace(2, 6, 16)
        mids = 0.5 * (base[1:] + base[:-1])
        lower = np.concatenate([[base[0]], mids])
        upper = np.concatenate([mids, [base[-1]]])
        assert (z >= lower - 1e-6).all() and (z <= upper + 1e-6).all()
        assert (np.diff(z, axis=-1) > 0).all()  # sorted within each ray

    def test_merge_sorted(self, rng_np):
        a = np.sort(rng_np.uniform(0, 1, (4, 8)), -1)
        b = np.sort(rng_np.uniform(0, 1, (4, 5)), -1)
        m = np.asarray(merge_z_vals(jnp.asarray(a), jnp.asarray(b)))
        assert m.shape == (4, 13)
        assert (np.diff(m, axis=-1) >= 0).all()


class TestComposite:
    def test_matches_oracle(self, rng_np):
        raw = rng_np.standard_normal((6, 11, 4)).astype(np.float32)
        z = np.sort(rng_np.uniform(2, 6, (6, 11)), -1).astype(np.float32)
        rays_d = rng_np.standard_normal((6, 3)).astype(np.float32)
        out = composite(jnp.asarray(raw), jnp.asarray(z), jnp.asarray(rays_d))
        want = raw2outputs_oracle(raw, z, rays_d)
        np.testing.assert_allclose(np.asarray(out.rgb), want[0], atol=1e-5)
        np.testing.assert_allclose(np.asarray(out.disp), want[1], rtol=1e-4)
        np.testing.assert_allclose(np.asarray(out.acc), want[2], atol=1e-5)
        np.testing.assert_allclose(np.asarray(out.weights), want[3], atol=1e-5)
        np.testing.assert_allclose(np.asarray(out.depth), want[4], atol=1e-4)

    def test_white_bkgd(self, rng_np):
        raw = rng_np.standard_normal((4, 7, 4)).astype(np.float32)
        raw[..., 3] = -10.0  # fully transparent
        z = np.sort(rng_np.uniform(2, 6, (4, 7)), -1).astype(np.float32)
        rays_d = np.ones((4, 3), np.float32)
        out = composite(jnp.asarray(raw), jnp.asarray(z), jnp.asarray(rays_d), white_bkgd=True)
        np.testing.assert_allclose(np.asarray(out.rgb), 1.0, atol=1e-4)

    def test_opaque_first_sample(self):
        """A huge density at the first sample should dominate the ray."""
        raw = np.zeros((1, 5, 4), np.float32)
        raw[0, 0, 3] = 1e6
        raw[0, 0, :3] = 10.0  # sigmoid -> ~1
        z = np.linspace(2, 6, 5, dtype=np.float32)[None]
        rays_d = np.array([[0, 0, 1]], np.float32)
        out = composite(jnp.asarray(raw), jnp.asarray(z), jnp.asarray(rays_d))
        np.testing.assert_allclose(np.asarray(out.rgb[0]), [1, 1, 1], atol=1e-3)
        np.testing.assert_allclose(np.asarray(out.depth[0]), 2.0, atol=1e-3)

    def test_noise_regularizer(self, rng_np):
        raw = rng_np.standard_normal((8, 9, 4)).astype(np.float32)
        z = np.sort(rng_np.uniform(2, 6, (8, 9)), -1).astype(np.float32)
        rays_d = np.ones((8, 3), np.float32)
        a = composite(jnp.asarray(raw), jnp.asarray(z), jnp.asarray(rays_d),
                      raw_noise_std=1.0, rng=jax.random.PRNGKey(1))
        b = composite(jnp.asarray(raw), jnp.asarray(z), jnp.asarray(rays_d))
        assert not np.allclose(np.asarray(a.rgb), np.asarray(b.rgb))
