"""Pallas kernel correctness (interpret mode on CPU) vs the jnp reference
path and the numpy oracle — the port of the reference torchsearchsorted
test sweep (d_nerf/torchsearchsorted/test/test_searchsorted.py)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from swnerf_tpu.ops.pallas.sample_pdf import sample_pdf_pallas
from swnerf_tpu.ops.sampling import sample_pdf
from tests.oracles import sample_pdf_oracle


class TestSamplePdfPallas:
    @pytest.mark.parametrize(
        "n_rays,n_bins,n_samples",
        [(1, 63, 128), (7, 63, 128), (200, 17, 5), (130, 2, 1), (64, 120, 64)],
    )
    def test_matches_oracle(self, rng_np, n_rays, n_bins, n_samples):
        bins = np.sort(rng_np.uniform(2.0, 6.0, (n_rays, n_bins)), -1).astype(np.float32)
        weights = rng_np.uniform(0.0, 1.0, (n_rays, n_bins - 1)).astype(np.float32)
        u = rng_np.uniform(0.0, 1.0, (n_rays, n_samples)).astype(np.float32)
        got = sample_pdf_pallas(
            jnp.asarray(bins), jnp.asarray(weights), n_samples,
            u=jnp.asarray(u), interpret=True,
        )
        want = sample_pdf_oracle(bins, weights, u)
        # atol covers fp32 cumsum-order epsilon flipping a bin boundary.
        np.testing.assert_allclose(np.asarray(got), want, atol=1e-4)

    def test_matches_jnp_path(self, rng_np):
        """The live jnp sample_pdf and the pallas kernel agree bitwise-ish."""
        bins = np.sort(rng_np.uniform(2.0, 6.0, (33, 63)), -1).astype(np.float32)
        weights = rng_np.uniform(0.0, 1.0, (33, 62)).astype(np.float32)
        u = rng_np.uniform(0.0, 1.0, (33, 128)).astype(np.float32)
        a = sample_pdf(jnp.asarray(bins), jnp.asarray(weights), 128, u=jnp.asarray(u))
        b = sample_pdf_pallas(
            jnp.asarray(bins), jnp.asarray(weights), 128, u=jnp.asarray(u), interpret=True
        )
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)

    def test_edge_uniforms_and_zero_weights(self, rng_np):
        bins = np.linspace(2.0, 6.0, 63, dtype=np.float32)[None].repeat(4, 0)
        weights = np.zeros((4, 62), np.float32)
        u = np.stack(
            [np.zeros(16), np.ones(16), np.full(16, 0.5), np.linspace(0, 1, 16)]
        ).astype(np.float32)
        got = np.asarray(
            sample_pdf_pallas(jnp.asarray(bins), jnp.asarray(weights), 16,
                              u=jnp.asarray(u), interpret=True)
        )
        want = sample_pdf_oracle(bins, weights, u)
        np.testing.assert_allclose(got, want, atol=2e-5)
        assert np.isfinite(got).all()

    def test_det_mode(self):
        bins = jnp.linspace(2.0, 6.0, 63)[None].repeat(2, 0)
        weights = jnp.ones((2, 62))
        a = np.asarray(sample_pdf(bins, weights, 32, det=True))
        b = np.asarray(sample_pdf_pallas(bins, weights, 32, det=True, interpret=True))
        np.testing.assert_allclose(a, b, atol=2e-6)

    def test_random_mode_statistics(self):
        """With rng (not external u) the distribution matches the weights."""
        bins = jnp.linspace(0.0, 1.0, 65)[None].repeat(4, 0)
        weights = jnp.zeros((4, 64)).at[:, 48:].set(1.0)
        s = np.asarray(
            sample_pdf_pallas(bins, weights, 256, rng=jax.random.PRNGKey(0), interpret=True)
        )
        assert ((s >= 0.74) & (s <= 1.0 + 1e-5)).mean() > 0.95
