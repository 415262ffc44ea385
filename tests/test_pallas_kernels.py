"""Pallas kernel correctness (interpret mode on CPU) vs the jnp reference
path and the numpy oracle — the port of the reference torchsearchsorted
test sweep (d_nerf/torchsearchsorted/test/test_searchsorted.py)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from swnerf_tpu.ops.pallas.sample_pdf import (
    sample_pdf_merge_pallas,
    sample_pdf_pallas,
)
from swnerf_tpu.ops.sampling import merge_z_vals, sample_pdf
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


class TestSamplePdfMergePallas:
    """The fused sample+merge kernel vs the two-op path (sample_pdf ->
    jnp.sort(concat)) — reference run.py:398-400 in one kernel."""

    def _mk(self, rng_np, n_rays, mz, n_samples):
        z_vals = np.sort(
            rng_np.uniform(2.0, 6.0, (n_rays, mz)), -1
        ).astype(np.float32)
        z_mid = 0.5 * (z_vals[:, 1:] + z_vals[:, :-1])
        weights = rng_np.uniform(0.0, 1.0, (n_rays, mz - 2)).astype(np.float32)
        u = np.sort(
            rng_np.uniform(0.0, 1.0, (n_rays, n_samples)), -1
        ).astype(np.float32)
        return z_vals, z_mid, weights, u

    @pytest.mark.parametrize(
        "n_rays,mz,n_samples",
        [(1, 64, 128), (33, 64, 128), (7, 17, 5), (130, 3, 1), (64, 120, 64)],
    )
    def test_matches_two_op_path(self, rng_np, n_rays, mz, n_samples):
        """Given the same SORTED uniforms the fused kernel reproduces
        sort(concat(z_vals, sample_pdf(...)))."""
        z_vals, z_mid, weights, u = self._mk(rng_np, n_rays, mz, n_samples)
        got = sample_pdf_merge_pallas(
            jnp.asarray(z_vals), jnp.asarray(z_mid), jnp.asarray(weights),
            n_samples, u=jnp.asarray(u), interpret=True,
        )
        z_samples = sample_pdf(
            jnp.asarray(z_mid), jnp.asarray(weights), n_samples, u=jnp.asarray(u)
        )
        want = merge_z_vals(jnp.asarray(z_vals), z_samples)
        assert got.shape == (n_rays, mz + n_samples)
        # sort is 1-Lipschitz in the sup norm, so the two-op atol carries.
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)

    def test_det_mode_matches(self, rng_np):
        z_vals, z_mid, weights, _ = self._mk(rng_np, 9, 64, 32)
        got = sample_pdf_merge_pallas(
            jnp.asarray(z_vals), jnp.asarray(z_mid), jnp.asarray(weights),
            32, det=True, interpret=True,
        )
        want = merge_z_vals(
            jnp.asarray(z_vals),
            sample_pdf(jnp.asarray(z_mid), jnp.asarray(weights), 32, det=True),
        )
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)

    def test_random_mode_sorted_superset(self, rng_np):
        """rng path: output is sorted, contains every coarse depth, and the
        sampled depths follow the weights (mass pinned to the last bins)."""
        z_vals = np.linspace(0.0, 1.0, 65, dtype=np.float32)[None].repeat(4, 0)
        z_mid = 0.5 * (z_vals[:, 1:] + z_vals[:, :-1])
        weights = np.zeros((4, 62), np.float32)
        weights[:, 48:] = 1.0
        out = np.asarray(
            sample_pdf_merge_pallas(
                jnp.asarray(z_vals), jnp.asarray(z_mid), jnp.asarray(weights),
                256, rng=jax.random.PRNGKey(3), interpret=True,
            )
        )
        assert out.shape == (4, 65 + 256)
        assert (np.diff(out, axis=-1) >= 0).all()
        for r in range(4):
            present = np.isin(z_vals[r], out[r])
            assert present.all()
        # 256 samples + 65 grid depths; >= 90% of the samples in the top band.
        in_band = (out >= z_mid[0, 48]).sum(-1) - (z_vals[0] >= z_mid[0, 48]).sum()
        assert (in_band > 0.9 * 256).all()

    def test_order_statistics_draw_is_uniform(self):
        """The exponential-spacing sorted-uniform draw has U(0,1) margins:
        with uniform weights on [0,1] bins the pooled samples' empirical CDF
        sits on the diagonal."""
        n, s = 256, 64
        z_vals = jnp.linspace(0.0, 1.0, 65)[None].repeat(n, 0)
        z_mid = 0.5 * (z_vals[:, 1:] + z_vals[:, :-1])
        weights = jnp.ones((n, 62))
        out = np.asarray(
            sample_pdf_merge_pallas(
                z_vals, z_mid, weights, s, rng=jax.random.PRNGKey(7),
                interpret=True,
            )
        )
        # Strip the deterministic grid depths: pooled sample mass only.
        mask = ~np.isin(out, np.asarray(z_vals[0]))
        samp = np.sort(out[mask])
        q = np.linspace(0, 1, samp.size)
        # bins span [z_mid_0, z_mid_-1] ~ [0.0078, 0.992]; CDF within 2%.
        assert np.abs(samp - (q * (samp[-1] - samp[0]) + samp[0])).max() < 0.02
