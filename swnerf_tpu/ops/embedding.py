"""Fourier-feature positional encoding.

Capability parity with the reference embedder (/root/reference/embedder.py:17-59):
identity passthrough plus [sin, cos] at ``num_freqs`` frequencies
``2^0 .. 2^(num_freqs-1)`` (log-spaced), applied to every input channel, with
feature order ``[x, sin(f0·x), cos(f0·x), sin(f1·x), cos(f1·x), ...]``.

TPU-first design notes: the encoding is a single fused broadcast-multiply +
sin/cos over a ``[..., F, d]`` tensor (VPU work that XLA fuses into the
consuming matmul); there is no per-frequency Python closure list as in the
reference.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp


def embedding_dim(num_freqs: int, input_dims: int = 3, include_input: bool = True) -> int:
    """Output feature size of :func:`positional_encoding`.

    ``num_freqs == -1`` means identity (reference get_embedder(i=-1),
    embedder.py:45-46).
    """
    if num_freqs == -1:
        return input_dims
    out = 2 * num_freqs * input_dims
    if include_input:
        out += input_dims
    return out


def positional_encoding(
    x: jnp.ndarray,
    num_freqs: int,
    include_input: bool = True,
    log_sampling: bool = True,
) -> jnp.ndarray:
    """Encode ``x[..., d] -> [..., embedding_dim]``.

    ``num_freqs == -1`` returns ``x`` unchanged (identity embedder).
    """
    if num_freqs == -1:
        return x
    if num_freqs == 0:
        return x if include_input else x[..., :0]
    if log_sampling:
        # 2^linspace(0, F-1, F) == exact powers of two.
        freqs = 2.0 ** jnp.linspace(0.0, num_freqs - 1, num_freqs, dtype=x.dtype)
    else:
        freqs = jnp.linspace(2.0**0.0, 2.0 ** (num_freqs - 1), num_freqs, dtype=x.dtype)
    xb = x[..., None, :] * freqs[:, None]  # [..., F, d]
    # Interleave per frequency: [sin(f_i x) (d), cos(f_i x) (d)] for each i.
    enc = jnp.stack([jnp.sin(xb), jnp.cos(xb)], axis=-2)  # [..., F, 2, d]
    enc = enc.reshape(*x.shape[:-1], -1)
    if include_input:
        return jnp.concatenate([x, enc], axis=-1)
    return enc


def make_embedder(num_freqs: int, input_dims: int = 3):
    """Return ``(embed_fn, out_dim)`` — the reference's get_embedder surface
    (embedder.py:44-59). ``num_freqs == -1`` gives identity."""
    fn = functools.partial(positional_encoding, num_freqs=num_freqs)
    return fn, embedding_dim(num_freqs, input_dims)
