"""Shared building blocks for pure-pytree MLP fields.

Weights are stored as ``[fan_in, fan_out]`` (JAX ``x @ w + b`` convention).
The reference's torch checkpoints store ``[fan_out, fan_in]``; the
``.tar``-compat layer (`swnerf_tpu.train.checkpoint`) transposes on IO.

Initializers reproduce the reference's *distributions* (exact sequences
necessarily differ between torch and JAX PRNGs):
  * ``torch_linear_init`` — torch ``nn.Linear`` default:
    W, b ~ U(-1/sqrt(fan_in), 1/sqrt(fan_in)).
  * ``kaiming_linear_init`` — ``nn.init.kaiming_normal_(a=0, mode='fan_in')``
    as applied to every Linear of NeRFOriginal
    (/root/reference/model.py:270-272): W ~ N(0, 2/fan_in); bias keeps the
    torch default uniform init.
"""

from __future__ import annotations

from typing import Any, Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp

Params = Any


class Field(NamedTuple):
    """A neural field consumed by the render core.

    init: ``rng -> params``.
    apply: ``(params, pts[N,S,3], viewdirs[N,3]|None, times[N,1]|None) ->
        (raw[N,S,C], aux dict)``. ``aux`` carries model extras such as the
        D-NeRF deformation ``dx``.
    cfg: the model config the field was built from (lets kernels that need
        architecture constants reach it; None for ad-hoc fields).
    eval_pass: optional forward-only fused whole-pass renderer
        ``(params, fine_params, fine_field, rays, ecfg) ->
        (rgb, disp, acc, depth)`` — picked up by ``render_image`` on TPU
        (render/fused_eval.py).
    """

    init: Callable[[jax.Array], Params]
    apply: Callable[..., Any]
    cfg: Any = None
    eval_pass: Optional[Callable[..., Any]] = None


def safe_init_enabled() -> bool:
    """``SWNERF_SAFE_INIT=1``: opt-in remedy for the shared dead-density
    seed pathology (PERFORMANCE.md "Seed pathology"). With the reference's
    init, trunk activations decay toward zero so the initial density is
    approximately the density head's BIAS — a per-seed coin flip; a
    negative draw leaves the network ReLU-dead with exactly zero gradients
    forever. The reference's own workaround is ``--raw_noise_std 1e0``;
    this knob instead removes the coin flip at the source (see
    ``density_bias_floor``). Off by default: it changes the init
    distribution, so strict torch-parity runs must keep it off."""
    import os

    return os.environ.get("SWNERF_SAFE_INIT", "0") == "1"


def density_bias_floor(head: dict, index=None, floor: float = 0.1) -> dict:
    """Fold the density-head bias to be >= ``floor``: ``b -> |b| + floor``
    (on ``b[index]`` when the head is a multi-channel output layer). Keeps
    the draw's magnitude distribution; guarantees a positive initial
    density everywhere, so alpha > 0 and gradients flow from step one."""
    b = head["b"]
    if index is None:
        nb = jnp.abs(b) + floor
    else:
        nb = b.at[index].set(jnp.abs(b[index]) + floor)
    return {**head, "b": nb}


def torch_linear_init(rng: jax.Array, fan_in: int, fan_out: int, dtype=jnp.float32):
    k = 1.0 / jnp.sqrt(jnp.asarray(fan_in, jnp.float32))
    wk, bk = jax.random.split(rng)
    return {
        "w": jax.random.uniform(wk, (fan_in, fan_out), dtype, -k, k),
        "b": jax.random.uniform(bk, (fan_out,), dtype, -k, k),
    }


def kaiming_linear_init(rng: jax.Array, fan_in: int, fan_out: int, dtype=jnp.float32):
    wk, bk = jax.random.split(rng)
    std = jnp.sqrt(2.0 / fan_in)
    k = 1.0 / jnp.sqrt(jnp.asarray(fan_in, jnp.float32))
    return {
        "w": jax.random.normal(wk, (fan_in, fan_out), dtype) * std,
        "b": jax.random.uniform(bk, (fan_out,), dtype, -k, k),
    }


_MATMUL_PRECISION = jax.lax.Precision.HIGHEST


def set_matmul_precision(p) -> None:
    """Set the field-MLP matmul precision.

    ``Precision.HIGHEST`` (default) keeps true fp32 MXU passes — required for
    the ±0.1 dB PSNR-parity gate vs the fp32 torch reference. ``DEFAULT``
    allows bf16 inputs for ~2-4x more MXU throughput when parity is not
    needed.
    """
    global _MATMUL_PRECISION
    _MATMUL_PRECISION = p


def dense(p, x: jnp.ndarray, precision=None) -> jnp.ndarray:
    """``x @ w + b`` with fp32 accumulation.

    ``precision`` overrides the module default for one call — fields thread
    their config's ``precision`` here so per-pipeline settings (e.g.
    ``--do_half_precision``) never leak across models composed in-process.
    """
    return (
        jnp.dot(
            x,
            p["w"],
            preferred_element_type=jnp.float32,
            precision=_MATMUL_PRECISION if precision is None else precision,
        )
        + p["b"]
    )


def init_mlp_stack(
    rng: jax.Array,
    dims,
    init_fn=torch_linear_init,
    dtype=jnp.float32,
):
    """Init a list of linear layers with io sizes ``dims[i] -> dims[i+1]``...

    ``dims`` is a list of (fan_in, fan_out) tuples (explicit, because skip
    connections make the io sizes non-chained).
    """
    keys = jax.random.split(rng, len(dims))
    return [init_fn(k, fi, fo, dtype) for k, (fi, fo) in zip(keys, dims)]
