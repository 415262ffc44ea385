"""Training step factory: Adam + exponential LR decay + coarse/fine MSE loss.

Capability parity with the reference optimization loop (nerf/run.py:683-708):
``loss = mse(rgb, target) [+ mse(rgb0, target)]``, Adam(betas=(0.9, 0.999)),
and the per-step LR ``lrate * 0.1^(step / (lrate_decay * 1000))``
(run.py:704-708).

TPU-first notes: the whole step — ray sampling noise, both field passes,
compositing, loss, backward, Adam update — is one jitted function with
donated (params, opt_state), so the optimizer never leaves HBM and XLA fuses
the update chain. Data parallelism comes for free: jit the same function
with the ray batch sharded over the mesh's ``rays`` axis and replicated
params, and XLA inserts the grad ``psum`` (see `swnerf_tpu.parallel`).
"""

from __future__ import annotations

from typing import Any, Callable, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from swnerf_tpu.models.common import Field
from swnerf_tpu.render.core import Rays, RenderConfig, render_rays


def mse(x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean((x - y) ** 2)


def mse_to_psnr(x: jnp.ndarray) -> jnp.ndarray:
    return -10.0 * jnp.log(x) / jnp.log(10.0)


def exp_decay_schedule(lrate: float, lrate_decay: int) -> Callable[[jnp.ndarray], jnp.ndarray]:
    """lr(step) = lrate * 0.1^(step / (lrate_decay * 1000))."""
    decay_steps = float(lrate_decay) * 1000.0

    def schedule(step):
        return lrate * (0.1 ** (step / decay_steps))

    return schedule


def make_optimizer(lrate: float = 5e-4, lrate_decay: int = 250) -> optax.GradientTransformation:
    """Adam with torch defaults (betas 0.9/0.999, eps 1e-8) and the
    reference's exponential decay schedule."""
    return optax.chain(
        optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8),
        optax.scale_by_learning_rate(exp_decay_schedule(lrate, lrate_decay)),
    )


class TrainState(NamedTuple):
    step: jnp.ndarray  # scalar int32
    params: Any  # {"coarse": pytree, "fine": pytree | None}
    opt_state: optax.OptState


def init_train_state(params, optimizer: optax.GradientTransformation) -> TrainState:
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        opt_state=optimizer.init(params),
    )


def make_train_step(
    field: Field,
    cfg: RenderConfig,
    optimizer: optax.GradientTransformation,
    extra_loss_fn: Optional[Callable[..., Tuple[jnp.ndarray, Dict]]] = None,
    fine_field: Optional[Field] = None,
):
    """Build a jittable ``(state, rays, target, rng) -> (state, metrics)``.

    ``extra_loss_fn(params, outputs, rays, target, rng)`` may add a model-
    specific term (e.g. the D-NeRF TV loss) returning ``(extra, extra_metrics)``.
    ``fine_field`` carries a distinct fine-network architecture
    (``--netdepth_fine/--netwidth_fine``); None shares the coarse one.
    """

    def loss_fn(params, rays: Rays, target, rng):
        out = render_rays(
            field,
            params["coarse"],
            rays,
            cfg,
            rng=rng,
            fine_params=params.get("fine"),
            fine_field=fine_field,
        )
        img_loss = mse(out["rgb"], target)
        loss = img_loss
        metrics = {"loss": img_loss, "psnr": mse_to_psnr(img_loss)}
        if "rgb0" in out:
            img_loss0 = mse(out["rgb0"], target)
            loss = loss + img_loss0
            metrics["psnr0"] = mse_to_psnr(img_loss0)
        if extra_loss_fn is not None:
            extra, extra_metrics = extra_loss_fn(params, out, rays, target, rng)
            loss = loss + extra
            metrics.update(extra_metrics)
        metrics["total_loss"] = loss
        return loss, metrics

    def train_step(state: TrainState, rays: Rays, target, rng):
        step_rng = jax.random.fold_in(rng, state.step)
        grads, metrics = jax.grad(loss_fn, has_aux=True)(
            state.params, rays, target, step_rng
        )
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(state.step + 1, params, opt_state), metrics

    return train_step
