"""Device mesh + ray-sharded data parallelism.

The reference has NO distribution (single cuda:0, Python chunk loops —
SURVEY.md §2.7). This module is the greenfield TPU story: a 1-D ``rays``
mesh over all chips (ICI), the ray batch sharded along its leading axis,
params/optimizer replicated. Gradients are reduced by the ``psum`` XLA
inserts automatically when a jitted replicated-output function consumes
sharded inputs — no NCCL/MPI, no hand-written collectives.

The model is a ~600k-param MLP, so pure data parallelism is the right
decomposition (no TP/PP); along-ray compositing stays chip-local (a per-ray
associative scan), so no sequence parallelism is needed at N<=192 samples —
deliberate, per SURVEY.md §5.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

RAYS_AXIS = "rays"


def make_mesh(devices=None) -> Mesh:
    """A 1-D mesh named ``rays`` over all (or the given) devices."""
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), (RAYS_AXIS,))


def rays_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis sharding for ray batches."""
    return NamedSharding(mesh, P(RAYS_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, tree):
    """Device_put a (rays, target, ...) pytree sharded on the leading axis.
    None leaves pass through."""
    sh = rays_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), tree)


def shard_train_step(train_step, mesh: Mesh, donate_state: bool = True):
    """Jit a ``(state, rays, target, rng) -> (state, metrics)`` step for the
    mesh: state replicated (and donated), batch sharded over ``rays``.

    XLA turns the mean-loss gradient into a ``psum`` over the rays axis —
    the data-parallel allreduce rides ICI.
    """
    rep = replicated(mesh)
    shd = rays_sharding(mesh)
    return jax.jit(
        train_step,
        in_shardings=(rep, shd, shd, rep),
        out_shardings=(rep, rep),
        donate_argnums=(0,) if donate_state else (),
    )
