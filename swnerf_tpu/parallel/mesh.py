"""Device mesh + ray-sharded data parallelism.

The reference has NO distribution (single cuda:0, Python chunk loops —
SURVEY.md §2.7). This module is the greenfield TPU story: a 1-D ``rays``
mesh over all chips (ICI), the ray batch sharded along its leading axis,
params/optimizer replicated. Gradients are reduced by the ``psum`` XLA
inserts automatically when a jitted replicated-output function consumes
sharded inputs — no NCCL/MPI, no hand-written collectives.

The model is a ~600k-param MLP, so pure data parallelism is the right
DEFAULT decomposition; along-ray compositing stays chip-local (a per-ray
associative scan), so no sequence parallelism is needed at N<=192 samples —
deliberate, per SURVEY.md §5. For user-scaled ``--netwidth`` fields that
outgrow one chip, `parallel/tensor.py` adds opt-in Megatron-style tensor
parallelism on a 2-D (rays, model) mesh (SWNERF_TENSOR_PARALLEL=k).
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


def replicate(mesh: Mesh, tree):
    """Device_put a pytree fully replicated over the mesh (one up-front
    broadcast so per-step jit calls don't re-transfer committed arrays).
    None leaves pass through."""
    rep = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, rep), tree)


def shard_batch(mesh: Mesh, tree):
    """Device_put a (rays, target, ...) pytree sharded on the leading axis.
    None leaves pass through."""
    sh = rays_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), tree)


def data_parallel_mesh(batch_size: int = 0, quiet: bool = False):
    """The CLI trainers' mesh policy: a 1-D ``rays`` mesh over all devices
    when more than one is visible (SWNERF_DATA_PARALLEL=0 opts out), else
    None (plain single-device jit).

    ``batch_size`` is the per-step ray count; when it does not divide evenly
    we still shard (GSPMD pads internally) but say so once.
    """
    import os

    if os.environ.get("SWNERF_DATA_PARALLEL", "1") == "0":
        return None
    n = jax.device_count()
    limit = int(os.environ.get("SWNERF_MESH_DEVICES", "0") or 0)
    if limit:
        n = min(n, limit)
    if batch_size:
        # in_shardings needs the batch axis divisible by the mesh size; use
        # the largest device count that divides it (e.g. N_rand=500 on 8
        # chips -> a 5-chip mesh rather than none at all).
        while n > 1 and batch_size % n:
            n -= 1
    if n <= 1:
        return None
    mesh = make_mesh(jax.devices()[:n])
    if not quiet:
        msg = f"Data parallelism: sharding rays over {n} devices"
        if n < jax.device_count():
            msg += (
                f" (largest divisor of N_rand={batch_size} within "
                f"{jax.device_count()} available)"
            )
        print(msg)
    return mesh


def shard_cli_step(step, mesh: Mesh, n_args: int, sharded_argnums, donate_argnums=(0,),
                   state_shardings=None):
    """Jit an arbitrary CLI train step for the mesh: the listed argument
    positions are sharded on their leading axis over ``rays`` (every leaf of
    a pytree argument), everything else — params, optimizer state, image
    stacks, scalars, RNG keys — is replicated; all outputs replicated.

    This is how the four trainers (run_nerf/run_dnerf/run_tnerf/
    run_multires) get data parallelism: the per-step pixel/index batch is
    the only sharded input, XLA turns the mean-loss gradient into a ``psum``
    over the rays axis, and the weight update happens replicated on every
    chip. The reference has no distribution at all (single cuda:0,
    SURVEY.md §2.7) — this is the greenfield TPU capability.

    ``state_shardings`` (a TrainState-shaped NamedSharding tree,
    parallel/tensor.py) overrides argument 0 and the first output for
    tensor-parallel runs: the params/optimizer leaves stay model-sharded
    across steps instead of replicated.
    """
    rep = replicated(mesh)
    shd = rays_sharding(mesh)
    in_sh = [shd if i in set(sharded_argnums) else rep for i in range(n_args)]
    out_sh = rep
    if state_shardings is not None:
        in_sh[0] = state_shardings
        out_sh = (state_shardings, rep)
    return jax.jit(
        step, in_shardings=tuple(in_sh), out_shardings=out_sh,
        donate_argnums=donate_argnums,
    )


def shard_map_train_step(train_step, mesh: Mesh, n_extra_rep: int = 0):
    """Wrap a ``(state, rays, target, *extras, rng) -> (state, metrics)``
    step with ``shard_map`` over the ``rays`` axis: state/rng (and the
    ``n_extra_rep`` scalar args before rng, e.g. the D-NeRF neighbor time)
    replicated, batch sharded on its leading axis, outputs replicated.

    This is the mesh path for steps containing Pallas kernels (the fused
    render-loss step, train/fused_step.py): GSPMD cannot partition a Mosaic
    custom call, so each device runs the kernels on its ray shard and the
    step reduces grads/metrics itself via ``pmean`` (it must be built with
    ``axis_name=RAYS_AXIS``). Returns the UNJITTED mapped step — compose
    with jax.jit or the CLI scan wrappers."""
    shd = P(RAYS_AXIS)
    rep = P()
    return jax.shard_map(
        train_step,
        mesh=mesh,
        in_specs=(rep, shd, shd) + (rep,) * (1 + n_extra_rep),
        out_specs=(rep, rep),
        check_vma=False,
    )


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
