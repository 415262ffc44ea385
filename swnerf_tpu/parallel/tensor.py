"""Tensor (model) parallelism for scaled-up fields.

The reference model (W=256, ~600k params) is correctly served by pure
rays data parallelism (`parallel/mesh.py` — replicated params, sharded
batch, grad psum). This module covers the regime that decomposition can't
reach: user-scaled fields (``--netwidth 1024+``) whose weights, activations,
and optimizer moments outgrow one chip's memory or one chip's step-time
budget. The reference has no distribution at all (single cuda:0,
SURVEY.md §2.7); this is greenfield TPU capability.

Design — pure GSPMD, no hand-written collectives:

* a 2-D ``("rays", "model")`` mesh: batch sharded over ``rays`` (the
  existing DP story), weights sharded over ``model``;
* Megatron-style alternating column/row sharding down the MLP trunk:
  a column-sharded layer (``w: P(None, "model")``) leaves its activation
  feature-sharded at zero comm cost, the following row-sharded layer
  (``w: P("model", None)``) consumes that shard and XLA inserts ONE
  all-reduce over ``model`` for its partial sums. Segment boundaries
  (the skip concat, the trunk->heads handoff) are forced to row-sharded
  layers so activations are replicated exactly where the graph re-mixes
  them with replicated tensors;
* layers whose fan dims don't divide the ``model`` axis fall back to
  replicated (computed redundantly) rather than erroring — arbitrary
  ``--netdepth/--netwidth`` keep working;
* the optimizer moments (Adam mu/nu mirror the param tree) shard
  identically to their parameters, so optimizer memory scales down with
  the model axis too.

Everything below returns `NamedSharding` trees; `jax.jit` with these as
in/out shardings lets XLA place every matmul, insert the ``model``
all-reduces, and overlap them on ICI — no torch.distributed analog, no
NCCL, per the scaling-book recipe (mesh + annotations + let XLA).
"""

from __future__ import annotations

import numpy as np
import jax
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from swnerf_tpu.parallel.mesh import RAYS_AXIS

MODEL_AXIS = "model"


def make_mesh_2d(n_rays: int, n_model: int, devices=None) -> Mesh:
    """A 2-D ``(rays, model)`` mesh. The ``model`` axis should map to the
    fastest ICI neighbors (it carries a per-layer all-reduce of activation
    shards; the ``rays`` axis carries one grad psum per step), which the
    default device order gives on TPU slices (adjacent devices first)."""
    if devices is None:
        devices = jax.devices()
    devices = np.asarray(devices[: n_rays * n_model]).reshape(n_rays, n_model)
    return Mesh(devices, (RAYS_AXIS, MODEL_AXIS))


def _stack_specs(stack, n_model: int):
    """Column/row PartitionSpecs for one `init_mlp_stack` list.

    Walks the layer list in segments (a segment re-starts at any layer whose
    fan_in differs from the previous fan_out — that is where the apply fn
    concatenated a replicated embedding, models/vanilla.py skip connection).
    Within a segment: alternate col, row, col, ...; force the LAST layer of
    every segment to row so its output is replicated for the concat/heads.
    Any assignment whose sharded dim doesn't divide ``n_model`` degrades to
    replicated for that layer.
    """
    specs = []
    # Segment boundaries: layer i starts a segment iff i == 0 or
    # fan_in(i) != fan_out(i-1)  (the skip concat widened the activation).
    starts = [0] + [
        i
        for i in range(1, len(stack))
        if stack[i]["w"].shape[0] != stack[i - 1]["w"].shape[1]
    ]
    seg_of = np.zeros(len(stack), np.int32)
    for s in starts:
        seg_of[s:] += 1
    for seg_id in range(1, len(starts) + 1):
        idxs = [i for i in range(len(stack)) if seg_of[i] == seg_id]
        for pos, i in enumerate(idxs):
            fan_in, fan_out = stack[i]["w"].shape
            is_last = pos == len(idxs) - 1
            col = pos % 2 == 0 and not is_last
            if col and fan_out % n_model == 0:
                specs.append({"w": P(None, MODEL_AXIS), "b": P(MODEL_AXIS)})
            elif not col and fan_in % n_model == 0:
                specs.append({"w": P(MODEL_AXIS, None), "b": P()})
            else:
                specs.append({"w": P(), "b": P()})
    return specs


def mlp_param_specs(params, n_model: int):
    """PartitionSpec tree matching one field's param dict: every
    `init_mlp_stack` list (a list of {"w","b"} layers) gets the
    column/row treatment; single linear heads stay replicated (they are
    tiny — alpha [W,1], rgb [W/2,3] — and sharding them buys nothing).
    Works for any model family built from the models/common.py helpers."""

    def is_stack(node):
        return (
            isinstance(node, list)
            and node
            and all(isinstance(l, dict) and set(l) == {"w", "b"} for l in node)
        )

    def walk(node):
        if node is None:
            return None
        if is_stack(node):
            return _stack_specs(node, n_model)
        if isinstance(node, dict):
            if set(node) == {"w", "b"}:  # a lone head layer
                return {"w": P(), "b": P()}
            return {k: walk(v) for k, v in node.items()}
        if isinstance(node, (list, tuple)):
            return type(node)(walk(v) for v in node)
        return P()  # bare array leaf
    return walk(params)


def param_shardings(mesh: Mesh, params):
    """NamedSharding tree for a (possibly nested family) param tree, e.g.
    run_nerf's ``{"coarse": ..., "fine": ... | None}``."""
    n_model = mesh.shape[MODEL_AXIS]
    specs = mlp_param_specs(params, n_model)

    def to_named(spec_tree):
        if spec_tree is None:
            return None
        if isinstance(spec_tree, P):
            return NamedSharding(mesh, spec_tree)
        if isinstance(spec_tree, dict):
            return {k: to_named(v) for k, v in spec_tree.items()}
        if isinstance(spec_tree, (list, tuple)):
            return type(spec_tree)(to_named(v) for v in spec_tree)
        raise TypeError(f"unexpected spec node {type(spec_tree)}")

    return to_named(specs)


def opt_state_shardings(opt_state, pshard, mesh: Mesh):
    """NamedSharding tree for one optax Adam chain: the moments (mu/nu
    mirror the param tree, train/loop.py) shard by ``pshard`` — optimizer
    memory scales with the model axis — and every other leaf (step counters,
    schedule state) replicates."""
    rep = NamedSharding(mesh, P())

    def walk_opt(node):
        if isinstance(node, optax.ScaleByAdamState):
            return optax.ScaleByAdamState(count=rep, mu=pshard, nu=pshard)
        if isinstance(node, tuple) and not hasattr(node, "_fields"):
            return tuple(walk_opt(c) for c in node)
        return jax.tree.map(lambda _: rep, node)

    return walk_opt(opt_state)


def train_state_shardings(state, pshard, mesh: Mesh):
    """A TrainState-shaped tree of NamedShardings: params by ``pshard``,
    Adam moments by the same shardings, step counter replicated."""
    return type(state)(
        step=NamedSharding(mesh, P()),
        params=pshard,
        opt_state=opt_state_shardings(state.opt_state, pshard, mesh),
    )


def shard_train_state(state, shardings):
    """device_put every leaf to its sharding (structures must match)."""
    return jax.tree.map(jax.device_put, state, shardings)


def _policy_mesh(batch_size: int, n_model: int) -> Mesh:
    """The shared ``SWNERF_TENSOR_PARALLEL=k`` mesh policy: the model axis
    gets ``n_model`` devices, the rays axis the largest batch divisor among
    the remainder. Raises if fewer than ``n_model`` devices are visible."""
    import os

    n_dev = jax.device_count()
    limit = int(os.environ.get("SWNERF_MESH_DEVICES", "0") or 0)
    if limit:
        n_dev = min(n_dev, limit)
    if n_dev < n_model:
        raise ValueError(
            f"SWNERF_TENSOR_PARALLEL={n_model} needs >= {n_model} devices, "
            f"have {n_dev}"
        )
    n_rays = n_dev // n_model
    while n_rays > 1 and batch_size % n_rays:
        n_rays -= 1
    return make_mesh_2d(n_rays, n_model)


def tensor_parallel_setup(state, batch_size: int, n_model: int, quiet=False):
    """The CLI policy for ``SWNERF_TENSOR_PARALLEL=k``: build the 2-D mesh
    (rays axis = the largest batch divisor among the remaining devices),
    shard the train state, and return ``(mesh, state_shardings, state)``.

    Raises if fewer than ``n_model`` devices are visible. The fused Mosaic
    kernels cannot be partitioned over ``model`` — callers must route
    through the XLA (autodiff) step, which is the right trade in the
    big-``netwidth`` regime this targets (the VMEM-resident fused kernel
    stops fitting there anyway).
    """
    mesh = _policy_mesh(batch_size, n_model)
    pshard = param_shardings(mesh, state.params)
    sshard = train_state_shardings(state, pshard, mesh)
    state = shard_train_state(state, sshard)
    if not quiet:
        print(
            f"Tensor parallelism: {n_model}-way model sharding x "
            f"{mesh.shape[RAYS_AXIS]}-way ray sharding ({mesh.size} devices)"
        )
    return mesh, sshard, state


def tensor_parallel_setup_multires(params_all, opt_states, batch_size: int,
                                   n_model: int, quiet=False):
    """``SWNERF_TENSOR_PARALLEL=k`` policy for run_multires's per-level
    param/optimizer LISTS (one field + one Adam chain per pyramid level,
    reference multires_dnerf.py:877-882): one shared 2-D mesh, every level's
    params and moments sharded by its own spec tree (levels differ in
    embedding dims but share netwidth, so the trunk shardings line up).
    Returns ``(mesh, pshards, oshards, params_all, opt_states)`` with the
    states device_put to their shardings. The fused phase-2 kernels cannot
    partition over ``model`` — run_multires's mesh path already forces the
    autodiff step, which is the right trade in the big-netwidth regime."""
    mesh = _policy_mesh(batch_size, n_model)
    pshards = [param_shardings(mesh, p) for p in params_all]
    oshards = [
        opt_state_shardings(o, s, mesh) for o, s in zip(opt_states, pshards)
    ]
    params_all = [
        jax.tree.map(jax.device_put, p, s) for p, s in zip(params_all, pshards)
    ]
    opt_states = [
        jax.tree.map(jax.device_put, o, s) for o, s in zip(opt_states, oshards)
    ]
    if not quiet:
        print(
            f"Tensor parallelism: {n_model}-way model sharding x "
            f"{mesh.shape[RAYS_AXIS]}-way ray sharding ({mesh.size} devices), "
            f"{len(params_all)} pyramid levels"
        )
    return mesh, pshards, oshards, params_all, opt_states
