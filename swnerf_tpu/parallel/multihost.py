"""Multi-host (multi-process) support: DCN-side batch assembly + host roles.

The reference is a single-GPU program (SURVEY.md §2.7); the TPU-first
replacement spec calls for ICI collectives *within* a slice and **DCN only
for multi-host input** with per-host RNG (SURVEY.md §2.7, §5). This module
is that DCN story for the CLI trainers:

- **Design**: every host loads the (small) image set and runs the SAME
  seeded numpy ray/pixel sampler, so all hosts agree on each step's global
  batch without any host-to-host traffic; each host then materializes only
  the rows its own devices hold via ``jax.make_array_from_callback``. The
  gradient ``psum`` XLA inserts spans the whole mesh (ICI within a slice,
  DCN across slices) — no hand-written collectives. NeRF datasets are a
  few hundred images, so replicated image loading beats a sharded input
  pipeline in both simplicity and DCN bytes (zero per step).
- **Host roles**: checkpoints, videos, testsets and log files are written
  by process 0 only (``is_primary``); training math is identical on every
  process.

Single-process behavior is bit-identical to the non-multihost path: every
helper short-circuits when ``jax.process_count() == 1``.

Real multi-host hardware is not available in this sandbox; the feeder's
assembly path is exercised single-process (forced on) against plain
``device_put`` in tests/test_multihost.py, and the jitted steps it feeds
are the same ones the 8-device mesh equivalence tests cover.
"""

from __future__ import annotations

import os

import jax
import numpy as np

__all__ = [
    "initialize_from_env",
    "is_primary",
    "host_fold",
    "host_shard_bounds",
    "wrap_feeder",
]


def initialize_from_env() -> bool:
    """Opt-in ``jax.distributed.initialize`` for multi-process runs.

    Reads ``SWNERF_COORDINATOR`` (host:port), ``SWNERF_NUM_PROCESSES`` and
    ``SWNERF_PROCESS_ID``; when unset (every single-host run, including TPU
    pods launched via environments that auto-configure JAX) this is a
    no-op. CLI mains call it before the first device query.

    Returns True when initialize() was actually called.
    """
    coord = os.environ.get("SWNERF_COORDINATOR", "")
    if not coord:
        return False
    kwargs = {"coordinator_address": coord}
    if os.environ.get("SWNERF_NUM_PROCESSES"):
        kwargs["num_processes"] = int(os.environ["SWNERF_NUM_PROCESSES"])
    if os.environ.get("SWNERF_PROCESS_ID"):
        kwargs["process_id"] = int(os.environ["SWNERF_PROCESS_ID"])
    jax.distributed.initialize(**kwargs)
    return True


def is_primary() -> bool:
    """True on the process that owns filesystem side effects (ckpts, videos,
    testsets, metrics/log files). Always True single-process."""
    return jax.process_index() == 0


def host_fold(rng, index: int | None = None):
    """Per-host RNG stream: ``fold_in(rng, process_index)`` (SURVEY.md §2.7).

    Use for randomness that must DIFFER across hosts (e.g. host-private
    validation-image picks). The training batch sampler deliberately does
    NOT use this — all hosts must agree on the global batch (module
    docstring); it exists for the per-host-stream half of the spec.
    """
    if index is None:
        index = jax.process_index()
    return jax.random.fold_in(rng, index)


def host_shard_bounds(n: int, index: int | None = None,
                      count: int | None = None) -> tuple[int, int]:
    """Contiguous [lo, hi) rows of an n-row resource assigned to this host
    (remainder spread over the first ``n % count`` hosts). For host-side
    work splits (e.g. eval frames rendered per host); the per-step train
    batch is assembled by sharding, not by these bounds."""
    if index is None:
        index = jax.process_index()
    if count is None:
        count = jax.process_count()
    base, rem = divmod(n, count)
    lo = index * base + min(index, rem)
    return lo, lo + base + (1 if index < rem else 0)


def _assemble(x, sharding):
    """Global jax.Array from a host-replicated numpy batch: each process
    materializes only its addressable shards."""
    x = np.asarray(x)
    return jax.make_array_from_callback(x.shape, sharding, lambda idx: x[idx])


def wrap_feeder(jitted, mesh, sharded_argnums, axis: int = 0, force: bool = False):
    """Make a mesh-jitted step callable in a multi-process run.

    ``jitted`` comes from `shard_cli_step`/`_scan_jit` with the listed
    argument positions sharded over ``rays`` on ``axis`` (0 for per-step
    batches, 1 for K-step scan batches). Single-process the numpy inputs
    commit directly and ``jitted`` is returned unchanged; multi-process a
    plain numpy array is not addressable under a multi-host sharding, so
    the wrapper assembles those arguments via ``jax.make_array_from_callback``
    from the host-replicated batch (module docstring). ``force=True`` is the
    test hook that exercises the assembly path single-process.
    """
    if jax.process_count() == 1 and not force:
        return jitted

    from jax.sharding import NamedSharding, PartitionSpec

    from swnerf_tpu.parallel.mesh import RAYS_AXIS

    spec = [None] * (axis + 1)
    spec[axis] = RAYS_AXIS
    sharding = NamedSharding(mesh, PartitionSpec(*spec))
    positions = set(sharded_argnums)

    def call(*args):
        args = list(args)
        for i in positions:
            args[i] = jax.tree.map(lambda x: _assemble(x, sharding), args[i])
        return jitted(*args)

    return call
