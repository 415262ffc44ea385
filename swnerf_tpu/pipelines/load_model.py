"""Standalone checkpoint loader for downstream tools.

The reference keeps a dedicated ``nerf/load_model.py`` (config_parser ->
create_nerf -> latest ``*.tar`` in logs/<exp>/ -> model + query fn,
load_model.py:127-149). Here the equivalent surface wraps
``run_nerf.create_vanilla`` (which already auto-resumes) and returns a
point-query function handling [N, 3] input — the shape used by the mesh
extractor (load_model.py:56-74).
"""

from __future__ import annotations

import jax.numpy as jnp

from swnerf_tpu.utils.config import config_parser


def load_model(argv=None):
    """Returns (field, params_query, state, args, query_fn).

    ``params_query`` is the fine network's params when present (the
    reference queries model_fine, extract_mesh.py:176), else the coarse.
    ``query_fn(positions [N,3], viewdirs [N,3]) -> raw [N,4]``.
    """
    from swnerf_tpu.pipelines.run_nerf import create_vanilla

    args = config_parser().parse_args(argv)
    field, fine_field, rcfg, optimizer, state, start, _cfgs = create_vanilla(args)
    # Query the fine network THROUGH the fine field (distinct
    # netdepth_fine/netwidth_fine architectures query correctly).
    if state.params["fine"] is not None:
        params_query = state.params["fine"]
        query_field = fine_field if fine_field is not None else field
    else:
        params_query = state.params["coarse"]
        query_field = field

    def query_fn(positions, viewdirs):
        pts = jnp.asarray(positions)[:, None, :]  # [N, 1, 3]
        raw, _ = query_field.apply(params_query, pts, jnp.asarray(viewdirs))
        return raw[:, 0, :]

    return query_field, params_query, state, args, query_fn
