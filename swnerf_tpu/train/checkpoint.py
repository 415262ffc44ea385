"""Checkpointing: torch-``.tar``-compatible reader/writer + native format.

The reference saves ``torch.save`` dicts to ``logs/<exp>/{iter:06d}.tar``
with these schemas (BASELINE.json requires them preserved):

* vanilla (nerf/run.py:717-723): ``{global_step, network_fn_state_dict,
  network_fine_state_dict, optimizer_state_dict}``
* D-NeRF (run_dnerf.py:757-769): fine dict only when two models are used
* T-NeRF (run_tnerf.py:719-728): single ``network_fn_state_dict``
* MultiRes (multires_dnerf.py:1010-1024): per-layer keys
  ``network_fn_{l} / network_fine_{l} / optimizer_{l}``

This module converts between our pure-pytree params (weights ``[in, out]``)
and torch state_dicts (weights ``[out, in]``), including the optimizer:
optax ``scale_by_adam``'s (count, mu, nu) maps 1:1 onto torch Adam's
(step, exp_avg, exp_avg_sq) in ``list(model.parameters())`` order, so
checkpoints resume exactly in either framework. torch (CPU) is used only
here, as the (de)serializer for the legacy format.
"""

from __future__ import annotations

import os
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# Param-tree <-> torch-state-dict codecs.
# A "layout" is an ordered list of (torch_module_name, path_in_our_tree)
# entries, in torch list(model.parameters()) order.
# ---------------------------------------------------------------------------


def _trunk_layout(prefix: str, params: Dict[str, Any]) -> List[Tuple[str, Tuple]]:
    """Layout of the vanilla/NeRFOriginal trunk (model.py:10-37,227-269):
    attribute definition order pts_linears, views_linears, feature, alpha,
    rgb (or output)."""
    out = []
    for i in range(len(params["pts_linears"])):
        out.append((f"{prefix}pts_linears.{i}", ("pts_linears", i)))
    if "views_linears" in params:
        for i in range(len(params["views_linears"])):
            out.append((f"{prefix}views_linears.{i}", ("views_linears", i)))
        out.append((f"{prefix}feature_linear", ("feature_linear",)))
        out.append((f"{prefix}alpha_linear", ("alpha_linear",)))
        out.append((f"{prefix}rgb_linear", ("rgb_linear",)))
    else:
        out.append((f"{prefix}output_linear", ("output_linear",)))
    return out


def model_layout(kind: str, params: Dict[str, Any]) -> List[Tuple[str, Tuple]]:
    """Ordered (torch_name, tree_path) pairs for a model family."""
    if kind in ("vanilla", "original"):
        return _trunk_layout("", params)
    if kind == "direct_temporal":
        # DirectTemporalNeRF (model.py:93-126): _occ, then _time, _time_out.
        out = [
            (f"_occ.{name}", ("canonical",) + path)
            for name, path in _trunk_layout("", params["canonical"])
        ]
        for i in range(len(params["time_net"]["layers"])):
            out.append((f"_time.{i}", ("time_net", "layers", i)))
        out.append(("_time_out", ("time_net", "out")))
        return out
    if kind == "tnerf":
        # TNeRF (model.py:152-186): Sequential wrappers put the Linear at
        # submodule index 0.
        out = []
        for i in range(len(params["layers"])):
            out.append((f"layers.{i}.0", ("layers", i)))
        for name in ("density", "feature", "layer_9", "color"):
            out.append((f"{name}.0", (name,)))
        return out
    raise ValueError(f"unknown model kind {kind!r}")


def _get_path(tree, path):
    for p in path:
        tree = tree[p]
    return tree


def _set_path(tree, path, value):
    for p in path[:-1]:
        tree = tree[p]
    tree[path[-1]] = value


def params_to_state_dict(kind: str, params) -> Dict[str, np.ndarray]:
    """Our pytree -> torch-layout state dict ({name}.weight [out,in])."""
    sd = {}
    for name, path in model_layout(kind, params):
        lyr = _get_path(params, path)
        sd[f"{name}.weight"] = np.asarray(lyr["w"]).T.copy()
        sd[f"{name}.bias"] = np.asarray(lyr["b"]).copy()
    return sd


def state_dict_to_params(kind: str, sd: Dict[str, Any], params_template):
    """torch state dict -> our pytree (shapes validated vs the template)."""
    params = jax.tree.map(lambda x: x, params_template)  # shallow-ish copy
    for name, path in model_layout(kind, params):
        w = np.asarray(sd[f"{name}.weight"]).T
        b = np.asarray(sd[f"{name}.bias"])
        tgt = _get_path(params, path)
        if tuple(w.shape) != tuple(tgt["w"].shape):
            raise ValueError(
                f"{name}.weight shape {w.shape} != expected {tgt['w'].shape}"
            )
        _set_path(params, path, {"w": jnp.asarray(w), "b": jnp.asarray(b)})
    return params


# ---------------------------------------------------------------------------
# Optimizer state conversion (optax scale_by_adam <-> torch.optim.Adam).
#
# ``groups`` is an ordered [(kind, key)] list naming the sub-models inside
# the params dict handed to optax, in the reference's grad_vars order — e.g.
# [("vanilla", "coarse"), ("vanilla", "fine")] mirrors
# ``list(model.parameters()) + list(model_fine.parameters())``
# (nerf/run.py:239-246).
# ---------------------------------------------------------------------------


def _find_adam_state(opt_state):
    import optax

    for s in jax.tree.leaves(
        opt_state, is_leaf=lambda x: isinstance(x, optax.ScaleByAdamState)
    ):
        if isinstance(s, optax.ScaleByAdamState):
            return s
    raise ValueError("no ScaleByAdamState found in opt_state")


def _iter_group_leaves(groups, tree):
    """Yield (is_weight, leaf) in torch list(parameters()) order: weight then
    bias per layer, groups in order; None (absent fine model) skipped."""
    for kind, key in groups:
        sub = tree[key]
        if sub is None:
            continue
        for _, path in model_layout(kind, sub):
            lyr = _get_path(sub, path)
            yield True, lyr["w"]
            yield False, lyr["b"]


def adam_to_torch_dict(opt_state, params, groups, lr: float) -> Dict[str, Any]:
    """optax adam state -> torch Adam optimizer_state_dict."""
    adam = _find_adam_state(opt_state)
    step = int(adam.count)
    state: Dict[int, Any] = {}
    mus = list(_iter_group_leaves(groups, adam.mu))
    nus = list(_iter_group_leaves(groups, adam.nu))
    for idx, ((is_w, mu), (_, nu)) in enumerate(zip(mus, nus)):
        mu = np.asarray(mu)
        nu = np.asarray(nu)
        state[idx] = {
            "step": step,
            "exp_avg": mu.T.copy() if is_w else mu.copy(),
            "exp_avg_sq": nu.T.copy() if is_w else nu.copy(),
        }
    return {
        "state": state,
        "param_groups": [
            {
                "lr": lr,
                "betas": (0.9, 0.999),
                "eps": 1e-8,
                "weight_decay": 0,
                "amsgrad": False,
                "maximize": False,
                "foreach": None,
                "capturable": False,
                "differentiable": False,
                "fused": None,
                "params": list(range(len(mus))),
            }
        ],
    }


def torch_dict_to_adam(torch_opt: Dict[str, Any], params, groups, opt_state_template):
    """torch Adam optimizer_state_dict -> optax opt_state.

    Returns (opt_state, step). Moment trees are rebuilt with the params
    structure; the chain's count states are set to the torch step.
    """
    import optax

    tstate = torch_opt["state"]

    step = 0
    flat: List[Tuple[np.ndarray, np.ndarray]] = []
    for idx, (is_w, leaf) in enumerate(_iter_group_leaves(groups, params)):
        ent = tstate.get(idx, tstate.get(str(idx)))
        if ent is not None:
            step = int(np.asarray(ent["step"]))
            mu = np.asarray(ent["exp_avg"])
            nu = np.asarray(ent["exp_avg_sq"])
            if is_w:
                mu, nu = mu.T, nu.T
        else:  # param never updated by torch
            mu = np.zeros_like(np.asarray(leaf))
            nu = np.zeros_like(np.asarray(leaf))
        flat.append((jnp.asarray(mu), jnp.asarray(nu)))

    # Two passes over flat: rebuild mu then nu. The moment trees must mirror
    # the FULL params structure (including keys absent from ``groups`` and
    # None-valued keys), or optax's tree_map over (params, mu, nu) fails.
    kind_by_key = {key: kind for kind, key in groups}

    def rebuild_moment(which):
        it = iter(flat)
        by_key = {}
        for kind, key in groups:  # consume flat in _iter_group_leaves order
            sub = params[key]
            if sub is None:
                by_key[key] = None
                continue
            new_sub = jax.tree.map(lambda x: x, sub)
            for _, path in model_layout(kind, sub):
                mu_w, nu_w = next(it)
                mu_b, nu_b = next(it)
                _set_path(
                    new_sub,
                    path,
                    {
                        "w": mu_w if which == "mu" else nu_w,
                        "b": mu_b if which == "mu" else nu_b,
                    },
                )
            by_key[key] = new_sub
        out = {}
        for key in params:
            if key in by_key:
                out[key] = by_key[key]
            else:
                sub = params[key]
                out[key] = None if sub is None else jax.tree.map(jnp.zeros_like, sub)
        return out

    mu_tree = rebuild_moment("mu")
    nu_tree = rebuild_moment("nu")

    # Fresh count array per chain state — sharing one buffer across states
    # breaks donation ("attempt to donate the same buffer twice").
    def fresh_count():
        return jnp.array(step, jnp.int32)

    new_states = []
    for s in opt_state_template:
        if isinstance(s, optax.ScaleByAdamState):
            new_states.append(
                optax.ScaleByAdamState(count=fresh_count(), mu=mu_tree, nu=nu_tree)
            )
        elif hasattr(s, "count"):
            new_states.append(type(s)(count=fresh_count()))
        else:
            new_states.append(s)
    return tuple(new_states), step


# ---------------------------------------------------------------------------
# .tar file IO (torch serialization used only here).
# ---------------------------------------------------------------------------


def save_tar(path: str, payload: Dict[str, Any]) -> None:
    """torch.save the payload (numpy arrays converted to torch tensors).

    Multi-process runs write from process 0 only (parallel/multihost.py
    host-role rule; every process computes, the primary owns the files)."""
    from swnerf_tpu.parallel.multihost import is_primary

    if not is_primary():
        return
    import torch

    def conv(x):
        if isinstance(x, dict):
            return {k: conv(v) for k, v in x.items()}
        if isinstance(x, (list, tuple)):
            t = [conv(v) for v in x]
            return type(x)(t) if not isinstance(x, tuple) else tuple(t)
        if isinstance(x, np.ndarray):
            return torch.from_numpy(np.ascontiguousarray(x))
        if isinstance(x, (jnp.ndarray, jax.Array)):
            return torch.from_numpy(np.ascontiguousarray(np.asarray(x)))
        return x

    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    torch.save(conv(payload), path)


def load_tar(path: str) -> Dict[str, Any]:
    """torch.load -> nested dicts of numpy arrays / scalars."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)

    def conv(x):
        if isinstance(x, dict):
            return {k: conv(v) for k, v in x.items()}
        if isinstance(x, (list, tuple)):
            return type(x)(conv(v) for v in x) if isinstance(x, list) else tuple(
                conv(v) for v in x
            )
        if isinstance(x, torch.Tensor):
            return x.detach().cpu().numpy()
        return x

    return conv(ckpt)


def save_native(path: str, state, extra: Optional[Dict[str, Any]] = None) -> None:
    """Native checkpoint: the full TrainState pytree serialized with flax
    msgpack (SURVEY.md §5 asks for a native format alongside the torch-.tar
    compatibility path). Atomic write; process 0 only (see save_tar)."""
    from swnerf_tpu.parallel.multihost import is_primary

    if not is_primary():
        return
    from flax import serialization

    payload = {"state": state, "extra": extra or {}}
    blob = serialization.to_bytes(payload)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(blob)
    os.replace(tmp, path)


def _check_state_dict_compat(saved, template, path="state"):
    """Recursively compare a raw restored state-dict against the template's
    state-dict: same keys, same leaf shapes. flax ``from_bytes`` would
    otherwise crash opaquely on a missing subtree (e.g. resuming a
    fine-less config from a snapshot saved WITH a fine net) or silently
    restore mismatched structures/shapes."""
    if isinstance(template, dict):
        if not isinstance(saved, dict):
            raise ValueError(
                f"native checkpoint mismatch at {path}: saved a leaf where "
                f"the current model has a subtree {sorted(template)}"
            )
        if set(saved) != set(template):
            raise ValueError(
                f"native checkpoint mismatch at {path}: saved keys "
                f"{sorted(saved)} != current model keys {sorted(template)} "
                "(was the snapshot written with a different model config?)"
            )
        for k in template:
            _check_state_dict_compat(saved[k], template[k], f"{path}.{k}")
        return
    if isinstance(saved, dict):
        raise ValueError(
            f"native checkpoint mismatch at {path}: saved a subtree "
            f"{sorted(saved)} where the current model has a leaf"
        )
    s_shape = getattr(saved, "shape", None)
    t_shape = getattr(template, "shape", None)
    if s_shape != t_shape:
        raise ValueError(
            f"native checkpoint mismatch at {path}: saved shape {s_shape} "
            f"!= current model shape {t_shape} "
            "(was the snapshot written with a different model config?)"
        )


def load_native(path: str, state_template, extra_template: Optional[Dict[str, Any]] = None):
    """Restore a native checkpoint into the given TrainState template.
    Returns (state, extra). Raises ValueError with a clear message when the
    snapshot's structure or leaf shapes do not match the template (changed
    model config), instead of flax's opaque crash / silent mis-restore."""
    from flax import serialization

    with open(path, "rb") as f:
        blob = f.read()
    template = {"state": state_template, "extra": extra_template or {}}
    raw = serialization.msgpack_restore(blob)
    _check_state_dict_compat(raw, serialization.to_state_dict(template))
    payload = serialization.from_state_dict(template, raw)
    return payload["state"], payload["extra"]


def save_orbax(path: str, state, extra: Optional[Dict[str, Any]] = None) -> None:
    """Orbax checkpoint: the full TrainState pytree written as an Orbax
    directory (SURVEY.md §5's "native orbax checkpoints" alongside the
    torch-.tar compatibility path). Unlike the msgpack snapshot this format
    saves SHARDED/distributed arrays natively — in a multi-process run every
    process must call it (Orbax coordinates the collective save itself), so
    it is deliberately NOT gated on ``is_primary``. Atomic finalize is
    Orbax's own tmp-dir + rename."""
    import orbax.checkpoint as ocp

    payload = {"state": state, "extra": extra or {}}
    os.makedirs(os.path.dirname(os.path.abspath(path)) or ".", exist_ok=True)
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(os.path.abspath(path), payload, force=True)


def load_orbax(path: str, state_template, extra_template: Optional[Dict[str, Any]] = None):
    """Restore an Orbax checkpoint into the given TrainState template;
    returns (state, extra). Orbax validates structure/shapes against the
    template itself."""
    import orbax.checkpoint as ocp

    template = {"state": state_template, "extra": extra_template or {}}
    with ocp.StandardCheckpointer() as ckptr:
        payload = ckptr.restore(os.path.abspath(path), template)
    return payload["state"], payload["extra"]


def tar_enabled() -> bool:
    """Is the reference-compatible ``.tar`` format selected?"""
    return "tar" in ckpt_formats()


def maybe_save_native(tar_path: str, state, i: int) -> None:
    """Write the native ``.msgpack`` and/or Orbax sibling of ``tar_path``
    when the format selection asks for them (shared by all four trainers;
    every process calls this — per-format host-role gating is internal)."""
    fmts = ckpt_formats()
    if "native" in fmts:
        p = native_path(tar_path)
        save_native(p, state, extra={"global_step": i})
        print("Saved checkpoints at", p)
    if "orbax" in fmts:
        p = orbax_path(tar_path)
        save_orbax(p, state, extra={"global_step": i})
        print("Saved checkpoints at", p)


def try_native_resume(ckpts: List[str], no_reload: bool, state_template):
    """If the latest discovered checkpoint is a native msgpack or Orbax
    snapshot, restore it into ``state_template`` and return
    ``(state, start_iter)``; else None (callers fall through to the
    ``.tar`` path)."""
    if not ckpts or no_reload:
        return None
    last = ckpts[-1]
    if last.endswith(".msgpack"):
        print("Reloading from", last)
        state, extra = load_native(last, state_template, {"global_step": 0})
        return state, int(extra["global_step"])
    if last.endswith(".orbax"):
        print("Reloading from", last)
        state, extra = load_orbax(last, state_template, {"global_step": 0})
        return state, int(extra["global_step"])
    return None


def ckpt_formats() -> frozenset:
    """``SWNERF_CKPT_FORMAT`` as a validated set: a comma-list drawn from
    ``tar`` (default — the reference-compatible torch-pickle archive),
    ``native`` (flax-msgpack pytree snapshot: no torch dependency, no
    transpose/schema conversion on the hot save path) and ``orbax``
    (directory format; saves sharded arrays natively in multi-process
    runs). Aliases: ``both`` = tar,native; ``all`` = all three."""
    v = os.environ.get("SWNERF_CKPT_FORMAT", "tar").lower()
    expanded = {"both": "tar,native", "all": "tar,native,orbax"}.get(v, v)
    fmts = frozenset(s.strip() for s in expanded.split(",") if s.strip())
    if not fmts or fmts - {"tar", "native", "orbax"}:
        raise ValueError(
            f"SWNERF_CKPT_FORMAT={v!r}: expected a comma-set of "
            "tar|native|orbax (aliases: both = tar,native; all = all three)"
        )
    return fmts


def ckpt_format() -> str:
    """The raw ``SWNERF_CKPT_FORMAT`` string, validated (the trainers call
    this at startup to fail fast on a typo, not at the first save)."""
    ckpt_formats()
    return os.environ.get("SWNERF_CKPT_FORMAT", "tar").lower()


def orbax_path(tar_path: str) -> str:
    """``000123.tar`` -> ``000123.orbax`` sibling (a directory)."""
    base = tar_path[:-4] if tar_path.endswith(".tar") else tar_path
    return base + ".orbax"


def native_path(tar_path: str) -> str:
    """``000123.tar`` -> ``000123.msgpack`` sibling path."""
    base = tar_path[:-4] if tar_path.endswith(".tar") else tar_path
    return base + ".msgpack"


def find_checkpoints(basedir: str, expname: str, ft_path: Optional[str] = None) -> List[str]:
    """Latest-last list of ckpts — ``.tar`` (reference auto-resume,
    run.py:262-268), native ``.msgpack`` snapshots and ``.orbax``
    directories, ordered by iteration NUMBER (lexicographic stem order
    would sort '1000000' before '990000' once iterations outgrow the 06d
    padding); a ``.tar`` sorts after its same-iteration siblings, so
    ``ckpts[-1]`` prefers the battle-tested compat format when both exist.
    In-progress Orbax tmp dirs (``*.orbax-checkpoint-tmp-*``) are excluded
    by the suffix filter — only finalized (renamed) saves are listed."""
    if ft_path is not None and ft_path != "None":
        return [ft_path]
    d = os.path.join(basedir, expname)
    if not os.path.isdir(d):
        return []
    names = [
        f for f in os.listdir(d)
        if ("tar" in f or f.endswith(".msgpack") or f.endswith(".orbax"))
        and not f.endswith(".tmp")
    ]

    def key(f):
        stem = os.path.splitext(f)[0]
        numeric = stem.isdigit()
        return (0, int(stem) if numeric else 0, stem if not numeric else "",
                f.endswith(".tar"))

    names.sort(key=key)
    return [os.path.join(d, f) for f in names]
