"""Export a (trained) vanilla checkpoint as an AOT serving artifact.

The reference's deployment story is "ship the repo + the .tar and rebuild
the model in Python" (nerf/load_model.py:127-149); this pipeline instead
packs the deterministic eval renderer into a self-contained versioned
StableHLO blob (utils/export.py) next to the checkpoint — serving needs
only ``load_renderer(blob)`` plus the params, no model code and no
tracing.

Usage (the standard vanilla flag set selects config/checkpoint; export
flags are stripped before the reference parser sees the argv):

    python -m swnerf_tpu.pipelines.export_model --config configs/lego.txt \
        --export_out logs/lego/renderer.jaxexport \
        --export_rays 8192 [--export_mode nerf|dnerf|tnerf] \
        [--export_platforms tpu,cpu] [--export_fused]

``--export_mode`` picks the checkpoint family: ``nerf`` (vanilla flag
set), ``dnerf``/``tnerf`` (the dnerf flag set; time-conditioned
artifacts take a trailing ``times [n, 1]`` operand), or ``multires``
(the dnerf flag set; one artifact PER PYRAMID LEVEL at
``<export_out>.L<layer>`` — per-level ray counts differ, so there is no
single-artifact mode; serving renders each level's frame and
reconstructs host-side with ``ops.pyramid.reconstruct_from_pyramid``).
``--export_rays`` fixes the artifact's static ray-batch size (callers
tile/pad frames, exactly as render_image does). By default fields are
rebuilt ``fused=False`` so the artifact is pure StableHLO (portable via
``--export_platforms``); ``--export_fused`` keeps the session field as-is
(on TPU that embeds Mosaic custom calls — TPU-only artifacts).
"""

from __future__ import annotations

import argparse


def _load(mode, rest, fused):
    """(field, fine_field, rcfg, state, start, with_times) for the mode."""
    if mode == "nerf":
        from swnerf_tpu.models import make_vanilla_field
        from swnerf_tpu.pipelines.run_nerf import create_vanilla
        from swnerf_tpu.utils.config import config_parser

        args = config_parser().parse_args(rest)
        field, ffield, rcfg, _o, state, start, (mcfg, fcfg) = create_vanilla(args)
        if not fused:
            field = make_vanilla_field(mcfg, fused=False)
            if fcfg is not None:
                ffield = make_vanilla_field(fcfg, fused=False)
        return field, ffield, rcfg, state, start, False
    if mode == "dnerf":
        from swnerf_tpu.models.dnerf import make_dnerf_field, make_nerf_original_field
        from swnerf_tpu.pipelines.run_dnerf import create_dnerf
        from swnerf_tpu.utils.config import config_parser_dnerf

        args = config_parser_dnerf().parse_args(rest)
        field, ffield, kind, rcfg, _o, state, start, (mcfg, fcfg) = create_dnerf(args)
        mk = make_dnerf_field if kind == "direct_temporal" else make_nerf_original_field
        if not fused:
            field = mk(mcfg, fused=False)
            if fcfg is not None:
                ffield = mk(fcfg, fused=False)
        # NeRFOriginal ignores times; DirectTemporal consumes them — both
        # accept the operand (models/dnerf.py apply signatures).
        return field, ffield, rcfg, state, start, kind == "direct_temporal"
    if mode == "tnerf":
        from swnerf_tpu.models.tnerf import make_tnerf_field
        from swnerf_tpu.pipelines.run_tnerf import create_tnerf
        from swnerf_tpu.utils.config import config_parser_dnerf

        args = config_parser_dnerf().parse_args(rest)
        field, rcfg, _o, state, start, mcfg = create_tnerf(args)
        if not fused:
            field = make_tnerf_field(mcfg, fused=False)
        return field, None, rcfg, state, start, True
    raise ValueError(f"--export_mode {mode!r} not recognized")


def _export_multires(own, rest):
    """One artifact per pyramid level. Each level is its own dnerf-family
    field (reference multires_dnerf.py:242-346) with its own channel dims,
    so each gets its own self-contained renderer blob; the level's frame
    geometry is printed so the server knows how to tile and reconstruct."""
    from swnerf_tpu.models.dnerf import make_dnerf_field, make_nerf_original_field
    from swnerf_tpu.pipelines.common import load_scene
    from swnerf_tpu.pipelines.run_multires import create_multires
    from swnerf_tpu.utils.config import config_parser_dnerf
    from swnerf_tpu.utils.export import export_renderer

    args = config_parser_dnerf().parse_args(rest)
    scene = load_scene(args)
    kind, fields, params_all, _opts, _osts, pyr_hwf, rcfg, start = create_multires(
        args, scene
    )
    mk = make_dnerf_field if kind == "direct_temporal" else make_nerf_original_field
    platforms = own.export_platforms.split(",") if own.export_platforms else None
    with_times = kind == "direct_temporal"
    paths = []
    for layer, (field, params) in enumerate(zip(fields, params_all)):
        if not own.export_fused:
            field = mk(field.cfg, fused=False)
        blob = export_renderer(
            field, params, rcfg, own.export_rays,
            platforms=platforms, with_times=with_times,
        )
        path = f"{own.export_out}.L{layer}"
        with open(path, "wb") as f:
            f.write(blob)
        h, w, focal = pyr_hwf[layer]
        print(
            f"Exported multires level {layer} @ iter {start} -> {path} "
            f"({len(blob)} bytes, {own.export_rays} rays, "
            f"level frame {h}x{w} focal={focal:.2f})"
        )
        paths.append(path)
    return paths


def main(argv=None):
    from swnerf_tpu.utils.export import export_renderer

    ap = argparse.ArgumentParser(add_help=False)
    ap.add_argument("--export_out", required=True)
    ap.add_argument("--export_rays", type=int, default=8192)
    ap.add_argument("--export_mode", default="nerf",
                    choices=("nerf", "dnerf", "tnerf", "multires"))
    ap.add_argument("--export_platforms", default=None,
                    help="comma-separated lowering platforms, e.g. tpu,cpu")
    ap.add_argument("--export_fused", action="store_true")
    own, rest = ap.parse_known_args(argv)

    if own.export_mode == "multires":
        return _export_multires(own, rest)

    field, fine_field, rcfg, state, start, with_times = _load(
        own.export_mode, rest, own.export_fused
    )
    platforms = (
        own.export_platforms.split(",") if own.export_platforms else None
    )
    blob = export_renderer(
        field, state.params, rcfg, own.export_rays,
        fine_field=fine_field, platforms=platforms, with_times=with_times,
    )
    with open(own.export_out, "wb") as f:
        f.write(blob)
    print(
        f"Exported {own.export_mode} @ iter {start} -> {own.export_out} "
        f"({len(blob)} bytes, {own.export_rays} rays"
        f"{', times operand' if with_times else ''}"
        f"{', platforms ' + own.export_platforms if own.export_platforms else ''})"
    )
    return own.export_out


if __name__ == "__main__":
    main()
