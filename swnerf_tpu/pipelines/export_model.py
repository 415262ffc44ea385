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
        --export_rays 8192 [--export_platforms tpu,cpu] [--export_fused]

``--export_rays`` fixes the artifact's static ray-batch size (callers
tile/pad frames, exactly as render_image does). By default the field is
rebuilt ``fused=False`` so the artifact is pure StableHLO (portable via
``--export_platforms``); ``--export_fused`` keeps the session field as-is
(on TPU that embeds Mosaic custom calls — TPU-only artifacts).
"""

from __future__ import annotations

import argparse


def main(argv=None):
    from swnerf_tpu.models import make_vanilla_field
    from swnerf_tpu.pipelines.run_nerf import create_vanilla
    from swnerf_tpu.utils.config import config_parser
    from swnerf_tpu.utils.export import export_renderer

    ap = argparse.ArgumentParser(add_help=False)
    ap.add_argument("--export_out", required=True)
    ap.add_argument("--export_rays", type=int, default=8192)
    ap.add_argument("--export_platforms", default=None,
                    help="comma-separated lowering platforms, e.g. tpu,cpu")
    ap.add_argument("--export_fused", action="store_true")
    own, rest = ap.parse_known_args(argv)

    args = config_parser().parse_args(rest)
    field, fine_field, rcfg, _opt, state, start, (mcfg, fcfg) = create_vanilla(args)
    if not own.export_fused:
        field = make_vanilla_field(mcfg, fused=False)
        if fcfg is not None:
            fine_field = make_vanilla_field(fcfg, fused=False)

    platforms = (
        own.export_platforms.split(",") if own.export_platforms else None
    )
    blob = export_renderer(
        field, state.params, rcfg, own.export_rays,
        fine_field=fine_field, platforms=platforms,
    )
    with open(own.export_out, "wb") as f:
        f.write(blob)
    print(
        f"Exported {args.expname} @ iter {start} -> {own.export_out} "
        f"({len(blob)} bytes, {own.export_rays} rays"
        f"{', platforms ' + own.export_platforms if own.export_platforms else ''})"
    )
    return own.export_out


if __name__ == "__main__":
    main()
