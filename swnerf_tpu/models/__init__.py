"""Field models: pure-pytree parameter trees + functional apply.

Each model family from the reference is expressed as a *field*: a pair of
``init(rng) -> params`` and ``apply(params, pts, viewdirs, times) ->
(raw, aux)`` functions consumed by the shared render core
(`swnerf_tpu.render.core`). This collapses the reference's four copy-paste
render engines into one core + four field definitions.
"""

from swnerf_tpu.models.common import Field, dense, torch_linear_init, kaiming_linear_init
from swnerf_tpu.models.vanilla import VanillaNeRFConfig, make_vanilla_field
from swnerf_tpu.models.dnerf import DNeRFConfig, make_dnerf_field, make_nerf_original_field
from swnerf_tpu.models.tnerf import TNeRFConfig, make_tnerf_field

__all__ = [
    "Field",
    "dense",
    "torch_linear_init",
    "kaiming_linear_init",
    "VanillaNeRFConfig",
    "make_vanilla_field",
    "DNeRFConfig",
    "make_dnerf_field",
    "make_nerf_original_field",
    "TNeRFConfig",
    "make_tnerf_field",
]
