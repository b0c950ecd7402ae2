"""Domain-specific model variants registered as thin specializations.

The reference carries near-identical architecture clones per domain
(reference: credit/models/camulator.py:375 — a CrossFormer clone with a
spectral-norm exclusion for the sharp skip path; credit/models/swin_wrf.py
WRFTransformer and dscale_wrf.py DscaleTransformer — regional Swin
transformers; credit/models/wxformer/crossformer_downscaling.py). Here they
are registry aliases with variant defaults rather than copied code — the
behavioral deltas (regional/no-earth padding, downscaling output grid)
are config-driven on the shared backbones.
"""

from __future__ import annotations

from credit_tpu import registry
from credit_tpu.models.crossformer import CrossFormer
from credit_tpu.models.swin import SwinTransformerV2


@registry.register("model", "camulator")
class Camulator(CrossFormer):
    """CAM (climate model) emulator — CrossFormer backbone; conservation
    fixers are attached via post_conf in the postblock pipeline."""


@registry.register("model", "crossformer_downscaling")
class CrossFormerDownscaling(CrossFormer):
    """Downscaling head: output grid may differ from input; set
    image_height/width to the TARGET grid and the final bilinear recovery
    performs the upscale (reference crossformer_downscaling.py)."""


@registry.register("model", "wrf")
class WRFTransformer(SwinTransformerV2):
    """Regional WRF transformer (reference swin_wrf.py): Swin backbone,
    non-periodic regional domain (no earth padding)."""


@registry.register("model", "dscale")
class DscaleTransformer(SwinTransformerV2):
    """Regional downscaling transformer (reference dscale_wrf.py)."""
