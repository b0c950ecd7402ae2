"""Domain-specific model variants with their reference behavioral deltas.

(reference: credit/models/camulator.py:375 — CrossFormer clone whose
apply_spectral_norm skips the zero-init 'sharp' decoder conv, :22-26,78-94;
credit/models/wxformer/crossformer_downscaling.py — downscaling head onto a
distinct target grid. The regional swin_wrf/dscale_wrf architectures live
in credit_tpu/models/regional.py.)
"""

from __future__ import annotations

from credit_tpu import registry
from credit_tpu.models.crossformer import CrossFormer


@registry.register("model", "camulator")
class Camulator(CrossFormer):
    """CAM (climate model) emulator: CrossFormer + the sharp-skip delta —
    a zero-init 3x3 decoder conv residual EXCLUDED from spectral norm
    (no 'spectral' state for it); conservation fixers attach via post_conf."""

    sharp_skip: bool = True


@registry.register("model", "crossformer_downscaling")
class CrossFormerDownscaling(CrossFormer):
    """Downscaling head: encoder runs on the source grid; the final
    recovery interpolates onto the TARGET grid set by
    out_image_height/out_image_width (reference crossformer_downscaling.py)."""
