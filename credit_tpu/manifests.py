"""HuggingFace checkpoint key/shape manifests + dry-run synthesis.

The reference publishes trained checkpoints on HuggingFace (reference:
README.md:62-66 — wxformer_6h, fuxi_6h; loaded via
credit/models/base_model.py:57 load_state_dict). This environment has no
egress, so we vendor the exact state_dict KEY/SHAPE manifests (names +
shapes only, extracted from the reference model classes at the published
configs) and validate the conversion path end-to-end against a synthesized
checkpoint with that layout — making the real HF download a mechanical
no-op when network exists:

    credit-tpu convert-checkpoint cfg.yml --dry-run-manifest wxformer_6h
"""

from __future__ import annotations

import json
import os
from typing import Dict, List

_DIR = os.path.join(os.path.dirname(__file__), "data", "manifests")

# model config matching each manifest (reference:
# config/gen_1/arXiv_2024/{wxformer,fuxi}_6h_single_step.yml model sections)
MANIFEST_MODEL_CONF = {
    "wxformer_6h": {
        "type": "crossformer", "frames": 1, "image_height": 640,
        "image_width": 1280, "levels": 16, "channels": 4,
        "surface_channels": 7, "input_only_channels": 3,
        "output_only_channels": 0, "patch_width": 1, "patch_height": 1,
        "frame_patch_size": 1, "dim": [128, 256, 512, 1024],
        "depth": [2, 2, 8, 2], "global_window_size": [10, 5, 2, 1],
        "local_window_size": 10,
        "cross_embed_kernel_sizes": [[4, 8, 16, 32], [2, 4], [2, 4], [2, 4]],
        "cross_embed_strides": [2, 2, 2, 2], "use_spectral_norm": True,
        "interp": True,
        "padding_conf": {"activate": True, "mode": "earth",
                         "pad_lat": [80, 80], "pad_lon": [80, 80]},
    },
    "fuxi_6h": {
        "type": "fuxi", "frames": 2, "frame_patch_size": 2,
        "image_height": 640, "image_width": 1280, "patch_height": 4,
        "patch_width": 4, "levels": 16, "channels": 4,
        "surface_channels": 7, "input_only_channels": 3,
        "output_only_channels": 0, "dim": 1024, "num_groups": 32,
        "num_heads": 8, "window_size": 7, "depth": 16,
        "use_spectral_norm": True, "interp": True,
        "padding_conf": {"activate": True, "mode": "earth",
                         "pad_lat": [80, 80], "pad_lon": [80, 80]},
    },
}


def available() -> List[str]:
    return sorted(f[:-5] for f in os.listdir(_DIR) if f.endswith(".json"))


def load_manifest(name: str) -> Dict[str, List[int]]:
    path = os.path.join(_DIR, f"{name}.json")
    if not os.path.exists(path):
        raise KeyError(f"no manifest {name!r}; available: {available()}")
    with open(path) as f:
        return json.load(f)


def synthesize_state_dict(name: str, seed: int = 0):
    """Torch state_dict with the manifest's exact keys/shapes and small
    deterministic values — shaped like the real HF checkpoint so the
    converter's key mapping + transposes are validated end to end."""
    import torch

    g = torch.Generator().manual_seed(seed)
    out = {}
    for k, shape in load_manifest(name).items():
        t = torch.empty(*shape) if shape else torch.empty(())
        out[k] = t.normal_(0.0, 0.02, generator=g)
    return out
