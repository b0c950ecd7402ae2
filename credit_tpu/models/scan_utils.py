"""Parameter-layout conversion for scan-over-blocks Transformer stages.

scan_blocks=True (models/layers.py Transformer) runs a stage's depth
identical blocks as one lax.scan body over parameters stacked on a leading
depth axis — one block graph in the compiled module instead of `depth`
copies. Checkpoints and the torch converter use the UNROLLED layout
(short_attn0..N-1); these helpers convert param/spectral trees between the
two layouts so either model variant can load either checkpoint.
"""

from __future__ import annotations

import re
from typing import Any, Dict

import jax
import jax.numpy as jnp

_BLOCK_RE = re.compile(r"^(short_attn|short_ff|long_attn|long_ff)(\d+)$")
_BLOCK_BASES = ("short_attn", "short_ff", "long_attn", "long_ff")


def stack_block_params(tree: Any) -> Any:
    """Unrolled stage subtrees ({short_attn0..}) -> scan layout
    ({blocks: {short_attn: leaves stacked on axis 0}}). Walks the whole
    tree; non-stage nodes pass through unchanged."""
    if not isinstance(tree, dict):
        return tree
    keys = [k for k in tree if _BLOCK_RE.match(k)]
    if not keys:
        return {k: stack_block_params(v) for k, v in tree.items()}
    depth = 1 + max(int(_BLOCK_RE.match(k).group(2)) for k in keys)
    blocks: Dict[str, Any] = {}
    for base in _BLOCK_BASES:
        subs = [tree[f"{base}{i}"] for i in range(depth)
                if f"{base}{i}" in tree]
        if subs:
            blocks[base] = jax.tree_util.tree_map(
                lambda *ls: jnp.stack(ls, axis=0), *subs)
    rest = {k: stack_block_params(v) for k, v in tree.items()
            if not _BLOCK_RE.match(k)}
    return {**rest, "blocks": blocks}


def unstack_block_params(tree: Any) -> Any:
    """Scan layout -> unrolled layout (for torch export / checkpoint
    interchange with scan_blocks=False models)."""
    if not isinstance(tree, dict):
        return tree
    if "blocks" in tree and isinstance(tree["blocks"], dict) and any(
            b in tree["blocks"] for b in _BLOCK_BASES):
        blocks = tree["blocks"]
        out = {k: unstack_block_params(v) for k, v in tree.items()
               if k != "blocks"}
        for base, sub in blocks.items():
            leaves = jax.tree_util.tree_leaves(sub)
            depth = int(leaves[0].shape[0]) if leaves else 0
            for i in range(depth):
                out[f"{base}{i}"] = jax.tree_util.tree_map(
                    lambda l, i=i: l[i], sub)
        return out
    return {k: unstack_block_params(v) for k, v in tree.items()}
