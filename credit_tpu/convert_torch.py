"""PyTorch (reference CREDIT) checkpoint -> credit-tpu flax variables.

Converts reference WXFormer/CrossFormer state_dicts — including the
HuggingFace wxformer_6h / wxformer_1h weights (reference: README.md:62-66,
credit/models/wxformer/crossformer.py module tree) — into this framework's
params + spectral collections:

  - Conv2d OIHW -> HWIO; ConvTranspose2d (I,O,kh,kw) -> (kh,kw,I,O)
  - 1x1 convs -> Dense (I,O); Linear (O,I) -> (I,O)
  - custom channel-LayerNorm g/b (1,C,1,1) -> scale/bias (C,)
  - spectral-norm weight_orig/weight_u/weight_v -> kernel + spectral u/v,
    with v re-permuted from torch's (I,kh,kw) column order to HWIO's
    (kh,kw,I)

Keys are mapped structurally (my module path -> reference key prefix), so
the same table drives save-side export for interchange.
"""

from __future__ import annotations

import re
from typing import Any, Dict

import numpy as np


def _np(t):
    if hasattr(t, "detach"):
        return t.detach().cpu().numpy()
    return np.asarray(t)


# my path prefix (joined with /) -> reference key prefix
_RULES = [
    (re.compile(r"^cel(\d+)/conv(\d+)$"), r"layers.\1.0.convs.\2"),
    (re.compile(r"^transformer(\d+)/short_attn(\d+)$"), r"layers.\1.1.layers.\2.0"),
    (re.compile(r"^transformer(\d+)/short_ff(\d+)$"), r"layers.\1.1.layers.\2.1"),
    (re.compile(r"^transformer(\d+)/long_attn(\d+)$"), r"layers.\1.1.layers.\2.2"),
    (re.compile(r"^transformer(\d+)/long_ff(\d+)$"), r"layers.\1.1.layers.\2.3"),
    (re.compile(r"^up_block(\d)/up$"), r"up_block\1.conv"),
    (re.compile(r"^up_block(\d)/res_conv(\d)$"),
     lambda m: f"up_block{m.group(1)}.b.{3 * int(m.group(2))}"),
    (re.compile(r"^up_block(\d)/res_gn(\d)$"),
     lambda m: f"up_block{m.group(1)}.b.{3 * int(m.group(2)) + 1}"),
    (re.compile(r"^up_block4$"), "up_block4"),
    (re.compile(r"^cube_embedding$"), "cube_embedding.proj"),
    (re.compile(r"^cube_embedding/norm$"), "cube_embedding.norm"),
]

_SUB_RULES = [
    (re.compile(r"^norm$"), "norm"),           # attn prenorm (g/b)
    (re.compile(r"^to_qkv$"), "to_qkv"),
    (re.compile(r"^to_out$"), "to_out"),
    (re.compile(r"^dpb/fc([012])$"), lambda m: f"dpb.layers.{3 * int(m.group(1))}"),
    (re.compile(r"^dpb/ln([012])$"), lambda m: f"dpb.layers.{3 * int(m.group(1)) + 1}"),
    (re.compile(r"^dpb/fc_out$"), "dpb.layers.9"),
]
_FF_SUB = [
    (re.compile(r"^norm$"), "layers.0"),
    (re.compile(r"^fc1$"), "layers.1"),
    (re.compile(r"^fc2$"), "layers.4"),
]


def _map_path(path: str):
    """my 'module/sub/leaf-less' path -> reference prefix, or None."""
    for block_rx, block_sub in _RULES:
        m = block_rx.match(path)
        if m:
            return m.expand(block_sub) if isinstance(block_sub, str) else block_sub(m)
    # two-level: block + submodule
    parts = path.split("/")
    for block_rx, block_sub in _RULES:
        m = block_rx.match("/".join(parts[:2]))
        if m:
            prefix = m.expand(block_sub) if isinstance(block_sub, str) else block_sub(m)
            rest = "/".join(parts[2:])
            subs = _FF_SUB if "_ff" in parts[1] else _SUB_RULES
            for rx, sub in subs:
                sm = rx.match(rest)
                if sm:
                    tail = sm.expand(sub) if isinstance(sub, str) else sub(sm)
                    return f"{prefix}.{tail}"
    return None


def _convert_kernel(src: np.ndarray, target_shape) -> np.ndarray:
    if src.ndim == 4 and len(target_shape) == 2:
        # 1x1 conv -> dense: (O, I, 1, 1) -> (I, O)
        return src[:, :, 0, 0].T
    if src.ndim == 2 and len(target_shape) == 2:
        return src.T  # Linear (O, I) -> (I, O)
    if src.ndim == 4 and len(target_shape) == 4:
        if tuple(src.transpose(2, 3, 1, 0).shape) == tuple(target_shape):
            return src.transpose(2, 3, 1, 0)  # Conv OIHW -> HWIO
        if tuple(src.transpose(2, 3, 0, 1).shape) == tuple(target_shape):
            return src.transpose(2, 3, 0, 1)  # ConvTranspose (I,O,kh,kw)
    if src.ndim == 5 and len(target_shape) == 5:
        return src.transpose(2, 3, 4, 1, 0)  # Conv3d (O,I,kd,kh,kw) -> DHWIO
    raise ValueError(f"cannot convert kernel {src.shape} -> {target_shape}")


def _convert_v(v: np.ndarray, src_kernel: np.ndarray) -> np.ndarray:
    """spectral v: torch column order (I, kh, kw) (conv) or (dims 0,2,3 for
    conv-transpose, also (I, kh, kw)) -> HWIO flat (kh, kw, I)."""
    if src_kernel.ndim == 4:
        o_first = src_kernel.shape[0] * np.prod(src_kernel.shape[2:])  # transpose case len
        if v.shape[0] == int(np.prod(src_kernel.shape[1:])):  # conv: (I*kh*kw)
            i, kh, kw = src_kernel.shape[1], src_kernel.shape[2], src_kernel.shape[3]
        else:  # conv-transpose: rows were dim1 (O); cols (I, kh, kw)
            i, kh, kw = src_kernel.shape[0], src_kernel.shape[2], src_kernel.shape[3]
        return v.reshape(i, kh, kw).transpose(1, 2, 0).reshape(-1)
    return v


def convert_crossformer(state_dict: Dict[str, Any], variables: Dict[str, Any],
                        strict: bool = True) -> Dict[str, Any]:
    """Fill my initialized `variables` ({'params', 'spectral'}) from a
    reference CrossFormer state_dict. Returns new variables."""
    import jax

    sd = {k: _np(v) for k, v in state_dict.items()}
    params = jax.tree_util.tree_map(np.asarray, variables["params"])
    spectral = jax.tree_util.tree_map(np.asarray, variables.get("spectral", {}))
    used = set()
    missing = []

    def walk(ptree, stree, path):
        leaf_names = [k for k, v in ptree.items() if not isinstance(v, dict)]
        if leaf_names:
            ref = _map_path(path)
            if ref is None:
                missing.append(path)
                return
            has_sn = isinstance(stree, dict) and "u" in stree
            w_key = (f"{ref}.weight_orig" if f"{ref}.weight_orig" in sd
                     else f"{ref}.weight")
            for leaf in leaf_names:
                tgt = ptree[leaf]
                if leaf == "kernel":
                    src = sd.get(w_key)
                    if src is None:
                        missing.append(f"{path}/kernel <- {w_key}")
                        continue
                    ptree[leaf] = _convert_kernel(src, tgt.shape).astype(tgt.dtype)
                    used.add(w_key)
                elif leaf == "bias" and f"{ref}.bias" in sd:
                    ptree[leaf] = sd[f"{ref}.bias"].reshape(tgt.shape).astype(tgt.dtype)
                    used.add(f"{ref}.bias")
                elif leaf == "scale":
                    for cand in (f"{ref}.g", f"{ref}.weight"):
                        if cand in sd:
                            ptree[leaf] = sd[cand].reshape(tgt.shape).astype(tgt.dtype)
                            used.add(cand)
                            break
                elif leaf == "bias":
                    for cand in (f"{ref}.b",):
                        if cand in sd:
                            ptree[leaf] = sd[cand].reshape(tgt.shape).astype(tgt.dtype)
                            used.add(cand)
                            break
            if has_sn:
                u_key, v_key = f"{ref}.weight_u", f"{ref}.weight_v"
                if u_key in sd:
                    stree["u"] = sd[u_key].astype(np.float32)
                    stree["v"] = _convert_v(sd[v_key], sd[w_key]).astype(np.float32)
                    used.update((u_key, v_key))
            return
        for k, sub in ptree.items():
            walk(sub, (stree or {}).get(k, {}) if isinstance(stree, dict) else {},
                 f"{path}/{k}" if path else k)

    walk(params, spectral, "")
    if strict and missing:
        raise KeyError(f"unmapped modules: {missing[:10]} (+{max(0, len(missing)-10)} more)")
    leftover = {k for k in sd if k not in used
                and not k.startswith("cube_embedding")  # unused when patch=1
                and "rel_pos_indices" not in k}
    if strict and leftover:
        raise KeyError(f"unconsumed reference keys: {sorted(leftover)[:10]}")
    out = dict(variables)
    out["params"] = params
    out["spectral"] = spectral
    return out


def load_torch_checkpoint(path: str) -> Dict[str, np.ndarray]:
    """Load a torch .pt checkpoint file into numpy (handles the reference's
    {'model_state_dict': ...} containers, base_trainer._save_checkpoint)."""
    import torch

    payload = torch.load(path, map_location="cpu", weights_only=True)
    for key in ("model_state_dict", "state_dict", "module"):
        if isinstance(payload, dict) and key in payload:
            payload = payload[key]
    return {k.replace("module.", ""): _np(v) for k, v in payload.items()}


# ---------------------------------------------------------------------------
# FuXi (reference credit/models/fuxi.py + timm SwinTransformerV2Stage core)


def _fold_sn(sd: Dict[str, np.ndarray], prefix: str) -> np.ndarray:
    """Return the effective eval-mode weight for a spectrally-normalized
    torch layer: weight_orig / sigma with sigma = u . (W v) (torch old-API
    eval semantics). Falls back to plain `weight`."""
    if f"{prefix}.weight_orig" in sd:
        w = sd[f"{prefix}.weight_orig"]
        u = sd[f"{prefix}.weight_u"]
        v = sd[f"{prefix}.weight_v"]
        if w.ndim == 4 and w.shape[0] != u.shape[0]:  # ConvTranspose: dim=1
            w2d = np.moveaxis(w, 1, 0).reshape(w.shape[1], -1)
        else:
            w2d = w.reshape(w.shape[0], -1)
        sigma = float(u @ (w2d @ v))
        return w / sigma
    return sd[f"{prefix}.weight"]


def convert_fuxi(state_dict: Dict[str, Any], variables: Dict[str, Any],
                 strict: bool = True) -> Dict[str, Any]:
    """Reference Fuxi state_dict -> credit_tpu Fuxi variables.

    Conv/ConvTranspose layers with native spectral norm convert weight_orig
    + u/v onto kernel + the 'spectral' collection; the timm SwinV2 core and
    the fc head (plain Dense here) use eval-exact sigma folding.
    """
    import jax

    sd = {k: _np(v) for k, v in state_dict.items()}
    params = jax.tree_util.tree_map(np.asarray, variables["params"])
    spectral = jax.tree_util.tree_map(np.asarray, variables.get("spectral", {}))
    used = set()

    def put(tree, path, value):
        node = tree
        for k in path[:-1]:
            node = node[k]
        tgt = node[path[-1]]
        assert tuple(value.shape) == tuple(tgt.shape), (path, value.shape, tgt.shape)
        node[path[-1]] = value.astype(tgt.dtype)

    def sn_layer(my_path, ref_prefix, kind):
        """kind: conv | convT; keeps native SN (u/v) when present."""
        w_key = f"{ref_prefix}.weight_orig" if f"{ref_prefix}.weight_orig" in sd \
            else f"{ref_prefix}.weight"
        w = sd[w_key]
        used.add(w_key)
        if kind == "conv":
            put(params, my_path + ["kernel"], w.transpose(2, 3, 1, 0))
        else:  # convT (I, O, kh, kw) -> (kh, kw, I, O)
            put(params, my_path + ["kernel"], w.transpose(2, 3, 0, 1))
        if f"{ref_prefix}.bias" in sd:
            put(params, my_path + ["bias"], sd[f"{ref_prefix}.bias"])
            used.add(f"{ref_prefix}.bias")
        if f"{ref_prefix}.weight_u" in sd:
            node = spectral
            for k in my_path:
                node = node[k]
            node["u"] = sd[f"{ref_prefix}.weight_u"].astype(np.float32)
            node["v"] = _convert_v(sd[f"{ref_prefix}.weight_v"], w).astype(np.float32)
            used.update((f"{ref_prefix}.weight_u", f"{ref_prefix}.weight_v"))

    def dense_folded(my_path, ref_prefix, bias: bool = True):
        w = _fold_sn(sd, ref_prefix)
        for cand in (f"{ref_prefix}.weight_orig", f"{ref_prefix}.weight",
                     f"{ref_prefix}.weight_u", f"{ref_prefix}.weight_v"):
            if cand in sd:
                used.add(cand)
        put(params, my_path + ["kernel"], w.T)
        if bias and f"{ref_prefix}.bias" in sd:
            put(params, my_path + ["bias"], sd[f"{ref_prefix}.bias"])
            used.add(f"{ref_prefix}.bias")

    def norm(my_path, ref_prefix, names=("scale", "bias")):
        put(params, my_path + [names[0]], sd[f"{ref_prefix}.weight"])
        put(params, my_path + [names[1]], sd[f"{ref_prefix}.bias"])
        used.update((f"{ref_prefix}.weight", f"{ref_prefix}.bias"))

    # cube embedding: Conv3d (O, I, kd, kh, kw) -> (kd, kh, kw, I, O)
    put(params, ["cube_embedding", "kernel"],
        sd["cube_embedding.proj.weight"].transpose(2, 3, 4, 1, 0))
    put(params, ["cube_embedding", "bias"], sd["cube_embedding.proj.bias"])
    used.update(("cube_embedding.proj.weight", "cube_embedding.proj.bias"))
    norm(["cube_embedding", "norm"], "cube_embedding.norm")

    # u_transformer down/up conv blocks
    for blk, kind in (("down", "conv"), ("up", "convT")):
        base = f"u_transformer.{blk}"
        my = ["u_transformer", blk]
        sn_layer(my + [blk], f"{base}.conv", kind)
        for r in range(2):
            sn_layer(my + [f"res_conv{r}"], f"{base}.b.{3 * r}", "conv")
            norm(my + [f"res_gn{r}"], f"{base}.b.{3 * r + 1}")

    # swin stage blocks (timm SwinTransformerV2Stage naming)
    i = 0
    while f"u_transformer.layer.blocks.{i}.norm1.weight" in sd:
        ref = f"u_transformer.layer.blocks.{i}"
        my = ["u_transformer", "swin", f"block{i}"]
        # Reference quirk we must reproduce exactly: timm's SwinV2 attention
        # computes F.linear(x, self.qkv.weight, qkv_bias) — reading .weight
        # as an ATTRIBUTE, which bypasses torch spectral_norm's pre-forward
        # hook. With the reference's model-wide apply_spectral_norm, qkv is
        # therefore effectively RAW (weight_orig) at eval, while cpb_mlp /
        # proj / mlp (invoked as modules) are sigma-folded.
        if f"{ref}.attn.qkv.weight_orig" in sd:
            put(params, my + ["attn", "qkv", "kernel"],
                sd[f"{ref}.attn.qkv.weight_orig"].T)
            used.update((f"{ref}.attn.qkv.weight_orig",
                         f"{ref}.attn.qkv.weight_u", f"{ref}.attn.qkv.weight_v"))
        else:
            dense_folded(my + ["attn", "qkv"], f"{ref}.attn.qkv", bias=False)
        for b in ("q_bias", "v_bias"):
            put(params, my + ["attn", b], sd[f"{ref}.attn.{b}"])
            used.add(f"{ref}.attn.{b}")
        put(params, my + ["attn", "logit_scale"], sd[f"{ref}.attn.logit_scale"])
        used.add(f"{ref}.attn.logit_scale")
        dense_folded(my + ["attn", "cpb_fc1"], f"{ref}.attn.cpb_mlp.0")
        dense_folded(my + ["attn", "cpb_fc2"], f"{ref}.attn.cpb_mlp.2", bias=False)
        dense_folded(my + ["attn", "proj"], f"{ref}.attn.proj")
        norm(my + ["norm1"], f"{ref}.norm1")
        norm(my + ["norm2"], f"{ref}.norm2")
        dense_folded(my + ["mlp_fc1"], f"{ref}.mlp.fc1")
        dense_folded(my + ["mlp_fc2"], f"{ref}.mlp.fc2")
        i += 1

    # fc head (plain Dense here; SN folded)
    dense_folded(["fc"], "fc")

    leftover = {k for k in sd if k not in used
                and "relative_position" not in k and "attn_mask" not in k
                and "relative_coords_table" not in k}
    if strict and leftover:
        raise KeyError(f"unconsumed fuxi keys: {sorted(leftover)[:10]} "
                       f"(+{max(0, len(leftover) - 10)})")
    out = dict(variables)
    out["params"] = params
    out["spectral"] = spectral
    return out
