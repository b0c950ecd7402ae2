"""Vendored minimal torch SwinTransformerV2Stage — the timm parameterization.

This is the parity ORACLE for the FuXi swin core (VERDICT round-1 item 6):
timm is absent in this image, so the reference's
`timm.models.swin_transformer_v2.SwinTransformerV2Stage` is re-created here
with the exact parameter names and math of timm's SwinV2 (qkv without bias +
separate q/v bias, per-head clamped logit_scale cosine attention, CPB MLP
Linear(2,512)->ReLU->Linear(512,heads,bias=False) on the log-spaced relative
coords table, 16*sigmoid bias, post-norm residuals, shifted windows with
-100 additive mask). Written independently of /root/reference — it's the
public SwinV2 formulation (Liu et al. 2022), vendored for tests only.
"""

import math

import torch
import torch.nn as nn
import torch.nn.functional as F


def to_2tuple(v):
    return tuple(v) if isinstance(v, (tuple, list)) else (v, v)


def window_partition(x, ws):
    B, H, W, C = x.shape
    x = x.view(B, H // ws, ws, W // ws, ws, C)
    return x.permute(0, 1, 3, 2, 4, 5).reshape(-1, ws * ws, C)


def window_reverse(xw, ws, H, W):
    B = xw.shape[0] // ((H // ws) * (W // ws))
    x = xw.view(B, H // ws, W // ws, ws, ws, -1)
    return x.permute(0, 1, 3, 2, 4, 5).reshape(B, H, W, -1)


class WindowAttention(nn.Module):
    def __init__(self, dim, num_heads, window_size, attn_drop=0.0,
                 proj_drop=0.0):
        super().__init__()
        self.dim = dim
        self.num_heads = num_heads
        self.window_size = to_2tuple(window_size)
        ws = self.window_size[0]

        self.logit_scale = nn.Parameter(
            torch.log(10 * torch.ones(num_heads, 1, 1)))
        self.cpb_mlp = nn.Sequential(
            nn.Linear(2, 512, bias=True), nn.ReLU(inplace=True),
            nn.Linear(512, num_heads, bias=False))

        coords = torch.arange(-(ws - 1), ws, dtype=torch.float32)
        table = torch.stack(torch.meshgrid(coords, coords, indexing="ij"),
                            dim=-1)
        table = table / (ws - 1) * 8
        table = (torch.sign(table) * torch.log2(torch.abs(table) + 1.0)
                 / math.log2(8))
        self.register_buffer("relative_coords_table",
                             table.reshape(-1, 2), persistent=False)

        coords = torch.stack(torch.meshgrid(torch.arange(ws),
                                            torch.arange(ws), indexing="ij"))
        flat = torch.flatten(coords, 1)
        rel = flat[:, :, None] - flat[:, None, :]
        rel = rel.permute(1, 2, 0).contiguous() + (ws - 1)
        idx = rel[..., 0] * (2 * ws - 1) + rel[..., 1]
        self.register_buffer("relative_position_index", idx, persistent=False)

        self.qkv = nn.Linear(dim, dim * 3, bias=False)
        self.q_bias = nn.Parameter(torch.zeros(dim))
        self.v_bias = nn.Parameter(torch.zeros(dim))
        self.attn_drop = nn.Dropout(attn_drop)
        self.proj = nn.Linear(dim, dim)
        self.proj_drop = nn.Dropout(proj_drop)

    def forward(self, x, mask=None):
        Bw, N, C = x.shape
        qkv_bias = torch.cat((self.q_bias,
                              torch.zeros_like(self.v_bias), self.v_bias))
        qkv = F.linear(x, self.qkv.weight, qkv_bias)
        qkv = qkv.reshape(Bw, N, 3, self.num_heads, -1).permute(2, 0, 3, 1, 4)
        q, k, v = qkv.unbind(0)                       # (Bw, H, N, dh)

        attn = F.normalize(q, dim=-1) @ F.normalize(k, dim=-1).transpose(-2, -1)
        scale = torch.clamp(self.logit_scale,
                            max=math.log(1.0 / 0.01)).exp()
        attn = attn * scale

        bias = self.cpb_mlp(self.relative_coords_table)
        bias = bias[self.relative_position_index.view(-1)].view(
            N, N, -1).permute(2, 0, 1).contiguous()
        attn = attn + (16 * torch.sigmoid(bias)).unsqueeze(0)

        if mask is not None:
            nW = mask.shape[0]
            attn = attn.view(Bw // nW, nW, self.num_heads, N, N) \
                + mask.unsqueeze(1).unsqueeze(0)
            attn = attn.view(-1, self.num_heads, N, N)
        attn = attn.softmax(dim=-1)
        attn = self.attn_drop(attn)
        x = (attn @ v).transpose(1, 2).reshape(Bw, N, C)
        return self.proj_drop(self.proj(x))


class Mlp(nn.Module):
    def __init__(self, dim, hidden, drop=0.0):
        super().__init__()
        self.fc1 = nn.Linear(dim, hidden)
        self.act = nn.GELU()
        self.fc2 = nn.Linear(hidden, dim)
        self.drop = nn.Dropout(drop)

    def forward(self, x):
        return self.drop(self.fc2(self.drop(self.act(self.fc1(x)))))


class SwinTransformerV2Block(nn.Module):
    def __init__(self, dim, input_resolution, num_heads, window_size=7,
                 shift_size=0, mlp_ratio=4.0, proj_drop=0.0, attn_drop=0.0,
                 drop_path=0.0):
        super().__init__()
        self.dim = dim
        self.input_resolution = to_2tuple(input_resolution)
        ws = min(window_size, *self.input_resolution)
        self.window_size = ws
        # same rule as the flax side: no shift when the window spans the grid
        self.shift_size = 0 if ws >= min(self.input_resolution) else shift_size
        self.num_heads = num_heads

        self.attn = WindowAttention(dim, num_heads, ws, attn_drop, proj_drop)
        self.norm1 = nn.LayerNorm(dim, eps=1e-5)
        self.mlp = Mlp(dim, int(dim * mlp_ratio), proj_drop)
        self.norm2 = nn.LayerNorm(dim, eps=1e-5)

        if self.shift_size > 0:
            H, W = self.input_resolution
            img = torch.zeros(H, W, dtype=torch.int32)
            cnt = 0
            for hs in (slice(0, -ws), slice(-ws, -self.shift_size),
                       slice(-self.shift_size, None)):
                for wsl in (slice(0, -ws), slice(-ws, -self.shift_size),
                            slice(-self.shift_size, None)):
                    img[hs, wsl] = cnt
                    cnt += 1
            win = img.view(H // ws, ws, W // ws, ws).permute(
                0, 2, 1, 3).reshape(-1, ws * ws)
            diff = win[:, :, None] - win[:, None, :]
            mask = torch.where(diff != 0, -100.0, 0.0).float()
            self.register_buffer("attn_mask", mask, persistent=False)
        else:
            self.attn_mask = None

    def forward(self, x):
        B, H, W, C = x.shape
        ws, ss = self.window_size, self.shift_size
        y = torch.roll(x, (-ss, -ss), dims=(1, 2)) if ss > 0 else x
        yw = window_partition(y, ws)
        yw = self.attn(yw, self.attn_mask)
        y = window_reverse(yw, ws, H, W)
        if ss > 0:
            y = torch.roll(y, (ss, ss), dims=(1, 2))
        x = x + self.norm1(y)                        # V2 post-norm
        x = x + self.norm2(self.mlp(x))
        return x


class SwinTransformerV2Stage(nn.Module):
    """Same-resolution stage (no downsample) — what FuXi's UTransformer uses
    (reference: credit/models/fuxi.py:249)."""

    def __init__(self, dim, out_dim, input_resolution, depth, num_heads,
                 window_size, proj_drop=0.0, attn_drop=0.0, drop_path=0.0,
                 **_):
        super().__init__()
        assert dim == out_dim, "minimal stage: no downsample/expansion"
        self.blocks = nn.ModuleList([
            SwinTransformerV2Block(
                dim, input_resolution, num_heads, window_size,
                shift_size=0 if i % 2 == 0 else window_size // 2,
                proj_drop=proj_drop, attn_drop=attn_drop,
                drop_path=drop_path)
            for i in range(depth)])

    def forward(self, x):
        for blk in self.blocks:
            x = blk(x)
        return x
