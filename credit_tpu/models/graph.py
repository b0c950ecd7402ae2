"""Graph transformer GRU model.

From-scratch JAX re-design of the reference graph model (reference:
credit/models/graph.py:28 GraphResTransfGRU — torch_geometric
TransformerConv:221 message passing + GateCell:395 GRU gating over
residual transformer blocks; mesh edges built by
applications/graph_edges[_knn].py). torch_geometric's gather/scatter message
passing becomes segment-softmax + segment-sum over a static edge list — the
XLA-friendly formulation (one gather + two segment reductions per layer).

Nodes are the flattened lat-lon grid; edges come from k-nearest neighbors in
chord distance on the sphere (built host-side at construction).
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from credit_tpu import registry
from credit_tpu.models.base import BaseModel

Dtype = Any


def knn_sphere_edges(lat_deg: np.ndarray, lon_deg: np.ndarray, k: int = 8
                     ) -> Tuple[np.ndarray, np.ndarray]:
    """(edge_src, edge_dst) for k nearest neighbors on the unit sphere
    (reference: applications/graph_edges_knn.py behavior)."""
    lat = np.deg2rad(lat_deg)
    lon = np.deg2rad(lon_deg)
    la, lo = np.meshgrid(lat, lon, indexing="ij")
    xyz = np.stack([np.cos(la) * np.cos(lo), np.cos(la) * np.sin(lo),
                    np.sin(la)], axis=-1).reshape(-1, 3)
    n = xyz.shape[0]
    # block-wise knn to bound memory
    src_list, dst_list = [], []
    block = 2048
    for start in range(0, n, block):
        d = xyz[start:start + block] @ xyz.T  # cos similarity
        idx = np.argpartition(-d, k + 1, axis=1)[:, :k + 1]
        for row, neigh in enumerate(idx):
            i = start + row
            for j in neigh:
                if j != i:
                    src_list.append(j)
                    dst_list.append(i)
    return np.asarray(src_list, np.int32), np.asarray(dst_list, np.int32)


def segment_softmax(logits: jnp.ndarray, segment_ids: jnp.ndarray,
                    num_segments: int) -> jnp.ndarray:
    """Softmax over edges grouped by destination node; logits (E, H)."""
    maxes = jax.ops.segment_max(logits, segment_ids, num_segments)
    exp = jnp.exp(logits - maxes[segment_ids])
    denom = jax.ops.segment_sum(exp, segment_ids, num_segments)
    return exp / (denom[segment_ids] + 1e-9)


class GraphTransformerConv(nn.Module):
    """TransformerConv (Shi et al. 2021) via segment ops; batch handled by
    vmapping node features over a shared static graph (the reference's
    'extra batch dimension' adaptation, graph.py:221)."""

    out_channels: int
    heads: int = 4
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, edge_src, edge_dst, edge_attr=None):
        """x: (N, C); edge_*: (E,). Returns (N, heads*out)."""
        h, c = self.heads, self.out_channels
        q = nn.Dense(h * c, dtype=self.dtype, name="lin_query")(x)
        k = nn.Dense(h * c, dtype=self.dtype, name="lin_key")(x)
        v = nn.Dense(h * c, dtype=self.dtype, name="lin_value")(x)
        n = x.shape[0]
        qe = q[edge_dst].reshape(-1, h, c)
        ke = k[edge_src].reshape(-1, h, c)
        ve = v[edge_src].reshape(-1, h, c)
        if edge_attr is not None:
            ea = nn.Dense(h * c, use_bias=False, dtype=self.dtype,
                          name="lin_edge")(edge_attr).reshape(-1, h, c)
            ke = ke + ea
            ve = ve + ea
        logits = (qe * ke).sum(-1) / jnp.sqrt(float(c))  # (E, h)
        alpha = segment_softmax(logits, edge_dst, n)
        msg = ve * alpha[..., None]
        agg = jax.ops.segment_sum(msg.reshape(-1, h * c), edge_dst, n)
        skip = nn.Dense(h * c, dtype=self.dtype, name="lin_skip")(x)
        return agg + skip


class GateCell(nn.Module):
    """GRU-style gate (reference graph.py:395)."""

    hidden_size: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, hprev: Optional[jnp.ndarray]):
        d = self.hidden_size
        z = nn.Dense(d, dtype=self.dtype, name="z_x")(x)
        r = nn.Dense(d, dtype=self.dtype, name="r_x")(x)
        if hprev is not None:
            z = z + nn.Dense(d, dtype=self.dtype, name="z_h")(hprev)
            r = r + nn.Dense(d, dtype=self.dtype, name="r_h")(hprev)
        z = nn.sigmoid(z)
        r = nn.sigmoid(r)
        if hprev is None:
            h_hat = jnp.tanh(nn.Dense(d, dtype=self.dtype, name="h_x")(x))
            return h_hat
        h_hat = jnp.tanh(nn.Dense(d, dtype=self.dtype, name="h_h")(r * hprev))
        return (1 - z) * hprev + z * h_hat


class GraphBlock(nn.Module):
    """transformer conv -> relu -> linear -> LN -> relu -> linear, residual
    (reference ResTransformerConv, graph.py:205-218)."""

    hidden_size: int
    heads: int = 4
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, edge_src, edge_dst, edge_attr=None):
        t = GraphTransformerConv(self.hidden_size // self.heads, self.heads,
                                 self.dtype, name="transformer")(
            x, edge_src, edge_dst, edge_attr)
        t = nn.relu(t)
        t = nn.Dense(self.hidden_size, dtype=self.dtype, name="physics_linear")(t)
        t = nn.LayerNorm(dtype=self.dtype, name="norm")(t)
        t = nn.relu(t)
        t = nn.Dense(self.hidden_size, dtype=self.dtype, name="merge_linear")(t)
        return t + x


@registry.register("model", "graph")
class GraphResTransfGRU(BaseModel):
    image_height: int = 181
    image_width: int = 360
    frames: int = 1
    output_frames: int = 1
    channels: int = 4
    surface_channels: int = 4
    input_only_channels: int = 0
    output_only_channels: int = 0
    levels: int = 15
    hidden_size: int = 256
    n_blocks: int = 4
    heads: int = 4
    knn: int = 6
    compute_dtype: Any = jnp.float32

    @property
    def base_input_channels(self):
        return self.channels * self.levels + self.surface_channels + self.input_only_channels

    @property
    def base_output_channels(self):
        return self.channels * self.levels + self.surface_channels + self.output_only_channels

    def setup(self):
        lat = np.linspace(90.0, -90.0, self.image_height)
        lon = np.linspace(0.0, 360.0, self.image_width, endpoint=False)
        src, dst = knn_sphere_edges(lat, lon, self.knn)
        self.edge_src = jnp.asarray(src)
        self.edge_dst = jnp.asarray(dst)
        self.encoder = nn.Dense(self.hidden_size, dtype=self.compute_dtype)
        self.blocks = [GraphBlock(self.hidden_size, self.heads, self.compute_dtype)
                       for _ in range(self.n_blocks)]
        self.gates = [GateCell(self.hidden_size, self.compute_dtype)
                      for _ in range(self.n_blocks)]
        self.decoder = nn.Dense(self.base_output_channels * self.output_frames,
                                dtype=self.compute_dtype)

    def __call__(self, x, train: bool = False):
        """x: (B, T, H, W, C) -> (B, T_out, H, W, C_out)."""
        b, t, hh, ww, c = x.shape
        nodes = x.transpose(0, 2, 3, 4, 1).reshape(b, hh * ww, c * t)

        def per_sample(nf):
            h = self.encoder(nf)
            state = None
            for blk, gate in zip(self.blocks, self.gates):
                h = blk(h, self.edge_src, self.edge_dst)
                state = gate(h, state)
                h = state
            return self.decoder(h)

        out = jax.vmap(per_sample)(nodes)
        out = out.reshape(b, hh, ww, self.base_output_channels, self.output_frames)
        return out.transpose(0, 4, 1, 2, 3)
