"""Graph neural network building blocks in pure JAX/flax.

The reference's GNN trainers (elektronn3/training/trainer_gnn*.py) build
on torch_geometric models. This module provides the native equivalents
over plain arrays — a graph is ``(x: (N, F), edge_index: (2, E))`` —
using segment-sum message passing (XLA scatter-add, TPU-friendly).

Includes GCN (Kipf & Welling, arXiv:1609.02907), GraphSAGE
(arXiv:1706.02216) and GAT (arXiv:1710.10903) convolutions plus a
configurable node-classification GNN.
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


def add_self_loops(edge_index: jnp.ndarray, num_nodes: int) -> jnp.ndarray:
    loops = jnp.arange(num_nodes)
    return jnp.concatenate(
        [edge_index, jnp.stack([loops, loops])], axis=1)


def gcn_norm(edge_index: jnp.ndarray, num_nodes: int) -> jnp.ndarray:
    """Symmetric D^-1/2 A D^-1/2 edge weights (self-loops assumed
    already added)."""
    row, col = edge_index
    deg = jax.ops.segment_sum(
        jnp.ones(row.shape[0]), row, num_segments=num_nodes)
    dinv = jax.lax.rsqrt(jnp.maximum(deg, 1e-12))
    return dinv[row] * dinv[col]


class GCNConv(nn.Module):
    """Graph convolution: X' = D^-1/2 (A+I) D^-1/2 X W."""
    features: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, edge_index):
        n = x.shape[0]
        ei = add_self_loops(edge_index, n)
        w = gcn_norm(ei, n).astype(x.dtype)
        h = nn.Dense(self.features, use_bias=False, dtype=self.dtype)(x)
        row, col = ei
        msgs = h[col] * w[:, None]
        out = jax.ops.segment_sum(msgs, row, num_segments=n)
        bias = self.param("bias", nn.initializers.zeros,
                          (self.features,), jnp.float32)
        return out + bias.astype(out.dtype)


class SAGEConv(nn.Module):
    """GraphSAGE-mean convolution: X' = W1 X + W2 mean_j X_j."""
    features: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, edge_index):
        n = x.shape[0]
        row, col = edge_index
        msgs = x[col]
        summed = jax.ops.segment_sum(msgs, row, num_segments=n)
        count = jax.ops.segment_sum(
            jnp.ones(row.shape[0], x.dtype), row, num_segments=n)
        mean = summed / jnp.maximum(count, 1.0)[:, None]
        return (nn.Dense(self.features, dtype=self.dtype, name="lin_self")(x)
                + nn.Dense(self.features, dtype=self.dtype,
                           name="lin_neigh")(mean))


class GATConv(nn.Module):
    """Single-layer multi-head graph attention."""
    features: int
    heads: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, edge_index):
        n = x.shape[0]
        ei = add_self_loops(edge_index, n)
        row, col = ei
        h = nn.Dense(self.features * self.heads, use_bias=False,
                     dtype=self.dtype)(x)
        h = h.reshape(n, self.heads, self.features)
        a_src = self.param("a_src", nn.initializers.normal(0.1),
                           (self.heads, self.features), jnp.float32)
        a_dst = self.param("a_dst", nn.initializers.normal(0.1),
                           (self.heads, self.features), jnp.float32)
        alpha_src = jnp.sum(h * a_src.astype(h.dtype), -1)  # (N, H)
        alpha_dst = jnp.sum(h * a_dst.astype(h.dtype), -1)
        e = nn.leaky_relu(alpha_src[row] + alpha_dst[col],
                          negative_slope=0.2)  # (E, H)
        # segment softmax over incoming edges of each target node
        e_max = jax.ops.segment_max(e, row, num_segments=n)
        e = jnp.exp(e - e_max[row])
        denom = jax.ops.segment_sum(e, row, num_segments=n)
        att = e / jnp.maximum(denom[row], 1e-12)
        msgs = h[col] * att[..., None]
        out = jax.ops.segment_sum(msgs, row, num_segments=n)
        return out.reshape(n, self.heads * self.features)


class GNN(nn.Module):
    """Configurable node-classification GNN (the reference trainers'
    torch_geometric models' counterpart): stack of conv layers with
    dropout, returning (logits, embeddings)."""
    hidden: int = 64
    out_channels: int = 2
    num_layers: int = 2
    conv: str = "gcn"  # 'gcn' | 'sage' | 'gat'
    dropout: float = 0.5
    dtype: Dtype = jnp.float32

    def _make_conv(self, features, name):
        if self.conv == "gcn":
            return GCNConv(features, dtype=self.dtype, name=name)
        if self.conv == "sage":
            return SAGEConv(features, dtype=self.dtype, name=name)
        if self.conv == "gat":
            return GATConv(features, dtype=self.dtype, name=name)
        raise ValueError(f"Unknown conv {self.conv!r}")

    @nn.compact
    def __call__(self, x, edge_index, *, train: bool = True):
        for i in range(self.num_layers - 1):
            x = self._make_conv(self.hidden, f"conv_{i}")(x, edge_index)
            x = nn.relu(x)
            x = nn.Dropout(self.dropout, deterministic=not train)(x)
        emb = x
        logits = self._make_conv(
            self.out_channels, f"conv_{self.num_layers - 1}")(x, edge_index)
        return logits, emb
