"""Neighbor-sampled minibatch GNN trainer.

Reference: elektronn3/training/trainer_gnn_minibatch.py:60-666:
- NeighborLoader-style sampling: per batch, seed nodes + k-hop sampled
  neighborhood subgraph (:192-218)
- class-imbalance-aware seed sampling (ImbalancedSampler)
- optional self-supervised embedding loss with edge dropout + negative
  sampling (:322-381)
- online clustering / linear probes (MiniBatchKMeans, SGDClassifier)
  (:436-530)

Native implementation over plain arrays; all sampling happens on host
(numpy), message passing on device.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
import optax

from elektronn3_tpu import logger


def sample_neighbors(edge_index: np.ndarray, seeds: np.ndarray,
                     num_neighbors: Sequence[int],
                     rng: np.random.Generator):
    """k-hop neighbor sampling: returns (node_ids, sub_edge_index,
    seed_positions). Approximates torch_geometric NeighborLoader."""
    row, col = edge_index
    # adjacency as CSR-ish dict built lazily per call (small graphs)
    order = np.argsort(row, kind="stable")
    row_s, col_s = row[order], col[order]
    starts = np.searchsorted(row_s, np.arange(row_s.max() + 2))

    nodes = list(seeds)
    node_set = {int(s): i for i, s in enumerate(seeds)}
    edges_src, edges_dst = [], []
    frontier = list(seeds)
    for fanout in num_neighbors:
        new_frontier = []
        for u in frontier:
            u = int(u)
            if u + 1 >= len(starts):
                continue
            nbrs = col_s[starts[u]:starts[u + 1]]
            if len(nbrs) > fanout:
                nbrs = rng.choice(nbrs, fanout, replace=False)
            for v in nbrs:
                v = int(v)
                if v not in node_set:
                    node_set[v] = len(nodes)
                    nodes.append(v)
                    new_frontier.append(v)
                edges_src.append(node_set[u])
                edges_dst.append(node_set[v])
        frontier = new_frontier
    nodes = np.asarray(nodes, np.int64)
    if edges_src:
        sub_ei = np.stack([np.asarray(edges_src), np.asarray(edges_dst)])
        # symmetric
        sub_ei = np.concatenate([sub_ei, sub_ei[::-1]], axis=1)
    else:
        sub_ei = np.zeros((2, 0), np.int64)
    return nodes, sub_ei, np.arange(len(seeds))


class GNNTrainer:
    """Minibatch GNN trainer with neighbor sampling + optional
    self-supervised embedding loss."""

    def __init__(self, model, graph: Dict[str, np.ndarray],
                 batch_size: int = 64,
                 num_neighbors: Sequence[int] = (10, 5),
                 lr: float = 1e-2, weight_decay: float = 5e-4,
                 imbalanced_sampling: bool = True,
                 embedding_loss: bool = False,
                 edge_dropout: float = 0.2,
                 seed: int = 0):
        self.model = model
        self.graph = {k: np.asarray(v) for k, v in graph.items()}
        self.batch_size = batch_size
        self.num_neighbors = tuple(num_neighbors)
        self.embedding_loss = embedding_loss
        self.edge_dropout = edge_dropout
        self.rng_np = np.random.default_rng(seed)
        self.optimizer = optax.adamw(lr, weight_decay=weight_decay)

        y = self.graph["y"]
        train_mask = self.graph.get(
            "train_mask", np.ones(len(y), bool))
        self.train_nodes = np.where(train_mask)[0]
        if imbalanced_sampling:
            # Inverse-frequency seed weights (ImbalancedSampler analog)
            counts = np.bincount(y[self.train_nodes])
            w = 1.0 / np.maximum(counts[y[self.train_nodes]], 1)
            self.seed_weights = w / w.sum()
        else:
            self.seed_weights = None

        key = jax.random.PRNGKey(seed)
        self._rng = key
        x0 = jnp.asarray(self.graph["x"][:4])
        ei0 = jnp.zeros((2, 1), jnp.int32)
        variables = model.init({"params": key, "dropout": key}, x0, ei0,
                               train=False)
        self.params = variables["params"]
        self.opt_state = self.optimizer.init(self.params)
        self.step = 0

    def _loss(self, params, x, edge_index, y, seed_pos, rng):
        logits, emb = self.model.apply(
            {"params": params}, x, edge_index, train=True,
            rngs={"dropout": rng})
        logp = jax.nn.log_softmax(logits, -1)
        nll = -jnp.take_along_axis(logp, y[:, None], axis=-1)[:, 0]
        loss = jnp.mean(nll[seed_pos])
        if self.embedding_loss and edge_index.shape[1] > 0:
            # Self-supervised: connected nodes near, random pairs far
            # (reference :322-381 with negative sampling).
            src, dst = edge_index
            pos = jnp.sum(emb[src] * emb[dst], -1)
            neg_dst = jax.random.permutation(rng, dst)
            neg = jnp.sum(emb[src] * emb[neg_dst], -1)
            emb_loss = jnp.mean(
                jax.nn.softplus(-pos) + jax.nn.softplus(neg))
            loss = loss + 0.1 * emb_loss
        return loss

    def _train_step(self, params, opt_state, x, ei, y, seed_pos, rng):
        loss, grads = jax.value_and_grad(self._loss)(
            params, x, ei, y, seed_pos, rng)
        updates, opt_state = self.optimizer.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    def run(self, max_steps: int = 100) -> Dict[str, float]:
        losses = []
        while self.step < max_steps:
            seeds = self.rng_np.choice(
                self.train_nodes, min(self.batch_size,
                                      len(self.train_nodes)),
                replace=False, p=self.seed_weights)
            ei = self.graph["edge_index"]
            if self.edge_dropout > 0:
                keep = self.rng_np.random(ei.shape[1]) > self.edge_dropout
                ei = ei[:, keep]
            nodes, sub_ei, seed_pos = sample_neighbors(
                ei, seeds, self.num_neighbors, self.rng_np)
            x = jnp.asarray(self.graph["x"][nodes])
            y = jnp.asarray(self.graph["y"][nodes])
            self._rng, step_rng = jax.random.split(self._rng)
            self.params, self.opt_state, loss = self._train_step(
                self.params, self.opt_state, x, jnp.asarray(sub_ei), y,
                jnp.asarray(seed_pos), step_rng)
            losses.append(float(loss))
            self.step += 1
        stats = {"tr_loss": float(np.mean(losses[-20:]))}
        stats.update(self.evaluate())
        return stats

    def evaluate(self) -> Dict[str, float]:
        """Full-graph eval + online probes (reference :436-530)."""
        logits, emb = self.model.apply(
            {"params": self.params}, jnp.asarray(self.graph["x"]),
            jnp.asarray(self.graph["edge_index"]), train=False)
        pred = np.argmax(np.asarray(logits), -1)
        y = self.graph["y"]
        mask = self.graph.get("val_mask", np.ones(len(y), bool))
        out = {"val_acc": float((pred[mask] == y[mask]).mean())}
        try:
            from sklearn.cluster import MiniBatchKMeans
            from sklearn.metrics import v_measure_score
            k = len(np.unique(y))
            if k >= 2:
                km = MiniBatchKMeans(n_clusters=k, n_init=3,
                                     random_state=0).fit(np.asarray(emb))
                out["val_v_measure"] = float(v_measure_score(y, km.labels_))
        except Exception:
            pass
        return out
