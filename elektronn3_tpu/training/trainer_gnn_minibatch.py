"""Neighbor-sampled minibatch GNN trainer.

Reference: elektronn3/training/trainer_gnn_minibatch.py:60-666:
- NeighborLoader-style sampling: per batch, seed nodes + k-hop sampled
  neighborhood subgraph (:192-218)
- class-imbalance-aware seed sampling (ImbalancedSampler)
- optional self-supervised embedding loss with edge dropout + negative
  sampling (:322-381)
- online clustering / linear probes (MiniBatchKMeans, SGDClassifier)
  partial_fit during training (:242-243, :361-362) + probe prediction
  at validation (:436-530)
- neighbor-sampled validation batches (:436-506)

Native implementation over plain arrays; all sampling happens on host
(numpy), message passing on device. The train step is ONE jitted XLA
program over power-of-two-padded static shapes (masked losses), so
steady-state steps are device-bound, not Python-bound.
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


def _ceil_pow2(n: int) -> int:
    return 1 << max(int(n) - 1, 0).bit_length()


class GNNTrainer:
    """Minibatch GNN trainer with neighbor sampling, a JIT-compiled
    padded-static-shape train step, optional self-supervised embedding
    loss, and online linear/clustering probes."""

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
        self.n_seeds = min(self.batch_size, len(self.train_nodes))

        key = jax.random.PRNGKey(seed)
        self._rng = key
        x0 = jnp.asarray(self.graph["x"][:4])
        ei0 = jnp.zeros((2, 1), jnp.int32)
        variables = model.init({"params": key, "dropout": key}, x0, ei0,
                               train=False)
        self.params = variables["params"]
        self.opt_state = self.optimizer.init(self.params)
        self.step = 0

        # Online probes trained on seed embeddings during training
        # (reference :242-243, :361-362: SGDClassifier(loss='log') +
        # MiniBatchKMeans partial_fit per step).
        self._n_classes = int(y.max()) + 1
        try:
            from sklearn.cluster import MiniBatchKMeans
            from sklearn.linear_model import SGDClassifier
            self._sgd_probe = SGDClassifier(loss="log_loss",
                                            random_state=seed)
            self._km_probe = MiniBatchKMeans(
                n_clusters=self._n_classes, n_init=3, random_state=seed) \
                if self._n_classes >= 2 else None
        except ImportError:
            self._sgd_probe = None
            self._km_probe = None

        # ONE jitted train step over padded static shapes: node/edge
        # counts vary per sampled subgraph, so inputs are padded to
        # power-of-two buckets (few recompiles) with masked losses —
        # the step itself is a single compiled XLA program (reference
        # runs eager per-batch torch ops).
        self._train_step_jit = jax.jit(self._padded_train_step)
        self._eval_step_jit = jax.jit(self._padded_eval_step)

    # -- padded, jit-compiled steps -------------------------------------

    def _padded_loss(self, params, x, ei, y, edge_mask, rng, train):
        rngs = {"dropout": rng} if train else None
        logits, emb = self.model.apply(
            {"params": params}, x, ei, train=train, rngs=rngs)
        logp = jax.nn.log_softmax(logits, -1)
        nll = -jnp.take_along_axis(logp, y[:, None], axis=-1)[:, 0]
        # Seeds occupy the first n_seeds node slots by construction.
        loss = jnp.mean(nll[:self.n_seeds])
        if self.embedding_loss:
            # Self-supervised: connected nodes near, random pairs far
            # (reference :322-381 with negative sampling). Padded edges
            # (dummy self-loops) are masked out of the mean.
            src, dst = ei
            pos = jnp.sum(emb[src] * emb[dst], -1)
            neg_dst = jax.random.permutation(rng, dst)
            neg = jnp.sum(emb[src] * emb[neg_dst], -1)
            per_edge = jax.nn.softplus(-pos) + jax.nn.softplus(neg)
            denom = jnp.maximum(jnp.sum(edge_mask), 1.0)
            loss = loss + 0.1 * jnp.sum(per_edge * edge_mask) / denom
        return loss, (logits, emb)

    def _padded_train_step(self, params, opt_state, x, ei, y, edge_mask,
                           rng):
        (loss, (_, emb)), grads = jax.value_and_grad(
            self._padded_loss, has_aux=True)(
                params, x, ei, y, edge_mask, rng, True)
        updates, opt_state = self.optimizer.update(grads, opt_state,
                                                   params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss, emb[:self.n_seeds]

    def _padded_eval_step(self, params, x, ei, y, edge_mask):
        loss, (logits, emb) = self._padded_loss(
            params, x, ei, y, edge_mask, jax.random.PRNGKey(0), False)
        return loss, logits[:self.n_seeds], emb[:self.n_seeds]

    def _pad_batch(self, nodes, sub_ei):
        """Pad a sampled subgraph to power-of-two node/edge buckets.
        Padded node slots get zero features/labels; padded edges are
        dummy-node self-loops (they only touch the last padded slot, so
        real aggregations are unaffected)."""
        n, e = len(nodes), sub_ei.shape[1]
        n_pad = _ceil_pow2(n + 1)  # +1 guarantees a dummy slot exists
        e_pad = _ceil_pow2(max(e, 1))
        x = np.zeros((n_pad,) + self.graph["x"].shape[1:],
                     self.graph["x"].dtype)
        x[:n] = self.graph["x"][nodes]
        y = np.zeros((n_pad,), self.graph["y"].dtype)
        y[:n] = self.graph["y"][nodes]
        ei = np.full((2, e_pad), n_pad - 1, np.int32)
        ei[:, :e] = sub_ei
        edge_mask = np.zeros((e_pad,), np.float32)
        edge_mask[:e] = 1.0
        return (jnp.asarray(x), jnp.asarray(ei), jnp.asarray(y),
                jnp.asarray(edge_mask))

    def _sample_batch(self, seeds, edge_dropout: float):
        ei = self.graph["edge_index"]
        if edge_dropout > 0:
            keep = self.rng_np.random(ei.shape[1]) > edge_dropout
            ei = ei[:, keep]
        nodes, sub_ei, _ = sample_neighbors(
            ei, seeds, self.num_neighbors, self.rng_np)
        return self._pad_batch(nodes, sub_ei)

    # -- training loop ---------------------------------------------------

    def run(self, max_steps: int = 100) -> Dict[str, float]:
        losses = []
        while self.step < max_steps:
            seeds = self.rng_np.choice(
                self.train_nodes, self.n_seeds,
                replace=False, p=self.seed_weights)
            x, ei, y, edge_mask = self._sample_batch(
                seeds, self.edge_dropout)
            self._rng, step_rng = jax.random.split(self._rng)
            self.params, self.opt_state, loss, seed_emb = \
                self._train_step_jit(self.params, self.opt_state, x, ei,
                                     y, edge_mask, step_rng)
            losses.append(float(loss))
            if self._sgd_probe is not None:
                z = np.asarray(seed_emb, np.float32)
                self._sgd_probe.partial_fit(
                    z, self.graph["y"][seeds],
                    classes=np.arange(self._n_classes))
                if self._km_probe is not None:
                    self._km_probe.partial_fit(z)
            self.step += 1
        stats = {"tr_loss": float(np.mean(losses[-20:]))}
        stats.update(self.evaluate())
        stats.update(self.validate_sampled())
        return stats

    # -- evaluation ------------------------------------------------------

    def validate_sampled(self, max_batches: int = 16) -> Dict[str, float]:
        """Neighbor-sampled validation (reference _validate,
        :436-506): validation seeds get the same k-hop sampled
        subgraphs as training (no edge dropout), evaluated through the
        jitted eval step; probe predictions come from the ONLINE
        SGDClassifier / MiniBatchKMeans probes."""
        y = self.graph["y"]
        mask = self.graph.get("val_mask", np.ones(len(y), bool))
        val_nodes = np.where(mask)[0]
        if len(val_nodes) == 0:
            return {}
        self.rng_np.shuffle(val_nodes)
        losses, accs, sgd_accs, km_targets, km_preds = [], [], [], [], []
        for i in range(0, len(val_nodes), self.n_seeds):
            chunk = val_nodes[i:i + self.n_seeds]
            if len(chunk) < self.n_seeds:
                # pad the seed set by repeating (dropped in metrics)
                chunk = np.concatenate(
                    [chunk, np.resize(chunk, self.n_seeds - len(chunk))])
            x, ei, yb, edge_mask = self._sample_batch(chunk, 0.0)
            loss, logits, emb = self._eval_step_jit(
                self.params, x, ei, yb, edge_mask)
            n_valid = min(len(val_nodes) - i, self.n_seeds)
            pred = np.argmax(np.asarray(logits), -1)[:n_valid]
            tgt = y[chunk[:n_valid]]
            losses.append(float(loss))
            accs.append((pred == tgt).mean())
            z = np.asarray(emb, np.float32)[:n_valid]
            if self._sgd_probe is not None \
                    and hasattr(self._sgd_probe, "coef_"):
                sgd_accs.append(
                    (self._sgd_probe.predict(z) == tgt).mean())
            if self._km_probe is not None \
                    and hasattr(self._km_probe, "cluster_centers_"):
                km_targets.append(tgt)
                km_preds.append(self._km_probe.predict(z))
            if i // self.n_seeds + 1 >= max_batches:
                break
        out = {"val_loss_sampled": float(np.mean(losses)),
               "val_acc_sampled": float(np.mean(accs))}
        if sgd_accs:
            out["val_sgd_acc"] = float(np.mean(sgd_accs))
        if km_preds:
            try:
                from sklearn.metrics import v_measure_score
                out["val_km_v_measure"] = float(v_measure_score(
                    np.concatenate(km_targets), np.concatenate(km_preds)))
            except ImportError:
                pass
        return out

    def evaluate(self) -> Dict[str, float]:
        """Full-graph eval + offline clustering probe (reference
        :436-530)."""
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
