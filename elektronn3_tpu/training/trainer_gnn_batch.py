"""Multi-graph batch GNN trainer.

Reference: elektronn3/training/trainer_gnn_batch.py:33-405 — same idea
as the full-batch trainer but over a tuple of graphs, with
KMeans/v-measure clustering evaluation of the learned embeddings.
"""

from __future__ import annotations

from math import inf
from typing import Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
import optax

from elektronn3_tpu import logger


class GNNTrainer:
    """Trainer over a sequence of graphs (dicts with 'x', 'edge_index',
    'y'); per-epoch loop over graphs, clustering eval via KMeans +
    v-measure (reference trainer_gnn_batch.py:33-405)."""

    def __init__(self, model, graphs: Sequence[Dict[str, np.ndarray]],
                 valid_graphs: Optional[Sequence[Dict]] = None,
                 lr: float = 1e-2, weight_decay: float = 5e-4,
                 seed: int = 0):
        self.model = model
        self.graphs = [
            {k: jnp.asarray(v) for k, v in g.items()} for g in graphs]
        self.valid_graphs = None if valid_graphs is None else [
            {k: jnp.asarray(v) for k, v in g.items()} for g in valid_graphs]
        self.optimizer = optax.adamw(lr, weight_decay=weight_decay)
        key = jax.random.PRNGKey(seed)
        self._rng = key
        g0 = self.graphs[0]
        variables = model.init({"params": key, "dropout": key},
                               g0["x"], g0["edge_index"], train=False)
        self.params = variables["params"]
        self.opt_state = self.optimizer.init(self.params)
        self._step_jit = jax.jit(self._train_step)

    def _train_step(self, params, opt_state, x, edge_index, y, rng):
        def loss_fn(p):
            logits, _ = self.model.apply(
                {"params": p}, x, edge_index, train=True,
                rngs={"dropout": rng})
            logp = jax.nn.log_softmax(logits, -1)
            nll = -jnp.take_along_axis(logp, y[:, None], axis=-1)[:, 0]
            return jnp.mean(nll)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = self.optimizer.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    def run(self, epochs: int = 100) -> Dict[str, float]:
        stats = {}
        for epoch in range(epochs):
            losses = []
            for g in self.graphs:
                self._rng, step_rng = jax.random.split(self._rng)
                self.params, self.opt_state, loss = self._step_jit(
                    self.params, self.opt_state, g["x"], g["edge_index"],
                    g["y"], step_rng)
                losses.append(float(loss))
            stats["tr_loss"] = float(np.mean(losses))
            if epoch % 20 == 0:
                stats.update(self.evaluate())
                logger.info(f"epoch {epoch}: " + " ".join(
                    f"{k}={v:.3f}" for k, v in stats.items()))
        stats.update(self.evaluate())
        return stats

    def evaluate(self) -> Dict[str, float]:
        """Accuracy + clustering quality (KMeans + v-measure) on the
        validation graphs (reference trainer_gnn_batch.py eval)."""
        from sklearn.cluster import KMeans
        from sklearn.metrics import v_measure_score
        graphs = self.valid_graphs or self.graphs
        accs, vms = [], []
        for g in graphs:
            logits, emb = self.model.apply(
                {"params": self.params}, g["x"], g["edge_index"],
                train=False)
            pred = np.argmax(np.asarray(logits), -1)
            y = np.asarray(g["y"])
            accs.append(float((pred == y).mean()))
            k = len(np.unique(y))
            if k >= 2 and emb.shape[0] > k:
                km = KMeans(n_clusters=k, n_init=3,
                            random_state=0).fit(np.asarray(emb))
                vms.append(float(v_measure_score(y, km.labels_)))
        out = {"val_acc": float(np.mean(accs))}
        if vms:
            out["val_v_measure"] = float(np.mean(vms))
        return out
