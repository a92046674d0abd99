"""Full-batch GNN trainer: semi-supervised node classification on one
graph.

Reference: elektronn3/training/trainer_gnn.py:30-375 (GNNTrainer):
single ``Data`` graph with train/val masks, early stopping, t-SNE
embedding visualization. Native JAX port over
``elektronn3_tpu.modules.graph`` models; a graph is a dict with
'x' (N, F), 'edge_index' (2, E), 'y' (N,), 'train_mask', 'val_mask'.
"""

from __future__ import annotations

import os
import pickle
from math import inf
from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from elektronn3_tpu import logger
from elektronn3_tpu.modules.loss import cross_entropy


def visualize_embeddings(emb: np.ndarray, labels: np.ndarray,
                         path: Optional[str] = None):
    """t-SNE scatter of node embeddings (reference trainer_gnn.py:30-47)."""
    from sklearn.manifold import TSNE
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    z = TSNE(n_components=2, init="random",
             perplexity=min(30, len(emb) - 1)).fit_transform(emb)
    fig, ax = plt.subplots()
    sc = ax.scatter(z[:, 0], z[:, 1], c=labels, s=4, cmap="tab10")
    fig.colorbar(sc, ax=ax)
    if path:
        fig.savefig(path, dpi=120)
        plt.close(fig)
    return fig


class GNNTrainer:
    """Full-batch semi-supervised node-classification trainer.

    Reference trainer_gnn.py:49-375 (run :145, _train :232,
    _validate :248; early stopping :185-189).
    """

    def __init__(self, model, graph: Dict[str, np.ndarray],
                 optimizer: Optional[optax.GradientTransformation] = None,
                 lr: float = 1e-2, weight_decay: float = 5e-4,
                 save_root: Optional[str] = None,
                 exp_name: str = "gnn", patience: int = 100,
                 enable_tensorboard: bool = False, seed: int = 0):
        self.model = model
        self.graph = {k: jnp.asarray(v) for k, v in graph.items()}
        assert "x" in graph and "edge_index" in graph and "y" in graph
        n = graph["x"].shape[0]
        if "train_mask" not in graph:
            raise ValueError("graph needs a train_mask")
        self.patience = patience
        self.optimizer = optimizer if optimizer is not None else \
            optax.adamw(lr, weight_decay=weight_decay)
        self.save_path = None
        if save_root is not None:
            self.save_path = os.path.join(os.path.expanduser(save_root),
                                          exp_name)
            os.makedirs(self.save_path, exist_ok=True)
        key = jax.random.PRNGKey(seed)
        self._rng = key
        variables = model.init({"params": key, "dropout": key},
                               self.graph["x"], self.graph["edge_index"],
                               train=False)
        self.params = variables["params"]
        self.opt_state = self.optimizer.init(self.params)
        self.step = 0
        self.best_val_loss = inf
        self.best_params = self.params
        self._train_step_jit = jax.jit(self._train_step)
        self._eval_jit = jax.jit(self._eval)

    def _train_step(self, params, opt_state, rng):
        g = self.graph

        def loss_fn(p):
            logits, _ = self.model.apply(
                {"params": p}, g["x"], g["edge_index"], train=True,
                rngs={"dropout": rng})
            mask = g["train_mask"].astype(jnp.float32)
            logp = jax.nn.log_softmax(logits, -1)
            nll = -jnp.take_along_axis(
                logp, g["y"][:, None], axis=-1)[:, 0]
            return jnp.sum(nll * mask) / jnp.maximum(jnp.sum(mask), 1.0)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = self.optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    def _eval(self, params):
        g = self.graph
        logits, emb = self.model.apply(
            {"params": params}, g["x"], g["edge_index"], train=False)
        pred = jnp.argmax(logits, -1)
        out = {}
        for name in ("train_mask", "val_mask", "test_mask"):
            if name in g:
                mask = g[name].astype(jnp.float32)
                correct = (pred == g["y"]).astype(jnp.float32)
                out[name.replace("_mask", "_acc")] = \
                    jnp.sum(correct * mask) / jnp.maximum(jnp.sum(mask), 1.0)
                logp = jax.nn.log_softmax(logits, -1)
                nll = -jnp.take_along_axis(
                    logp, g["y"][:, None], axis=-1)[:, 0]
                out[name.replace("_mask", "_loss")] = \
                    jnp.sum(nll * mask) / jnp.maximum(jnp.sum(mask), 1.0)
        return out, emb

    def run(self, epochs: int = 200) -> Dict[str, float]:
        bad = 0
        stats = {}
        for epoch in range(epochs):
            self._rng, step_rng = jax.random.split(self._rng)
            self.params, self.opt_state, loss = self._train_step_jit(
                self.params, self.opt_state, step_rng)
            self.step += 1
            evals, emb = self._eval_jit(self.params)
            stats = {k: float(v) for k, v in evals.items()}
            stats["tr_loss"] = float(loss)
            val_loss = stats.get("val_loss", stats["tr_loss"])
            if val_loss < self.best_val_loss:
                self.best_val_loss = val_loss
                self.best_params = self.params
                bad = 0
            else:
                bad += 1
                if bad > self.patience:  # early stopping (ref :185-189)
                    logger.info(f"Early stopping at epoch {epoch}")
                    break
            if epoch % 50 == 0:
                logger.info(
                    f"epoch {epoch}: " + " ".join(
                        f"{k}={v:.3f}" for k, v in stats.items()))
        self.params = self.best_params
        if self.save_path:
            with open(os.path.join(self.save_path, "gnn_params.pkl"),
                      "wb") as f:
                pickle.dump(jax.device_get(self.params), f)
            _, emb = self._eval_jit(self.params)
            try:
                visualize_embeddings(
                    np.asarray(emb), np.asarray(self.graph["y"]),
                    os.path.join(self.save_path, "embeddings.png"))
            except Exception:
                logger.exception("embedding visualization failed")
        return stats
