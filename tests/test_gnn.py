"""GNN modules and trainer tests (native JAX graph stack)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from elektronn3_tpu.modules.graph import GATConv, GCNConv, GNN, SAGEConv


def make_two_cluster_graph(n=40, seed=0):
    rng = np.random.default_rng(seed)
    y = np.repeat([0, 1], n // 2)
    x = rng.normal(size=(n, 8)).astype(np.float32) + y[:, None] * 1.5
    edges = []
    for i in range(n):
        for _ in range(4):
            j = int(rng.integers(0, n // 2) + (n // 2) * y[i])
            if j != i:
                edges.append((i, j))
                edges.append((j, i))
    edge_index = np.array(edges).T
    mask = rng.random(n) < 0.5
    return dict(x=x, edge_index=edge_index, y=y,
                train_mask=mask, val_mask=~mask)


@pytest.mark.parametrize("conv_cls", [GCNConv, SAGEConv, GATConv])
def test_graph_convs_shapes(conv_cls, rng):
    g = make_two_cluster_graph()
    conv = conv_cls(16)
    key = jax.random.PRNGKey(0)
    variables = conv.init(key, jnp.asarray(g["x"]),
                          jnp.asarray(g["edge_index"]))
    out = conv.apply(variables, jnp.asarray(g["x"]),
                     jnp.asarray(g["edge_index"]))
    assert out.shape == (g["x"].shape[0], 16)
    assert np.all(np.isfinite(np.asarray(out)))


def test_gcn_aggregates_neighbors():
    # Star graph: center node 0 connected to 1..3. A GCN layer output at
    # node 0 must depend on neighbor features.
    x = np.eye(4, dtype=np.float32)
    ei = np.array([[0, 0, 0, 1, 2, 3], [1, 2, 3, 0, 0, 0]])
    conv = GCNConv(4)
    key = jax.random.PRNGKey(0)
    v = conv.init(key, jnp.asarray(x), jnp.asarray(ei))
    out1 = conv.apply(v, jnp.asarray(x), jnp.asarray(ei))
    x2 = x.copy()
    x2[1] += 5.0  # perturb a neighbor of node 0
    out2 = conv.apply(v, jnp.asarray(x2), jnp.asarray(ei))
    assert not np.allclose(out1[0], out2[0])


def test_gnn_trainer_full_batch(tmp_path):
    from elektronn3_tpu.training.trainer_gnn import GNNTrainer
    g = make_two_cluster_graph()
    model = GNN(hidden=16, out_channels=2, conv="gcn")
    tr = GNNTrainer(model, g, lr=1e-2, patience=50,
                    save_root=str(tmp_path), exp_name="g")
    stats = tr.run(epochs=60)
    assert stats["val_acc"] > 0.8


def test_gnn_trainer_batch():
    from elektronn3_tpu.training.trainer_gnn_batch import GNNTrainer
    graphs = [make_two_cluster_graph(seed=s) for s in range(2)]
    model = GNN(hidden=16, out_channels=2, conv="sage")
    tr = GNNTrainer(model, graphs)
    stats = tr.run(epochs=30)
    assert stats["val_acc"] > 0.8


def test_gnn_trainer_minibatch():
    from elektronn3_tpu.training.trainer_gnn_minibatch import GNNTrainer
    g = make_two_cluster_graph(n=60)
    model = GNN(hidden=16, out_channels=2, conv="sage", dropout=0.1)
    tr = GNNTrainer(model, g, batch_size=16, num_neighbors=(5, 3),
                    embedding_loss=True)
    stats = tr.run(max_steps=40)
    assert np.isfinite(stats["tr_loss"])
    assert stats["val_acc"] > 0.6
