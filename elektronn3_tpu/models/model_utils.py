"""Model inspection utilities.

Reference: elektronn3/models/_model_utils.py:16-238 (receptive-field
visualization, first-conv finder/swapper, param counting, model summary).
JAX adaptation: modules are immutable dataclasses, so "swapping" a layer
returns a new module config; summaries come from
``jax.eval_shape`` + tabulation (no forward hooks needed).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np


def num_params(variables_or_params) -> int:
    """Total number of trainable parameters.
    Reference _model_utils.py:113-116."""
    params = variables_or_params.get("params", variables_or_params) \
        if isinstance(variables_or_params, dict) else variables_or_params
    return sum(int(np.prod(p.shape))
               for p in jax.tree_util.tree_leaves(params))


def find_first(model, cond: Callable[[str, Any], bool],
               variables=None) -> Optional[str]:
    """Find the path of the first parameter leaf satisfying ``cond``.
    Reference _model_utils.py:76-94 (adapted: operates on the params
    tree since flax submodules are not registered objects)."""
    if variables is None:
        raise ValueError("variables (params tree) required")
    params = variables.get("params", variables)
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    for path, leaf in flat:
        name = "/".join(str(getattr(p, "key", p)) for p in path)
        if cond(name, leaf):
            return name
    return None


def find_first_conv(model, variables) -> Optional[str]:
    """Path of the first conv kernel. Reference _model_utils.py:85-94."""
    return find_first(
        model, lambda name, leaf: "kernel" in name and leaf.ndim >= 3,
        variables)


def change_conv1_input_channels(
        model, variables, old_in_channels: int, new_in_channels: int):
    """Adapt the first conv layer (and model config) to a different
    input channel count, summing kernel input channels like common
    pretrained-weight surgery. Reference _model_utils.py:96-111.

    Returns (new_model, new_variables).
    """
    new_model = model
    if hasattr(model, "in_channels"):
        new_model = dataclasses.replace(model, in_channels=new_in_channels)
    path = find_first_conv(model, variables)
    if path is None:
        return new_model, variables
    params = dict(variables.get("params", variables))

    def update(tree, keys):
        if len(keys) == 1:
            kern = tree[keys[0]]
            if kern.shape[-2] == old_in_channels:
                mean_k = jnp.mean(kern, axis=-2, keepdims=True)
                new_k = jnp.repeat(mean_k, new_in_channels, axis=-2)
                tree = dict(tree)
                tree[keys[0]] = new_k
            return tree
        tree = dict(tree)
        tree[keys[0]] = update(dict(tree[keys[0]]), keys[1:])
        return tree

    params = update(params, path.split("/"))
    new_variables = dict(variables)
    new_variables["params"] = params
    return new_model, new_variables


def model_summary(model, input_shape: Sequence[int],
                  train: bool = False, depth: int = 2) -> str:
    """Per-layer summary (shapes/params), torchsummary-style.
    Reference _model_utils.py:119-238. Uses flax tabulate."""
    import flax.linen as nn
    x = jnp.zeros(tuple(input_shape), jnp.float32)
    try:
        return nn.tabulate(
            model, jax.random.PRNGKey(0), depth=depth,
            compute_flops=False, compute_vjp_flops=False)(x, train=train)
    except TypeError:
        return nn.tabulate(model, jax.random.PRNGKey(0), depth=depth)(x)


def visualize_receptive_field(model, variables, input_shape,
                              channel: int = 0):
    """Estimate the effective receptive field via input-gradient
    magnitude at the output center voxel. Reference _model_utils.py:16-74
    (which uses the 'receptivefield' package; here computed directly with
    jax.grad — no extra dependency).

    Returns the |d out_center / d input| saliency array (spatial shape).
    """
    # Random (not zero) probe input: with zero input and zero-init
    # biases, ReLUs would block all gradient flow.
    x = jnp.asarray(
        np.random.default_rng(0).normal(size=tuple(input_shape)),
        jnp.float32)

    def center_out(inp):
        out = model.apply(variables, inp, train=False)
        idx = tuple([0] + [s // 2 for s in out.shape[1:-1]] + [channel])
        return out[idx]

    g = jax.grad(center_out)(x)
    return np.abs(np.asarray(g))[0, ..., 0]
