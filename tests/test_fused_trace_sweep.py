"""Config-surface trace sweep under pallas_flat='auto' on a (faked)
TPU backend: every reference UNet config (models/unet.py:550-935
surface) must either engage a fused executor or decline gracefully —
never raise at trace time. This guards the compile-failure class the
VMEM/geometry gates exist to prevent (round-3: ungated sf=64 models
failed to compile before the merge-aware bound).

Pure tracing (jax.make_jaxpr) — no kernels execute, so the sweep is
cheap and runs on the CPU CI host.
"""

import itertools

import jax
import jax.numpy as jnp
import pytest

from elektronn3_tpu.models.unet import UNet


@pytest.fixture
def tpu_backend(monkeypatch):
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")


CASES = [
    # (dim, n_blocks, sf, planar, merge, up, norm, act, conv_mode)
    (3, 2, 32, (0,), "concat", "transpose", "batch", "relu", "same"),
    (3, 2, 32, (0,), "add", "transpose", "batch", "relu", "same"),
    (3, 3, 32, (0,), "concat", "transpose", "none", "leaky", "same"),
    (3, 3, 32, (), "concat", "transpose", "batch", "relu", "same"),
    (3, 3, 64, (0,), "concat", "transpose", "batch", "relu", "same"),
    (3, 3, 64, (), "concat", "transpose", "batch", "relu", "same"),
    (3, 2, 64, (0,), "add", "transpose", "batch", "relu", "same"),
    (3, 2, 32, (0,), "concat", "resizeconv_nearest", "batch", "relu",
     "same"),
    (3, 2, 32, (0,), "concat", "transpose", "group4", "relu", "same"),
    (3, 2, 32, (0,), "concat", "transpose", "batch", "silu", "same"),
    (3, 2, 32, (0,), "concat", "transpose", "batch", "relu", "valid"),
    (3, 4, 32, (0,), "concat", "transpose", "batch", "relu", "same"),
    (2, 2, 32, (), "concat", "transpose", "batch", "relu", "same"),
    (2, 3, 32, (), "concat", "transpose", "batch", "leaky", "same"),
    (2, 3, 64, (), "concat", "transpose", "batch", "relu", "same"),
    (2, 2, 64, (), "add", "transpose", "none", "relu", "same"),
    (2, 2, 32, (), "concat", "resizeconv_linear", "batch", "relu",
     "same"),
]


@pytest.mark.parametrize(
    "dim,n_blocks,sf,planar,merge,up,norm,act,conv_mode", CASES)
def test_auto_config_traces(tpu_backend, dim, n_blocks, sf, planar,
                            merge, up, norm, act, conv_mode):
    model = UNet(in_channels=1, out_channels=2, n_blocks=n_blocks,
                 start_filts=sf, planar_blocks=planar, dim=dim,
                 merge_mode=merge, up_mode=up, normalization=norm,
                 activation=act, conv_mode=conv_mode,
                 dtype=jnp.bfloat16, pallas_flat="auto")
    if dim == 3:
        shape = (1, 8, 16, 16, 1)
    else:
        shape = (1, 32, 32, 1)
    x = jnp.zeros(shape, jnp.float32)
    v_shapes = jax.eval_shape(
        lambda: model.init({"params": jax.random.PRNGKey(0)}, x,
                           train=False))
    # Trace the training forward (the path with the most fused
    # machinery: stats side outputs, skip routing, merged decoders).
    params = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype),
                          v_shapes["params"])
    extra = {}
    if "batch_stats" in v_shapes:
        extra["batch_stats"] = jax.tree.map(
            lambda s: jnp.zeros(s.shape, s.dtype),
            v_shapes["batch_stats"])
    mutable = ["batch_stats"] if "batch_stats" in v_shapes else False
    jpr = jax.make_jaxpr(
        lambda p: model.apply({"params": p, **extra}, x, train=True,
                              mutable=mutable))(params)
    # Output keeps the expected logits shape.
    outav = jpr.out_avals[0]
    if conv_mode == "same":
        assert outav.shape == shape[:-1] + (2,), outav.shape
