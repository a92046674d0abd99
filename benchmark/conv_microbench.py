"""Microbenchmark: tap-packed Pallas direct conv vs XLA conv.

Shapes are the headline train_benchmark U-Net's hot convs
(reference benchmark/train_benchmark.py:96-107: n_blocks=4,
planar_blocks=(0,), start_filts=32, patch (44,88,88), batch 8).
"""

import sys as _sys, os as _os
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

from elektronn3_tpu.ops.pallas_conv import conv_direct

CASES = [
    # (name, (B, D, H, W), cin, cout, planar)
    ("L0 conv2 planar 32->32", (8, 44, 88, 88), 32, 32, True),
    ("L0up planar 64->32", (8, 44, 88, 88), 64, 32, True),
    ("L1 conv 64->64", (8, 22, 44, 44), 64, 64, False),
    ("L1up conv 128->64", (8, 22, 44, 44), 128, 64, False),
    ("L2 conv 128->128", (8, 11, 22, 22), 128, 128, False),
]

DTYPE = jnp.bfloat16
REPS = 30


@functools.partial(jax.jit, static_argnames=("planar", "reps"))
def _xla_loop(x, w, planar, reps):
    def body(c, _):
        o = jax.lax.conv_general_dilated(
            c, w, window_strides=(1, 1, 1), padding="SAME",
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
            preferred_element_type=jnp.float32).astype(c.dtype)
        return o[..., :c.shape[-1]] if o.shape[-1] >= c.shape[-1] \
            else jnp.concatenate([o, o], -1)[..., :c.shape[-1]], ()
    c, _ = jax.lax.scan(body, x, None, length=reps)
    return c


@functools.partial(jax.jit, static_argnames=("planar", "reps"))
def _pallas_loop(x, w, planar, reps):
    def body(c, _):
        o = conv_direct(c, w, planar=planar)
        return o[..., :c.shape[-1]] if o.shape[-1] >= c.shape[-1] \
            else jnp.concatenate([o, o], -1)[..., :c.shape[-1]], ()
    c, _ = jax.lax.scan(body, x, None, length=reps)
    return c


def bench(fn, x, w, planar):
    out = fn(x, w, planar, REPS)  # compile + warm (same static reps!)
    float(jnp.sum(out.astype(jnp.float32)))
    t0 = time.perf_counter()
    out = fn(x, w, planar, REPS)
    float(jnp.sum(out.astype(jnp.float32)))
    return (time.perf_counter() - t0) / REPS


def main():
    rng = np.random.default_rng(0)
    print(f"backend={jax.default_backend()} dtype={DTYPE.__name__}")
    for name, (B, D, H, W), cin, cout, planar in CASES:
        kd = 1 if planar else 3
        x = jnp.asarray(rng.normal(size=(B, D, H, W, cin)), DTYPE)
        w = jnp.asarray(rng.normal(size=(kd, 3, 3, cin, cout)) * 0.1, DTYPE)
        flops = 2 * B * D * H * W * kd * 9 * cin * cout
        t_xla = bench(_xla_loop, x, w, planar)
        t_pal = bench(_pallas_loop, x, w, planar)
        print(f"{name:28s} xla {t_xla*1e3:7.2f} ms ({flops/t_xla/1e12:6.1f}"
              f" TF/s) | pallas {t_pal*1e3:7.2f} ms "
              f"({flops/t_pal/1e12:6.1f} TF/s) | speedup "
              f"{t_xla/t_pal:5.2f}x")


if __name__ == "__main__":
    main()
