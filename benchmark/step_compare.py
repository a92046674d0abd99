"""Compare full train-step time: XLA executor vs fused flat executor.

Headline config (reference benchmark/train_benchmark.py:96-107,184,293).
Usage: PYTHONPATH=... python benchmark/step_compare.py [--steps 20]
"""

import sys as _sys, os as _os
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import argparse
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import optax

from elektronn3_tpu.models.unet import UNet
from elektronn3_tpu.modules import CEDiceLoss

p = argparse.ArgumentParser()
p.add_argument("--steps", type=int, default=20)
p.add_argument("--batch", type=int, default=8)
p.add_argument("--patch", type=int, nargs=3, default=(44, 88, 88))
p.add_argument("--logit-bf16", action="store_true",
               help="emit bf16 logits (UNet logit_dtype=bf16)")
p.add_argument("--f32", action="store_true",
               help="f32 model (fused arm FORCES pallas_flat=True "
                    "since 'auto' is bf16-only)")
p.add_argument("--only", choices=["xla", "fused"], default=None)
p.add_argument("--sf", type=int, default=32, help="start_filts")
p.add_argument("--blocks", type=int, default=4, help="n_blocks")
p.add_argument("--dim", type=int, default=3, choices=[2, 3],
               help="2 = 2D model on the last two --patch dims "
                    "(H-tiled fused path; planar_blocks=())")
p.add_argument("--norm", default="batch",
               help="normalization ('batch'/'group'/'group<G>'/"
                    "'instance'/'none') — non-batch norms currently "
                    "decline the fused path (coverage-matrix rows)")
p.add_argument("--conv-mode", default="same", choices=["same", "valid"],
               help="'valid' declines the fused path (matrix row)")
args = p.parse_args()

BATCH = args.batch
PATCH = tuple(args.patch)


def measure(pallas_flat):
    if args.f32 and pallas_flat:
        pallas_flat = True   # force: 'auto' resolves to off for f32
    model = UNet(in_channels=1, out_channels=2, n_blocks=args.blocks,
                 start_filts=args.sf,
                 planar_blocks=(0,) if args.dim == 3 else (),
                 dim=args.dim, normalization=args.norm,
                 conv_mode=args.conv_mode,
                 dtype=jnp.float32 if args.f32 else jnp.bfloat16,
                 pallas_flat=pallas_flat,
                 logit_dtype=jnp.bfloat16 if args.logit_bf16 else None)
    crit = CEDiceLoss(1.0, 1.0)
    shape = (BATCH,) + (PATCH if args.dim == 3 else PATCH[-2:]) + (1,)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=shape), jnp.float32)
    key = jax.random.PRNGKey(0)
    variables = model.init({"params": key, "dropout": key},
                           jnp.zeros(shape, jnp.float32), train=False)
    params = variables["params"]
    # Non-batch norms carry no running statistics; keep the step
    # signature uniform with an (empty) extra-collections dict.
    extra = {k: v for k, v in variables.items() if k != "params"}
    # 'valid' convs shrink the output; size the target by a dry run.
    out_spatial = jax.eval_shape(
        lambda v, xx: model.apply(v, xx, train=False),
        variables, jax.ShapeDtypeStruct(shape, jnp.float32)).shape[1:-1]
    y = jnp.asarray(rng.integers(0, 2, size=(BATCH,) + out_spatial))
    tx = optax.adam(1e-3)
    opt_state = tx.init(params)

    @partial(jax.jit, donate_argnums=(0, 1, 2))
    def train_step(params, extra, opt_state, x, y):
        def loss_fn(pp):
            out, mut = model.apply(
                {"params": pp, **extra}, x, train=True,
                mutable=list(extra.keys()))
            return crit(out, y).astype(jnp.float32), mut
        (loss, mut), g = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(g, opt_state)
        params = optax.apply_updates(params, updates)
        return params, dict(extra, **mut), opt_state, loss

    for _ in range(3):
        params, extra, opt_state, loss = train_step(
            params, extra, opt_state, x, y)
    l0 = float(loss)
    t0 = time.perf_counter()
    for _ in range(args.steps):
        params, extra, opt_state, loss = train_step(
            params, extra, opt_state, x, y)
    lf = float(loss)
    dt = (time.perf_counter() - t0) / args.steps
    vox = int(np.prod(shape))
    print(f"pallas_flat={pallas_flat!r:6}: {dt*1e3:7.2f} ms/step  "
          f"{vox/dt/1e6:6.1f} MVox/s  (loss {l0:.4f} -> {lf:.4f})")
    return dt


if args.only == "xla":
    measure(False)
elif args.only == "fused":
    measure("auto")
else:
    t_xla = measure(False)
    t_fused = measure("auto")
    print(f"speedup: {t_xla/t_fused:.2f}x")
