#!/usr/bin/env python3
"""On-TPU fused-vs-XLA exactness check (round-2 review item 7).

tests/test_flat_conv.py / test_flat64.py verify the fused executors'
math in INTERPRET mode on CPU; this script closes the remaining gap on
the real chip with two criteria per dtype:

1. PRIMARY — Mosaic vs interpret, same fused model, same chip
   (``E3TPU_PALLAS_INTERPRET=1`` forces the interpret leg): proves the
   Mosaic-COMPILED kernels compute exactly the function the
   interpret-mode parity tests verified. f32 is the decisive leg: any
   indexing/packing/halo/adjoint bug would show there, and it measures
   3.4e-7 worst (pure re-association residue). bf16 legitimately
   differs up to ~2.6e-2 at these shapes because the two executions
   ROUND differently, not compute differently: XLA (interpret leg)
   runs under ``--xla_allow_excess_precision=true`` and keeps f32
   intermediates across bf16 elementwise chains, while Mosaic rounds
   to bf16 at kernel stores — so bf16 gets tol 5e-2 and the
   structural guarantee rides on the f32 leg.

2. SECONDARY — fused executor vs pure-XLA executor (pallas_flat=True
   vs False): same math by construction. Tolerances encode two
   *measured XLA:TPU properties*, not kernel slack:

   - XLA:TPU computes ConvTranspose KERNEL gradients at reduced
     (bf16-pass) precision even under
     ``default_matmul_precision('highest')``: on the f32 check model,
     XLA-on-TPU itself differs from XLA-on-CPU by 4.25e-2 rel on
     ``up_0/upconv/kernel`` — the one grad where the fused path
     "fails" vs XLA:TPU — while the fused path matches XLA-on-CPU to
     <= 1e-4 everywhere (three-way Mosaic/interpret/XLA + TPU-vs-CPU
     cross-check, 2026-08; docs/design.md "On-chip exactness"). The
     fused upconv wgrad is the MORE exact side; ConvTranspose
     kernel-grad rows get tol 0.1.
   - bf16 executor-vs-executor grads at these tiny shapes differ by
     accumulation order alone: the same ~2e-1 worst diffs reproduce
     bit-for-bit in the CPU interpret comparison, so they are not chip
     effects. bf16 grad tol 0.3; outputs/running-stats tol 2e-2.

Run on the TPU host (driver-runnable):
    python benchmark/tpu_exactness_check.py
Exits non-zero on any mismatch; prints one summary line per criterion.
"""

import sys as _sys, os as _os
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

from elektronn3_tpu.models.unet import UNet, init_unet

# (criterion, dtype) -> (default tol, per-key overrides)
TOLS = {
    ("mosaic", "float32"): (1e-5, {}),
    ("mosaic", "bfloat16"): (5e-2, {}),
    ("xla", "float32"): (1e-4, {"upconv_kernel_grad": 0.1}),
    # bf16 grads use the f32-reference criterion instead of a fixed
    # tolerance (see compare_grads_vs_ref): executor-vs-executor bf16
    # grad spread at tiny shapes is pure accumulation order (it
    # reproduces on CPU interpret) and scales with the model — the
    # 3d-c128 config measured 5.9e-1 on the first conv's wgrad, the
    # deepest bf16 accumulation in the model, while both arms sit the
    # same distance from the f32 ground truth. Outputs/stats keep a
    # fixed tol.
    ("xla", "bfloat16"): (2e-2, {}),
}
# bf16 fused grads must be within this factor of the XLA arm's own
# distance to the f32-XLA reference grads (same params), plus a floor
# for grads where the XLA arm is accidentally near-exact. The factor
# is calibrated to the measured PRECISION-SEMANTICS gap, not to
# parity: the fused kernels round intermediates (prologue slabs,
# dy_tot scratch) to bf16 at kernel stores, while XLA:TPU keeps f32
# excess precision across fused bf16 elementwise chains
# (--xla_allow_excess_precision) — so the fused arm legitimately sits
# 2-5x farther from the f32 ground truth at these tiny shapes
# (measured 2026-08-18: conv1 kernel 2.7x, BN scales up to 5.4x; the
# same rounding reproduces on CPU interpret, no chip involved). A
# real executor defect shows orders of magnitude, not single digits:
# the f32 legs pin the structure to ~1e-6 and the 3-seed training A/B
# (BASELINE.md) pins end-to-end equivalence.
#
# The FLOOR covers rows where the XLA bf16 arm is lucky-exact and the
# factor test's denominator collapses. Calibrated to the worst
# MEASURED formulation-rounding distance: the 3d-group config's
# down_0/conv1/bias grad sits 0.115 from the f32 reference in CPU
# INTERPRET mode (no chip involved — pure bf16 store rounding of the
# prologued scratch/stored y under per-sample group-norm stats, where
# bias grads do NOT cancel as they do under per-channel norms), while
# XLA:CPU-bf16 sits 0.017 (ratio 6.7, inside the factor) but
# XLA:TPU-bf16 happens to land at 0.010 (ratio 11.6). Same value
# on-chip (0.116): platform-stable rounding, not a defect.
#
# The floor is PER CONFIG (round-4 review item): only 3d-group needs
# the loose 1.25e-1 (per-sample stats kill the bias-grad cancellation);
# every pre-existing config keeps the 5e-2 it historically met, so the
# lucky-exact-denominator guard stays as tight as each config allows.
BF16_GRAD_REF_FACTOR = 8.0
BF16_GRAD_REF_FLOOR = 5e-2            # default (configs w/o override)
BF16_GRAD_REF_FLOOR_OVERRIDES = {"3d-group": 1.25e-1}


def items(tree):
    return sorted(((jax.tree_util.keystr(k), np.asarray(a)) for k, a in
                   jax.tree_util.tree_leaves_with_path(tree)),
                  key=lambda t: t[0])


def run_model(model, v, x, interpret: bool):
    """(train_out, batch_stats, eval_out, grads) for one executor leg.

    The interpret flag is read by the kernels at trace time
    (ops/flat_conv._interpret); fresh lambdas defeat the jit cache.
    """
    os.environ["E3TPU_PALLAS_INTERPRET"] = "1" if interpret else ""
    try:
        o, mut = jax.jit(lambda v, x: model.apply(
            v, x, train=True, mutable=["batch_stats"]))(v, x)
        ev = jax.jit(lambda v, x: model.apply(v, x, train=False))(v, x)

        def loss(params):
            out, _ = model.apply(
                {**v, "params": params}, x,
                train=True, mutable=["batch_stats"])
            return jnp.mean(out.astype(jnp.float32) ** 2)

        g = jax.jit(jax.grad(loss))(v["params"])
        # group/instance-norm models carry no running statistics
        return (np.asarray(o, np.float32),
                items(mut.get("batch_stats", {})),
                np.asarray(ev, np.float32), items(g))
    finally:
        os.environ.pop("E3TPU_PALLAS_INTERPRET", None)


def compare_legs(tag, label, dtype_name, a_leg, b_leg,
                 ref_grads=None, ref_floor=BF16_GRAD_REF_FLOOR):
    default_tol, overrides = TOLS[(tag, dtype_name)]
    fails, worst, n = [], 0.0, 0

    def compare(name, kind, a, b):
        nonlocal worst, n
        tol = overrides.get(kind, default_tol)
        a, b = np.asarray(a, np.float32), np.asarray(b, np.float32)
        scale = max(1.0, float(np.max(np.abs(b))))
        d = float(np.max(np.abs(a - b))) / scale
        worst, n = max(worst, d), n + 1
        if d > tol:
            fails.append(f"{name}: rel-max-diff {d:.2e} (tol {tol:.0e})")

    o_a, bs_a, ev_a, g_a = a_leg
    o_b, bs_b, ev_b, g_b = b_leg
    compare("train_out", "out", o_a, o_b)
    compare("eval_out", "out", ev_a, ev_b)
    for (k1, a), (k2, b) in zip(bs_a, bs_b):
        compare(f"batch_stats{k1}", "stats", a, b)
    bf16_ref = tag == "xla" and dtype_name == "bfloat16" \
        and ref_grads is not None
    for idx_g, ((k1, a), (k2, b)) in enumerate(zip(g_a, g_b)):
        if bf16_ref:
            # f32-reference criterion: the fused arm must sit no
            # farther from the f32-XLA grads (same params) than the
            # XLA bf16 arm does — accumulation-order spread passes,
            # a real defect (one arm systematically off) fails.
            kr, r = ref_grads[idx_g]
            a32, b32, r32 = (np.asarray(t, np.float32) for t in
                             (a, b, r))
            scale = max(1.0, float(np.max(np.abs(r32))))
            d_f = float(np.max(np.abs(a32 - r32))) / scale
            d_x = float(np.max(np.abs(b32 - r32))) / scale
            lim = max(BF16_GRAD_REF_FACTOR * d_x, ref_floor)
            worst, n = max(worst, d_f), n + 1
            if d_f > lim:
                fails.append(
                    f"grad{k1}: fused {d_f:.2e} vs XLA {d_x:.2e} from "
                    f"the f32 reference (limit {lim:.2e})")
            continue
        kind = ("upconv_kernel_grad"
                if "upconv" in k1 and "kernel" in k1 else "grad")
        compare(f"grad{k1}", kind, a, b)

    crit = {"mosaic": "Mosaic-vs-interpret",
            "xla": "fused-vs-XLA"}[tag]
    extra = " (bf16 grads vs f32 reference)" if bf16_ref else ""
    status = "PASS" if not fails else "FAIL"
    print(f"[{status}] {label} {crit} on {jax.default_backend()}"
          f"{extra} — worst rel diff {worst:.2e}, {n} values checked")
    for f in fails:
        print("   " + f)
    return not fails


CONFIGS = [
    # 3D: engages BOTH fused executors — planar CC=32 L0 + C=64 kd=3 L1
    ("3d", (1, 4, 8, 16, 1), dict(dim=3, planar_blocks=(0,))),
    # 2D H-tiled: CC32 + fused64 kd=1 with d_halo halo strips at a
    # forced slab height (tile2d=4 over a 16-row image) — the
    # production 2D path that interpret-only tests can't vouch for
    # on-chip.
    ("2d-tiled", (1, 16, 16, 1), dict(dim=2, tile2d=4)),
    # C=128 decoder chain (start_filts=64): generalized 256->128 dense
    # upconv (nk=no=2) + 4-chunk merge conv + FlatActs64-carry upconv
    # (upconv122_f64in) at up_1.
    ("3d-c128", (1, 4, 8, 8, 1), dict(dim=3, planar_blocks=(0,),
                                      n_blocks=3, start_filts=64)),
    # Group norm via per-sample statistics (round 4): B=2 exercises the
    # b-indexed (leading-squeezed) stat/prologue blocks under Mosaic —
    # the layout constraint interpret mode cannot see.
    ("3d-group", (2, 4, 8, 16, 1), dict(dim=3, planar_blocks=(0,),
                                        normalization="group")),
    # Input-chunk-split merged backwards (round 5, bwd_ki_split): the
    # production trigger is the sf=64 C=128 4-chunk merge whose VMEM
    # gate the tiny check shapes never reach, so force 2-way splits —
    # on this config every multi-chunk conv backward runs partitioned,
    # including the 4-chunk decoder merge (the sf=64 training path).
    ("3d-c128-kisplit", (1, 4, 8, 8, 1),
     dict(dim=3, planar_blocks=(0,), n_blocks=3, start_filts=64,
          _env={"E3TPU_FORCE_KI_SPLIT": "2"})),
    # vup merge conv (round 5, opt-in capability — measured SLOWER
    # end-to-end so default-off, models/unet.py _vup_on): virtual
    # upconv chunk recomputed in the merge conv prologue + stats-only
    # carry pass. Mosaic-vs-interpret validates the recompute and the
    # folded backward chain on the chip.
    ("3d-vup", (1, 4, 8, 16, 1), dict(dim=3, planar_blocks=(0,),
                                      _env={"E3TPU_VUP": "1"})),
]


def check(cfg_name, shape, mkw, dtype_name, dtype):
    mkw = dict(mkw)
    env = mkw.pop("_env", {})
    for k_, v_ in env.items():
        os.environ[k_] = v_
    try:
        return _check(cfg_name, shape, mkw, dtype_name, dtype)
    finally:
        for k_ in env:
            os.environ.pop(k_, None)


def _check(cfg_name, shape, mkw, dtype_name, dtype):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=shape), jnp.float32)
    kw = dict(in_channels=1, out_channels=2, n_blocks=2, start_filts=32,
              normalization="batch", dtype=dtype)
    kw.update(mkw)
    m_xla = UNet(pallas_flat=False, **kw)
    m_fused = UNet(pallas_flat=True, **kw)
    v = init_unet(m_xla, shape)

    # Pin HIGHEST so the f32 XLA leg is as exact as the platform allows
    # (fused kernels pin HIGHEST for f32 / DEFAULT for bf16 internally).
    ref_grads = None
    with jax.default_matmul_precision("highest"):
        fused_mosaic = run_model(m_fused, v, x, interpret=False)
        fused_interp = run_model(m_fused, v, x, interpret=True)
        xla = run_model(m_xla, v, x, interpret=False)
        if dtype_name == "bfloat16":
            # f32 ground truth for the bf16 grad criterion: the same
            # params (param_dtype is f32) through the f32 XLA model.
            kw32 = dict(kw, dtype=jnp.float32)
            m_ref = UNet(pallas_flat=False, **kw32)
            ref_grads = run_model(m_ref, v, x, interpret=False)[3]

    ok = compare_legs("mosaic", f"{cfg_name} {dtype_name}",
                      dtype_name, fused_mosaic, fused_interp)
    ok &= compare_legs("xla", f"{cfg_name} {dtype_name}",
                       dtype_name, fused_mosaic, xla,
                       ref_grads=ref_grads,
                       ref_floor=BF16_GRAD_REF_FLOOR_OVERRIDES.get(
                           cfg_name, BF16_GRAD_REF_FLOOR))
    return ok


def main():
    ok = True
    for cfg_name, shape, mkw in CONFIGS:
        for name, dt in [("bfloat16", jnp.bfloat16),
                         ("float32", jnp.float32)]:
            ok &= check(cfg_name, shape, mkw, name, dt)
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
