"""MFU ledger for the headline train step (VERDICT round-3 item 7).

Produces ONE auditable table: per fused-kernel family — device
self-time, useful FLOPs (standard conv algebra), achieved TF/s,
packing-ceiling TF/s (v5e bf16 peak x useful-MAC fraction of the
kernel's matmul structure), % of ceiling — plus the whole-step
achieved FLOP/s vs the v5e bf16 peak (MFU%).

Two phases (capture on the TPU, parse anywhere):

  python benchmark/mfu_ledger.py --capture --out /tmp/e3tpu_mfu
  python benchmark/mfu_ledger.py --parse /tmp/e3tpu_mfu [--dump]

"Useful FLOPs" counts the mathematically necessary multiply-adds
(2*N*spatial*Cin*Cout*taps for a conv; dgrad+wgrad each equal the
forward), NOT the MACs the packed matmuls issue. The packing fractions
below derive from the kernel structures in ops/flat_fused.py /
ops/flat_fused64.py (docs/design.md "The fused flat executor"):

- fused64 (C=64 chunks, JG=2 w-parity lanes): per (kz, kh) tap group,
  ONE within-row 128x128 matmul (all four 64x64 blocks carry kw taps —
  100% useful) + ONE combined-corner matmul (block-anti-diagonal, 2 of
  4 blocks useful). Per output element per tap group: 192 useful MACs
  (3 kw x 64 ci) of 256 issued = 75%.
- CC32 (C=32, JG=4 w-in-row lanes): within-row matmul has 10 of 16
  32x32 blocks useful (|j1-j2| <= 1), combined corner 2 of 16. Per
  output element per kh: 96 useful (3 kw x 32 ci) of 256 issued
  = 37.5%.
- upconv (k=2, stride 2): phase-packed block-diagonal weights; each
  (z,h) phase is a full 128x128 (cin 128 -> co 64|128 dense in lanes)
  matmul. cin=128->cout=64: half the output lanes carry the other
  w-parity's phase => 100% dense (both parities computed in one
  matmul). Counted at 100% (the 1-tap upconv is ~3% of a level's
  FLOPs; see design.md).
- conv1 (1->32 selection-matrix form) and the cout=2 head GEMM have
  tiny useful FLOPs by construction (Cin=1 / Cout=2); they are listed
  with achieved TF/s but excluded from ceiling grading (their cost is
  layout, not MACs — see design.md).

v5e peak: 197 TF/s bf16 (public spec, 394 TOPS int8 / 2).
"""

import sys as _sys, os as _os
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import argparse
import glob
import json
import re
from collections import defaultdict

V5E_BF16_PEAK_TFS = 197.0

BATCH, PATCH = 8, (44, 88, 88)
STEPS = 5  # traced steps


# ---------------------------------------------------------------- FLOPs

def conv_flops(spatial, cin, cout, taps, batch=BATCH):
    """Useful fwd MAC*2 count of a dense conv at `spatial` output."""
    import numpy as np
    return 2 * batch * int(np.prod(spatial)) * cin * cout * taps


def headline_flop_table():
    """(family, pass) -> useful FLOPs for the headline UNet
    (n_blocks=4, sf=32, planar=(0,), patch (44,88,88), batch 8).

    Families follow the profile's scope names (down_i/up_i, conv1/
    conv2/upconv/pool/head). Backward = dgrad + wgrad = 2x fwd,
    except down_0/conv1 (input_grad=False skips dgrad; wgrad only).
    The up_i/conv1 merge dgrad feeds both the upconv output and the
    skip — one dgrad at concat width, same FLOPs as fwd.
    """
    L0 = (44, 88, 88)
    L1 = (44, 44, 44)
    L2 = (22, 22, 22)
    L3 = (11, 11, 11)
    t = {}
    # encoder                       spatial cin cout taps
    t[("down_0/conv1", "fwd")] = conv_flops(L0, 1, 32, 9)
    t[("down_0/conv1", "bwd")] = conv_flops(L0, 1, 32, 9)      # wgrad only
    t[("down_0/conv2", "fwd")] = conv_flops(L0, 32, 32, 9)
    t[("down_0/conv2", "bwd")] = 2 * conv_flops(L0, 32, 32, 9)
    t[("down_1/conv1", "fwd")] = conv_flops(L1, 32, 64, 27)
    t[("down_1/conv1", "bwd")] = 2 * conv_flops(L1, 32, 64, 27)
    t[("down_1/conv2", "fwd")] = conv_flops(L1, 64, 64, 27)
    t[("down_1/conv2", "bwd")] = 2 * conv_flops(L1, 64, 64, 27)
    t[("down_2 (XLA)", "fwd")] = conv_flops(L2, 64, 128, 27) + \
        conv_flops(L2, 128, 128, 27)
    t[("down_2 (XLA)", "bwd")] = 2 * t[("down_2 (XLA)", "fwd")]
    t[("down_3 (XLA)", "fwd")] = conv_flops(L3, 128, 256, 27) + \
        conv_flops(L3, 256, 256, 27)
    t[("down_3 (XLA)", "bwd")] = 2 * t[("down_3 (XLA)", "fwd")]
    # decoder (up_0 deepest)
    t[("up_0 (XLA)", "fwd")] = (conv_flops(L2, 256, 128, 1) +     # upconv
                                conv_flops(L2, 256, 128, 27) +   # merge
                                conv_flops(L2, 128, 128, 27))
    t[("up_0 (XLA)", "bwd")] = 2 * t[("up_0 (XLA)", "fwd")]
    t[("up_1/upconv", "fwd")] = conv_flops(L1, 128, 64, 1)
    t[("up_1/upconv", "bwd")] = 2 * conv_flops(L1, 128, 64, 1)
    t[("up_1/conv1", "fwd")] = conv_flops(L1, 128, 64, 27)
    t[("up_1/conv1", "bwd")] = 2 * conv_flops(L1, 128, 64, 27)
    t[("up_1/conv2", "fwd")] = conv_flops(L1, 64, 64, 27)
    t[("up_1/conv2", "bwd")] = 2 * conv_flops(L1, 64, 64, 27)
    t[("up_2/upconv", "fwd")] = conv_flops(L0, 64, 32, 1)
    t[("up_2/upconv", "bwd")] = 2 * conv_flops(L0, 64, 32, 1)
    t[("up_2/conv1", "fwd")] = conv_flops(L0, 64, 32, 9)
    t[("up_2/conv1", "bwd")] = 2 * conv_flops(L0, 64, 32, 9)
    t[("up_2/conv2", "fwd")] = conv_flops(L0, 32, 32, 9)
    t[("up_2/conv2", "bwd")] = 2 * conv_flops(L0, 32, 32, 9)
    t[("head (conv_final)", "fwd")] = conv_flops(L0, 32, 2, 1)
    t[("head (conv_final)", "bwd")] = 2 * conv_flops(L0, 32, 2, 1)
    return t


# Packing-ceiling useful-MAC fractions (docstring derivations).
# down_1/conv1 (32->64): the pooled compact32 input fills half of each
# 64-lane input group, so the within-row/corner matmuls carry 32 of 64
# useful ci lanes — half the C=64 fraction (0.75 / 2).
PACKING_FRAC = {
    "down_0/conv2": 0.375, "up_2/conv1": 0.375, "up_2/conv2": 0.375,
    "down_1/conv1": 0.375, "down_1/conv2": 0.75,
    "up_1/conv1": 0.75, "up_1/conv2": 0.75,
    "up_1/upconv": 1.0, "up_2/upconv": 1.0,
}
# Families whose useful FLOPs are tiny/zero by construction (cost is
# layout/VPU, not MACs) — graded by time only. Pools (suffix match in
# the printer) are max-pools: zero MACs.
NO_CEILING = {"down_0/conv1", "head (conv_final)", "loss+opt+misc"}


# ------------------------------------------------------------- capture

def capture(out_dir):
    from functools import partial
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax
    from elektronn3_tpu.models.unet import UNet
    from elektronn3_tpu.modules import CEDiceLoss

    model = UNet(in_channels=1, out_channels=2, n_blocks=4,
                 start_filts=32, planar_blocks=(0,), dim=3,
                 normalization="batch", dtype=jnp.bfloat16)
    crit = CEDiceLoss(1.0, 1.0)
    shape = (BATCH,) + PATCH + (1,)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=shape), jnp.float32)
    y = jnp.asarray(rng.integers(0, 2, size=shape[:-1]))
    key = jax.random.PRNGKey(0)
    variables = model.init({"params": key, "dropout": key},
                           jnp.zeros(shape, jnp.float32), train=False)
    params, batch_stats = variables["params"], variables["batch_stats"]
    tx = optax.adam(1e-3)
    opt_state = tx.init(params)

    @partial(jax.jit, donate_argnums=(0, 1, 2))
    def train_step(params, batch_stats, opt_state, x, y):
        def loss_fn(pp):
            out, mut = model.apply(
                {"params": pp, "batch_stats": batch_stats}, x,
                train=True, mutable=["batch_stats"])
            return crit(out, y).astype(jnp.float32), mut["batch_stats"]
        (loss, bs), g = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(g, opt_state)
        params = optax.apply_updates(params, updates)
        return params, bs, opt_state, loss

    print("compiling...", flush=True)
    for _ in range(3):
        params, batch_stats, opt_state, loss = train_step(
            params, batch_stats, opt_state, x, y)
    print("warm loss", float(loss), flush=True)
    jax.profiler.start_trace(out_dir)
    print("trace started", flush=True)
    for _ in range(STEPS):
        params, batch_stats, opt_state, loss = train_step(
            params, batch_stats, opt_state, x, y)
    print("traced loss", float(loss), flush=True)
    jax.profiler.stop_trace()
    print("trace written to", out_dir, flush=True)


# --------------------------------------------------------------- parse

def load_hlo_stats(trace_dir):
    """Return list of dict rows from xprof's hlo_stats tool."""
    planes = sorted(glob.glob(trace_dir + "/**/*.xplane.pb",
                              recursive=True))
    if not planes:
        raise SystemExit(f"no xplane.pb under {trace_dir}")
    from xprof.convert import raw_to_tool_data
    data, _ = raw_to_tool_data.xspace_to_tool_data(
        [planes[-1]], "hlo_stats", {})
    if isinstance(data, bytes):
        data = data.decode()
    obj = json.loads(data)
    return obj


_FAMILY_RE = re.compile(r"_unet_forward/(down_\d|up_\d)/"
                        r"(conv1|conv2|upconv|pool)")
# Pool kernels sit directly under the level scope (no submodule name).
_POOL_RE = re.compile(r"_unet_forward/(down_\d|up_\d)/pallas_call")


def classify(fw_name, category):
    """(family, pass) from the hlo_stats Framework op name."""
    is_bwd = "transpose(jvp" in fw_name
    m = _FAMILY_RE.search(fw_name)
    if not m:
        mp = _POOL_RE.search(fw_name)
        if mp:
            return (f"{mp.group(1)}/pool",
                    "bwd" if is_bwd else "fwd")
    if m:
        lvl, op = m.groups()
        if lvl in ("down_2", "down_3", "up_0"):
            return f"{lvl} (XLA)", "bwd" if is_bwd else "fwd"
        return f"{lvl}/{op}", "bwd" if is_bwd else "fwd"
    if "conv_final" in fw_name or "/head" in fw_name:
        return "head (conv_final)", "bwd" if is_bwd else "fwd"
    if re.search(r"_unet_forward/(down_2|down_3|up_0)", fw_name):
        return ("down_2 (XLA)" if "down_2" in fw_name else
                "down_3 (XLA)" if "down_3" in fw_name else "up_0 (XLA)",
                "bwd" if is_bwd else "fwd")
    return "loss+opt+misc", "all"


def parse(trace_dir, dump=False):
    obj = load_hlo_stats(trace_dir)
    # hlo_stats ships a GViz DataTable: {cols: [...], rows: [{c: [...]}]}
    cols = [c.get("label") or c.get("id") for c in obj["cols"]]
    rows = [[c.get("v") if isinstance(c, dict) else c
             for c in r["c"]] for r in obj["rows"]]
    if dump:
        print("\t".join(map(str, cols)))
        for r in rows[:400]:
            print("\t".join(map(str, r)))
        return
    idx = {c: i for i, c in enumerate(cols)}
    i_fw = idx["Framework op name"]
    i_self = idx["Total self time (us)"]
    i_cat = idx["HLO op category"]

    tms = defaultdict(float)      # (family, pass) -> ms per step
    misc = []
    for r in rows:
        fam, ps = classify(str(r[i_fw]), str(r[i_cat]))
        tms[(fam, ps)] += float(r[i_self]) / 1e3 / STEPS
        if fam == "loss+opt+misc":
            misc.append((float(r[i_self]) / 1e3 / STEPS,
                         str(r[i_cat]), str(r[i_fw])[:110]))
    if _os.environ.get("MFU_MISC"):
        for t, cat, fw in sorted(misc, reverse=True)[:25]:
            print(f"  misc {t:6.3f} ms  {cat:12s}  {fw}")

    flops = headline_flop_table()
    fams = sorted({f for f, _ in list(tms) + list(flops)})
    step_ms = sum(tms.values())
    tot_flop = 0.0
    print(f"\n| family | pass | ms/step | useful GFLOP | achieved TF/s "
          f"| ceiling TF/s (packing) | % of ceiling |")
    print("|---|---|---|---|---|---|---|")
    for fam in fams:
        for ps in ("fwd", "bwd", "all"):
            t = tms.get((fam, ps), 0.0)
            fl = flops.get((fam, ps), 0.0)
            if t == 0 and fl == 0:
                continue
            tot_flop += fl
            ach = fl / (t * 1e-3) / 1e12 if t else float("nan")
            frac = PACKING_FRAC.get(fam)
            if fam in NO_CEILING or fam.endswith("/pool") or frac is None:
                ceil_s = pct_s = "—"
            else:
                ceil = V5E_BF16_PEAK_TFS * frac
                ceil_s = f"{ceil:.0f} ({frac:.0%})"
                pct_s = f"{100 * ach / ceil:.0f}%"
            print(f"| {fam} | {ps} | {t:.2f} | {fl / 1e9:.1f} | "
                  f"{ach:.1f} | {ceil_s} | {pct_s} |")
    print(f"\nprofile device-busy: {step_ms:.2f} ms/step; "
          f"useful FLOPs {tot_flop / 1e12:.3f} TFLOP/step")
    for name, ms in [("device-busy", step_ms)]:
        tfs = tot_flop / (ms * 1e-3) / 1e12
        print(f"whole-step achieved ({name} {ms:.2f} ms): "
              f"{tfs:.1f} TF/s = {100 * tfs / V5E_BF16_PEAK_TFS:.1f}% MFU "
              f"(v5e bf16 peak {V5E_BF16_PEAK_TFS:.0f} TF/s)")
    return tms


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--capture", action="store_true")
    p.add_argument("--parse", metavar="DIR")
    p.add_argument("--dump", action="store_true")
    p.add_argument("--out", default="/tmp/e3tpu_mfu")
    a = p.parse_args()
    if a.capture:
        capture(a.out)
    elif a.parse:
        parse(a.parse, dump=a.dump)
    else:
        p.error("need --capture or --parse DIR")
