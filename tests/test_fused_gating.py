"""Gating tests for the fused-executor coverage matrix
(docs/design.md "Fused-executor coverage matrix"; round-2 review
item 3). These are pure trace-time predicates — no kernels run — so
they exercise exactly the decisions 'auto' makes on a TPU backend.

Reference point for uniform coverage: reference models/unet.py:550-935
(its cuDNN path covers every config; ours must at least *decide*
correctly and loudly)."""

import jax
import jax.numpy as jnp
import pytest

from elektronn3_tpu.models import unet as unet_mod
from elektronn3_tpu.models.unet import UNet


def _m(**kw):
    base = dict(in_channels=1, out_channels=2, n_blocks=2,
                start_filts=32, planar_blocks=(0,), dim=3,
                normalization="batch", dtype=jnp.bfloat16,
                pallas_flat="auto")
    base.update(kw)
    return UNet(**base)


@pytest.fixture
def tpu_backend(monkeypatch):
    """'auto' gates on jax.default_backend() == 'tpu'; fake it so the
    decision logic (not the environment) is under test."""
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")


def test_auto_declines_off_tpu():
    # Real backend in tests is CPU: 'auto' must resolve to the XLA
    # executor everywhere (interpret mode is for parity tests only).
    m = _m()
    assert not m._flat_fused_ok(True, 32, 88, 88)
    assert not m._flat_fused64_ok(False, 64, 44, 44, 44, True)


def test_auto_declines_f32(tpu_backend):
    m = _m(dtype=jnp.float32)
    assert not m._flat_fused_ok(True, 32, 88, 88)
    assert not m._flat_fused64_ok(False, 64, 44, 44, 44, True)


def test_headline_levels_engage(tpu_backend):
    m = _m()
    # L0: C=32 planar at (88, 88); L1: C=64 3D at (44, 44).
    assert m._flat_fused_ok(True, 32, 88, 88)
    assert m._flat_fused64_ok(False, 64, 44, 44, 44, True)
    # L1 decoder (128 -> 64 merge conv): 2 x 1408 rows fits.
    assert m._flat_fused64_ok(False, 64, 44, 44, 0, False, merge=True)


def test_c128_small_level_declines_under_auto(tpu_backend):
    m = _m()
    # Headline L2: C=128 at 22^3 = 10648 vox < _FUSED128_MIN_VOX —
    # measured ~+9 ms/step vs XLA (BASELINE.md "C=128 crossover").
    assert not m._flat_fused64_ok(False, 128, 22, 22, 22, True)
    reason = m._fused_decline_reason(False, 128, 22, 22, 22, True)
    assert "too small" in reason
    # Forced mode still engages (capability is tested in test_flat64).
    mf = _m(pallas_flat=True)
    assert mf._flat_fused64_ok(False, 128, 22, 22, 22, True)


def test_merge_vmem_bound_declines_planar64_decoder(tpu_backend):
    from elektronn3_tpu.ops import flat_fused64 as ff64
    m = _m(start_filts=64)
    # C=64 planar encoder at (88, 88): 4752 rows, fits.
    assert m._flat_fused64_ok(True, 64, 88, 88, 44, True)
    # Its decoder conv1 consumes the 2-chunk concat: the UNSPLIT
    # backward exceeds the measured 16 MB scoped-VMEM limit (v5e:
    # +645 KB OOM) — round 5's input-chunk split (bwd_ki_split) runs
    # it as two 1-chunk calls, which fit, so the level now TRAINS
    # fused instead of declining.
    assert ff64.conv64_vmem_bytes(2, 1, 1, 88, 88, train=True) \
        + ff64.VMEM_SLOP > ff64.VMEM_LIMIT          # unsplit: over
    assert ff64.bwd_ki_split(2, 1, 1, 88, 88) == 2  # split fits
    assert m._flat_fused64_ok(True, 64, 88, 88, 0, False,
                              merge=True)
    # merge_mode='add' does not widen the conv: stays fused unsplit.
    ma = _m(start_filts=64, merge_mode="add")
    assert ma._flat_fused64_ok(True, 64, 88, 88, 0, False, merge=True)


def test_decline_reasons_name_the_cause(tpu_backend):
    m = _m()
    assert "C=256 has no fused executor" in \
        m._fused_decline_reason(False, 256, 11, 11, 11, False)
    assert "odd level shape" in \
        m._fused_decline_reason(False, 64, 11, 11, 11, False)
    mf = _m(dtype=jnp.float32)
    assert "bfloat16" in \
        mf._fused_decline_reason(True, 32, 88, 88, 44, True)


def test_min_vox_env_knob(tpu_backend, monkeypatch):
    # The crossover is env-tunable for recalibration on new hardware.
    monkeypatch.setattr(unet_mod, "_FUSED128_MIN_VOX", 1)
    m = _m()
    assert m._flat_fused64_ok(False, 128, 22, 22, 22, True)
    monkeypatch.setattr(unet_mod, "_FUSED128_MIN_VOX", 10**9)
    assert not m._flat_fused64_ok(False, 128, 44, 44, 44, True)


def test_sf64_model_plans_without_vmem_oom(tpu_backend):
    """The sf=64 3-block model (planar C=64 L0 at (88,88), C=128 L1 at
    44^3) must produce a plan whose every fused level fits the scoped
    VMEM limit — the merge bound is what keeps up_1 off the fused
    path. (Tracing only; uses abstract eval, no TPU needed.)"""
    m = _m(start_filts=64, n_blocks=3)
    shape = (1, 44, 88, 88, 1)
    out = jax.eval_shape(
        lambda x: m.init({"params": jax.random.PRNGKey(0)},
                         x, train=False),
        jax.ShapeDtypeStruct(shape, jnp.float32))
    assert out  # tracing succeeded; decoder declined via merge bound


def test_c128_decoder_gate(tpu_backend):
    """The C=128 decoder (merge=True) declines where the per-kernel
    VMEM estimate exceeds the chip limit and engages where it fits."""
    m = _m(start_filts=64, n_blocks=3)
    import elektronn3_tpu.ops.flat_fused64 as _f
    # sf=64 model's L1 at 44^3: the 4-chunk kd=3 merge conv COMPILED
    # AT 17.35 MB scoped VMEM on the v5e in its 3-view form (1.35 MB
    # over the 16 MB limit, measured 2026-08-18) — the old row-count
    # heuristic let it through (it ignored the nin*nout*kd
    # packed-weight blocks, 4.7 MB here). Its unsplit BACKWARD needs
    # ~28 MB (the m0/mc f32 accumulators alone are 9.4 MB); round 5's
    # input-chunk split runs it as four 1-chunk calls (~10 MB each),
    # so training now ENGAGES under the z-window kernels.
    assert _f.conv64_vmem_bytes(4, 2, 3, 44, 44, train=True, zw=True) \
        + _f.VMEM_SLOP > _f.VMEM_LIMIT               # unsplit: over
    assert m._flat_fused64_ok(False, 128, 44, 44, 44, False,
                              merge=True, train=True) \
        == _f._zwindow_enabled()
    assert m._flat_fused64_ok(False, 128, 44, 44, 44, False,
                              merge=True, train=False) \
        == _f._zwindow_enabled()
    # headline-22^3-sized C=128 level: min-vox declines under 'auto'.
    assert not m._flat_fused64_ok(False, 128, 22, 22, 22, False,
                                  merge=True)
    # VMEM bound: 4-chunk merge at (88, 88) exceeds it even fully
    # split (the dy/y views and dy_tot scratch don't shrink with ki).
    assert _f.bwd_ki_split(4, 2, 3, 88, 88) == 0
    assert not m._flat_fused64_ok(False, 128, 88, 88, 88, False,
                                  merge=True)
    # Forced mode respects the VMEM gate too (forcing a config the
    # chip cannot compile is useless) — except under interpret, where
    # the CPU parity tests run with no scoped-VMEM constraint. With
    # the ki-split the 44^3 merge now fits in training as well.
    mf = _m(start_filts=64, n_blocks=3, pallas_flat=True)
    assert mf._flat_fused64_ok(False, 128, 44, 44, 44, False,
                               merge=True) == _f._zwindow_enabled()
    assert not mf._flat_fused64_ok(False, 128, 88, 88, 88, False,
                                   merge=True)


def test_vmem_estimator_matches_measured_points(tpu_backend):
    """conv64_vmem_bytes against the three v5e calibration points
    (docs/design.md round-3): measured-OOM configs estimate over the
    limit, the known-good headline decoder under it. The OOM points
    were measured on the 3-view kernels (zw=False); the z-window
    variants shrink the input-view footprint."""
    from elektronn3_tpu.ops import flat_fused64 as ff64
    lim = ff64.VMEM_LIMIT - ff64.VMEM_SLOP
    # C=128 decoder merge fwd at (44,44,44): real 17.35 MB (OOM).
    est = ff64.conv64_vmem_bytes(4, 2, 3, 44, 44, train=False, zw=False)
    assert est > lim and abs(est - 17.35 * 2**20) / 2**20 < 2.5
    # planar C=64 decoder bwd at (88,88): real 16.65 MB (OOM);
    # kd=1, so the z-window mode does not apply.
    est = ff64.conv64_vmem_bytes(2, 1, 1, 88, 88, train=True)
    assert est > lim
    # headline L1 decoder bwd at (44,44): compiles and runs (both
    # kernel forms).
    for zw in (False, True):
        est = ff64.conv64_vmem_bytes(2, 1, 3, 44, 44, train=True, zw=zw)
        assert est <= lim
    # headline L1 encoder: plenty of headroom.
    est = ff64.conv64_vmem_bytes(1, 1, 3, 44, 44, train=True)
    assert est <= lim - 4 * 2**20
    # z-window halves the view footprint: the C=128 merge conv fwd
    # that OOM'd in 3-view form fits under zw (eval engages; its
    # backward still declines on the m0/mc f32 accumulators).
    assert ff64.conv64_vmem_bytes(4, 2, 3, 44, 44, train=False,
                                  zw=True) <= lim
    assert ff64.conv64_vmem_bytes(4, 2, 3, 44, 44, train=True,
                                  zw=True) > lim


def test_sf64_level_coherence(tpu_backend):
    """Level coherence under the VMEM gate: when a level's decoder
    merge conv declines, the ENCODER must decline too under 'auto' —
    fusing only the encoder measured slower than pure XLA (v5e: 156 vs
    143 ms/step on the sf=64 3-block model). Since round 5's
    input-chunk split the sf=64 model's L0/L1 merges FIT in training,
    so the whole model fuses; the still-declining geometry (C=128
    merge at 88^3, dy views don't shrink with ki) must kick its
    encoder off with it."""
    import jax
    m = _m(start_filts=64, n_blocks=3)
    # 88^3 C=128: merge declines fully-split -> encoder declines too
    # (coherence), even though the encoder conv alone would fit.
    assert not m._flat_fused64_ok(False, 128, 88, 88, 88, False,
                                  merge=True)
    shape = (1, 44, 88, 88, 1)
    x = jax.ShapeDtypeStruct(shape, jnp.float32)
    v = jax.eval_shape(
        lambda xx: m.init({"params": jax.random.PRNGKey(0)}, xx,
                          train=False), x)

    def train_apply(params, batch_stats, xx):
        return m.apply({"params": params, "batch_stats": batch_stats},
                       xx, train=True, mutable=["batch_stats"])

    jaxpr = jax.make_jaxpr(train_apply)(v["params"], v["batch_stats"], x)

    # Flatten nested jaxprs (pjit/custom_vjp bodies hold the kernels).
    def collect(jx, acc):
        for e in jx.eqns:
            acc.add(e.primitive.name)
            for p in e.params.values():
                if hasattr(p, "jaxpr"):
                    collect(p.jaxpr if hasattr(p.jaxpr, "eqns")
                            else p.jaxpr.jaxpr, acc)
                if isinstance(p, (tuple, list)):
                    for q in p:
                        if hasattr(q, "jaxpr"):
                            collect(q.jaxpr if hasattr(q.jaxpr, "eqns")
                                    else q.jaxpr.jaxpr, acc)
        return acc

    names = collect(jaxpr.jaxpr, set())
    assert "pallas_call" in names, (
        "sf=64 3-block training trace must engage the fused executors "
        "under 'auto' since the round-5 input-chunk split admitted its "
        "L0/L1 decoder merge convs to training")


def test_fused_and_xla_models_init_identically():
    """Same-seed init must be BITWISE identical between the fused and
    XLA executors (flax folds a per-module call counter into param
    rngs, so fused modules must draw kernel-then-bias exactly like
    nn.Conv/nn.ConvTranspose — a bias-first draw in the fused upconvs
    silently de-paired executor A/B runs)."""
    import jax
    from elektronn3_tpu.models.unet import init_unet
    for kwx in (dict(start_filts=64, n_blocks=2),
                dict(start_filts=32, n_blocks=4)):
        kw = dict(in_channels=1, out_channels=2, planar_blocks=(0,),
                  dim=3, normalization="batch", dtype=jnp.bfloat16,
                  **kwx)
        shape = (1, 4, 8, 8, 1)
        va = init_unet(UNet(pallas_flat=True, **kw), shape)
        vb = init_unet(UNet(pallas_flat=False, **kw), shape)
        for a, b in zip(jax.tree_util.tree_leaves(va["params"]),
                        jax.tree_util.tree_leaves(vb["params"])):
            assert a.shape == b.shape
            assert float(jnp.max(jnp.abs(
                jnp.asarray(a, jnp.float32)
                - jnp.asarray(b, jnp.float32)))) == 0.0
