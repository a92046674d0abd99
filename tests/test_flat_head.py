"""Flat-head custom VJP: the hand-written backward (row-padded dy,
dx written once at full chunk size — see flat_fused._head_bwd) must
match plain autodiff of the same forward impl. Fast (pure XLA, no
Pallas interpret), so it runs in the quick suite.

Reference: models/unet.py conv_final (1x1 head); the fused heads are
elektronn3_tpu/ops/flat_fused.py head_bnact_from_flat and
flat_fused64.head_bnact_from_flat64.
"""

import jax
import jax.numpy as jnp
import pytest

import elektronn3_tpu.ops.flat_fused as ff
import elektronn3_tpu.ops.flat_fused64 as ff64


CONFIGS = [
    # (public head with custom_vjp, autodiffed impl, geometry, cc)
    ("flat32", ff.head_bnact_from_flat, ff._head_impl,
     ff.flat_geometry, ff.CC),
    ("flat64", ff64.head_bnact_from_flat64, ff64._head64_impl,
     ff64.flat_geometry64, ff64.CC64),
]


@pytest.mark.parametrize("name,head,impl,geom,cc",
                         CONFIGS, ids=[c[0] for c in CONFIGS])
@pytest.mark.parametrize("act", ["relu", "leaky", "linear"])
def test_head_custom_vjp_matches_autodiff(rng, name, head, impl, geom,
                                          cc, act):
    H, W, B, D, cout, nchunks = 6, 20, 2, 3, 3, 2
    G, R, P = geom(H, W)
    xs = [jnp.asarray(rng.normal(size=(B, D, R + 2 * P, 128)),
                      jnp.float32) for _ in range(nchunks)]
    inv = [jnp.asarray(rng.normal(size=(128,)), jnp.float32)
           for _ in range(nchunks)]
    shift = [jnp.asarray(rng.normal(size=(128,)), jnp.float32)
             for _ in range(nchunks)]
    w = jnp.asarray(rng.normal(size=(cc * nchunks, cout)), jnp.float32)
    b = jnp.asarray(rng.normal(size=(cout,)), jnp.float32)
    args = (xs, inv, shift, w, b)

    def mk(fn):
        def loss(a):
            return jnp.sum(jnp.sin(fn(*a, H, W, act)))
        return loss

    y_new = head(*args, H, W, act)
    y_ref = impl(*args, H, W, act)
    assert float(jnp.max(jnp.abs(y_new - y_ref))) == 0.0  # fwd bitwise

    l_new, g_new = jax.jit(jax.value_and_grad(mk(head)))(args)
    l_ref, g_ref = jax.jit(jax.value_and_grad(mk(impl)))(args)
    assert float(l_new) == float(l_ref)
    scale = jax.tree.reduce(max, jax.tree.map(
        lambda t: float(jnp.max(jnp.abs(t))), g_ref)) + 1e-12
    diff = jax.tree.reduce(max, jax.tree.map(
        lambda a_, b_: float(jnp.max(jnp.abs(a_ - b_))), g_new, g_ref))
    # Only f32 reduction order differs (the wgrad contracts over the
    # zero-dy pad rows in the hand-written form).
    assert diff / scale < 1e-5, (name, act, diff, scale)


def _chunk_sized_pads(hlo: str):
    """Lines padding to a 128-lane (chunk-sized) result tensor.

    StableHLO types print as tensor<...x128xf32>, so the lane dim is
    matched as 'x128x' inside the RESULT type (after '->'). Round-3
    advisor: the previous '128>' condition could never match and the
    guard was vacuous.
    """
    return [line for line in hlo.splitlines()
            if "stablehlo.pad" in line
            and "x128x" in line.split("->")[-1]]


@pytest.mark.parametrize("name,head,impl,geom,cc",
                         CONFIGS, ids=[c[0] for c in CONFIGS])
def test_head_bwd_pads_dy_not_dx(name, head, impl, geom, cc):
    """Structural guard: the hand-written backward's HLO must not pad
    a chunk-sized (..., 128) tensor — the whole point is that the pad
    lands on the small dy instead of dx. Parametrized over both heads
    (flat32 and flat64 carry separate backward copies)."""
    H, W, B, D, cout = 6, 20, 1, 2, 2
    G, R, P = geom(H, W)
    xs = [jnp.zeros((B, D, R + 2 * P, 128), jnp.float32)]
    inv = [jnp.ones((128,), jnp.float32)]
    shift = [jnp.zeros((128,), jnp.float32)]
    w = jnp.zeros((cc, cout), jnp.float32)
    b = jnp.zeros((cout,), jnp.float32)
    args = (xs, inv, shift, w, b)

    def mk(fn):
        def loss(a):
            return jnp.sum(fn(*a, H, W, "relu"))
        return loss

    # Non-vacuousness: plain autodiff of the impl DOES emit a
    # chunk-sized dx pad, and this matcher flags it.
    hlo_auto = jax.jit(jax.grad(mk(impl))).lower(args).as_text()
    assert _chunk_sized_pads(hlo_auto), (
        "matcher failed to flag the known autodiff dx pad — the "
        "structural guard below would be vacuous")

    hlo = jax.jit(jax.grad(mk(head))).lower(args).as_text()
    bad = _chunk_sized_pads(hlo)
    assert not bad, f"chunk-sized pad in {name} head bwd: {bad[0]}"


@pytest.mark.parametrize("name,head,impl,geom,cc",
                         CONFIGS, ids=[c[0] for c in CONFIGS])
def test_head_bwd_extreme_finite_pad_rows(rng, name, head, impl, geom,
                                          cc):
    """The hand-written backward reduces dinv/dw over ALL chunk rows
    (pad/halo rows included) relying on zero dy there; autodiff only
    touched valid rows. Guard the docstring's 'pad rows hold finite
    halo data' assumption: with extreme-but-finite pad-row values
    (+-1e30), 0 * 1e30 == 0 so every gradient must still match
    autodiff. (With inf/nan pad rows it would NaN-poison — that is the
    documented contract violation, not a kernel bug.)"""
    H, W, B, D, cout, nchunks = 6, 20, 2, 3, 3, 2
    G, R, P = geom(H, W)
    xs = []
    for k in range(nchunks):
        x = rng.normal(size=(B, D, R + 2 * P, 128)).astype("float32")
        x[:, :, :P] = 1e30 * (-1.0) ** k
        x[:, :, P + R:] = -1e30 * (-1.0) ** k
        xs.append(jnp.asarray(x))
    inv = [jnp.asarray(rng.normal(size=(128,)), jnp.float32)
           for _ in range(nchunks)]
    shift = [jnp.asarray(rng.normal(size=(128,)), jnp.float32)
             for _ in range(nchunks)]
    w = jnp.asarray(rng.normal(size=(cc * nchunks, cout)), jnp.float32)
    b = jnp.asarray(rng.normal(size=(cout,)), jnp.float32)
    args = (xs, inv, shift, w, b)

    def mk(fn):
        def loss(a):
            return jnp.sum(jnp.sin(fn(*a, H, W, "relu")))
        return loss

    l_new, g_new = jax.jit(jax.value_and_grad(mk(head)))(args)
    l_ref, g_ref = jax.jit(jax.value_and_grad(mk(impl)))(args)
    assert float(l_new) == float(l_ref)
    finite = jax.tree.map(lambda t: bool(jnp.all(jnp.isfinite(t))),
                          g_new)
    assert all(jax.tree.leaves(finite)), (name, "non-finite grads")
    scale = jax.tree.reduce(max, jax.tree.map(
        lambda t: float(jnp.max(jnp.abs(t))), g_ref)) + 1e-12
    diff = jax.tree.reduce(max, jax.tree.map(
        lambda a_, b_: float(jnp.max(jnp.abs(a_ - b_))), g_new, g_ref))
    assert diff / scale < 1e-5, (name, diff, scale)
