"""Numeric tests for the loss zoo (golden formulas, torch cross-check)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from elektronn3_tpu.modules import loss as L
from elektronn3_tpu.modules import lovasz


def make_seg_batch(rng, n=2, spatial=(8, 8), c=3):
    logits = jnp.asarray(rng.normal(size=(n, *spatial, c)), jnp.float32)
    target = jnp.asarray(rng.integers(0, c, size=(n, *spatial)))
    return logits, target


def test_cross_entropy_matches_torch(rng):
    import torch
    logits, target = make_seg_batch(rng)
    ours = L.cross_entropy(logits, target)
    t_logits = torch.tensor(np.moveaxis(np.asarray(logits), -1, 1))
    t_target = torch.tensor(np.asarray(target)).long()
    theirs = torch.nn.functional.cross_entropy(t_logits, t_target).item()
    assert np.isclose(float(ours), theirs, rtol=1e-5)


def test_cross_entropy_weights_and_ignore(rng):
    import torch
    logits, target = make_seg_batch(rng)
    w = np.array([0.2, 1.0, 3.0], np.float32)
    ours = L.cross_entropy(logits, target, weight=jnp.asarray(w),
                           ignore_index=0)
    t_logits = torch.tensor(np.moveaxis(np.asarray(logits), -1, 1))
    t_target = torch.tensor(np.asarray(target)).long()
    theirs = torch.nn.functional.cross_entropy(
        t_logits, t_target, weight=torch.tensor(w), ignore_index=0).item()
    assert np.isclose(float(ours), theirs, rtol=1e-5)


def test_dice_perfect_prediction_is_near_zero(rng):
    target = jnp.asarray(rng.integers(0, 3, size=(2, 8, 8)))
    onehot = jax.nn.one_hot(target, 3)
    val = L.dice_loss(onehot, target)
    assert float(val) < 1e-3


def test_dice_loss_formula(rng):
    logits, target = make_seg_batch(rng)
    probs = jax.nn.softmax(logits, axis=-1)
    got = L.dice_loss(probs, target)
    # Direct reference formula (loss.py:165-189)
    p = np.asarray(probs)
    t = np.asarray(jax.nn.one_hot(target, 3))
    num = 2 * (p * t).sum(axis=(0, 1, 2))
    den = (p + t).sum(axis=(0, 1, 2)) + 1e-4
    expect = (1 - num / den).mean()
    assert np.isclose(float(got), expect, rtol=1e-5)


def test_dice_loss_class_api(rng):
    logits, target = make_seg_batch(rng)
    crit = L.DiceLoss()
    v = crit(logits, target)
    assert np.isfinite(float(v)) and 0 <= float(v) <= 1


def test_focal_reduces_to_ce_at_gamma0(rng):
    logits, target = make_seg_batch(rng)
    fl = L.focal_loss(logits, target, gamma=0.0)
    ce = L.cross_entropy(logits, target)
    assert np.isclose(float(fl), float(ce), rtol=1e-5)


def test_combined_loss(rng):
    logits, target = make_seg_batch(rng)
    ce = L.CrossEntropyLoss()
    dc = L.DiceLoss()
    comb = L.CombinedLoss([ce, dc], weight=[0.5, 2.0])
    got = comb(logits, target)
    expect = 0.5 * float(ce(logits, target)) + 2.0 * float(dc(logits, target))
    assert np.isclose(float(got), expect, rtol=1e-5)


def test_masked_mse(rng):
    out = jnp.asarray(rng.normal(size=(2, 4, 4, 1)), jnp.float32)
    tgt = jnp.asarray(rng.normal(size=(2, 4, 4, 1)), jnp.float32)
    mask = jnp.asarray(rng.integers(0, 2, size=(2, 4, 4, 1)))
    got = L.masked_mse_loss(out, tgt, mask)
    m = np.asarray(mask).astype(bool)
    expect = ((np.asarray(out) - np.asarray(tgt))[m] ** 2).mean()
    assert np.isclose(float(got), expect, rtol=1e-5)
    # No mask = plain MSE
    assert np.isclose(float(L.masked_mse_loss(out, tgt)),
                      ((np.asarray(out) - np.asarray(tgt)) ** 2).mean(),
                      rtol=1e-6)


def test_gap_triplet(rng):
    a = jnp.asarray(rng.normal(size=(2, 8, 8, 4)), jnp.float32)
    p = a + 0.01
    n = jnp.asarray(rng.normal(size=(2, 8, 8, 4)), jnp.float32)
    crit = L.GAPTripletMarginLoss()
    v_easy = crit(a, p, n)
    v_hard = crit(a, n, p)
    assert float(v_hard) > float(v_easy)


def test_lovasz_perfect_vs_bad(rng):
    target = jnp.asarray(rng.integers(0, 3, size=(2, 8, 8)))
    onehot = jax.nn.one_hot(target, 3)
    perfect = lovasz.lovasz_softmax(onehot, target)
    uniform = lovasz.lovasz_softmax(jnp.full_like(onehot, 1 / 3), target)
    assert float(perfect) < float(uniform)
    assert float(perfect) < 1e-3


def test_lovasz_grad_formula():
    gt = jnp.asarray([1.0, 1.0, 0.0, 1.0, 0.0])
    g = np.asarray(lovasz.lovasz_grad(gt))
    # manual: gts=3
    inter = 3 - np.cumsum([1, 1, 0, 1, 0])
    union = 3 + np.cumsum([0, 0, 1, 0, 1])
    jac = 1.0 - inter / union
    expect = np.concatenate([jac[:1], np.diff(jac)])
    assert np.allclose(g, expect)


def test_lovasz_ignore_index(rng):
    # Ignored pixels must not change the loss: compare loss with some
    # pixels ignored vs the same pixels given correct predictions.
    target = np.asarray(rng.integers(0, 2, size=(1, 6, 6)))
    probs = np.asarray(rng.uniform(0.0, 1.0, size=(1, 6, 6, 2)), np.float32)
    probs = probs / probs.sum(-1, keepdims=True)
    tgt_ig = target.copy()
    tgt_ig[0, :2, :2] = 255
    v = lovasz.lovasz_softmax(jnp.asarray(probs), jnp.asarray(tgt_ig),
                              ignore=255)
    assert np.isfinite(float(v))


def test_norpf_dice(rng):
    logits, target = make_seg_batch(rng, c=4)
    crit = L.NorpfDiceLoss()
    v = crit(logits, target)
    assert np.isfinite(float(v))


def test_acloss(rng):
    logits, target = make_seg_batch(rng, c=2)
    crit = L.ACLoss()
    v = crit(logits, target)
    assert np.isfinite(float(v))


def test_distance_weighted_mse(rng):
    out = jnp.asarray(rng.normal(size=(2, 96, 96, 1)), jnp.float32)
    tgt = jnp.asarray(rng.normal(size=(2, 96, 96, 1)), jnp.float32)
    crit = L.DistanceWeightedMSELoss(fg_weight=10.0, mask_borders=8)
    v = crit(out, tgt)
    assert np.isfinite(float(v))
    # fg_weight=1, no border mask == plain MSE
    crit1 = L.DistanceWeightedMSELoss(fg_weight=1.0, mask_borders=None)
    assert np.isclose(float(crit1(out, tgt)),
                      ((np.asarray(out) - np.asarray(tgt)) ** 2).mean(),
                      rtol=1e-6)


def test_fixmatch_consistency_zero_for_equivariant_fn(rng):
    # An identity "model" is trivially flip/rot-equivariant -> loss ~ only
    # pseudo-label CE; with pseudo-labels off, consistency must be 0.
    inp = jnp.asarray(rng.normal(size=(2, 8, 8, 3)), jnp.float32)
    crit = L.FixMatchSegLoss(lambda x: x, enable_pseudo_label=False)
    v = crit(inp, rng=jax.random.PRNGKey(1))
    assert float(v) < 1e-10


def test_cedice_fused_matches_combined(rng):
    logits, target = make_seg_batch(rng)
    fused = L.CEDiceLoss(0.5, 0.5)(logits, target)
    ref = L.CombinedLoss([L.CrossEntropyLoss(), L.DiceLoss()],
                         weight=[0.5, 0.5])(logits, target)
    assert np.isclose(float(fused), float(ref), rtol=1e-5)
    # Weighted variant
    w = np.array([0.3, 1.0, 2.0], np.float32)
    fused_w = L.CEDiceLoss(1.0, 1.0, class_weight=w)(logits, target)
    ref_w = L.CombinedLoss(
        [L.CrossEntropyLoss(weight=w), L.DiceLoss(weight=w)],
        weight=[1.0, 1.0])(logits, target)
    assert np.isclose(float(fused_w), float(ref_w), rtol=1e-4)
