"""Lovász-Softmax and Lovász-hinge losses in pure JAX.

Direct-optimization surrogates for the Jaccard (IoU) index
(Berman et al., arXiv:1705.08790). Functional parity with the reference's
vendored implementation (elektronn3/modules/lovasz_losses.py:33-232), but
restructured for XLA: instead of boolean-mask *filtering* (dynamic shapes),
ignored pixels are handled by zeroing their error contribution, which is
exact because prefix cumsums are unaffected by trailing zero-error
elements.

Channels-last convention: ``probas`` is ``(N, *spatial, C)``, ``labels``
is ``(N, *spatial)`` int.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def lovasz_grad(gt_sorted: jnp.ndarray) -> jnp.ndarray:
    """Gradient of the Lovász extension w.r.t. sorted errors.

    Reference: lovasz_losses.py:33-45.
    """
    p = gt_sorted.shape[0]
    gts = jnp.sum(gt_sorted)
    intersection = gts - jnp.cumsum(gt_sorted)
    union = gts + jnp.cumsum(1.0 - gt_sorted)
    jaccard = 1.0 - intersection / jnp.maximum(union, 1e-12)
    if p > 1:
        jaccard = jnp.concatenate(
            [jaccard[:1], jaccard[1:] - jaccard[:-1]])
    return jaccard


def _lovasz_softmax_flat(probas: jnp.ndarray, labels: jnp.ndarray,
                         valid: jnp.ndarray,
                         only_present: bool = False) -> jnp.ndarray:
    """Lovász-Softmax on flat (P, C) probabilities / (P,) labels.

    ``valid`` is a (P,) float mask; invalid pixels contribute zero error
    and zero foreground. Reference: lovasz_losses.py:185-203.
    """
    C = probas.shape[1]

    def class_loss(c):
        fg = (labels == c).astype(probas.dtype) * valid
        errors = jnp.abs(fg - probas[:, c]) * valid
        order = jnp.argsort(-errors)
        errors_sorted = errors[order]
        fg_sorted = fg[order]
        loss_c = jnp.dot(errors_sorted, lovasz_grad(fg_sorted))
        present = (jnp.sum(fg) > 0).astype(probas.dtype)
        return loss_c, present

    losses, presents = jax.vmap(class_loss)(jnp.arange(C))
    if only_present:
        return jnp.sum(losses * presents) / jnp.maximum(
            jnp.sum(presents), 1e-12)
    return jnp.mean(losses)


def lovasz_softmax(probas: jnp.ndarray, labels: jnp.ndarray,
                   only_present: bool = False, per_image: bool = False,
                   ignore: Optional[int] = None) -> jnp.ndarray:
    """Multi-class Lovász-Softmax loss.

    Args:
        probas: class probabilities, ``(N, *spatial, C)`` channels-last.
        labels: int ground truth, ``(N, *spatial)``.
        only_present: average only over classes present in ``labels``.
        per_image: compute per image instead of over the whole batch.
        ignore: void class id.

    Reference: lovasz_losses.py:168-221 (incl. 4D/5D flatten_probas).
    """
    C = probas.shape[-1]
    if per_image:
        def one(pr, lb):
            prf = pr.reshape(-1, C)
            lbf = lb.reshape(-1)
            vld = jnp.ones_like(lbf, prf.dtype) if ignore is None else \
                (lbf != ignore).astype(prf.dtype)
            return _lovasz_softmax_flat(prf, lbf, vld, only_present)
        return jnp.mean(jax.vmap(one)(probas, labels))
    prf = probas.reshape(-1, C)
    lbf = labels.reshape(-1)
    vld = jnp.ones_like(lbf, prf.dtype) if ignore is None else \
        (lbf != ignore).astype(prf.dtype)
    return _lovasz_softmax_flat(prf, lbf, vld, only_present)


def _lovasz_hinge_flat(logits: jnp.ndarray, labels: jnp.ndarray,
                       valid: jnp.ndarray) -> jnp.ndarray:
    """Binary Lovász hinge on flat logits. Reference
    lovasz_losses.py:109-126."""
    signs = 2.0 * labels - 1.0
    errors = (1.0 - logits * signs) * valid
    order = jnp.argsort(-errors)
    errors_sorted = errors[order]
    gt_sorted = (labels * valid)[order]
    grad = lovasz_grad(gt_sorted)
    return jnp.dot(jax.nn.relu(errors_sorted), grad)


def lovasz_hinge(logits: jnp.ndarray, labels: jnp.ndarray,
                 per_image: bool = True,
                 ignore: Optional[int] = None) -> jnp.ndarray:
    """Binary Lovász hinge loss. ``logits`` (N, *spatial) raw scores,
    ``labels`` (N, *spatial) in {0, 1}. Reference lovasz_losses.py:93-106."""
    if per_image:
        def one(lg, lb):
            lgf, lbf = lg.reshape(-1), lb.reshape(-1).astype(lg.dtype)
            vld = jnp.ones_like(lgf) if ignore is None else \
                (lb.reshape(-1) != ignore).astype(lg.dtype)
            return _lovasz_hinge_flat(lgf, lbf, vld)
        return jnp.mean(jax.vmap(one)(logits, labels))
    lgf = logits.reshape(-1)
    lbf = labels.reshape(-1).astype(lgf.dtype)
    vld = jnp.ones_like(lgf) if ignore is None else \
        (labels.reshape(-1) != ignore).astype(lgf.dtype)
    return _lovasz_hinge_flat(lgf, lbf, vld)


def binary_xloss(logits: jnp.ndarray, labels: jnp.ndarray,
                 ignore: Optional[int] = None) -> jnp.ndarray:
    """Numerically stable binary cross-entropy on logits.
    Reference lovasz_losses.py:144-165 (StableBCELoss)."""
    lbf = labels.astype(logits.dtype)
    neg_abs = -jnp.abs(logits)
    loss = jnp.clip(logits, 0) - logits * lbf + jnp.log1p(jnp.exp(neg_abs))
    if ignore is not None:
        vld = (labels != ignore).astype(logits.dtype)
        return jnp.sum(loss * vld) / jnp.maximum(jnp.sum(vld), 1e-12)
    return jnp.mean(loss)


def iou_binary(preds, labels, empty: float = 1.0,
               ignore: Optional[int] = None, per_image: bool = True):
    """Binary IoU (not a loss; eval metric). Reference
    lovasz_losses.py:48-65."""
    preds = jnp.asarray(preds)
    labels = jnp.asarray(labels)
    if not per_image:
        preds, labels = preds[None], labels[None]

    def one(p, l):
        vld = jnp.ones(l.shape, jnp.float32) if ignore is None else \
            (l != ignore).astype(jnp.float32)
        inter = jnp.sum(((p == 1) & (l == 1)) * vld)
        union = jnp.sum((((p == 1) | (l == 1)) & True) * vld)
        return jnp.where(union == 0, empty, inter / jnp.maximum(union, 1e-12))

    ious = jax.vmap(one)(preds, labels)
    return 100.0 * jnp.mean(ious)
