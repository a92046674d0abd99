"""Segmentation metrics based on cached confusion-matrix counts.

Functional parity with reference elektronn3/training/metrics.py:
- confusion_matrix (:49-118) — per-class binary (tp, tn, fp, fn)
- precision/recall/accuracy/dice_coefficient/iou (:121-169)
- auroc/average_precision (:172-234, sklearn-backed)
- channel_metric (:237-...)
- Evaluator wrapper classes (:317-401)

Metric values are returned ×100 (percent), like the reference
(metrics.py docstring), with ``mean`` over classes excluding ignore.

Channels-last convention: model outputs are ``(N, *spatial, C)``;
dense targets ``(N, *spatial)``.
"""

from __future__ import annotations

from typing import Callable, Optional

import numpy as np


_CM_LAMBDAS = {}  # metric_fn -> ((tp, tn, fp, fn) -> value); see Evaluator


def _as_np(x) -> np.ndarray:
    return np.asarray(x)


def confusion_matrix(
        target: np.ndarray,
        pred: np.ndarray,
        num_classes: int = 2,
        dtype=np.int64,
        nan_when_empty: bool = True,
        ignore: Optional[int] = None,
) -> np.ndarray:
    """Per-class binary confusion counts (tp, tn, fp, fn), shape (C, 4).

    Reference metrics.py:49-118.
    """
    target = _as_np(target).reshape(-1)
    pred = _as_np(pred).reshape(-1)
    if ignore is not None:
        keep = target != ignore
        target = target[keep]
        pred = pred[keep]
    cm = np.empty((num_classes, 4), dtype=np.float64)
    for c in range(num_classes):
        pos_pred = pred == c
        pos_target = target == c
        tp = np.sum(pos_pred & pos_target)
        fp = np.sum(pos_pred & ~pos_target)
        fn = np.sum(~pos_pred & pos_target)
        tn = np.sum(~pos_pred & ~pos_target)
        if nan_when_empty and pos_target.sum() == 0:
            cm[c] = (np.nan,) * 4
        else:
            cm[c] = (tp, tn, fp, fn)
    return cm


def _metric_from_cm(cm: np.ndarray, fn: Callable, mean: bool) -> np.ndarray:
    with np.errstate(divide="ignore", invalid="ignore"):
        vals = fn(cm[:, 0], cm[:, 1], cm[:, 2], cm[:, 3])
    if mean:
        return np.nanmean(vals) * 100
    return vals * 100


def precision(target, pred, num_classes=2, mean=True, ignore=None):
    """tp / (tp + fp). Reference metrics.py:121-131."""
    cm = confusion_matrix(target, pred, num_classes, ignore=ignore)
    return _metric_from_cm(cm, lambda tp, tn, fp, fn: tp / (tp + fp), mean)


def recall(target, pred, num_classes=2, mean=True, ignore=None):
    """tp / (tp + fn). Reference metrics.py:134-143."""
    cm = confusion_matrix(target, pred, num_classes, ignore=ignore)
    return _metric_from_cm(cm, lambda tp, tn, fp, fn: tp / (tp + fn), mean)


def accuracy(target, pred, num_classes=2, mean=True, ignore=None):
    """(tp + tn) / all. Reference metrics.py:146-155."""
    cm = confusion_matrix(target, pred, num_classes, ignore=ignore)
    return _metric_from_cm(
        cm, lambda tp, tn, fp, fn: (tp + tn) / (tp + tn + fp + fn), mean)


def dice_coefficient(target, pred, num_classes=2, mean=True, ignore=None):
    """2tp / (2tp + fp + fn). Reference metrics.py:158-166."""
    cm = confusion_matrix(target, pred, num_classes, ignore=ignore)
    return _metric_from_cm(
        cm, lambda tp, tn, fp, fn: 2 * tp / (2 * tp + fp + fn), mean)


def iou(target, pred, num_classes=2, mean=True, ignore=None):
    """tp / (tp + fp + fn) (Jaccard). Reference metrics.py:169."""
    cm = confusion_matrix(target, pred, num_classes, ignore=ignore)
    return _metric_from_cm(
        cm, lambda tp, tn, fp, fn: tp / (tp + fp + fn), mean)


def _fill_cm_lambdas():
    _CM_LAMBDAS.update({
        precision: lambda tp, tn, fp, fn: tp / (tp + fp),
        recall: lambda tp, tn, fp, fn: tp / (tp + fn),
        accuracy: lambda tp, tn, fp, fn: (tp + tn) / (tp + tn + fp + fn),
        dice_coefficient: lambda tp, tn, fp, fn: 2 * tp / (2 * tp + fp + fn),
        iou: lambda tp, tn, fp, fn: tp / (tp + fp + fn),
    })


_fill_cm_lambdas()


def auroc(target, probs, mean=True):
    """Area under ROC curve from class probabilities (N, *sp, C).
    sklearn-backed; reference metrics.py:172-196."""
    from sklearn.metrics import roc_auc_score
    target = _as_np(target).reshape(-1)
    probs = _as_np(probs)
    num_classes = probs.shape[-1]
    probs = probs.reshape(-1, num_classes)
    vals = np.empty(num_classes)
    for c in range(num_classes):
        try:
            vals[c] = roc_auc_score((target == c).astype(int), probs[..., c])
        except ValueError:
            vals[c] = np.nan
    vals = vals * 100
    return np.nanmean(vals) if mean else vals


def average_precision(target, probs, mean=True):
    """Average precision (AP) from class probabilities.
    Reference metrics.py:199-223."""
    from sklearn.metrics import average_precision_score
    target = _as_np(target).reshape(-1)
    probs = _as_np(probs)
    num_classes = probs.shape[-1]
    probs = probs.reshape(-1, num_classes)
    vals = np.empty(num_classes)
    for c in range(num_classes):
        try:
            vals[c] = average_precision_score(
                (target == c).astype(int), probs[..., c])
        except ValueError:
            vals[c] = np.nan
    vals = vals * 100
    return np.nanmean(vals) if mean else vals


def channel_metric(metric, c: int, num_classes: int, argmax: bool = True):
    """Make a metric evaluate only on channel ``c``.
    Reference metrics.py:237-260."""

    def evaluator(target, out):
        pred = np.argmax(_as_np(out), -1) if argmax else _as_np(out)
        return metric(target, pred, num_classes=num_classes, mean=False)[c]

    return evaluator


# ---------------------------------------------------------------------------
# Evaluator wrappers (reference metrics.py:317-401): callables that take
# (target, model output logits) and reduce to a scalar, used as
# Trainer valid_metrics entries.
# ---------------------------------------------------------------------------

class Evaluator:
    name = "generic"

    def __init__(self, metric_fn: Callable, index: Optional[int] = None,
                 ignore: Optional[int] = None, self_supervised: bool = False):
        self.metric_fn = metric_fn
        self.index = index
        self.ignore = ignore
        self.self_supervised = self_supervised

    def __call__(self, target, out):
        target = _as_np(target)
        out = _as_np(out)
        num_classes = out.shape[-1]
        pred = np.argmax(out, -1)
        m = self.metric_fn(target, pred, num_classes=num_classes,
                           mean=self.index is None, ignore=self.ignore)
        if self.index is not None:
            m = m[self.index]
        return m

    # -- streaming interface (confusion-matrix-based metrics only) ------
    # Binary confusion counts are additive across batches, so the
    # Trainer accumulates one (C, 4) count matrix per validation run
    # and memory stays independent of the validation-set size
    # (the reference concatenates all outputs instead).

    @property
    def supports_streaming(self) -> bool:
        return self.metric_fn in _CM_LAMBDAS

    def from_cm(self, counts: np.ndarray) -> float:
        """Compute the metric from accumulated raw confusion counts
        (C, 4) as produced by ``confusion_matrix(nan_when_empty=False)``
        summed over batches. Classes absent from the targets (tp + fn
        == 0) become NaN, matching confusion_matrix's nan_when_empty."""
        cm = np.asarray(counts, np.float64).copy()
        absent = (cm[:, 0] + cm[:, 3]) == 0
        cm[absent] = np.nan
        m = _metric_from_cm(cm, _CM_LAMBDAS[self.metric_fn],
                            mean=self.index is None)
        if self.index is not None:
            m = m[self.index]
        return m


class Accuracy(Evaluator):
    name = "accuracy"

    def __init__(self, *args, **kwargs):
        super().__init__(accuracy, *args, **kwargs)


class Precision(Evaluator):
    name = "precision"

    def __init__(self, *args, **kwargs):
        super().__init__(precision, *args, **kwargs)


class Recall(Evaluator):
    name = "recall"

    def __init__(self, *args, **kwargs):
        super().__init__(recall, *args, **kwargs)


class DSC(Evaluator):
    name = "DSC"

    def __init__(self, *args, **kwargs):
        super().__init__(dice_coefficient, *args, **kwargs)


class IoU(Evaluator):
    name = "IoU"

    def __init__(self, *args, **kwargs):
        super().__init__(iou, *args, **kwargs)


class _ProbEvaluator:
    def __init__(self, fn):
        self.fn = fn

    def __call__(self, target, out):
        out = _as_np(out)
        # softmax over channels-last
        e = np.exp(out - out.max(-1, keepdims=True))
        probs = e / e.sum(-1, keepdims=True)
        return self.fn(target, probs)


class AUROC(_ProbEvaluator):
    name = "AUROC"

    def __init__(self):
        super().__init__(auroc)


class AveragePrecision(_ProbEvaluator):
    name = "AP"

    def __init__(self):
        super().__init__(average_precision)


class _ClusterEvaluator:
    """Base for sklearn clustering-comparison metrics (reference
    metrics.py:377-401: NMI/AMI/ARI/Silhouette)."""
    fn_name = None

    def __call__(self, target, out):
        import sklearn.metrics as skm
        target = _as_np(target).reshape(-1)
        pred = np.argmax(_as_np(out), -1).reshape(-1)
        return getattr(skm, self.fn_name)(target, pred) * 100


class NMI(_ClusterEvaluator):
    name = "NMI"
    fn_name = "normalized_mutual_info_score"


class AMI(_ClusterEvaluator):
    name = "AMI"
    fn_name = "adjusted_mutual_info_score"


class ARI(_ClusterEvaluator):
    name = "ARI"
    fn_name = "adjusted_rand_score"


class SilhouetteScore:
    name = "silhouette"

    def __call__(self, target, out):
        import sklearn.metrics as skm
        out = _as_np(out)
        feats = out.reshape(-1, out.shape[-1])
        labels = _as_np(target).reshape(-1)
        # Subsample for tractability on dense outputs
        if feats.shape[0] > 10000:
            idx = np.random.default_rng(0).choice(
                feats.shape[0], 10000, replace=False)
            feats, labels = feats[idx], labels[idx]
        if len(np.unique(labels)) < 2:
            return np.nan
        return skm.silhouette_score(feats, labels) * 100


# Default metrics dict used by the Trainer if none is given
# (mirrors common usage in reference examples).
def default_metrics(num_classes: int = 2):
    return {
        "val_accuracy": Accuracy(),
        "val_precision": Precision(),
        "val_recall": Recall(),
        "val_DSC": DSC(),
        "val_IoU": IoU(),
    }
