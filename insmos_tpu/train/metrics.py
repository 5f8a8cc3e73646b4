"""MOS classification metrics and detection recall.

Reference models/metrics.py: confusion-matrix accumulation, IoU from
tp/fp/fn with the ignore class's COLUMN zeroed; models/post_process.py:
67-110 recall at IoU thresholds vs gt boxes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..constants import IGNORE_INDEX, N_MOS_CLASSES
from ..ops.iou3d import boxes_iou3d


def confusion_matrix(pred_logits, gt_labels, valid, n_classes: int = N_MOS_CLASSES):
    """Softmax-argmax with ignored logits at -inf, then bincount (pred, gt)."""
    ignore = jnp.zeros((n_classes,), bool).at[jnp.asarray(IGNORE_INDEX)].set(True)
    logits = jnp.where(ignore[None, :], -jnp.inf, pred_logits)
    pred = jnp.argmax(logits, axis=-1)
    flat = pred * n_classes + gt_labels
    flat = jnp.where(valid, flat, n_classes * n_classes)
    counts = jnp.zeros((n_classes * n_classes + 1,), jnp.int32).at[flat].add(1)
    return counts[:-1].reshape(n_classes, n_classes)


def iou_from_confusion(cm):
    """Per-class IoU; ignored classes' gt columns zeroed (metrics.py:31-52)."""
    cm = cm.astype(jnp.float32)
    cm = cm.at[:, jnp.asarray(IGNORE_INDEX)].set(0.0)
    tp = jnp.diag(cm)
    fp = cm.sum(axis=1) - tp
    fn = cm.sum(axis=0) - tp
    return tp / (tp + fp + fn + 1e-15)


def accuracy_from_confusion(cm):
    cm = cm.astype(jnp.float32)
    cm = cm.at[:, jnp.asarray(IGNORE_INDEX)].set(0.0)
    tp = jnp.diag(cm)
    fp = cm.sum(axis=1) - tp
    return tp.sum() / (tp.sum() + fp.sum() + 1e-15)


def detection_recall(pred_boxes, pred_mask, gt_boxes, num_gt, thresh_list):
    """recalled-count per threshold + gt count (post_process.py:88-107).

    pred_boxes (K, 7+), gt_boxes (M, 7+); zero-dim gt rows excluded via
    num_gt AND the reference's trailing-zero-row trim (sum == 0).
    """
    gt_ok = (jnp.arange(gt_boxes.shape[0]) < num_gt) & (
        jnp.abs(gt_boxes).sum(axis=-1) > 0
    )
    iou = boxes_iou3d(pred_boxes[:, :7], gt_boxes[:, :7])  # (K, M)
    iou = jnp.where(pred_mask[:, None] & gt_ok[None, :], iou, 0.0)
    best = iou.max(axis=0)  # (M,)
    out = {
        f"rcnn_{t}": (gt_ok & (best > t)).sum() for t in thresh_list
    }
    out["gt"] = gt_ok.sum()
    return out
