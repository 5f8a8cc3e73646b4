"""Losses.

- mos_loss: the reference MOSLoss (models/loss.py:9-34) — NLL over
  log-softmax with the ignored class's logit forced to -inf and class
  weights zeroed on ignored classes (normalized to sum 1), torch-NLL
  weighted-mean reduction (denominator = sum of applied weights).
- gaussian_focal_loss: CornerNet-style heatmap focal (center_head.py:
  598-617, alpha=2 gamma=4, clip-sigmoid eps 1e-4), averaged by the
  number of peak (==1) cells.
- reg_l1_loss: masked L1 on gathered box codes (center_head.py:306-331),
  averaged by the number of valid boxes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..constants import IGNORE_INDEX, N_MOS_CLASSES


def mos_loss(logits, labels, valid):
    """logits (N, C), labels (N,) int, valid (N,) bool -> scalar."""
    C = logits.shape[-1]
    ignore = jnp.zeros((C,), bool).at[jnp.asarray(IGNORE_INDEX)].set(True)
    w = jnp.where(ignore, 0.0, 1.0)
    w = w / w.sum()

    masked_logits = jnp.where(ignore[None, :], -jnp.inf, logits)
    logp = jnp.log(jnp.clip(jax.nn.softmax(masked_logits, axis=-1), 1e-8, None))
    nll = -jnp.take_along_axis(logp, labels[:, None], axis=1)[:, 0]
    wi = jnp.take(w, labels) * valid.astype(logits.dtype)
    return (nll * wi).sum() / jnp.clip(wi.sum(), 1e-12, None)


def gaussian_focal_loss(cls_logits, heatmap, *, alpha=2.0, gamma=4.0):
    """cls_logits (H, W, C) raw; heatmap (C, H, W) gaussian targets."""
    pred = jnp.clip(jax.nn.sigmoid(cls_logits), 1e-4, 1 - 1e-4)
    pred = jnp.transpose(pred, (2, 0, 1))  # (C, H, W)
    eps = 1e-12
    pos_w = (heatmap == 1.0).astype(pred.dtype)
    neg_w = jnp.power(1.0 - heatmap, gamma)
    pos = -jnp.log(pred + eps) * jnp.power(1 - pred, alpha) * pos_w
    neg = -jnp.log(1 - pred + eps) * jnp.power(pred, alpha) * neg_w
    num_pos = jnp.clip(pos_w.sum(), 1.0, None)
    return (pos + neg).sum() / num_pos


def reg_l1_loss(box_map, anno_boxes, inds, mask, code_weights):
    """box_map (H, W, 8); anno (M, 8); inds (M,) flat y*W+x; mask (M,)."""
    H, W, C = box_map.shape
    flat = box_map.reshape(H * W, C)
    pred = jnp.take(flat, inds, axis=0)  # (M, 8)
    m = mask.astype(box_map.dtype)[:, None] * jnp.asarray(code_weights)[None, :]
    m = m * jnp.isfinite(anno_boxes).astype(box_map.dtype)
    num = jnp.clip(mask.sum().astype(box_map.dtype), 0.0, None)
    loss = jnp.abs(pred - jnp.nan_to_num(anno_boxes)) * m
    return loss.sum() / (num + 1e-4)
