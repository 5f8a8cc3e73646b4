"""CenterPoint-style detection head + on-device post-processing.

Reference: models/backbones_2d/center_head.py (1x1 convs -> 3-class heatmap
+ 8-ch box code, bias init -log((1-0.01)/0.01), box weight std 0.001) and
models/post_process.py (sigmoid -> class-agnostic NMS, SCORE_THRESH 0.1,
NMS_THRESH 0.01, topk 4096 -> 500).

Everything returns fixed-shape arrays + masks; NMS is ops.greedy_nms.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from ..config import Config
from ..ops.box_utils import decode_center_boxes
from ..ops.nms import greedy_nms
from .layers import init_conv2d


def init_center_head(key, cfg: Config):
    c_in = cfg.model.bev.num_upsample_filters[0]
    nc = cfg.model.head.num_class
    k1, k2 = jax.random.split(key)
    cls = init_conv2d(k1, 1, 1, c_in, nc, bias=True)
    pi = 0.01
    cls["b"] = jnp.full((nc,), -math.log((1 - pi) / pi))
    box = init_conv2d(k2, 1, 1, c_in, 8, bias=True)
    box["w"] = jax.random.normal(k2, (1, 1, c_in, 8)) * 1e-3
    box["b"] = jnp.zeros((8,))
    return {"cls": cls, "box": box}


def center_head_forward(params, feat):
    """feat: (H, W, C) -> (cls_logits (H, W, nc), box_preds (H, W, 8))."""
    from .layers import mm

    cls = mm(feat, params["cls"]["w"][0, 0]) + params["cls"]["b"]
    box = mm(feat, params["box"]["w"][0, 0]) + params["box"]["b"]
    return cls, box


def decode_and_nms(cfg: Config, cls_logits, box_preds):
    """Dense maps -> (boxes (Npost, 8 incl. class col), scores, labels, valid).

    Mirrors post_processing + class_agnostic_nms (post_process.py:5-24,
    186-208): sigmoid scores, class = argmax + 1, score gate, top-K by
    score, greedy rotated NMS, cap at nms_post_maxsize. When the config
    enables MULTI_CLASSES_NMS (post_process.py:159, dead-False by default)
    the per-class variant runs instead.
    """
    pp = cfg.model.post
    voxel = cfg.data.voxel_size
    rng = cfg.data.point_cloud_range
    boxes = decode_center_boxes(box_preds, voxel, rng, cfg.model.head.out_size_factor)
    scores_all = jax.nn.sigmoid(cls_logits.reshape(-1, cls_logits.shape[-1]))
    if pp.multi_classes_nms:
        return _multi_classes_nms(cfg, boxes, scores_all)
    scores = scores_all.max(axis=-1)
    labels = scores_all.argmax(axis=-1) + 1  # 1-indexed (post_process.py:192)

    gate = scores >= pp.score_thresh
    k = min(pp.nms_pre_maxsize, scores.shape[0])
    top_scores, top_idx = jax.lax.top_k(jnp.where(gate, scores, -1.0), k)
    top_boxes = jnp.take(boxes, top_idx, axis=0)
    top_labels = jnp.take(labels, top_idx)
    keep_idx, keep_mask = greedy_nms(
        top_boxes, top_scores, top_scores >= pp.score_thresh,
        pp.nms_thresh, pp.nms_post_maxsize,
    )
    sel_boxes = jnp.take(top_boxes, keep_idx, axis=0)
    sel_scores = jnp.where(keep_mask, jnp.take(top_scores, keep_idx), 0.0)
    sel_labels = jnp.where(keep_mask, jnp.take(top_labels, keep_idx), 0)
    sel_boxes = jnp.where(keep_mask[:, None], sel_boxes, 0.0)
    boxes8 = jnp.concatenate(
        [sel_boxes, sel_labels[:, None].astype(sel_boxes.dtype)], axis=-1
    )
    return boxes8, sel_scores, sel_labels, keep_mask


def _multi_classes_nms(cfg: Config, boxes, scores_all):
    """Per-class NMS (reference multi_classes_nms, post_process.py:27-65):
    each class runs score gate + top-K + greedy NMS independently; keeps
    are concatenated. Fixed-shape deviation: the concatenated keeps are
    re-capped to nms_post_maxsize by score (the reference's total can reach
    num_class * NMS_POST_MAXSIZE; downstream fusion uses <= max_objs boxes
    so the cap is inert in practice)."""
    pp = cfg.model.post
    nc = scores_all.shape[-1]
    k = min(pp.nms_pre_maxsize, scores_all.shape[0])
    all_boxes, all_scores, all_labels, all_mask = [], [], [], []
    for c in range(nc):
        s = scores_all[:, c]
        gate = s >= pp.score_thresh
        top_s, top_i = jax.lax.top_k(jnp.where(gate, s, -1.0), k)
        top_b = jnp.take(boxes, top_i, axis=0)
        keep_idx, keep_mask = greedy_nms(
            top_b, top_s, top_s >= pp.score_thresh,
            pp.nms_thresh, pp.nms_post_maxsize,
        )
        all_boxes.append(jnp.take(top_b, keep_idx, axis=0))
        all_scores.append(jnp.where(keep_mask, jnp.take(top_s, keep_idx), 0.0))
        all_labels.append(jnp.full((keep_idx.shape[0],), c + 1, jnp.int32))
        all_mask.append(keep_mask)
    cb = jnp.concatenate(all_boxes)
    cs = jnp.concatenate(all_scores)
    cl = jnp.concatenate(all_labels)
    cm = jnp.concatenate(all_mask)
    top_s, top_i = jax.lax.top_k(jnp.where(cm, cs, -1.0), pp.nms_post_maxsize)
    mask = top_s > 0.0
    sel_boxes = jnp.where(mask[:, None], jnp.take(cb, top_i, axis=0), 0.0)
    sel_labels = jnp.where(mask, jnp.take(cl, top_i), 0)
    sel_scores = jnp.where(mask, top_s, 0.0)
    boxes8 = jnp.concatenate(
        [sel_boxes, sel_labels[:, None].astype(sel_boxes.dtype)], axis=-1
    )
    return boxes8, sel_scores, sel_labels, mask
