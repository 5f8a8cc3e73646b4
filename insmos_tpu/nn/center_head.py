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
    score, greedy rotated NMS, cap at nms_post_maxsize.
    """
    pp = cfg.model.post
    voxel = cfg.data.voxel_size
    rng = cfg.data.point_cloud_range
    boxes = decode_center_boxes(box_preds, voxel, rng, cfg.model.head.out_size_factor)
    scores_all = jax.nn.sigmoid(cls_logits.reshape(-1, cls_logits.shape[-1]))
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
