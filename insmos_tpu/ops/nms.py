"""Greedy rotated NMS on-device.

Replaces the CUDA bitmask kernel + host scan
(models/bbox_post_process/src/iou3d_nms_kernel.cu:267-311,
iou3d_nms.cpp:90-136). Semantics are the classic greedy scan: visit boxes in
descending score order; keep a box iff no already-kept box overlaps it above
the threshold. We run it as a `lax.while_loop` that each step picks the
highest-scoring live box and suppresses its neighbourhood — identical
semantics, and the iteration count equals the number of kept boxes (tens)
instead of the candidate count (thousands).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .iou3d import boxes_iou_bev

_NEG = -jnp.inf


def greedy_nms(boxes, scores, valid, iou_thresh: float, max_out: int):
    """boxes (K, 7), scores (K,), valid (K,) bool -> (keep_idx, keep_mask).

    keep_idx: (max_out,) int32 indices into boxes, score-descending; slots
    beyond the kept count hold 0 and are masked off by keep_mask.
    """
    boxes = jnp.asarray(boxes, jnp.float32)
    K = boxes.shape[0]
    live = jnp.asarray(valid, bool)
    masked_scores = jnp.where(live, scores, _NEG)

    def cond(state):
        ms, _, _, n = state
        return (n < max_out) & jnp.any(ms > _NEG)

    def body(state):
        ms, keep_idx, keep_mask, n = state
        i = jnp.argmax(ms)
        keep_idx = keep_idx.at[n].set(i.astype(jnp.int32))
        keep_mask = keep_mask.at[n].set(True)
        iou = boxes_iou_bev(boxes[i][None], boxes)[0]  # (K,)
        suppress = iou > iou_thresh
        ms = jnp.where(suppress, _NEG, ms)
        ms = ms.at[i].set(_NEG)
        return ms, keep_idx, keep_mask, n + 1

    init = (
        masked_scores,
        jnp.zeros((max_out,), jnp.int32),
        jnp.zeros((max_out,), bool),
        jnp.int32(0),
    )
    _, keep_idx, keep_mask, _ = jax.lax.while_loop(cond, body, init)
    return keep_idx, keep_mask
