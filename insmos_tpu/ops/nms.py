"""Greedy rotated NMS on-device.

Replaces the CUDA bitmask kernel + host scan
(models/bbox_post_process/src/iou3d_nms_kernel.cu:267-311,
iou3d_nms.cpp:90-136). Semantics are the classic greedy scan: visit boxes in
descending score order; keep a box iff no already-kept box overlaps it above
the threshold.

Two implementations, identical semantics:

- :func:`greedy_nms_chunked` mirrors the reference's chunked bitmask
  scheme on the VPU: boxes are score-sorted and processed in 128-wide
  chunks; each chunk computes one (chunk, K) rotated-IoU tile, resolves its
  internal suppress-by-earlier-keeper order by a static unrolled scan,
  and suppresses all later boxes in one masked reduction; an early-exit
  cond stops tiling once every remaining box is suppressed. Sequential
  work is O(K/chunk) outer steps instead of O(n_kept) serialized argmax
  rounds — at 4096 candidates / 500 keepers this measures ~240 ms vs
  ~600 ms for the while-loop form (both clip-bound; see iou3d.py's
  transposed layout note for where the time goes).

- :func:`greedy_nms` (default) is the one-keeper-per-iteration
  `lax.while_loop` (iteration count = number of kept boxes): measured
  faster in the deployment regime where a few dozen boxes survive the
  score gate (~7 ms vs ~11 ms at 52 keepers); the chunked form's bounded
  worst case (~240 ms vs ~600 ms at 500 keepers) makes it the safer pick
  for adversarial/serving-heavy scenes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .iou3d import boxes_iou_bev

_NEG = -jnp.inf


def greedy_nms_chunked(boxes, scores, valid, iou_thresh: float,
                       max_out: int, chunk: int = 128):
    """boxes (K, 7), scores (K,), valid (K,) bool -> (keep_idx, keep_mask).

    keep_idx: (max_out,) int32 indices into boxes, score-descending; slots
    beyond the kept count hold arbitrary indices masked off by keep_mask.
    """
    boxes = jnp.asarray(boxes, jnp.float32)
    scores = jnp.asarray(scores)
    valid = jnp.asarray(valid, bool)
    K = boxes.shape[0]
    Kp = -(-K // chunk) * chunk

    # score-descending order, invalid boxes last (their slots stay suppressed)
    order = jnp.argsort(jnp.where(valid, -scores, jnp.inf))
    b = jnp.zeros((Kp, 7), jnp.float32).at[:K].set(boxes[order])
    v = jnp.zeros((Kp,), bool).at[:K].set(valid[order])

    pos_i = jnp.arange(Kp)
    tri = pos_i[:chunk, None] < pos_i[None, :chunk]  # tri[j, i]: j before i

    def outer(c, sup):
        cb = jax.lax.dynamic_slice_in_dim(b, c * chunk, chunk)
        iou = boxes_iou_bev(cb, b)  # (chunk, Kp)
        over = iou > iou_thresh
        intra = jax.lax.dynamic_slice_in_dim(over, c * chunk, chunk, axis=1)
        adj = intra & tri  # adj[j, i]: j suppresses i within the chunk
        live = ~jax.lax.dynamic_slice_in_dim(sup, c * chunk, chunk)

        # greedy within the chunk: a static unrolled scan (each step is a
        # couple of (chunk,)-vector VPU ops; keep[j] is final once step j
        # runs since only earlier rows modify it)
        keep = live
        for j in range(chunk):
            keep = keep & ~(keep[j] & adj[j])

        sup = jax.lax.dynamic_update_slice_in_dim(sup, ~keep, c * chunk, 0)
        later = pos_i >= (c + 1) * chunk
        return sup | (jnp.any(keep[:, None] & over, axis=0) & later)

    # early exit: once every box from the next chunk on is suppressed
    # (the common case after the top-score chunks in a dense scene),
    # the remaining tiles cannot change anything
    def cond(st):
        c, sup = st
        return (c < Kp // chunk) & jnp.any(~sup & (pos_i >= c * chunk))

    def body(st):
        c, sup = st
        return c + 1, outer(c, sup)

    _, sup = jax.lax.while_loop(cond, body, (jnp.int32(0), ~v))
    kept = ~sup & v

    # first max_out keepers in sorted (= score-descending) order
    pos = jnp.argsort(~kept, stable=True)[:max_out]
    return order[pos].astype(jnp.int32), kept[pos]


def greedy_nms(boxes, scores, valid, iou_thresh: float, max_out: int):
    """One-keeper-per-iteration while-loop form (see module docstring)."""
    boxes = jnp.asarray(boxes, jnp.float32)
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
