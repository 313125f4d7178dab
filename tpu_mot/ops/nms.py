"""On-device non-maximum suppression with static shapes.

Reference: NMS inside the TF YOLO wrapper's postprocess (SURVEY.md §2 row
"detector (YOLO)").  TPU-native form: fixed-capacity greedy NMS as a
lax.fori_loop over output slots — each iteration selects the best remaining
box and suppresses its IoU neighborhood; no dynamic shapes anywhere.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from tpu_mot.ops.iou import pairwise_iou


def nms(boxes: jnp.ndarray, scores: jnp.ndarray, max_out: int,
        iou_thr: float = 0.45, score_thr: float = 0.0):
    """Greedy NMS.

    boxes  : [N, 4] (cx, cy, w, h)
    scores : [N] (0 = invalid/padding)
    Returns (indices [max_out] int32 with -1 padding, valid [max_out] bool).
    """
    n = boxes.shape[0]
    iou = pairwise_iou(boxes, boxes)                    # [N, N]
    live = scores > score_thr

    def body(_, state):
        live, out_idx, out_valid, k = state
        s = jnp.where(live, scores, -1.0)
        best = jnp.argmax(s).astype(jnp.int32)
        ok = s[best] > score_thr
        # Suppress the winner's neighborhood (including itself).
        suppress = iou[best] >= iou_thr
        live = live & ~(suppress & ok)
        live = live.at[best].set(False)
        out_idx = out_idx.at[k].set(jnp.where(ok, best, -1))
        out_valid = out_valid.at[k].set(ok)
        return live, out_idx, out_valid, k + 1

    init = (live, jnp.full((max_out,), -1, jnp.int32),
            jnp.zeros((max_out,), bool), jnp.int32(0))
    _, out_idx, out_valid, _ = jax.lax.fori_loop(0, max_out, body, init)
    return out_idx, out_valid


def nms_classwise(boxes: jnp.ndarray, scores: jnp.ndarray,
                  classes: jnp.ndarray, max_out: int,
                  iou_thr: float = 0.45, score_thr: float = 0.0):
    """Class-aware NMS: boxes of different classes never suppress each
    other (the standard YOLO postprocess).  Implemented by offsetting box
    centers per class so cross-class IoU is zero."""
    offset = classes.astype(jnp.float32) * 1e5
    shifted = boxes.at[:, 0].add(offset)
    return nms(shifted, scores, max_out, iou_thr, score_thr)
