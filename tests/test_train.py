"""Detector training convergence: the YOLO train step must actually learn
on a toy synthetic-rectangle task (single device; DP equivalence is
covered in test_parallel)."""

import numpy as np
import jax.numpy as jnp
import optax

from tpu_mot.models.yolo import YoloSpec, YOLOV2_TINY_ANCHORS
from tpu_mot.parallel import train


def _toy_batch(rng, b=4, s=64):
    images = rng.random((b, s, s, 3)).astype(np.float32) * 0.2
    gt_boxes = np.zeros((b, 1, 4), np.float32)
    for i in range(b):
        cx, cy = rng.uniform(16, 48, 2)
        w, h = rng.uniform(12, 20, 2)
        x0, x1 = int(cx - w / 2), int(cx + w / 2)
        y0, y1 = int(cy - h / 2), int(cy + h / 2)
        images[i, y0:y1, x0:x1] = 0.9
        gt_boxes[i, 0] = (cx, cy, w, h)
    gt_classes = np.zeros((b, 1), int)
    gt_valid = np.ones((b, 1), bool)
    return images, gt_boxes, gt_classes, gt_valid


def test_loss_decreases():
    spec = YoloSpec("yolov2-tiny", num_classes=1, input_size=64,
                    anchors=YOLOV2_TINY_ANCHORS)
    tx = optax.adam(1e-3)
    state = train.init_train_state(spec, tx, seed=0)
    step = train.make_train_step(spec, tx)

    rng = np.random.default_rng(0)
    images, gb, gc, gv = _toy_batch(rng)
    targets = [jnp.asarray(t) for t in train.build_targets(spec, gb, gc, gv)]
    imgs = jnp.asarray(images)

    losses = []
    for _ in range(25):
        state, loss = step(state, imgs, targets)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0] * 0.5, (losses[0], losses[-1])


def test_targets_structure():
    spec = YoloSpec("yolov2-tiny", num_classes=2, input_size=64,
                    anchors=YOLOV2_TINY_ANCHORS)
    gb = np.asarray([[[32.0, 32.0, 16.0, 16.0]]], np.float32)
    gc = np.asarray([[1]])
    gv = np.ones((1, 1), bool)
    (tgt,) = train.build_targets(spec, gb, gc, gv)
    assert tgt.shape == (1, 2, 2, 5, 7)      # 64/32=2 grid, 5 anchors
    assert tgt[..., 4].sum() == 1.0          # one responsible cell
    gy, gx = 1, 1
    cell = tgt[0, gy, gx]
    ai = int(np.argmax(cell[:, 4]))
    assert cell[ai, 5 + 1] == 1.0            # class one-hot
