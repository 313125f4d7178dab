"""JAX/Flax YOLO detector family — the reference's TF-wrapped CNN, re-served
as a native JAX model (BASELINE.json north star: "the YOLO CNN detector is
re-served as a JAX model replacing the TensorFlow wrapper").

Two family members cover the reference's detector class (SURVEY.md §2 row
"detector (YOLO)"):

  * yolov3_tiny — the standard 13-conv two-head tiny variant (darknet
    layout, so public .weights files load via models.detector).
  * yolov2_tiny — single-head darkflow-era variant.

All convs run in NHWC with optional bfloat16 compute (MXU-native); decode
and NMS run on device so detect() is one jitted program per frame batch.
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn

# Canonical anchor sets (pixels at the native 416x416 input), public YOLO
# releases.
YOLOV3_TINY_ANCHORS = (
    ((81, 82), (135, 169), (344, 319)),      # head 0, stride 32
    ((10, 14), (23, 27), (37, 58)),          # head 1, stride 16
)
YOLOV2_TINY_ANCHORS = (
    ((18.3, 21.6), (59.9, 66.0), (106.8, 175.5), (252.2, 112.9),
     (312.2, 293.4)),                        # single head, stride 32
)


@dataclasses.dataclass(frozen=True)
class YoloSpec:
    name: str
    num_classes: int = 80
    input_size: int = 416
    anchors: tuple = YOLOV3_TINY_ANCHORS
    dtype: str = "float32"      # conv compute dtype ("bfloat16" for MXU)
    # BatchNorm running-stats momentum: 0.99 matches darknet for long
    # training runs; small/fast fine-tunes want ~0.9 so the running
    # stats converge to the batch stats the train-mode network learned
    # against (the train/eval gap at 0.99 needs thousands of steps to
    # close).
    bn_momentum: float = 0.99

    @property
    def strides(self) -> tuple:
        return (32, 16)[: len(self.anchors)]


class ConvBlock(nn.Module):
    """Conv + BatchNorm + LeakyReLU — darknet's standard block."""
    features: int
    kernel: int = 3
    stride: int = 1
    use_bn: bool = True
    act: bool = True
    dtype: jnp.dtype = jnp.float32
    bn_momentum: float = 0.99

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(self.features, (self.kernel, self.kernel),
                    strides=(self.stride, self.stride),
                    padding="SAME", use_bias=not self.use_bn,
                    dtype=self.dtype, name="conv")(x)
        if self.use_bn:
            # train=True uses batch statistics and updates the running
            # mean/var (apply with mutable=["batch_stats"]); inference
            # uses the stored running statistics.
            x = nn.BatchNorm(use_running_average=not train,
                             momentum=self.bn_momentum,
                             epsilon=1e-5, dtype=self.dtype, name="bn")(x)
        if self.act:
            x = nn.leaky_relu(x, 0.1)
        return x


def _maxpool(x, stride=2):
    return nn.max_pool(x, (2, 2), strides=(stride, stride), padding="SAME")


class YoloV3Tiny(nn.Module):
    """Two-head tiny YOLOv3 (13 convs), darknet-compatible topology."""
    spec: YoloSpec

    @nn.compact
    def __call__(self, x, train: bool = False):
        dt = jnp.bfloat16 if self.spec.dtype == "bfloat16" else jnp.float32
        nc = self.spec.num_classes
        n_anchor0 = len(self.spec.anchors[0])
        n_anchor1 = len(self.spec.anchors[1])
        cb = lambda f, k=3, **kw: ConvBlock(
            f, k, dtype=dt, bn_momentum=self.spec.bn_momentum, **kw)
        c = lambda f, k=3, **kw: (lambda y: cb(f, k, **kw)(y, train))

        x = c(16)(x)
        x = _maxpool(x)
        x = c(32)(x)
        x = _maxpool(x)
        x = c(64)(x)
        x = _maxpool(x)
        x = c(128)(x)
        x = _maxpool(x)
        x = c(256)(x)
        route8 = x
        x = _maxpool(x)
        x = c(512)(x)
        x = _maxpool(x, stride=1)
        x = c(1024)(x)
        x = c(256, k=1)(x)
        route13 = x
        # Head 0 (stride 32).
        y0 = c(512)(route13)
        y0 = ConvBlock(n_anchor0 * (5 + nc), 1, use_bn=False, act=False,
                       dtype=dt, name="head0")(y0, train)
        # Head 1 (stride 16) with upsample + concat.
        u = c(128, k=1)(route13)
        u = jax.image.resize(u, (u.shape[0], u.shape[1] * 2,
                                 u.shape[2] * 2, u.shape[3]), "nearest")
        x1 = jnp.concatenate([u, route8], axis=-1)
        y1 = c(256)(x1)
        y1 = ConvBlock(n_anchor1 * (5 + nc), 1, use_bn=False, act=False,
                       dtype=dt, name="head1")(y1, train)
        return (y0.astype(jnp.float32), y1.astype(jnp.float32))


class YoloV2Tiny(nn.Module):
    """Single-head tiny YOLOv2 (9 convs), darkflow-era topology."""
    spec: YoloSpec

    @nn.compact
    def __call__(self, x, train: bool = False):
        dt = jnp.bfloat16 if self.spec.dtype == "bfloat16" else jnp.float32
        nc = self.spec.num_classes
        n_anchor = len(self.spec.anchors[0])
        cb = lambda f, k=3, **kw: ConvBlock(
            f, k, dtype=dt, bn_momentum=self.spec.bn_momentum, **kw)
        c = lambda f, k=3, **kw: (lambda y: cb(f, k, **kw)(y, train))
        for f in (16, 32, 64, 128, 256):
            x = c(f)(x)
            x = _maxpool(x)
        x = c(512)(x)
        x = _maxpool(x, stride=1)
        x = c(1024)(x)
        x = c(512)(x)
        x = ConvBlock(n_anchor * (5 + nc), 1, use_bn=False, act=False,
                      dtype=dt, name="head0")(x, train)
        return (x.astype(jnp.float32),)


def build_model(spec: YoloSpec):
    if spec.name == "yolov3-tiny":
        return YoloV3Tiny(spec)
    if spec.name == "yolov2-tiny":
        return YoloV2Tiny(spec)
    raise ValueError(f"unknown yolo variant {spec.name!r}")


def decode_head(raw: jnp.ndarray, anchors: Sequence, stride: int,
                num_classes: int, input_size: int):
    """Raw head output [B, Hg, Wg, A*(5+C)] → (boxes [B, N, 4] cxcywh in
    input pixels, scores [B, N], classes [B, N]) with N = Hg*Wg*A.

    Standard YOLOv2/v3 decode: sigmoid xy offset + grid, anchor * exp(wh),
    sigmoid objectness * max-class probability.
    """
    b, hg, wg, _ = raw.shape
    a = len(anchors)
    raw = raw.reshape(b, hg, wg, a, 5 + num_classes)
    gy = jax.lax.broadcasted_iota(jnp.float32, (hg, wg), 0)
    gx = jax.lax.broadcasted_iota(jnp.float32, (hg, wg), 1)
    anc = jnp.asarray(anchors, jnp.float32)            # [A, 2] pixels

    xy = jax.nn.sigmoid(raw[..., 0:2])
    cx = (gx[None, :, :, None] + xy[..., 0]) * stride
    cy = (gy[None, :, :, None] + xy[..., 1]) * stride
    wh = jnp.exp(jnp.clip(raw[..., 2:4], -10.0, 8.0)) * anc[None, None, None]
    obj = jax.nn.sigmoid(raw[..., 4])
    cls_prob = jax.nn.softmax(raw[..., 5:], axis=-1) if num_classes > 1 \
        else jnp.ones(raw.shape[:-1] + (1,), jnp.float32)
    best_cls = jnp.argmax(cls_prob, axis=-1)
    score = obj * jnp.max(cls_prob, axis=-1)

    n = hg * wg * a
    boxes = jnp.stack([cx, cy, wh[..., 0], wh[..., 1]],
                      axis=-1).reshape(b, n, 4)
    return boxes, score.reshape(b, n), best_cls.reshape(b, n)
