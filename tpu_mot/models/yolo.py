"""JAX/Flax YOLO detector family — the reference's TF-wrapped CNN, re-served
as a native JAX model (BASELINE.json north star: "the YOLO CNN detector is
re-served as a JAX model replacing the TensorFlow wrapper").

Four family members cover the reference's detector class (SURVEY.md §2 row
"detector (YOLO)"):

  * yolov3      — full darknet-53 backbone, three heads (stride 32/16/8).
  * yolov3_tiny — the standard 13-conv two-head tiny variant (darknet
    layout, so public .weights files load via models.detector).
  * yolov2      — full darknet-19 + passthrough (reorg) single head; the
    darkflow-served model class the reference wraps in TensorFlow.
  * yolov2_tiny — single-head darkflow-era tiny variant.

Class activation follows the lineage: v2-family heads use a softmax over
classes, v3-family heads use independent per-class sigmoids (the darknet
"logistic" classifier switch) — threaded through decode and the training
loss via YoloSpec.cls_activation.

All convs run in NHWC with optional bfloat16 compute (MXU-native); decode
and NMS run on device so detect() is one jitted program per frame batch.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
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
# Full v2 shares the v2 anchor set (darknet publishes them in grid units;
# these are the same values scaled by stride 32 into input pixels).
YOLOV2_ANCHORS = YOLOV2_TINY_ANCHORS
YOLOV3_ANCHORS = (
    ((116, 90), (156, 198), (373, 326)),     # head 0, stride 32
    ((30, 61), (62, 45), (59, 119)),         # head 1, stride 16
    ((10, 13), (16, 30), (33, 23)),          # head 2, stride 8
)


_CANONICAL_ANCHORS = {
    "yolov3": YOLOV3_ANCHORS,
    "yolov3-tiny": YOLOV3_TINY_ANCHORS,
    "yolov2": YOLOV2_ANCHORS,
    "yolov2-tiny": YOLOV2_TINY_ANCHORS,
}


@dataclasses.dataclass(frozen=True)
class YoloSpec:
    name: str
    num_classes: int = 80
    input_size: int = 416
    # None → the variant's canonical anchor set (resolved in __post_init__);
    # pass an explicit per-head tuple-of-tuples to override.
    anchors: tuple | None = None
    # Conv compute dtype.  Measured on the v5e (2026-08-19,
    # tools/bench_e2e_r4.log + train_e2e_mota_r4.log quant_map phase):
    # "bfloat16" is the serving recommendation — 720p e2e 1572 fps vs
    # 1131 exact, trained-net mAP delta -0.005.  "int8" (dynamic PTQ:
    # per-channel int8 weights, per-sample int8 activations, int32 MXU
    # accumulation) is accuracy-safe on the trained fixture net (mAP
    # +0.033 vs f32 — inside the 24-frame estimator's noise) but SLOWER
    # than bf16 (1338 vs 1572 fps: the dynamic scale/requant overhead
    # outweighs the int8 MXU gain at yolov3-tiny sizes), so it is a
    # validated option for int8-only deployments, not a default.
    dtype: str = "float32"
    # BatchNorm running-stats momentum: 0.99 matches darknet for long
    # training runs; small/fast fine-tunes want ~0.9 so the running
    # stats converge to the batch stats the train-mode network learned
    # against (the train/eval gap at 0.99 needs thousands of steps to
    # close).
    bn_momentum: float = 0.99
    # Early-layer formulation.  "direct" = the darknet composition
    # (conv Cin=3 @ full res -> pool -> conv -> pool).  "s2d4" = the
    # exact space-to-depth rewrite: the whole stem runs on the
    # (input/4)^2 grid with the conv taps scattered into
    # (cell-offset, subpixel) kernel slots and the maxpools collapsed
    # to channel-group maxes — same math, MXU-friendly channel counts.
    # Measured on the v5e (tools/profile_stem_r5.log, 2026-08-19, b8
    # 416^2 bf16): direct 2.098 ms / s2d2 1.251 / s2d4 0.732 — the
    # shipped stem was the backbone's lane-padding pathology (~7% MXU,
    # tools/profile_backbone_r4e.log); only the winner (s2d4) is
    # implemented.  The param tree is IDENTICAL to "direct" (the
    # scatter is an apply-time transform of the canonical kernels), so
    # darknet .weights loads and checkpoints are stem-agnostic and a
    # net can train "direct" and serve "s2d4".  Inference-only
    # (supported: yolov3-tiny, yolov2-tiny, yolov2 — the pooled-stem
    # variants; yolov3's strided convs have no pool to collapse).
    # "auto" (the default since r5) resolves per apply: s2d4 whenever it
    # is supported and the call is inference, else direct — serving gets
    # the fast stem with zero config (720p e2e exact 1565 -> 1917 fps,
    # configs[4] strided-4 3377 -> 3883 agg fps/chip,
    # tools/bench_e2e_r5_*.log, bench_configs4_r5_*.log) while training
    # and int8 keep the direct composition.  resolved_stem() is the one
    # resolution point.
    stem: str = "auto"

    def __post_init__(self):
        if self.stem not in ("auto", "direct", "s2d4"):
            raise ValueError(f"unknown stem {self.stem!r}; "
                             "have ('auto', 'direct', 's2d4')")
        if self.stem == "s2d4":
            if self.name == "yolov3":
                raise ValueError("yolov3's strided-conv stem has no pools "
                                 "to collapse; stem='s2d4' supports the "
                                 "pooled variants (yolov3-tiny, yolov2, "
                                 "yolov2-tiny)")
            if self.dtype == "int8":
                raise ValueError("stem='s2d4' is implemented for the "
                                 "f32/bf16 conv path (int8 serves the "
                                 "direct stem)")
        if self.anchors is None:
            if self.name not in _CANONICAL_ANCHORS:
                raise ValueError(
                    f"unknown yolo variant {self.name!r}; have "
                    f"{sorted(_CANONICAL_ANCHORS)} (or pass anchors=)")
            object.__setattr__(self, "anchors",
                               _CANONICAL_ANCHORS[self.name])

    @property
    def strides(self) -> tuple:
        return (32, 16, 8)[: len(self.anchors)]

    @property
    def cls_activation(self) -> str:
        """Per-lineage class activation: v3 heads score classes with
        independent sigmoids (darknet's logistic switch), v2 heads with a
        softmax.  Used by both decode_head and the training loss so the
        model trains against the same link function it is decoded with."""
        return "sigmoid" if self.name.startswith("yolov3") else "softmax"


def _dt_quant(spec):
    """Resolve spec.dtype -> (flax compute dtype, int8-quant flag)."""
    if spec.dtype == "int8":
        return jnp.float32, True
    return (jnp.bfloat16 if spec.dtype == "bfloat16"
            else jnp.float32), False


class _QuantConv(nn.Module):
    """int8 inference conv (post-training dynamic quantization).

    Parameter tree is IDENTICAL to nn.Conv ("kernel", optional "bias"),
    so f32-trained / darknet-loaded weights run through this path with
    zero conversion: weights quantize per-output-channel symmetric int8
    at trace time, activations per-tensor dynamic int8 at run time, and
    the conv accumulates int8 x int8 -> int32 on the MXU (2x the bf16
    peak on v5e) before the two scales rescale the output to f32.
    Inference only — round() kills gradients (guarded in parallel.train).
    """
    features: int
    kernel: int = 3
    stride: int = 1
    use_bias: bool = False

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        w = self.param("kernel", nn.initializers.lecun_normal(),
                       (self.kernel, self.kernel, in_ch, self.features))
        s_w = jnp.maximum(jnp.max(jnp.abs(w), axis=(0, 1, 2)) / 127.0,
                          1e-8)                                   # [O]
        wq = jnp.clip(jnp.round(w / s_w), -127, 127).astype(jnp.int8)
        x = x.astype(jnp.float32)
        # PER-SAMPLE activation scale (not per-batch): a bright frame
        # must not coarsen its batchmates' quantization grid — batched
        # and streamed serving must see identical per-frame detections
        # (the repo's batched==streamed parity contract).
        s_x = jnp.maximum(
            jnp.max(jnp.abs(x), axis=(1, 2, 3), keepdims=True) / 127.0,
            1e-8)                                           # [B, 1, 1, 1]
        xq = jnp.clip(jnp.round(x / s_x), -127, 127).astype(jnp.int8)
        pad = self.kernel // 2
        y = jax.lax.conv_general_dilated(
            xq, wq, (self.stride, self.stride),
            ((pad, pad), (pad, pad)),    # darknet-symmetric, see ConvBlock
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32)
        y = y.astype(jnp.float32) * (s_x * s_w)
        if self.use_bias:
            y = y + self.param("bias", nn.initializers.zeros,
                               (self.features,))
        return y


@functools.lru_cache(maxsize=None)
def _s2d_scatter(s: int) -> np.ndarray:
    """0/1 placement tensor for the space-to-depth kernel rewrite.

    A 3x3 stride-1 conv on X equals a 3x3 conv on s2d(X) with each tap
    (u, v) scattered into a (cell-tap, subpixel-block, cell-offset-block)
    slot: output block q = ey*s+ex of a cell is the conv output at pixel
    (s*I+ey, s*J+ex); tap (u, v) reads pixel offset a = ey+u-1, which
    lives at cell offset divmod(a, s)[0] and subpixel block
    divmod(a, s)[1].  Cell-level zero padding reproduces SAME padding
    exactly (taps never reach beyond one pixel outside the frame).
    Returns S[u, v, a, b, p, q] in {0, 1} with p = dy*s+dx, q = ey*s+ex;
    the scattered kernel is einsum('uvabpq,uvio->abpiqo', S, w)
    reshaped to [3, 3, s*s*Cin, s*s*Co].  (u, a, ey, ...) determine each
    other uniquely, so no two taps share a slot and placement is exact
    (exactness asserted at 3e-7 f32/HIGHEST, tools/profile_stem_r5.log).
    """
    m = np.zeros((3, 3, 3, 3, s * s, s * s), np.float32)
    for ey in range(s):
        for ex in range(s):
            for u in range(3):
                for v in range(3):
                    da, dy = divmod(ey + u - 1, s)
                    db, dx = divmod(ex + v - 1, s)
                    m[u, v, da + 1, db + 1, dy * s + dx, ey * s + ex] = 1.0
    return m


def _scatter_kernel(w: jnp.ndarray, s: int) -> jnp.ndarray:
    """Apply-time s2d rewrite of a [3, 3, Cin, Co] kernel →
    [3, 3, s²·Cin, s²·Co] (see _s2d_scatter)."""
    cin, co = w.shape[2], w.shape[3]
    out = jnp.einsum("uvabpq,uvio->abpiqo",
                     jnp.asarray(_s2d_scatter(s), w.dtype), w)
    return out.reshape(3, 3, s * s * cin, s * s * co)


class _ConvKernel(nn.Module):
    """Param-holder matching nn.Conv's tree ({"kernel"}) so the s2d stem
    shares parameters with the direct formulation byte-for-byte."""
    shape: tuple

    @nn.compact
    def __call__(self):
        return self.param("kernel", nn.initializers.lecun_normal(),
                          self.shape)


class _BNParams(nn.Module):
    """Param-holder matching nn.BatchNorm's tree (params scale/bias,
    batch_stats mean/var)."""
    features: int

    @nn.compact
    def __call__(self):
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        mean = self.variable("batch_stats", "mean", jnp.zeros,
                             (self.features,), jnp.float32)
        var = self.variable("batch_stats", "var", jnp.ones,
                            (self.features,), jnp.float32)
        return scale, bias, mean.value, var.value


def resolved_stem(spec: "YoloSpec", train: bool = False,
                  hw=None) -> str:
    """Resolve spec.stem="auto" for one apply: the s2d4 rewrite whenever
    it is supported (pooled-stem variants, f32/bf16 conv path, input
    H/W divisible by 4) and the call is inference; the direct
    composition for training, int8, yolov3 (whose strided stem has no
    pools to collapse), and odd input extents — a DEFAULT nobody opted
    into must never turn a previously-valid shape into a trace error.
    Explicit "direct"/"s2d4" pass through (s2d4's support constraints
    were validated by YoloSpec.__post_init__; an explicit s2d4 on an
    indivisible shape still raises in _stem_s2d4)."""
    if spec.stem != "auto":
        return spec.stem
    if train or spec.dtype == "int8" or spec.name == "yolov3":
        return "direct"
    if hw is not None and (hw[0] % 4 or hw[1] % 4):
        return "direct"
    return "s2d4"


class ConvBlock(nn.Module):
    """Conv + BatchNorm + LeakyReLU — darknet's standard block."""
    features: int
    kernel: int = 3
    stride: int = 1
    use_bn: bool = True
    act: bool = True
    dtype: jnp.dtype = jnp.float32
    bn_momentum: float = 0.99
    quant: bool = False        # int8 inference path (spec.dtype="int8")
    # Space-to-depth stem rewrite (spec.stem="s2d4"): > 1 selects the
    # cell factor the input grid is packed by; s2d_cin is the CANONICAL
    # kernel input-channel count (the declared param keeps the direct
    # shape [k, k, s2d_cin, features] — see _scatter_kernel).
    s2d_cells: int = 1
    s2d_cin: int = 0

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.s2d_cells > 1:
            return self._s2d_call(x, train)
        # darknet pads k//2 on BOTH sides.  XLA's "SAME" agrees at
        # stride 1 but pads (0, 1) at stride 2, sampling one pixel later
        # than darknet's (1, 1) — a spatial shift that compounds across
        # the full-v3 backbone's five downsample convs and misaligns
        # pretrained .weights activations against the grid decode.
        # Explicit symmetric padding is darknet-exact at every stride.
        pad = self.kernel // 2
        padding = ((pad, pad), (pad, pad))
        if self.quant:
            x = _QuantConv(self.features, self.kernel, self.stride,
                           use_bias=not self.use_bn, name="conv")(x)
        else:
            x = nn.Conv(self.features, (self.kernel, self.kernel),
                        strides=(self.stride, self.stride),
                        padding=padding, use_bias=not self.use_bn,
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

    def _s2d_call(self, x, train):
        """Space-to-depth formulation of conv+BN+leaky: the conv runs on
        the packed [B, H/s... , s²·Cin] grid against the scattered
        kernel; BN parameters (per canonical output channel) tile s²×
        across the cell-offset blocks.  Exact rewrite of the direct
        block (placement proof in _s2d_scatter); inference-only — the
        param tree is shared with "direct", so train direct and serve
        s2d (batch-stat updates in packed space would additionally need
        the per-position reduction, which nothing serving needs)."""
        if train:
            raise ValueError(
                "stem='s2d4' is inference-only; train with stem='direct'"
                " (identical parameters) and serve with s2d4")
        if self.quant or not self.use_bn or self.stride != 1 \
                or self.kernel != 3:
            raise ValueError("s2d ConvBlock supports only the 3x3 "
                             "stride-1 BN stem blocks (got quant="
                             f"{self.quant}, use_bn={self.use_bn}, "
                             f"stride={self.stride}, k={self.kernel})")
        s2 = self.s2d_cells
        w = _ConvKernel((3, 3, self.s2d_cin, self.features),
                        name="conv")()
        if x.shape[-1] == s2 * s2:
            # Gray fast path: the caller packed a single-channel frame,
            # so the canonical Cin channels would all see the same
            # values — fold the kernel over Cin first (exact for
            # replicated channels: conv(repeat(g, C), w) ==
            # conv(g, w.sum(Cin))).
            w = w.sum(axis=2, keepdims=True)
        elif x.shape[-1] != s2 * s2 * self.s2d_cin:
            raise ValueError(
                f"s2d input has {x.shape[-1]} channels; expected "
                f"{s2 * s2} (gray) or {s2 * s2 * self.s2d_cin}")
        w = _scatter_kernel(w, s2).astype(self.dtype)
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype), w, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        scale, bias, mean, var = _BNParams(self.features, name="bn")()
        tile = lambda p: jnp.tile(p.astype(self.dtype), s2 * s2)
        y = ((y - tile(mean)) * jax.lax.rsqrt(tile(var) + 1e-5)
             * tile(scale) + tile(bias))
        if self.act:
            y = nn.leaky_relu(y, 0.1)
        return y


def _maxpool(x, stride=2):
    return nn.max_pool(x, (2, 2), strides=(stride, stride), padding="SAME")


def _posmax(x, groups):
    """2x2 stride-2 maxpool in s2d-packed space: max over the `groups`
    leading cell-offset blocks per output channel."""
    b, h, w, c = x.shape
    return x.reshape(b, h, w, groups, c // groups).max(axis=3)


def _stem_pool_s4(x, co):
    """First stem maxpool in s2d4-packed space: block index
    (ey*4+ex)·co+o decomposes as ey = 2·py2+dy, ex = 2·px2+dx; a 2x2
    stride-2 maxpool is the max over (dy, dx), and the survivors
    re-pack as the s2d2 block order (py2*2+px2)·co+o the second
    (s=2-scattered) conv kernel expects."""
    b, h, w, _ = x.shape
    x = x.reshape(b, h, w, 2, 2, 2, 2, co)
    x = x.max(axis=(4, 6))
    return x.reshape(b, h, w, 4 * co)


def _stem_s2d4(x, cb, f1, f2, train):
    """Space-to-depth rewrite of the pooled YOLO stem:
    conv(3→f1) → pool → conv(f1→f2) → pool, computed entirely on the
    (H/4, W/4) grid.  x is [B, H, W, 1] (gray fast path) or
    [B, H, W, 3]; returns [B, H/4, W/4, f2], exact vs the direct
    composition (tools/profile_stem_r5.log: 3e-7 f32, 2.9x faster on
    the v5e at the 416² serving shape)."""
    if x.shape[1] % 4 or x.shape[2] % 4:
        raise ValueError(f"s2d4 stem needs H, W divisible by 4; "
                         f"got {x.shape}")
    x = _reorg(x, 4)                       # [B, H/4, W/4, 16·Cin]
    x = cb(f1, s2d_cells=4, s2d_cin=3)(x, train)
    x = _stem_pool_s4(x, f1)               # [B, H/4, W/4, 4·f1]
    x = cb(f2, s2d_cells=2, s2d_cin=f1)(x, train)
    return _posmax(x, 4)                   # [B, H/4, W/4, f2]


def _reorg(x: jnp.ndarray, stride: int = 2) -> jnp.ndarray:
    """YOLOv2 passthrough layer: space-to-depth, [B, H, W, C] →
    [B, H/s, W/s, s*s*C] with output channel k = (dy*s + dx)*C + c.

    This is the ordering the darkflow/pytorch ports of yolov2 use for the
    passthrough route (block-position-major, source-channel-minor).
    darknet's own reorg kernel has a well-known index quirk; the port
    ordering is the one public v2 weight conversions are checked against,
    so it is the right target for load parity [K-class evidence,
    SURVEY.md §0 — no reference file to cite].
    """
    b, h, w, c = x.shape
    s = stride
    x = x.reshape(b, h // s, s, w // s, s, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, h // s, w // s, s * s * c)


class YoloV3Tiny(nn.Module):
    """Two-head tiny YOLOv3 (13 convs), darknet-compatible topology."""
    spec: YoloSpec

    @nn.compact
    def __call__(self, x, train: bool = False):
        dt, quant = _dt_quant(self.spec)
        nc = self.spec.num_classes
        n_anchor0 = len(self.spec.anchors[0])
        n_anchor1 = len(self.spec.anchors[1])
        cb = lambda f, k=3, **kw: ConvBlock(
            f, k, dtype=dt, bn_momentum=self.spec.bn_momentum,
            quant=quant, **kw)
        c = lambda f, k=3, **kw: (lambda y: cb(f, k, **kw)(y, train))

        if resolved_stem(self.spec, train, x.shape[1:3]) == "s2d4":
            x = _stem_s2d4(x, cb, 16, 32, train)
        else:
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
                       dtype=dt, quant=quant, name="head0")(y0, train)
        # Head 1 (stride 16) with upsample + concat.
        u = c(128, k=1)(route13)
        u = jax.image.resize(u, (u.shape[0], u.shape[1] * 2,
                                 u.shape[2] * 2, u.shape[3]), "nearest")
        x1 = jnp.concatenate([u, route8], axis=-1)
        y1 = c(256)(x1)
        y1 = ConvBlock(n_anchor1 * (5 + nc), 1, use_bn=False, act=False,
                       dtype=dt, quant=quant, name="head1")(y1, train)
        return (y0.astype(jnp.float32), y1.astype(jnp.float32))


class YoloV2Tiny(nn.Module):
    """Single-head tiny YOLOv2 (9 convs), darkflow-era topology."""
    spec: YoloSpec

    @nn.compact
    def __call__(self, x, train: bool = False):
        dt, quant = _dt_quant(self.spec)
        nc = self.spec.num_classes
        n_anchor = len(self.spec.anchors[0])
        cb = lambda f, k=3, **kw: ConvBlock(
            f, k, dtype=dt, bn_momentum=self.spec.bn_momentum,
            quant=quant, **kw)
        c = lambda f, k=3, **kw: (lambda y: cb(f, k, **kw)(y, train))
        if resolved_stem(self.spec, train, x.shape[1:3]) == "s2d4":
            x = _stem_s2d4(x, cb, 16, 32, train)
            body = (64, 128, 256)
        else:
            body = (16, 32, 64, 128, 256)
        for f in body:
            x = c(f)(x)
            x = _maxpool(x)
        x = c(512)(x)
        x = _maxpool(x, stride=1)
        x = c(1024)(x)
        x = c(512)(x)
        x = ConvBlock(n_anchor * (5 + nc), 1, use_bn=False, act=False,
                      dtype=dt, quant=quant, name="head0")(x, train)
        return (x.astype(jnp.float32),)


class YoloV2(nn.Module):
    """Full YOLOv2: darknet-19 backbone + passthrough (reorg) head.

    Construction order follows the darknet cfg exactly so that flax's
    auto-numbered ConvBlock_{i} names enumerate in the .weights file
    order (see detector._conv_layers_in_call_order).
    """
    spec: YoloSpec

    @nn.compact
    def __call__(self, x, train: bool = False):
        dt, quant = _dt_quant(self.spec)
        nc = self.spec.num_classes
        n_anchor = len(self.spec.anchors[0])
        cb = lambda f, k=3, **kw: ConvBlock(
            f, k, dtype=dt, bn_momentum=self.spec.bn_momentum,
            quant=quant, **kw)
        c = lambda f, k=3, **kw: (lambda y: cb(f, k, **kw)(y, train))

        if resolved_stem(self.spec, train, x.shape[1:3]) == "s2d4":
            x = _stem_s2d4(x, cb, 32, 64, train)
        else:
            x = c(32)(x)
            x = _maxpool(x)
            x = c(64)(x)
            x = _maxpool(x)
        x = c(128)(x)
        x = c(64, k=1)(x)
        x = c(128)(x)
        x = _maxpool(x)
        x = c(256)(x)
        x = c(128, k=1)(x)
        x = c(256)(x)
        x = _maxpool(x)
        x = c(512)(x)
        x = c(256, k=1)(x)
        x = c(512)(x)
        x = c(256, k=1)(x)
        x = c(512)(x)
        route16 = x                          # stride-16 512-ch feature
        x = _maxpool(x)
        x = c(1024)(x)
        x = c(512, k=1)(x)
        x = c(1024)(x)
        x = c(512, k=1)(x)
        x = c(1024)(x)
        # Detection block.
        x = c(1024)(x)
        x = c(1024)(x)
        p = c(64, k=1)(route16)
        p = _reorg(p)                        # [B, Hg, Wg, 256]
        x = jnp.concatenate([p, x], axis=-1)
        x = c(1024)(x)
        x = ConvBlock(n_anchor * (5 + nc), 1, use_bn=False, act=False,
                      dtype=dt, quant=quant, name="head0")(x, train)
        return (x.astype(jnp.float32),)


class YoloV3(nn.Module):
    """Full YOLOv3: darknet-53 backbone, three heads (stride 32/16/8).

    75 conv layers in darknet cfg order (52 backbone + 23 head/neck), so
    the flax auto-numbering again matches the .weights serialization.
    """
    spec: YoloSpec

    @nn.compact
    def __call__(self, x, train: bool = False):
        dt, quant = _dt_quant(self.spec)
        nc = self.spec.num_classes
        heads_a = [len(a) for a in self.spec.anchors]
        cb = lambda f, k=3, **kw: ConvBlock(
            f, k, dtype=dt, bn_momentum=self.spec.bn_momentum,
            quant=quant, **kw)
        c = lambda f, k=3, **kw: (lambda y: cb(f, k, **kw)(y, train))

        def res(x, half):
            # darknet-53 residual: 1x1 halve, 3x3 restore, identity add
            # (no activation on the sum — the blocks' leaky relu is it).
            y = c(half, k=1)(x)
            y = c(half * 2)(y)
            return x + y

        x = c(32)(x)
        x = c(64, stride=2)(x)
        x = res(x, 32)
        x = c(128, stride=2)(x)
        for _ in range(2):
            x = res(x, 64)
        x = c(256, stride=2)(x)
        for _ in range(8):
            x = res(x, 128)
        route8 = x                            # stride-8, 256 ch
        x = c(512, stride=2)(x)
        for _ in range(8):
            x = res(x, 256)
        route16 = x                           # stride-16, 512 ch
        x = c(1024, stride=2)(x)
        for _ in range(4):
            x = res(x, 512)

        def convset(x, f):
            for k in (1, 3, 1, 3, 1):
                x = c(f if k == 1 else f * 2, k=k)(x)
            return x

        def upsample2(u):
            return jax.image.resize(
                u, (u.shape[0], u.shape[1] * 2, u.shape[2] * 2,
                    u.shape[3]), "nearest")

        # Head 0 (stride 32).
        branch0 = convset(x, 512)
        y0 = c(1024)(branch0)
        y0 = ConvBlock(heads_a[0] * (5 + nc), 1, use_bn=False, act=False,
                       dtype=dt, quant=quant, name="head0")(y0, train)
        # Head 1 (stride 16).
        u = upsample2(c(256, k=1)(branch0))
        branch1 = convset(jnp.concatenate([u, route16], axis=-1), 256)
        y1 = c(512)(branch1)
        y1 = ConvBlock(heads_a[1] * (5 + nc), 1, use_bn=False, act=False,
                       dtype=dt, quant=quant, name="head1")(y1, train)
        # Head 2 (stride 8).
        u = upsample2(c(128, k=1)(branch1))
        branch2 = convset(jnp.concatenate([u, route8], axis=-1), 128)
        y2 = c(256)(branch2)
        y2 = ConvBlock(heads_a[2] * (5 + nc), 1, use_bn=False, act=False,
                       dtype=dt, quant=quant, name="head2")(y2, train)
        return (y0.astype(jnp.float32), y1.astype(jnp.float32),
                y2.astype(jnp.float32))


def build_model(spec: YoloSpec):
    builders = {"yolov3": YoloV3, "yolov3-tiny": YoloV3Tiny,
                "yolov2": YoloV2, "yolov2-tiny": YoloV2Tiny}
    if spec.name not in builders:
        raise ValueError(f"unknown yolo variant {spec.name!r}")
    n_heads = {"yolov3": 3, "yolov3-tiny": 2, "yolov2": 1,
               "yolov2-tiny": 1}[spec.name]
    if len(spec.anchors) != n_heads:
        raise ValueError(
            f"{spec.name} has {n_heads} heads but spec carries "
            f"{len(spec.anchors)} anchor groups (leave anchors=None for "
            f"the canonical set)")
    return builders[spec.name](spec)


def decode_head(raw: jnp.ndarray, anchors: Sequence, stride: int,
                num_classes: int, input_size: int,
                cls_act: str = "softmax"):
    """Raw head output [B, Hg, Wg, A*(5+C)] → (boxes [B, N, 4] cxcywh in
    input pixels, scores [B, N], classes [B, N]) with N = Hg*Wg*A.

    Standard YOLOv2/v3 decode: sigmoid xy offset + grid, anchor * exp(wh),
    sigmoid objectness * max-class probability.  cls_act selects the class
    link function ("softmax" = v2 lineage, "sigmoid" = v3's independent
    logistic classifiers — pass spec.cls_activation).
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
    if num_classes <= 1:
        cls_prob = jnp.ones(raw.shape[:-1] + (1,), jnp.float32)
    elif cls_act == "sigmoid":
        cls_prob = jax.nn.sigmoid(raw[..., 5:])
    else:
        cls_prob = jax.nn.softmax(raw[..., 5:], axis=-1)
    best_cls = jnp.argmax(cls_prob, axis=-1)
    score = obj * jnp.max(cls_prob, axis=-1)

    n = hg * wg * a
    boxes = jnp.stack([cx, cy, wh[..., 0], wh[..., 1]],
                      axis=-1).reshape(b, n, 4)
    return boxes, score.reshape(b, n), best_cls.reshape(b, n)
