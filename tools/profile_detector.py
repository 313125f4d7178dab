"""Per-stage detector cost attribution at the serving shapes.

The r4 configs[4] stage split (tools/bench_configs4_r4.log) charges the
detector 7.23 ms per 8-stream 1080p step — ~0.9 ms/image for a bf16
yolov3-tiny whose batch-8 backbone is ~44 bf16 GFLOPs ≈ 0.25 ms at the
v5e's MXU peak.  Either the preprocess/decode/NMS stages dominate or the
backbone itself is running far off peak; this tool splits the
detect_batch program into dependent-chain stages (CLAUDE.md timing
methodology — marginal ms from two lax.scan chain lengths, every input
data-dependent on the carry so XLA cannot hoist) to find out.

Stages at frames [8, 1080, 1920] uint8 gray, yolov3-tiny bf16 + FastNMS
(the configs[4] serving point):
  pre      u8 gray -> f32 /255 -> 3ch -> bilinear resize to 416
  backbone resized [8,416,416,3] -> head rasters
  decode   head rasters -> (boxes, scores, classes) [8, 2535, ...]
  nms      decoded -> padded detections (fast_nms, max_out=64)
  full     whole detect_batch for cross-check (sum of parts ~= full)

Plus preprocess experiments the attribution motivates (bf16 resize,
resize-then-broadcast for gray input).

Run in the bench session; commit the log.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp

    from tpu_mot.models.detector import detect_batch
    from tpu_mot.models.yolo import (YoloSpec, build_model, decode_head)
    from tpu_mot.ops.nms import nms_classwise

    # CPU-smoke knobs (tests/dev): PROF_DET_B/H/W/LONG/SHORT.
    b = int(os.environ.get("PROF_DET_B", "8"))
    h = int(os.environ.get("PROF_DET_H", "1080"))
    w = int(os.environ.get("PROF_DET_W", "1920"))
    spec = YoloSpec("yolov3-tiny", num_classes=1, dtype="bfloat16",
                    stem=os.environ.get("TPU_MOT_STEM", "direct"))
    s = spec.input_size
    rng = np.random.default_rng(0)
    frames = jnp.asarray(
        rng.integers(0, 255, (b, h, w), np.uint8))

    model = build_model(spec)
    var = model.init(jax.random.PRNGKey(0),
                     jnp.zeros((1, s, s, 3), jnp.float32))
    params = {"params": var["params"],
              "batch_stats": var.get("batch_stats", {})}

    n_long = int(os.environ.get("PROF_DET_LONG", "64"))
    n_short = int(os.environ.get("PROF_DET_SHORT", "8"))

    def measure(body, carry0, fetch):
        def run(n):
            c, _ = jax.lax.scan(body, carry0, None, length=n)
            return fetch(c)
        f_long = jax.jit(lambda: run(n_long))
        f_short = jax.jit(lambda: run(n_short))
        jax.block_until_ready(f_long())
        jax.block_until_ready(f_short())

        def t(f):
            best = np.inf
            for _ in range(5):
                t0 = time.perf_counter()
                jax.block_until_ready(f())
                best = min(best, time.perf_counter() - t0)
            return best
        ms = (t(f_long) - t(f_short)) / (n_long - n_short) * 1e3
        # Noise-floor clamp (VERDICT r4 weak #4): sub-10us stages can
        # measure negative under dependent-chain marginal timing; floor
        # at 0 and flag so a reader never quotes a negative cost.
        if ms < 0:
            print(json.dumps({"note": "below-resolution stage clamped",
                              "raw_ms": round(ms, 4)}), flush=True)
            ms = 0.0
        return ms

    def emit(k, v):
        print(json.dumps({"stage": k, "ms": round(v, 4)}), flush=True)

    # -- preprocess: the detect_batch head block, verbatim semantics.
    def pre(fr):
        f = fr.astype(jnp.float32) / 255.0
        f = jnp.repeat(f[..., None], 3, axis=-1)
        return jax.image.resize(f, (f.shape[0], s, s, 3), "bilinear")

    def pre_body(carry, _):
        fr = (frames + carry).astype(jnp.uint8)
        out = pre(fr)
        return carry + (out[0, 0, 0, 0] * 1e-9).astype(jnp.uint8), None
    emit("pre_u8_1080p_x8 (shipped)", measure(
        pre_body, jnp.uint8(0), lambda c: c))

    # Experiment: resize the single gray channel, broadcast to 3ch after
    # (element-identical for replicated channels; 3x less resize work).
    def pre_gray_first(fr):
        f = fr.astype(jnp.float32) / 255.0
        r = jax.image.resize(f, (f.shape[0], s, s), "bilinear")
        return jnp.repeat(r[..., None], 3, axis=-1)

    def pre_g_body(carry, _):
        fr = (frames + carry).astype(jnp.uint8)
        out = pre_gray_first(fr)
        return carry + (out[0, 0, 0, 0] * 1e-9).astype(jnp.uint8), None
    emit("pre_resize_gray_then_broadcast", measure(
        pre_g_body, jnp.uint8(0), lambda c: c))

    # Experiment: bf16 resize arithmetic (images tolerate bf16; the
    # divide-class precision findings are about KCF spectra, not pixels).
    def pre_bf16(fr):
        f = (fr.astype(jnp.bfloat16) / 255.0)
        r = jax.image.resize(f, (f.shape[0], s, s), "bilinear")
        return jnp.repeat(r[..., None], 3, axis=-1).astype(jnp.float32)

    def pre_b_body(carry, _):
        fr = (frames + carry).astype(jnp.uint8)
        out = pre_bf16(fr)
        return carry + (out[0, 0, 0, 0] * 1e-9).astype(jnp.uint8), None
    emit("pre_bf16_gray_resize", measure(
        pre_b_body, jnp.uint8(0), lambda c: c))

    # -- backbone on pre-resized input.
    x0 = pre(frames)

    def bb_body(x, _):
        heads = model.apply(params, x)
        # Cheap data dependence back onto the input raster.
        d = (heads[0][0, 0, 0, 0] * 1e-12).astype(jnp.float32)
        return x + d, None
    emit("backbone_bf16_b8_416", measure(bb_body, x0,
                                         lambda c: c[0, 0, 0, 0]))

    heads0 = model.apply(params, x0)

    # -- decode (both heads).
    def dec(heads):
        bs, ss, cs = [], [], []
        for head, anchors, stride in zip(heads, spec.anchors,
                                         spec.strides):
            bx, sc, cl = decode_head(head, anchors, stride,
                                     spec.num_classes, s,
                                     cls_act=spec.cls_activation)
            bs.append(bx)
            ss.append(sc)
            cs.append(cl)
        return (jnp.concatenate(bs, axis=1), jnp.concatenate(ss, axis=1),
                jnp.concatenate(cs, axis=1))

    def dec_body(carry, _):
        hs = tuple(hh + carry for hh in heads0)
        bx, sc, cl = dec(hs)
        return carry + bx[0, 0, 0] * 1e-12 + sc[0, 0] * 1e-12, None
    emit("decode_2heads", measure(dec_body, jnp.float32(0),
                                  lambda c: c))

    boxes0, scores0, classes0 = dec(heads0)

    # -- NMS (fast impl, the serving default).
    def nms_body(carry, _):
        sc = scores0 + carry

        def one(bx, scr, cl):
            idx, valid = nms_classwise(bx, scr, cl, 64, 0.45, 0.3,
                                       impl="fast")
            return jnp.sum(jnp.where(valid, scr[jnp.clip(idx, 0, scr.shape[0] - 1)], 0.0))
        tot = jnp.sum(jax.vmap(one)(boxes0, sc, classes0))
        return carry + tot * 1e-12, None
    emit("nms_fast_x8", measure(nms_body, jnp.float32(0), lambda c: c))

    # -- full detect_batch cross-check.
    def full_body(carry, _):
        fr = (frames + carry).astype(jnp.uint8)
        dets, valid, cls = detect_batch(
            params, fr, spec, (h, w), 64, nms_impl="fast")
        return carry + (jnp.sum(dets) * 1e-12).astype(jnp.uint8), None
    emit("full_detect_batch", measure(full_body, jnp.uint8(0),
                                      lambda c: c))


if __name__ == "__main__":
    sys.exit(main())
