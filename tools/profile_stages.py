"""Standalone per-stage cost chains at the bench shape (1080p, T=128,
D=160) — finer attribution than tools/profile_ablation.py's whole-pipeline
ablations, which can't separate stages that XLA fuses together.

Each stage is measured as a DEPENDENT lax.scan chain inside one device
program (CLAUDE.md timing methodology: the axon tunnel RTT and dedup make
per-call timing meaningless); marginal ms/iteration comes from two chain
lengths.  Stage costs measured standalone are a lower bound on their cost
inside the fused step (no cross-stage fusion), but the sum matching the
ablation totals validates both.

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

    from tpu_mot.config import TrackerConfig
    from tpu_mot.kernels import roi as roi_k
    from tpu_mot.ops import assignment, iou as iou_ops, kalman
    from tpu_mot.ops import features as feat_ops
    from tpu_mot.ops import kcf as kcf_ops

    h, w = 1080, 1920
    t_cap, d_cap, s = 128, 160, 64
    cfg = TrackerConfig(max_tracks=t_cap, max_detections=d_cap,
                        frame_height=h, frame_width=w)
    rng = np.random.default_rng(0)
    gray = jnp.asarray(rng.random((h, w)).astype(np.float32))
    boxes = np.zeros((t_cap, 4), np.float32)
    boxes[:, 0] = rng.uniform(50, w - 50, t_cap)
    boxes[:, 1] = rng.uniform(50, h - 50, t_cap)
    boxes[:, 2:] = rng.uniform(24, 64, (t_cap, 2))
    boxes = jnp.asarray(boxes)
    dets = np.zeros((d_cap, 5), np.float32)
    dets[:, 0] = rng.uniform(50, w - 50, d_cap)
    dets[:, 1] = rng.uniform(50, h - 50, d_cap)
    dets[:, 2:4] = rng.uniform(24, 64, (d_cap, 2))
    dets[:, 4] = 1.0
    dets = jnp.asarray(dets)

    feat0 = jnp.asarray(rng.standard_normal((t_cap, 1, s, s)),
                        jnp.float32) * 0.3
    yf = kcf_ops.make_yf(s, cfg.kcf.padding, cfg.kcf.output_sigma_factor)
    model0 = kcf_ops.train(feat0, yf, 0.2, 1e-4)
    lr = jnp.full((t_cap,), 0.075, jnp.float32)
    resp0 = kcf_ops.detect(model0, feat0, 0.2)
    levels0 = roi_k.build_pyramid(gray)

    n_long, n_short = 256, 32

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
        return (t(f_long) - t(f_short)) / (n_long - n_short) * 1e3

    class Stages(dict):
        def __setitem__(self, k, v):
            print(json.dumps({"stage": k, "ms": round(v, 4)}), flush=True)
            dict.__setitem__(self, k, v)
    stages = Stages()

    # ROI extraction, 128 boxes from the prebuilt pyramid (one site).
    def roi_body(b, _):
        p = roi_k.extract_patches_pallas(gray, b, cfg.kcf.padding, s,
                                         levels=levels0, frame_hw=(h, w))
        return b + jnp.mean(p) * 1e-9, None
    stages["roi_extract_128"] = measure(roi_body, boxes,
                                        lambda c: c[0, 0])

    # Pyramid build (once per frame in the step), via the rebuild DELTA:
    # a naive chain consuming one element of the levels lets XLA DCE the
    # whole reduce_window chain (first attempt measured ~0 ms); feeding
    # the rebuilt levels into the ROI kernel (opaque HBM refs) keeps it.
    def pyr_roi_body(carry, _):
        g, b = carry
        lv = roi_k.build_pyramid(g)
        p = roi_k.extract_patches_pallas(g, b, cfg.kcf.padding, s,
                                         levels=lv, frame_hw=(h, w))
        return (g + jnp.mean(p) * 1e-9, b), None
    ms_both = measure(pyr_roi_body, (gray, boxes), lambda c: c[0][0, 0])
    stages["pyramid_build_1080p (delta)"] = (
        ms_both - stages["roi_extract_128"])

    # Feature windowing (hann + normalize); carry is [T, S, S] patches.
    def feat_body(p, _):
        f = feat_ops.extract_features(p, cfg.kcf)     # [T, C, S, S]
        return f[:, 0], None
    stages["features_window"] = measure(feat_body, feat0[:, 0],
                                        lambda c: c[0, 0, 0])

    # KCF detect math (XLA chain) / train+blend math — measured AT THE
    # SHIPPED precision point (cfg.kcf_precision auto->fwd_high; the
    # module default outside a scope is "highest", which the r4
    # profile_stages_r4.log numbers reflect — they overstate the KCF
    # block vs what bench.py actually runs).
    from tpu_mot.ops import fft as fft_ops
    shipped_mode = cfg.kcf_precision_resolved

    def det_body(f, _):
        r = kcf_ops.detect(model0, f, 0.2)
        return r[:, None] * 0.5 + feat0 * 0.5, None
    with fft_ops.precision_scope(shipped_mode):
        stages[f"kcf_detect_math_xla ({shipped_mode})"] = measure(
            det_body, feat0, lambda c: c[0, 0, 0, 0])

    def trn_body(m, _):
        # Features must depend on the carry or XLA hoists the entire
        # train() out of the scan (first attempt measured ~0 ms).
        f = feat0 * (1.0 + jnp.mean(m.alphaf.re) * 1e-9)
        return kcf_ops.blend(m, kcf_ops.train(f, yf, 0.2, 1e-4), lr), None
    with fft_ops.precision_scope(shipped_mode):
        stages[f"kcf_train_math_xla ({shipped_mode})"] = measure(
            trn_body, model0, lambda m: m.alphaf.re[0, 0, 0])

    # Peak + subpixel + PSR.
    def peak_body(r, _):
        dy, dx, pk = kcf_ops.peak_displacement(r)
        pk = kcf_ops.psr(r, pk)
        return r + (jnp.sum(dy + dx + pk) * 1e-12), None
    stages["peak_subpixel_psr"] = measure(peak_body, resp0,
                                          lambda c: c[0, 0, 0])

    # Cost matrix + auction assignment at 128x160.
    alive = jnp.ones((t_cap,), bool)
    dvalid = jnp.ones((d_cap,), bool)

    def asg_body(b, _):
        cost = iou_ops.association_cost(b, dets[:, :4], alive, dvalid,
                                        cfg.iou_gate, cfg.cost_infeasible)
        feasible = cost < cfg.cost_infeasible * 0.5
        m, it, conv = assignment.auction_assign_stats(cost, feasible)
        return b + jnp.sum(m).astype(jnp.float32) * 1e-12, None
    stages["cost_plus_auction"] = measure(asg_body, boxes,
                                          lambda c: c[0, 0])

    # Same block at the SHIPPED impl (assign_impl auto -> pallas on TPU;
    # the default-arg call above measures the XLA while_loop solver —
    # r4c logs' 0.15 ms outlier was that, not a regression).
    if jax.default_backend() == "tpu":
        def asg_body_pallas(b, _):
            cost = iou_ops.association_cost(b, dets[:, :4], alive, dvalid,
                                            cfg.iou_gate,
                                            cfg.cost_infeasible)
            feasible = cost < cfg.cost_infeasible * 0.5
            m, it, conv = assignment.auction_assign_stats(cost, feasible,
                                                          impl="pallas")
            return b + jnp.sum(m).astype(jnp.float32) * 1e-12, None
        stages["cost_plus_auction (pallas, shipped)"] = measure(
            asg_body_pallas, boxes, lambda c: c[0, 0])

    # Kalman predict + correct.
    mean0, cov0 = kalman.init(boxes, cfg.kalman)

    def kf_body(carry, _):
        mean, cov = carry
        mean, cov = kalman.predict(mean, cov, cfg.kalman)
        mean, cov = kalman.correct(mean, cov, boxes, alive, cfg.kalman)
        return (mean, cov), None
    stages["kalman_predict_correct"] = measure(kf_body, (mean0, cov0),
                                               lambda c: c[0][0, 0])

    total = sum(stages.values())
    print(json.dumps({"stage": "SUM(parts, standalone)",
                      "ms": round(total, 4),
                      "note": "roi+features runs ONCE per frame under the "
                              "r3b train_site='detect' default (twice "
                              "under 'refined'); kcf_train here measures "
                              "the train math only — compare the "
                              "full-default ms/frame from bench.py"}),
          flush=True)


if __name__ == "__main__":
    sys.exit(main())
