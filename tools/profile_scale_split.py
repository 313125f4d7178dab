"""Attribute the 3-scale cost delta: ROI extraction ([T] vs [3T] vs the
shared-DMA scales kernel), KCF detect, and HOG featurize.

The first version of this tool timed per-call host chains and produced
negative deltas — tunnel noise (see CLAUDE.md: only dependent lax.scan
chains inside ONE device program measure real cost).  This version uses
profile_stages.py's methodology: each stage is a carry-dependent scan
body, marginal ms from two chain lengths.

Run on the TPU:  python tools/profile_scale_split.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def main() -> None:
    import jax
    import jax.numpy as jnp

    from tpu_mot.kernels import roi as roi_k
    from tpu_mot.ops import kcf as kcf_ops

    h, w = 1080, 1920
    t_cap, s = 128, 64
    rng = np.random.default_rng(0)
    gray = jnp.asarray((rng.random((h, w)) * 255).astype(np.uint8))
    boxes = np.zeros((t_cap, 4), np.float32)
    boxes[:, 0] = rng.uniform(50, w - 50, t_cap)
    boxes[:, 1] = rng.uniform(50, h - 50, t_cap)
    boxes[:, 2:] = rng.uniform(24, 64, (t_cap, 2))
    boxes = jnp.asarray(boxes)
    levels0 = roi_k.build_pyramid(gray)
    sstep = 1.05
    scale_tuple = (1 / sstep, 1.0, sstep)
    scales3 = jnp.repeat(jnp.asarray(scale_tuple, jnp.float32), t_cap)
    boxes3 = jnp.tile(boxes, (3, 1))

    n_long, n_short = 128, 16

    def measure(body, carry0):
        def run(n):
            c, _ = jax.lax.scan(body, carry0, None, length=n)
            return c
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

    res = {}

    def roi_T(c, _):
        p = roi_k.extract_patches_pallas(
            gray, boxes + c, 2.5, s, levels=levels0, frame_hw=(h, w))
        return jnp.sum(p) * 1e-12, None

    def roi_3T(c, _):
        p = roi_k.extract_patches_pallas(
            gray, boxes3 + c, 2.5, s, scales3, levels=levels0,
            frame_hw=(h, w))
        return jnp.sum(p) * 1e-12, None

    def roi_shared(c, _):
        p = roi_k.extract_patches_scales_pallas(
            gray, boxes + c, 2.5, s, scale_tuple, levels=levels0,
            frame_hw=(h, w))
        return jnp.sum(p) * 1e-12, None

    res["roi_T"] = measure(roi_T, jnp.float32(0))
    res["roi_3T"] = measure(roi_3T, jnp.float32(0))
    res["roi_shared3"] = measure(roi_shared, jnp.float32(0))

    feat0 = jnp.asarray(rng.standard_normal((t_cap, 1, s, s)),
                        jnp.float32) * 0.3
    yf = kcf_ops.make_yf(s, 2.5, 0.125)
    model = kcf_ops.train(feat0, yf, 0.2, 1e-4)
    z1 = jnp.asarray(rng.standard_normal((t_cap, 1, s, s)),
                     jnp.float32) * 0.3
    z3 = jnp.asarray(rng.standard_normal((3, t_cap, 1, s, s)),
                     jnp.float32) * 0.3

    def det_T(c, _):
        r = kcf_ops.detect(model, z1 + c, 0.2)
        return jnp.sum(r) * 1e-12, None

    def det_3T(c, _):
        r = kcf_ops.detect(model, z3 + c, 0.2)
        return jnp.sum(r) * 1e-12, None

    res["detect_T"] = measure(det_T, jnp.float32(0))
    res["detect_3T"] = measure(det_3T, jnp.float32(0))

    print(json.dumps({k: round(v, 4) for k, v in res.items()}))
    print(json.dumps({
        "roi_3T_minus_T_ms": round(res["roi_3T"] - res["roi_T"], 4),
        "roi_shared_minus_T_ms": round(res["roi_shared3"] - res["roi_T"],
                                       4),
        "roi_shared_saving_vs_3T_ms": round(
            res["roi_3T"] - res["roi_shared3"], 4),
        "kcf_detect_extra_ms": round(res["detect_3T"] - res["detect_T"],
                                     4),
    }))


if __name__ == "__main__":
    sys.exit(main())
