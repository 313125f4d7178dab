"""Pyramid build sweep at 1080p: XLA reduce_window chain vs the fused
one-pass Pallas kernel (kernels/pyramid.py) — standalone dependent-chain
marginal timing (CLAUDE.md methodology), with the pyramid feeding the ROI
kernel so XLA cannot DCE it (same rebuild-delta trick as
tools/profile_stages.py), plus compiled-kernel value parity.

Run in the bench session; commit the log:
    python tools/bench_pyramid.py | tee tools/bench_pyramid_r3.log
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

    from tpu_mot.kernels import pyramid as pyr_k
    from tpu_mot.kernels import roi as roi_k

    h, w = 1080, 1920
    t_cap, s = 128, 64
    rng = np.random.default_rng(0)
    frame = jnp.asarray(rng.integers(0, 256, (h, w), dtype=np.uint8))
    boxes = np.zeros((t_cap, 4), np.float32)
    boxes[:, 0] = rng.uniform(50, w - 50, t_cap)
    boxes[:, 1] = rng.uniform(50, h - 50, t_cap)
    boxes[:, 2:] = rng.uniform(24, 64, (t_cap, 2))
    boxes = jnp.asarray(boxes)

    # -- compiled-kernel value parity -----------------------------------
    ref = [np.asarray(x) for x in roi_k.build_pyramid(frame)]
    got = [np.asarray(x) for x in pyr_k.build_pyramid_fused(frame)]
    lh, lw = h, w
    for lv, (r, g) in enumerate(zip(ref, got)):
        assert r.shape == g.shape, (lv, r.shape, g.shape)
        np.testing.assert_array_equal(g[:lh, :lw], r[:lh, :lw])
        lh, lw = -(-lh // 2), -(-lw // 2)
    print(json.dumps({"check": "compiled u8 bit-parity vs XLA chain",
                      "levels": len(ref), "status": "PASS"}), flush=True)

    # -- dependent-chain marginal timing --------------------------------
    n_long, n_short = 256, 32

    def measure(build):
        def body2(carry, _):
            g, b = carry
            lv = build(g)
            p = roi_k.extract_patches_pallas(
                g.astype(jnp.float32) / 255.0, b, 2.5, s, levels=lv,
                frame_hw=(h, w))
            # Boxes carry a result-derived perturbation so no iteration
            # hoists (scan-hoisting pitfall, CLAUDE.md).
            bb = b + jnp.mean(p) * 1e-9
            return (g, bb), None

        def run(n):
            c, _ = jax.lax.scan(body2, (frame, boxes), None, length=n)
            return c[1][0, 0]
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

    for name, build in [("xla", roi_k.build_pyramid),
                        ("fused", pyr_k.build_pyramid_fused)]:
        ms = measure(build)
        print(json.dumps({"impl": name,
                          "ms_per_frame (pyramid+roi chain)":
                          round(ms, 4)}), flush=True)


if __name__ == "__main__":
    sys.exit(main())
