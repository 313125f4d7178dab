"""ROI-kernel pipelining sweep: tracks-per-program x DMA buffer depth,
plus an honest pyramid-build cost (measured as the delta between a chain
that rebuilds the pyramid every iteration and one using prebuilt levels —
the Pallas kernel consumes all levels as opaque HBM refs, so nothing can
be DCE'd, unlike a naive chain that only touches one element).

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

    from tpu_mot.kernels import roi as roi_k

    h, w = 1080, 1920
    t_cap, s = 128, 64
    padding = 2.5
    rng = np.random.default_rng(0)
    gray = jnp.asarray(rng.random((h, w)).astype(np.float32))
    boxes = np.zeros((t_cap, 4), np.float32)
    boxes[:, 0] = rng.uniform(50, w - 50, t_cap)
    boxes[:, 1] = rng.uniform(50, h - 50, t_cap)
    boxes[:, 2:] = rng.uniform(24, 64, (t_cap, 2))
    boxes = jnp.asarray(boxes)
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

    base_ms = None
    for tpp, nbuf in [(16, 4), (16, 8), (32, 4), (32, 8), (8, 4),
                      (32, 16), (64, 8)]:
        try:
            def body(b, _, tpp=tpp, nbuf=nbuf):
                p = roi_k.extract_patches_pallas(
                    gray, b, padding, s, levels=levels0, frame_hw=(h, w),
                    tracks_per_prog=tpp, n_buffers=nbuf)
                return b + jnp.mean(p) * 1e-9, None
            ms = measure(body, boxes, lambda c: c[0, 0])
            if base_ms is None:
                base_ms = ms
            print(json.dumps({"variant": f"tpp{tpp}/nbuf{nbuf}",
                              "ms": round(ms, 4)}), flush=True)
        except Exception as e:  # noqa: BLE001
            print(json.dumps({"variant": f"tpp{tpp}/nbuf{nbuf}",
                              "error": f"{type(e).__name__}: {e}"[:160]}),
                  flush=True)

    # u8 pyramid variants: default dots / int8 first dot / no dots
    # (diagnostic: attributes the kernel's DMA vs MXU split).
    frame_u8 = jnp.asarray((np.asarray(gray) * 255).astype(np.uint8))
    levels_u8 = roi_k.build_pyramid(frame_u8)
    for di in ("default", "int8", "colfirst", "nodot"):
        try:
            def body_u8(b, _, di=di):
                p = roi_k.extract_patches_pallas(
                    frame_u8, b, padding, s, levels=levels_u8,
                    frame_hw=(h, w), dot_impl=di)
                return b + jnp.mean(p) * 1e-9, None
            ms = measure(body_u8, boxes, lambda c: c[0, 0])
            print(json.dumps({"variant": f"u8/{di}", "ms": round(ms, 4)}),
                  flush=True)
        except Exception as e:  # noqa: BLE001
            print(json.dumps({"variant": f"u8/{di}",
                              "error": f"{type(e).__name__}: {e}"[:160]}),
                  flush=True)

    # u8 pyramid build cost (delta, as below but u8 chain).  The carry
    # perturbation must be NONZERO or XLA hoists the whole body out of
    # the scan (first attempt used `+ x*0` and measured 0.001 ms).
    def body_u8_rebuild(carry, _):
        g, b = carry
        lv = roi_k.build_pyramid(g)
        p = roi_k.extract_patches_pallas(g, b, padding, s, levels=lv,
                                         frame_hw=(h, w))
        return (g ^ (jnp.mean(p) > 1e9).astype(jnp.uint8), b), None
    ms_u8_rb = measure(body_u8_rebuild, (frame_u8, boxes),
                       lambda c: c[0][0, 0])
    print(json.dumps({"variant": "u8_with_pyramid_rebuild",
                      "ms": round(ms_u8_rb, 4)}), flush=True)

    # Pyramid cost via delta: rebuild levels every iteration (consumed by
    # the kernel, so the reduce_window chain cannot be pruned).
    def body_rebuild(carry, _):
        g, b = carry
        lv = roi_k.build_pyramid(g)
        p = roi_k.extract_patches_pallas(g, b, padding, s, levels=lv,
                                         frame_hw=(h, w))
        return (g + jnp.mean(p) * 1e-9, b), None
    ms_rebuild = measure(body_rebuild, (gray, boxes), lambda c: c[0][0, 0])
    print(json.dumps({"variant": "with_pyramid_rebuild(tpp16/nbuf4)",
                      "ms": round(ms_rebuild, 4),
                      "pyramid_delta_ms": round(ms_rebuild - base_ms, 4)}),
          flush=True)


if __name__ == "__main__":
    sys.exit(main())
