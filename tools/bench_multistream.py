"""Within-chip multi-stream throughput: vmap the fused per-frame step over
S independent 1080p streams (each with its own 128-track bank) in ONE
device program.

Motivation (r2 finding): shaving ~60 us/frame of HBM traffic off the step
(u8 pyramid, deeper ROI DMA pipeline, auction unroll) left the canonical
bench flat at ~3800 fps — the step is launch/latency bound (~dozens of
sequential fusions x a few us), not bandwidth bound.  If that is right,
batching S streams into one program should cost far less than S x the
single-stream time, and aggregate frames/sec/chip should scale.

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
    from tpu_mot.data import synthetic
    from tpu_mot.tracker import bank as bank_mod
    from tpu_mot.tracker import step as step_mod
    from tpu_mot.tracker.api import pad_detections

    height, width = 1080, 1920
    n_obj, n_frames, reps = 128, 32, 5
    d_cap = 160

    rng = np.random.default_rng(0)
    objs = synthetic.make_objects(n_obj, height, width, rng,
                                  min_size=24, max_size=64, max_speed=3.0)
    frames, boxes, vis = synthetic.render_sequence(
        objs, n_frames, height, width, seed=0, noise=0.01)
    dets_list = synthetic.detections_from_gt(boxes, vis, seed=0,
                                             frame_hw=(height, width))
    frames_u8 = (frames * 255).astype(np.uint8)
    d = np.zeros((n_frames, d_cap, 5), np.float32)
    v = np.zeros((n_frames, d_cap), bool)
    for f in range(n_frames):
        d[f], v[f] = pad_detections(dets_list[f], d_cap)

    cfg = TrackerConfig(max_tracks=128, max_detections=d_cap,
                        frame_height=height, frame_width=width)

    for s_streams in (1, 2, 4, 8):
        try:
            fj = jnp.asarray(np.broadcast_to(
                frames_u8[:, None], (n_frames, s_streams, height, width))
                .copy())
            dj = jnp.asarray(np.broadcast_to(
                d[:, None], (n_frames, s_streams, d_cap, 5)).copy())
            vj = jnp.asarray(np.broadcast_to(
                v[:, None], (n_frames, s_streams, d_cap)).copy())
            bank0 = jax.tree.map(
                lambda x: jnp.broadcast_to(
                    x[None], (s_streams,) + x.shape).copy() if hasattr(
                        x, "shape") else x,
                bank_mod.empty_bank(cfg))

            vstep = jax.vmap(lambda b, f, dd, vv: step_mod.step(
                b, f, dd, vv, cfg))

            @jax.jit
            def run_seq(bank, fseq, dseq, vseq):
                def body(b, xs):
                    f, dd, vv = xs
                    b, out = vstep(b, f, dd, vv)
                    return b, out.n_alive
                return jax.lax.scan(body, bank, (fseq, dseq, vseq))

            bank, alive = run_seq(bank0, fj, dj, vj)
            jax.block_until_ready(alive)

            def chain(n):
                b = bank
                t0 = time.perf_counter()
                for _ in range(n):
                    b, a = run_seq(b, fj, dj, vj)
                float(np.asarray(a).sum())
                return time.perf_counter() - t0

            chain(1)
            t1 = min(chain(1) for _ in range(2))
            tn = min(chain(reps + 1) for _ in range(2))
            ms = (tn - t1) / reps / n_frames * 1e3      # per frame-step
            agg_fps = s_streams * 1e3 / ms
            print(json.dumps({
                "streams": s_streams,
                "ms_per_step": round(ms, 4),
                "aggregate_fps_per_chip": round(agg_fps, 1),
                "scaling_vs_1": None if s_streams == 1 else round(
                    agg_fps, 1),
            }), flush=True)
        except Exception as e:  # noqa: BLE001
            print(json.dumps({"streams": s_streams,
                              "error": f"{type(e).__name__}: {e}"[:200]}),
                  flush=True)


if __name__ == "__main__":
    sys.exit(main())
