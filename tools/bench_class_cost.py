"""Bench-shape perf cost of class-aware association (VERDICT r3 ask #5).

class_aware=True adds (a) the class gate (a [T, D] equality mask folded
into feasibility) and (b) under assoc_box="auto"->"best", the
dual-hypothesis cost — a second pairwise_iou of the Kalman boxes and a
per-pair max.  Both ride the same fused program; the expectation is
noise.  This measures it at the canonical bench shape (1080p, 128
tracks, 160-det capacity) with IDENTICAL scene dynamics: the class-aware
run feeds 6-col detections with a constant class 0, so the tracker's
decisions match the class-blind run exactly and the timing delta is
pure gate+dual-cost machinery.

Methodology: dependent-chain marginal timing, same as bench.py (the
bank carries across reps; tunnel RTT cancels in the subtraction).
Prints one JSON line per config.
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
    from tpu_mot.tracker import scan
    from tpu_mot.tracker.api import pad_detections

    height, width = 1080, 1920
    n_obj, n_frames, reps = 128, 64, 5

    rng = np.random.default_rng(0)
    objs = synthetic.make_objects(n_obj, height, width, rng,
                                  min_size=24, max_size=64, max_speed=3.0)
    frames, boxes, vis = synthetic.render_sequence(
        objs, n_frames, height, width, seed=0, noise=0.01)
    dets_list = synthetic.detections_from_gt(boxes, vis, seed=0,
                                             frame_hw=(height, width))
    frames_u8 = jnp.asarray((frames * 255).astype(np.uint8))

    for class_aware in (False, True):
        cfg = TrackerConfig(max_tracks=128, max_detections=160,
                            frame_height=height, frame_width=width,
                            class_aware=class_aware)
        det_w = 6 if class_aware else 5
        d = np.zeros((n_frames, cfg.max_detections, det_w), np.float32)
        v = np.zeros((n_frames, cfg.max_detections), bool)
        for f in range(n_frames):
            d[f], v[f] = pad_detections(dets_list[f], cfg.max_detections,
                                        width=det_w)
        dj, vj = jnp.asarray(d), jnp.asarray(v)
        bank = bank_mod.empty_bank(cfg)
        bank, out = scan.run_sequence(bank, frames_u8, dj, vj, cfg)
        jax.block_until_ready(out.boxes)

        def chain(n, b=bank):
            t0 = time.perf_counter()
            for _ in range(n):
                b, o = scan.run_sequence(b, frames_u8, dj, vj, cfg)
            float(np.asarray(o.n_alive).sum())
            return time.perf_counter() - t0

        chain(1)
        t1 = min(chain(1) for _ in range(2))
        tn = min(chain(reps + 1) for _ in range(2))
        dt = (tn - t1) / reps
        fps = n_frames / dt if dt > 1e-9 else 0.0
        print(json.dumps({
            "class_aware": class_aware,
            "assoc_box_resolved": cfg.assoc_box_resolved,
            "fps": round(fps, 1),
            "ms_per_frame": round(1e3 * dt / n_frames, 4),
        }), flush=True)


if __name__ == "__main__":
    sys.exit(main())
