"""Template-size speed/quality sweep (r4 ask-#8 exploration).

The r4 ablation (tools/profile_ablation_r4.log) attributes 74% of the
default frame (0.163 of 0.221 ms) to the KCF block, whose DFT einsums
and resample matmuls scale superlinearly in the template size S.
BASELINE configs[1] pins S=64, so the canonical bench stays 64 — this
sweep documents the serving knob: what a user who can tolerate a
smaller correlation window gains in throughput and pays in quality,
measured on the canonical 1080p/128-track fixture (MOTA/HOTA on the
same scene, marginal-chain fps).

Prints one JSON line per template size.
"""

import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp

    from tpu_mot.config import KCFConfig, TrackerConfig
    from tpu_mot.data import synthetic
    from tpu_mot.tracker import bank as bank_mod
    from tpu_mot.tracker import scan
    from tpu_mot.tracker.api import pad_detections
    from tpu_mot.utils import metrics

    height, width = 1080, 1920
    n_obj, n_frames, reps = 128, 64, 5

    rng = np.random.default_rng(0)
    objs = synthetic.make_objects(n_obj, height, width, rng,
                                  min_size=24, max_size=64, max_speed=3.0)
    frames, boxes, vis = synthetic.render_sequence(
        objs, n_frames, height, width, seed=0, noise=0.01)
    dets_list = synthetic.detections_from_gt(boxes, vis, seed=0,
                                             frame_hw=(height, width))
    fj = jnp.asarray((frames * 255).astype(np.uint8))
    gt = [(np.where(vis[f])[0], boxes[f, np.where(vis[f])[0]])
          for f in range(n_frames)]

    for s in (64, 48, 32):
        cfg = TrackerConfig(max_tracks=128, max_detections=160,
                            frame_height=height, frame_width=width,
                            kcf=KCFConfig(template_size=s))
        d = np.zeros((n_frames, cfg.max_detections, 5), np.float32)
        v = np.zeros((n_frames, cfg.max_detections), bool)
        for f in range(n_frames):
            d[f], v[f] = pad_detections(dets_list[f], cfg.max_detections)
        dj, vj = jnp.asarray(d), jnp.asarray(v)

        bank, out = scan.run_sequence(bank_mod.empty_bank(cfg), fj, dj, vj,
                                      cfg)
        jax.block_until_ready(out.boxes)
        ids_np, boxes_np, valid_np = (np.asarray(out.ids),
                                      np.asarray(out.boxes),
                                      np.asarray(out.valid))
        hyp = []
        for f in range(n_frames):
            sel = np.where(valid_np[f])[0]
            hyp.append((ids_np[f, sel], boxes_np[f, sel]))
        mota = metrics.clear_mot(gt, hyp)["mota"]
        hota = metrics.hota(gt, hyp)["hota"]

        def chain(n, b=bank):
            t0 = time.perf_counter()
            for _ in range(n):
                b, o = scan.run_sequence(b, fj, dj, vj, cfg)
            float(np.asarray(o.n_alive).sum())
            return time.perf_counter() - t0

        chain(1)
        t1 = min(chain(1) for _ in range(2))
        tn = min(chain(reps + 1) for _ in range(2))
        dt = (tn - t1) / reps
        fps = n_frames / dt if dt > 1e-9 else 0.0
        print(json.dumps({"template_size": s, "fps": round(fps, 1),
                          "ms_per_frame": round(1e3 * dt / n_frames, 4),
                          "mota": round(float(mota), 4),
                          "hota": round(float(hota), 4)}), flush=True)


if __name__ == "__main__":
    sys.exit(main())
