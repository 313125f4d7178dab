"""Per-stage cost attribution by ablation (marginal-timing methodology).

Each row disables/swaps one stage of the default bench pipeline; the fps
delta attributes that stage's per-frame cost.  Coarser than a profiler
trace but robust through the axon tunnel, and directly comparable to the
canonical bench.  Run in the bench session; commit the log.
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
    fj = jnp.asarray((frames * 255).astype(np.uint8))

    ablations = {
        "full default": {},
        "- appearance (w=0)": dict(appearance_weight=0.0),
        "- psr (peak mode)": dict(confidence_mode="peak", min_psr=0.2),
        "- kcf entirely (SORT mode)": dict(use_kcf=False),
        "roi xla instead of pallas": dict(roi_impl="xla"),
        "kcf pallas fused kernel": dict(kcf_impl="pallas"),
    }

    base_ms = None
    for name, kw in ablations.items():
        cfg = TrackerConfig(max_tracks=128, max_detections=160,
                            frame_height=height, frame_width=width, **kw)
        d = np.zeros((n_frames, 160, 5), np.float32)
        v = np.zeros((n_frames, 160), bool)
        for f in range(n_frames):
            d[f], v[f] = pad_detections(dets_list[f], 160)
        dj, vj = jnp.asarray(d), jnp.asarray(v)
        bank0 = bank_mod.empty_bank(cfg)
        bank, out = scan.run_sequence(bank0, fj, dj, vj, cfg)
        float(np.asarray(out.n_alive).sum())

        def chain(n):
            b = bank
            t0 = time.perf_counter()
            for _ in range(n):
                b, o = scan.run_sequence(b, fj, dj, vj, cfg)
            float(np.asarray(o.n_alive).sum())
            return time.perf_counter() - t0

        chain(1)
        t1 = min(chain(1) for _ in range(2))
        tn = min(chain(reps + 1) for _ in range(2))
        ms = (tn - t1) / reps / n_frames * 1e3
        if base_ms is None:
            base_ms = ms
        print(json.dumps({"ablation": name,
                          "ms_per_frame": round(ms, 4),
                          "fps": round(1e3 / ms, 1),
                          "delta_vs_default_ms": round(ms - base_ms, 4)}),
              flush=True)


if __name__ == "__main__":
    sys.exit(main())
