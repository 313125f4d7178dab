"""Bench the expensive tracker variants on the TPU (VERDICT r1 weak #4:
fHOG x31 channels, 3-scale search, peak-vs-PSR confidence had no recorded
numbers, so their cost was unknown and regressions invisible).

Same load and methodology as bench.py (1080p, 128 objects, dependent-chain
marginal timing); one JSON line per variant.  Run in the bench session and
commit the log (tools/bench_variants_rN.log).
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

    from tpu_mot.config import TrackerConfig, KCFConfig
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

    variants = {
        "default (gray, psr@5, appearance off)": {},
        "peak-ungated (r1 bench config)": dict(
            confidence_mode="peak", min_psr=0.0, appearance_weight=0.0),
        "fhog31 (cell 4)": dict(
            kcf=KCFConfig(feature_type="hog", cell_size=4)),
        "3-scale (step 1.05)": dict(kcf=KCFConfig(scale_step=1.05)),
        "fhog31 + 3-scale": dict(
            kcf=KCFConfig(feature_type="hog", cell_size=4,
                          scale_step=1.05)),
        # The heavy config pays the r4 fwd_high DFT premium
        # proportionally more (31 channels x 3 scales of forward
        # spectra); this row documents the recovery knob for users whose
        # scenes don't need the precision rescue.
        "fhog31 + 3-scale (kcf_precision=default)": dict(
            kcf=KCFConfig(feature_type="hog", cell_size=4,
                          scale_step=1.05),
            kcf_precision="default"),
    }

    for name, kw in variants.items():
        cfg = TrackerConfig(max_tracks=128, max_detections=160,
                            frame_height=height, frame_width=width, **kw)
        d = np.zeros((n_frames, 160, 5), np.float32)
        v = np.zeros((n_frames, 160), bool)
        for f in range(n_frames):
            d[f], v[f] = pad_detections(dets_list[f], 160)
        dj, vj = jnp.asarray(d), jnp.asarray(v)
        bank0 = bank_mod.empty_bank(cfg)

        bank, out = scan.run_sequence(bank0, fj, dj, vj, cfg)
        hyp = []
        ids_np, boxes_np, valid_np = (np.asarray(out.ids),
                                      np.asarray(out.boxes),
                                      np.asarray(out.valid))
        for f in range(n_frames):
            sel = np.where(valid_np[f])[0]
            hyp.append((ids_np[f, sel], boxes_np[f, sel]))
        mota = metrics.clear_mot(gt, hyp)["mota"]

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
        fps = n_frames / ((tn - t1) / reps)
        print(json.dumps({"variant": name, "fps": round(fps, 1),
                          "mota_sanity": round(float(mota), 4)}),
              flush=True)


if __name__ == "__main__":
    sys.exit(main())
