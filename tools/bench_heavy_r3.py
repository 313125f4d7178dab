"""Focused bench of the scale-search variants after the shared-DMA scale
kernel (kernels/roi.extract_patches_scales_pallas): same load and
methodology as bench.py / bench_variants.py, only the scale configs.

Run on the TPU:  python tools/bench_heavy_r3.py
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
        "3-scale (step 1.05, shared-DMA)": dict(
            kcf=KCFConfig(scale_step=1.05)),
        "fhog31 + 3-scale (shared-DMA)": dict(
            kcf=KCFConfig(feature_type="hog", cell_size=4,
                          scale_step=1.05)),
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
        jax.block_until_ready(out.boxes)
        hyp = []
        ids_np, boxes_np, valid_np = (np.asarray(out.ids),
                                      np.asarray(out.boxes),
                                      np.asarray(out.valid))
        for f in range(n_frames):
            sel = np.where(valid_np[f])[0]
            hyp.append((ids_np[f, sel], boxes_np[f, sel]))
        mota = metrics.clear_mot(gt, hyp)["mota"]

        def chain(n, _bank=bank, _cfg=cfg, _dj=dj, _vj=vj):
            b = _bank
            t0 = time.perf_counter()
            for _ in range(n):
                b, o = scan.run_sequence(b, fj, _dj, _vj, _cfg)
            float(np.asarray(o.n_alive).sum())
            return time.perf_counter() - t0

        chain(1)
        t1 = min(chain(1) for _ in range(2))
        tn = min(chain(reps + 1) for _ in range(2))
        dt = (tn - t1) / reps
        fps = n_frames / dt if dt > 1e-9 else 0.0
        print(json.dumps({"variant": name, "fps": round(fps, 1),
                          "mota_sanity": round(float(mota), 4)}),
              flush=True)


if __name__ == "__main__":
    sys.exit(main())
