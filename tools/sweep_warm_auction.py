"""A/B the auction warm start (cfg.auction_warm_start) on the bench
fixture: per-frame assign_iters distribution, convergence, and MOTA for
warm vs cold, at the bench shapes (or a CPU-sized slice with --small).

The decision metric is the ROUND COUNT the while_loop actually runs —
the auction stage is loop-iteration-bound (profile_stages_r3b.log:
cost+auction 0.047 ms at ~4 µs/unroll), so mean iters is a direct proxy
for stage time without tunnel noise.

Usage: python tools/sweep_warm_auction.py [--small]
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    small = "--small" in sys.argv
    import jax
    import jax.numpy as jnp

    from tpu_mot.config import TrackerConfig
    from tpu_mot.data import synthetic
    from tpu_mot.tracker import bank as bank_mod
    from tpu_mot.tracker import scan
    from tpu_mot.tracker.api import pad_detections
    from tpu_mot.utils import metrics

    if small:
        height, width, n_obj, n_frames, max_det = 480, 640, 48, 48, 64
    else:
        height, width, n_obj, n_frames, max_det = 1080, 1920, 128, 64, 160

    rng = np.random.default_rng(0)
    objs = synthetic.make_objects(n_obj, height, width, rng,
                                  min_size=24, max_size=64, max_speed=3.0)
    frames, boxes, vis = synthetic.render_sequence(
        objs, n_frames, height, width, seed=0, noise=0.01)
    dets_list = synthetic.detections_from_gt(boxes, vis, seed=0,
                                             frame_hw=(height, width))

    for warm in (False, True):
        cfg = TrackerConfig(max_tracks=128, max_detections=max_det,
                            frame_height=height, frame_width=width,
                            auction_warm_start=warm)
        d = np.zeros((n_frames, cfg.max_detections, 5), np.float32)
        v = np.zeros((n_frames, cfg.max_detections), bool)
        for f in range(n_frames):
            d[f], v[f] = pad_detections(dets_list[f], cfg.max_detections)
        fj = jnp.asarray((frames * 255).astype(np.uint8))
        dj, vj = jnp.asarray(d), jnp.asarray(v)
        bank0 = bank_mod.empty_bank(cfg)
        bank, out = scan.run_sequence(bank0, fj, dj, vj, cfg)
        jax.block_until_ready(out.boxes)

        iters = np.asarray(out.assign_iters)
        conv = np.asarray(out.assign_converged)
        hyp = []
        ids_np, boxes_np, valid_np = (np.asarray(out.ids),
                                      np.asarray(out.boxes),
                                      np.asarray(out.valid))
        for f in range(n_frames):
            sel = np.where(valid_np[f])[0]
            hyp.append((ids_np[f, sel], boxes_np[f, sel]))
        gt = [(np.where(vis[f])[0], boxes[f, np.where(vis[f])[0]])
              for f in range(n_frames)]
        m = metrics.clear_mot(gt, hyp)
        print({
            "warm": warm,
            "iters_mean": round(float(iters.mean()), 2),
            "iters_p90": int(np.percentile(iters, 90)),
            "iters_max": int(iters.max()),
            "iters_tail_frames": iters[2:].tolist()[:16],
            "all_converged": bool(conv.all()),
            "mota": round(float(m["mota"]), 4),
            "idf1": round(float(m["idf1"]), 4),
            "idsw": int(m["idsw"]),
        }, flush=True)


if __name__ == "__main__":
    main()
