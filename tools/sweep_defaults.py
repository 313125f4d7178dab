"""Sweep confidence_mode / min_psr / appearance_weight on crowded synthetic
scenes with occlusions (detection dropouts) and false positives, to pick
validated shipped defaults (VERDICT r1 next #5).

Run on CPU:  python tools/sweep_defaults.py [--quick]
Prints one JSON line per configuration and a final "BEST" line.
"""

import argparse
import itertools
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402


def run_one(mode, thr, aw, seeds, n_frames, n_obj):
    from tpu_mot.config import TrackerConfig
    from tpu_mot.data import synthetic
    from tpu_mot.tracker import scan
    from tpu_mot.utils import metrics as metrics_mod

    h, w = 320, 480
    motas, idf1s, idsws = [], [], []
    for seed in seeds:
        rng = np.random.default_rng(seed)
        objs = synthetic.make_objects(n_obj, h, w, rng, max_speed=3.0)
        # Hard part of the scenario: a third of the objects get a real
        # occlusion window (invisible ~12 frames, motion continues).  With
        # no confidence gate the KCF correlates on background during the
        # window and drags the Kalman state off; with a good gate the
        # track coasts ballistically and re-acquires.
        for k in range(0, n_obj, 3):
            start = int(rng.integers(n_frames // 4, n_frames // 2))
            objs[k].occlude = (start, start + 12)
        frames, boxes, vis = synthetic.render_sequence(
            objs, n_frames, h, w, seed=seed, noise=0.02)
        # Detector faults: 20% dropout + 2 FPs/frame clutter.
        dets = synthetic.detections_from_gt(
            boxes, vis, seed=seed, jitter=2.0, drop_prob=0.2,
            fp_per_frame=2.0, frame_hw=(h, w))
        cfg = TrackerConfig(
            max_tracks=2 * n_obj, max_detections=2 * n_obj,
            frame_height=h, frame_width=w, roi_impl="xla",
            confidence_mode=mode, min_psr=thr, appearance_weight=aw)
        _, tracks, _ = scan.track_sequence(frames, dets, cfg)
        gt = [(np.where(vis[f])[0], boxes[f, np.where(vis[f])[0]])
              for f in range(n_frames)]
        hyp = [(np.asarray([t[0] for t in tr]),
                np.asarray([t[1] for t in tr]).reshape(-1, 4))
               for tr in tracks]
        m = metrics_mod.clear_mot(gt, hyp)
        motas.append(m["mota"])
        idf1s.append(m["idf1"])
        idsws.append(m["idsw"])
    return {"confidence_mode": mode, "min_psr": thr,
            "appearance_weight": aw,
            "mota": round(float(np.mean(motas)), 4),
            "idf1": round(float(np.mean(idf1s)), 4),
            "idsw": round(float(np.mean(idsws)), 1)}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    args = ap.parse_args()
    seeds = [0] if args.quick else [0, 1, 2]
    n_frames = 30 if args.quick else 60
    n_obj = 8 if args.quick else 16

    grid = []
    for thr in (0.0, 0.2, 0.35, 0.5):
        grid.append(("peak", thr))
    for thr in (3.0, 5.0, 8.0):
        grid.append(("psr", thr))

    results = []
    for (mode, thr), aw in itertools.product(grid, (0.0, 0.25)):
        r = run_one(mode, thr, aw, seeds, n_frames, n_obj)
        results.append(r)
        print(json.dumps(r), flush=True)

    best = max(results, key=lambda r: (r["mota"] + r["idf1"], -r["idsw"]))
    print("BEST " + json.dumps(best))


if __name__ == "__main__":
    main()
