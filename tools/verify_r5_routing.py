"""End-to-end TPU verification of the r5 per-scale precision routing
(tracker/step.py + ops/kcf.detect_from_spectrum): synthetic-sequence MOT
through the public API on the real chip, unit-scale AND multi-scale
configs, with detection dropout so KCF refinement carries tracks."""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def run(scale_step: float) -> dict:
    import jax
    import jax.numpy as jnp

    from tpu_mot.config import KCFConfig, TrackerConfig
    from tpu_mot.data import synthetic
    from tpu_mot.tracker import bank as bank_mod
    from tpu_mot.tracker import scan
    from tpu_mot.tracker.api import MultiTracker, pad_detections
    from tpu_mot.utils import metrics

    height, width = 480, 640
    n_obj, n_frames = 16, 48
    rng = np.random.default_rng(0)
    objs = synthetic.make_objects(n_obj, height, width, rng,
                                  min_size=24, max_size=56, max_speed=3.0)
    frames, boxes, vis = synthetic.render_sequence(
        objs, n_frames, height, width, seed=0, noise=0.01)
    dets_list = synthetic.detections_from_gt(
        boxes, vis, seed=0, drop_prob=0.2, frame_hw=(height, width))

    cfg = TrackerConfig(max_tracks=32, max_detections=40,
                        frame_height=height, frame_width=width,
                        kcf=KCFConfig(scale_step=scale_step))
    d = np.zeros((n_frames, cfg.max_detections, 5), np.float32)
    v = np.zeros((n_frames, cfg.max_detections), bool)
    for f in range(n_frames):
        d[f], v[f] = pad_detections(dets_list[f], cfg.max_detections)
    frames_u8 = (frames * 255).astype(np.uint8)

    bank0 = bank_mod.empty_bank(cfg)
    bank, out = scan.run_sequence(bank0, jnp.asarray(frames_u8),
                                  jnp.asarray(d), jnp.asarray(v), cfg)
    jax.block_until_ready(out.boxes)
    ids_np, boxes_np, valid_np = (np.asarray(out.ids), np.asarray(out.boxes),
                                  np.asarray(out.valid))
    hyp = [(ids_np[f, np.where(valid_np[f])[0]],
            boxes_np[f, np.where(valid_np[f])[0]]) for f in range(n_frames)]
    gt = [(np.where(vis[f])[0], boxes[f, np.where(vis[f])[0]])
          for f in range(n_frames)]
    mota = metrics.clear_mot(gt, hyp)["mota"]
    hota = metrics.hota(gt, hyp)["hota"]

    # Public per-frame API path (MultiTracker.init/update) on the same cfg.
    mt = MultiTracker(cfg)
    mt.init(frames_u8[0], dets_list[0])
    for f in range(1, 8):
        tracks = mt.update(frames_u8[f], dets_list[f])
    return {"scale_step": scale_step, "mota": round(float(mota), 4),
            "hota": round(float(hota), 4), "api_tracks_f7": len(tracks)}


def main():
    import jax
    print("devices:", jax.devices(), file=sys.stderr)
    ok = True
    for ss in (1.0, 1.05):
        r = run(ss)
        r["ok"] = r["mota"] > 0.8 and r["api_tracks_f7"] > 0
        ok &= r["ok"]
        print(json.dumps(r), flush=True)
    print(json.dumps({"verify": "r5_routing", "ok": bool(ok)}), flush=True)
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
