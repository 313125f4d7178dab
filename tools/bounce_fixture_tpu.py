"""Identical-texture bounce fixture on the REAL TPU — the precision
canary.

The CPU tier computes every dot in f32, so it can never see bf16
spectra corruption; this fixture is the only probe that separates the
kcf_precision modes behaviorally (r4: IDF1 0.987 CPU -> ~0.70 TPU with
bf16 forward spectra, rescued by fwd_high — docs/BENCHMARKS.md r4
section).  Mirrors tests/test_class_aware.py::
test_bounce_gate_and_best_assoc_matrix's geometry; runs the SHIPPED
default config (class_aware + assoc_box auto->best, kcf_precision
auto->fwd_high) plus any mode passed as argv.

Usage: python tools/bounce_fixture_tpu.py [mode ...]
  (modes: default fwd_high high highest — each a kcf_precision value)
Prints one JSON line per mode; exits nonzero if the SHIPPED mode's
IDF1 drops below 0.95 (the rescue regressing is a release blocker).
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> int:
    import jax
    import jax.numpy as jnp

    from tpu_mot.config import TrackerConfig, KCFConfig
    from tpu_mot.data import synthetic
    from tpu_mot.tracker import bank as bank_mod, scan
    from tpu_mot.tracker.api import pad_detections
    from tpu_mot.utils import metrics

    print(f"device: {jax.devices()[0]}", file=sys.stderr)

    h, w, n_frames, speed = 240, 320, 40, 4.0
    meet, y = 160.0, 120.0
    f_meet = n_frames // 2
    t = np.arange(n_frames)
    cx1 = np.where(t <= f_meet, meet - speed * (f_meet - t),
                   meet - speed * (t - f_meet))
    centers = np.zeros((n_frames, 2, 2))
    centers[:, 0] = np.stack([cx1, np.full(n_frames, y - 1.0)], -1)
    centers[:, 1] = np.stack([2 * meet - cx1,
                              np.full(n_frames, y + 1.0)], -1)
    sizes = np.asarray([[20.0, 20.0], [20.0, 20.0]])
    classes = np.asarray([0, 1], np.int64)
    frames, boxes, vis = synthetic.render_trajectories(
        centers, sizes, h, w, seed=42, tex_levels=[0.45, 0.45])
    dets_list = synthetic.detections_from_gt(
        boxes, vis, seed=1, jitter=1.0, frame_hw=(h, w), classes=classes)

    d = np.zeros((n_frames, 16, 6), np.float32)
    v = np.zeros((n_frames, 16), bool)
    for f in range(n_frames):
        d[f], v[f] = pad_detections(dets_list[f], 16)

    modes = sys.argv[1:] or ["auto"]
    rc = 0
    for mode in modes:
        cfg = TrackerConfig(max_tracks=16, max_detections=16,
                            frame_height=h, frame_width=w, n_init=2,
                            class_aware=True, kcf_precision=mode,
                            kcf=KCFConfig())
        _, outs = scan.run_sequence(bank_mod.empty_bank(cfg),
                                    jnp.asarray(frames), jnp.asarray(d),
                                    jnp.asarray(v), cfg)
        ids = np.asarray(outs.ids)
        bxs = np.asarray(outs.boxes)
        val = np.asarray(outs.valid)
        hyp = [(ids[f, val[f]], bxs[f, val[f]]) for f in range(n_frames)]
        gt = [(np.where(vis[f])[0], boxes[f, vis[f]])
              for f in range(n_frames)]
        m = metrics.clear_mot(gt, hyp)
        print(json.dumps({"mode": mode,
                          "resolved": cfg.kcf_precision_resolved,
                          "idf1": round(m["idf1"], 4),
                          "idsw": int(m["idsw"]),
                          "fp": int(m["fp"]), "fn": int(m["fn"])}),
              flush=True)
        if mode == "auto" and m["idf1"] < 0.95:
            rc = 1
    return rc


if __name__ == "__main__":
    sys.exit(main())
