"""Golden-file regression (SURVEY.md §4.5): fixed seed + fixed detections
→ exact track-ID/box dump, compared against a committed golden file so
refactors that change numerics are caught deliberately.

Regenerate after an INTENTIONAL behavior change:
    python tests/test_golden.py regen
"""

import os
import sys

import numpy as np

GOLDEN = os.path.join(os.path.dirname(__file__), "golden",
                      "mot_synthetic_v1.npz")


def _run():
    from tpu_mot.config import TrackerConfig
    from tpu_mot.data import synthetic
    from tpu_mot.tracker import scan

    rng = np.random.default_rng(42)
    objs = synthetic.make_objects(10, 240, 320, rng, max_speed=2.5)
    frames, boxes, vis = synthetic.render_sequence(objs, 25, 240, 320,
                                                   seed=42)
    dets = synthetic.detections_from_gt(boxes, vis, seed=42,
                                        frame_hw=(240, 320))
    cfg = TrackerConfig(max_tracks=32, max_detections=16,
                        frame_height=240, frame_width=320, roi_impl="xla")
    _, _, out = scan.track_sequence(frames, dets, cfg)
    return out


def test_golden_mot_dump():
    if not os.path.exists(GOLDEN):
        import pytest
        pytest.skip("golden file not generated yet")
    out = _run()
    g = np.load(GOLDEN)
    np.testing.assert_array_equal(out.ids, g["ids"])
    np.testing.assert_array_equal(out.valid, g["valid"])
    # Bit-exactness is the goal on identical software; allow only
    # float-noise drift so a compiler update doesn't mask real changes.
    np.testing.assert_allclose(out.boxes, g["boxes"], rtol=0, atol=1e-3)


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "regen":
        sys.path.insert(0, os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))))
        import jax
        jax.config.update("jax_platforms", "cpu")
        out = _run()
        os.makedirs(os.path.dirname(GOLDEN), exist_ok=True)
        np.savez_compressed(GOLDEN, ids=np.asarray(out.ids),
                            valid=np.asarray(out.valid),
                            boxes=np.asarray(out.boxes))
        print(f"wrote {GOLDEN}")
