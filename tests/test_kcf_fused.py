"""Fused Pallas KCF kernel parity vs ops/kcf.py (interpret mode, CPU tier).

The compiled-Mosaic behavior is covered on the TPU by tools/tpu_parity.py
and the bench MOTA gate; this tier proves the kernel math is the same
program as the unfused reference path.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from tpu_mot.kernels import kcf as fused
from tpu_mot.ops import kcf as kcf_ops
from tpu_mot.ops.cfloat import CF


def _bank(rng, t=5, c=1, s=32):
    feat0 = rng.standard_normal((t, c, s, s)).astype(np.float32) * 0.3
    yf = kcf_ops.make_yf(s, 2.5, 0.125, backend="matmul")
    model = kcf_ops.train(jnp.asarray(feat0), yf, 0.2, 1e-4,
                          backend="matmul")
    return model, yf


@pytest.mark.parametrize("c", [1, 3])
def test_detect_fused_parity(c):
    rng = np.random.default_rng(0)
    s = 32
    model, _ = _bank(rng, t=5, c=c, s=s)
    feat = rng.standard_normal((5, c, s, s)).astype(np.float32) * 0.3
    want = np.asarray(kcf_ops.detect(model, jnp.asarray(feat), 0.2,
                                     backend="matmul"))
    got = np.asarray(fused.detect_fused(model, jnp.asarray(feat), 0.2,
                                        interpret=True))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("c", [1, 3])
def test_train_fused_parity(c):
    rng = np.random.default_rng(1)
    s = 32
    model, yf = _bank(rng, t=6, c=c, s=s)
    feat = rng.standard_normal((6, c, s, s)).astype(np.float32) * 0.3
    lr = np.asarray([1.0, 0.075, 0.0, 0.5, 0.075, 1.0], np.float32)

    fresh = kcf_ops.train(jnp.asarray(feat), yf, 0.2, 1e-4,
                          backend="matmul")
    want = kcf_ops.blend(model, fresh, jnp.asarray(lr))
    got = fused.train_fused(model, jnp.asarray(feat), yf, 0.2, 1e-4,
                            jnp.asarray(lr), interpret=True)
    for g, w in zip([got.xf.re, got.xf.im, got.alphaf.re, got.alphaf.im],
                    [want.xf.re, want.xf.im, want.alphaf.re,
                     want.alphaf.im]):
        # Spectra scale ~25; measured deviation is float-noise (~2e-6 rel).
        np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                   rtol=1e-4, atol=5e-5)


def test_fused_roundtrip_tracks_shift():
    """End-to-end sanity on the fused pair: train on a patch, detect on a
    circularly shifted copy — the peak must sit at the shift (the exact
    circulant recovery property of KCF)."""
    rng = np.random.default_rng(2)
    s = 32
    patch = rng.standard_normal((s, s)).astype(np.float32)
    feat = patch[None, None]
    yf = kcf_ops.make_yf(s, 2.5, 0.125, backend="matmul")
    empty = kcf_ops.KCFModel(
        xf=CF(jnp.zeros((1, 1, s, s // 2 + 1)),
              jnp.zeros((1, 1, s, s // 2 + 1))),
        alphaf=CF(jnp.zeros((1, s, s // 2 + 1)),
                  jnp.zeros((1, s, s // 2 + 1))))
    model = fused.train_fused(empty, jnp.asarray(feat), yf, 0.2, 1e-4,
                              jnp.ones((1,)), interpret=True)
    shifted = np.roll(np.roll(patch, 3, axis=0), -2, axis=1)
    resp = fused.detect_fused(model, jnp.asarray(shifted[None, None]), 0.2,
                              interpret=True)
    dy, dx, peak = kcf_ops.peak_displacement(resp)
    # Target peak is at center; a (dy, dx) object shift moves it by (dy, dx).
    assert abs(float(dy[0]) - 3) < 0.5, float(dy[0])
    assert abs(float(dx[0]) + 2) < 0.5, float(dx[0])
    assert float(peak[0]) > 0.5


def test_full_tracker_impl_equality():
    """Whole-pipeline cross-check: the fused Pallas KCF impl and the XLA
    einsum chain must produce the same tracks through the public step on
    a real multi-frame scene (same matches, boxes within fp tolerance).
    This guards the impl dispatch plumbing (config knobs -> kernels) that
    the per-op parity tests cannot see."""
    import jax
    import numpy as np
    from tpu_mot.config import KCFConfig, TrackerConfig
    from tpu_mot.data import synthetic
    from tpu_mot.tracker import bank as bank_mod
    from tpu_mot.tracker import step as step_mod

    rng = np.random.default_rng(11)
    objs = synthetic.make_objects(6, 120, 160, rng, min_size=12,
                                  max_size=24, max_speed=2.0)
    frames, gt, vis = synthetic.render_sequence(objs, 8, 120, 160, seed=2,
                                                noise=0.01)
    dets = synthetic.detections_from_gt(gt, vis, seed=2,
                                        frame_hw=(120, 160))
    from tpu_mot.tracker.api import pad_detections

    outs = {}
    for impl in ("xla", "pallas"):
        cfg = TrackerConfig(
            kcf=KCFConfig(template_size=32), max_tracks=8,
            max_detections=8, frame_height=120, frame_width=160,
            roi_impl="xla", kcf_impl=impl)
        bank = bank_mod.empty_bank(cfg)
        boxes_seq, ids_seq = [], []
        for f in range(8):
            d, v = pad_detections(dets[f], 8)
            bank, out = step_mod.step(bank, jnp.asarray(frames[f]),
                                      jnp.asarray(d), jnp.asarray(v), cfg)
            boxes_seq.append(np.asarray(out.boxes))
            ids_seq.append(np.asarray(out.ids))
        outs[impl] = (np.stack(boxes_seq), np.stack(ids_seq))

    np.testing.assert_array_equal(outs["xla"][1], outs["pallas"][1])
    np.testing.assert_allclose(outs["xla"][0], outs["pallas"][0],
                               rtol=1e-3, atol=5e-2)
