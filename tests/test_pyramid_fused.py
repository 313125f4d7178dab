"""Fused Pallas pyramid (kernels/pyramid.py) vs the XLA reduce_window
chain (kernels/roi.build_pyramid): same level shapes, bit-equal u8
levels (integer-valued f32 pooling is exact in both), zero padding
guaranteed, odd-extent edge semantics matching XLA's zero-padded "SAME".

Runs in interpret mode on CPU; compiled-Mosaic behavior is asserted by
tools/tpu_parity.py in the bench session.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from tpu_mot.kernels import pyramid as pyr_k
from tpu_mot.kernels import roi as roi_k


def _true_shapes(h, w):
    out = [(h, w)]
    for _ in range(1, roi_k.N_LEVELS):
        h, w = -(-h // 2), -(-w // 2)
        out.append((h, w))
    return out


@pytest.mark.parametrize("hw", [(256, 384), (250, 330), (120, 160),
                                (1080 // 2, 1920 // 2)])
def test_u8_bit_parity(hw):
    h, w = hw
    rng = np.random.default_rng(0)
    frame = rng.integers(0, 256, (h, w), dtype=np.uint8)
    ref = roi_k.build_pyramid(jnp.asarray(frame))
    got = pyr_k.build_pyramid_fused(jnp.asarray(frame))
    assert len(ref) == len(got)
    for lv, ((lh, lw), r, g) in enumerate(zip(_true_shapes(h, w), ref,
                                              got)):
        assert r.shape == g.shape, lv
        assert g.dtype == jnp.uint8, lv
        rn, gn = np.asarray(r), np.asarray(g)
        np.testing.assert_array_equal(gn[:lh, :lw], rn[:lh, :lw],
                                      err_msg=f"level {lv}")
        # Padding is guaranteed zero (a NaN/garbage byte here would ride
        # into the ROI kernel's window DMAs).
        assert not gn[lh:].any(), lv
        assert not gn[:, lw:].any(), lv


def test_float_parity_bf16():
    h, w = 250, 330
    rng = np.random.default_rng(1)
    frame = rng.random((h, w)).astype(np.float32)
    ref = roi_k.build_pyramid(jnp.asarray(frame))          # bf16 levels
    got = pyr_k.build_pyramid_fused(jnp.asarray(frame))
    for lv, ((lh, lw), r, g) in enumerate(zip(_true_shapes(h, w), ref,
                                              got)):
        assert g.dtype == r.dtype, lv
        rn = np.asarray(r).astype(np.float32)
        gn = np.asarray(g).astype(np.float32)
        # Accumulation order may differ by one f32 ulp before the bf16
        # round; one bf16 ulp of slack.
        np.testing.assert_allclose(gn[:lh, :lw], rn[:lh, :lw],
                                    atol=1 / 128.0, rtol=0,
                                    err_msg=f"level {lv}")
        assert np.isfinite(gn).all(), lv
        assert not gn[lh:].any() and not gn[:, lw:].any(), lv


def test_float_exact_dtype_request():
    h, w = 120, 160
    rng = np.random.default_rng(2)
    frame = rng.random((h, w)).astype(np.float32)
    ref = roi_k.build_pyramid(jnp.asarray(frame), dtype=jnp.float32)
    got = pyr_k.build_pyramid_fused(jnp.asarray(frame), dtype=jnp.float32)
    for lv, ((lh, lw), r, g) in enumerate(zip(_true_shapes(h, w), ref,
                                              got)):
        assert g.dtype == jnp.float32
        np.testing.assert_allclose(np.asarray(g)[:lh, :lw],
                                    np.asarray(r)[:lh, :lw],
                                    atol=1e-6, rtol=0, err_msg=f"lv{lv}")


def test_step_pyramid_impl_equality():
    """Full tracker scan with pyramid_impl='fused' (interpret on CPU,
    which requires roi_impl='pallas' interpret too) matches the XLA
    pyramid's outputs bit-for-bit at the id/valid level."""
    from tpu_mot.config import TrackerConfig
    from tpu_mot.data import synthetic
    from tpu_mot.tracker import scan

    rng = np.random.default_rng(3)
    objs = synthetic.make_objects(5, 120, 160, rng, max_speed=2.0)
    frames, boxes, vis = synthetic.render_sequence(objs, 8, 120, 160,
                                                   seed=3)
    dets = synthetic.detections_from_gt(boxes, vis, seed=3,
                                        frame_hw=(120, 160))
    outs = {}
    for impl in ("xla", "fused"):
        cfg = TrackerConfig(max_tracks=8, max_detections=8,
                            frame_height=120, frame_width=160,
                            roi_impl="pallas", pyramid_impl=impl)
        _, _, out = scan.track_sequence(frames, dets, cfg)
        outs[impl] = out
    np.testing.assert_array_equal(outs["xla"].ids, outs["fused"].ids)
    np.testing.assert_array_equal(outs["xla"].valid, outs["fused"].valid)
    np.testing.assert_allclose(outs["xla"].boxes, outs["fused"].boxes,
                               rtol=0, atol=1e-3)
