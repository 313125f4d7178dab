"""Pallas ROI kernel parity vs the XLA sampler (interpret mode on CPU)."""

import numpy as np
import jax.numpy as jnp

from tpu_mot.kernels import roi
from tpu_mot.ops import patch as patch_ops


def test_level0_exact_parity():
    """Windows <= MAX_WIN px sample level 0 — bit-comparable to the XLA
    bilinear path at float32; within bf16 quantization at the production
    pyramid dtype."""
    rng = np.random.default_rng(0)
    frame = rng.random((240, 320)).astype(np.float32)
    boxes = np.array([[70.0, 50.0, 20.0, 26.0],
                      [150.0, 120.0, 40.0, 30.0],
                      [10.0, 230.0, 30.0, 24.0]], np.float32)  # edge clamp
    want = np.asarray(patch_ops.extract_patches(
        jnp.asarray(frame), jnp.asarray(boxes), 2.5, 64))
    got32 = np.asarray(roi.extract_patches_pallas(
        jnp.asarray(frame), jnp.asarray(boxes), 2.5, 64, interpret=True,
        dtype=jnp.float32))
    np.testing.assert_allclose(got32, want, rtol=1e-5, atol=1e-5)
    got16 = np.asarray(roi.extract_patches_pallas(
        jnp.asarray(frame), jnp.asarray(boxes), 2.5, 64, interpret=True))
    np.testing.assert_allclose(got16, want, atol=6e-3)


def test_higher_level_approximates_fullres():
    """Large windows sample a mip level; result must approximate the
    full-res average within a coarse tolerance."""
    rng = np.random.default_rng(1)
    # Smooth image so mip-level sampling is close to full-res sampling.
    small = rng.random((30, 40)).astype(np.float32)
    frame = np.kron(small, np.ones((16, 16))).astype(np.float32)  # 480x640
    boxes = np.array([[320.0, 240.0, 120.0, 100.0]], np.float32)  # win=300
    got = np.asarray(roi.extract_patches_pallas(
        jnp.asarray(frame), jnp.asarray(boxes), 2.5, 64, interpret=True))
    want = np.asarray(patch_ops.extract_patches(
        jnp.asarray(frame), jnp.asarray(boxes), 2.5, 64))
    # Mip sampling blurs sharp texture edges over 2^k full-res pixels;
    # mean error stays small, max error concentrates at block borders.
    assert np.abs(got - want).mean() < 0.05, np.abs(got - want).mean()


def test_degenerate_and_outside_boxes_finite():
    rng = np.random.default_rng(2)
    frame = rng.random((240, 320)).astype(np.float32)
    boxes = np.array([[10.0, 10.0, 0.0, 0.0],
                      [1000.0, 1000.0, 20.0, 20.0],
                      [-50.0, -50.0, 600.0, 600.0]], np.float32)
    got = np.asarray(roi.extract_patches_pallas(
        jnp.asarray(frame), jnp.asarray(boxes), 2.5, 64, interpret=True))
    assert np.isfinite(got).all()


def test_u8_pyramid_parity():
    """uint8 ingest frames keep the pyramid uint8 (zero-copy level 0,
    halved DMA); the kernel folds the 1/255 dequantization into its
    resample weights.  Level-0 sampling must match the XLA f32 path on
    gray = frame/255 to float accuracy."""
    rng = np.random.default_rng(7)
    frame_u8 = rng.integers(0, 256, (240, 384), dtype=np.uint8)
    gray = frame_u8.astype(np.float32) / 255.0
    boxes = np.array([[70.0, 50.0, 20.0, 26.0],
                      [200.0, 120.0, 40.0, 30.0],
                      [10.0, 230.0, 30.0, 24.0]], np.float32)
    levels = roi.build_pyramid(jnp.asarray(frame_u8))
    assert all(lv.dtype == jnp.uint8 for lv in levels)
    got = np.asarray(roi.extract_patches_pallas(
        jnp.asarray(frame_u8), jnp.asarray(boxes), 2.5, 64,
        interpret=True, levels=levels, frame_hw=frame_u8.shape))
    want = np.asarray(patch_ops.extract_patches(
        jnp.asarray(gray), jnp.asarray(boxes), 2.5, 64))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
    # Deeper levels: u8 rounding of the 2x average pool (<= 0.5/255).
    l1 = np.asarray(levels[1]).astype(np.float32)[:120, :192] / 255.0
    want_l1 = gray.reshape(120, 2, 192, 2).mean(axis=(1, 3))
    np.testing.assert_allclose(l1, want_l1, atol=0.51 / 255.0)


def test_pyramid_dtype_domain_coherent():
    """dtype overrides must convert the VALUE DOMAIN, not just the storage
    dtype: a u8 frame with dtype=float32 (exact-parity runs) must yield
    [0,1]-domain levels, and a float frame with dtype=uint8 must scale up
    to 0..255 — the review-r2 bug returned 255x-hot patches silently."""
    rng = np.random.default_rng(12)
    frame_u8 = rng.integers(0, 256, (240, 384), dtype=np.uint8)
    gray = frame_u8.astype(np.float32) / 255.0
    boxes = np.array([[70.0, 50.0, 20.0, 26.0]], np.float32)
    want = np.asarray(patch_ops.extract_patches(
        jnp.asarray(gray), jnp.asarray(boxes), 2.5, 64))
    # u8 frame, f32 pyramid requested.
    lv32 = roi.build_pyramid(jnp.asarray(frame_u8), dtype=jnp.float32)
    assert lv32[0].dtype == jnp.float32
    got = np.asarray(roi.extract_patches_pallas(
        jnp.asarray(frame_u8), jnp.asarray(boxes), 2.5, 64,
        interpret=True, levels=lv32, frame_hw=frame_u8.shape))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
    # f32 frame, u8 pyramid requested.
    lvu8 = roi.build_pyramid(jnp.asarray(gray), dtype=jnp.uint8)
    assert lvu8[0].dtype == jnp.uint8
    got = np.asarray(roi.extract_patches_pallas(
        jnp.asarray(gray), jnp.asarray(boxes), 2.5, 64,
        interpret=True, levels=lvu8, frame_hw=gray.shape))
    np.testing.assert_allclose(got, want, atol=1.0 / 255.0)
    # int8 dots on a non-u8 pyramid must fail loudly, not silently
    # measure the default path.
    import pytest
    with pytest.raises(ValueError, match="uint8 pyramid"):
        roi.extract_patches_pallas(
            jnp.asarray(gray), jnp.asarray(boxes), 2.5, 64,
            interpret=True, levels=lv32, frame_hw=gray.shape,
            dot_impl="int8")


def test_u8_int8_dot_parity():
    """The int8-MXU resample variant quantizes the hat weights to 1/127
    steps; output must match the f32-dot u8 path within that budget
    (pixel range [0,1], two weights per output row)."""
    rng = np.random.default_rng(9)
    frame_u8 = rng.integers(0, 256, (240, 384), dtype=np.uint8)
    boxes = np.array([[70.0, 50.0, 20.0, 26.0],
                      [200.0, 120.0, 40.0, 30.0]], np.float32)
    levels = roi.build_pyramid(jnp.asarray(frame_u8))
    base = np.asarray(roi.extract_patches_pallas(
        jnp.asarray(frame_u8), jnp.asarray(boxes), 2.5, 64,
        interpret=True, levels=levels, frame_hw=frame_u8.shape))
    got = np.asarray(roi.extract_patches_pallas(
        jnp.asarray(frame_u8), jnp.asarray(boxes), 2.5, 64,
        interpret=True, levels=levels, frame_hw=frame_u8.shape,
        dot_impl="int8"))
    # Two rounded weights/row, each off by <= 0.5/127 on [0,1] pixels.
    np.testing.assert_allclose(got, base, atol=1.2 / 127.0)


def test_u8_colfirst_dot_parity():
    """Column-first dot ordering is the same bilinear resample up to f32
    summation order."""
    rng = np.random.default_rng(10)
    frame_u8 = rng.integers(0, 256, (240, 384), dtype=np.uint8)
    boxes = np.array([[70.0, 50.0, 20.0, 26.0],
                      [200.0, 120.0, 40.0, 30.0]], np.float32)
    levels = roi.build_pyramid(jnp.asarray(frame_u8))
    base = np.asarray(roi.extract_patches_pallas(
        jnp.asarray(frame_u8), jnp.asarray(boxes), 2.5, 64,
        interpret=True, levels=levels, frame_hw=frame_u8.shape))
    got = np.asarray(roi.extract_patches_pallas(
        jnp.asarray(frame_u8), jnp.asarray(boxes), 2.5, 64,
        interpret=True, levels=levels, frame_hw=frame_u8.shape,
        dot_impl="colfirst"))
    np.testing.assert_allclose(got, base, rtol=1e-5, atol=1e-5)


def test_u8_frame_through_tracker_step():
    """The fused step accepts uint8 frames on both ROI paths (the u8
    pyramid on pallas, to_gray on xla) and produces identical tracking to
    the f32-gray equivalent within resample tolerance."""
    import jax
    from tpu_mot.config import TrackerConfig
    from tpu_mot.tracker import api as api_mod

    rng = np.random.default_rng(8)
    frame_u8 = rng.integers(0, 256, (120, 160), dtype=np.uint8)
    cfg = TrackerConfig(max_tracks=8, max_detections=4, frame_height=120,
                        frame_width=160, roi_impl="xla")
    trk = api_mod.MultiTracker(cfg)
    dets = np.array([[40.0, 40.0, 20.0, 18.0, 0.9],
                     [100.0, 70.0, 24.0, 20.0, 0.8]], np.float32)
    trk.init(frame_u8, dets)
    trk2 = api_mod.MultiTracker(cfg)
    trk2.init(frame_u8.astype(np.float32) / 255.0, dets)
    np.testing.assert_allclose(
        np.asarray(trk.last_output.boxes),
        np.asarray(trk2.last_output.boxes), rtol=1e-4, atol=1e-4)
    # The u8 bank carries the same KCF spectra as the f32-gray bank.
    np.testing.assert_allclose(
        np.asarray(trk.bank.kcf.xf.re), np.asarray(trk2.bank.kcf.xf.re),
        rtol=1e-3, atol=1e-4)


def test_pyramid_shapes_and_content():
    rng = np.random.default_rng(3)
    frame = rng.random((1080, 1920)).astype(np.float32)
    levels = roi.build_pyramid(jnp.asarray(frame))
    assert len(levels) == roi.N_LEVELS
    # Level 1 equals 2x average pooling of the frame (bf16 storage).
    l1 = np.asarray(levels[1].astype(jnp.float32))[:540, :960]
    want = frame.reshape(540, 2, 960, 2).mean(axis=(1, 3))
    np.testing.assert_allclose(l1, want, atol=4e-3)
    l1_exact = np.asarray(roi.build_pyramid(
        jnp.asarray(frame), dtype=jnp.float32)[1])[:540, :960]
    np.testing.assert_allclose(l1_exact, want, rtol=1e-5, atol=1e-5)
    # Alignment padding present.
    for lv, arr in enumerate(levels):
        assert arr.shape[0] % 8 == 0 and arr.shape[1] % 128 == 0
        assert arr.shape[0] >= roi.BLK_ROWS and arr.shape[1] >= roi.BLK_COLS


def test_scales_kernel_matches_per_scale_extraction():
    """extract_patches_scales_pallas (one DMA per track feeding all scale
    resamples) == K separate extract_patches_pallas calls wherever all
    scale windows select the same pyramid level (non-straddling tracks);
    straddling tracks agree within the mip-level approximation."""
    rng = np.random.default_rng(1)
    frame = rng.random((240, 320)).astype(np.float32)
    # Small boxes: every scale window well under MAX_WIN -> all level 0.
    boxes = np.array([[70.0, 50.0, 20.0, 26.0],
                      [150.0, 120.0, 40.0, 30.0],
                      [250.0, 60.0, 16.0, 16.0]], np.float32)
    scales = (1 / 1.05, 1.0, 1.05)
    got = np.asarray(roi.extract_patches_scales_pallas(
        jnp.asarray(frame), jnp.asarray(boxes), 2.5, 64, scales,
        interpret=True, dtype=jnp.float32))            # [3, T, S, S]
    for k, sv in enumerate(scales):
        want = np.asarray(roi.extract_patches_pallas(
            jnp.asarray(frame), jnp.asarray(boxes), 2.5, 64,
            jnp.full((3,), sv, jnp.float32), interpret=True,
            dtype=jnp.float32))
        np.testing.assert_allclose(got[k], want, rtol=1e-5, atol=1e-5,
                                   err_msg=f"scale {sv}")


def test_scales_kernel_straddling_level_boundary():
    """A box whose scale windows straddle a pyramid-level boundary: the
    shared-DMA kernel samples the max-scale level for all scales — finite
    output, close to the per-scale formulation within the level-resample
    approximation."""
    rng = np.random.default_rng(2)
    # Smooth low-frequency texture (the natural-image regime the mip
    # approximation is designed for — on white noise a level-1 resample
    # legitimately differs by ~the noise sigma).
    frame = np.kron(rng.random((60, 80)),
                    np.ones((8, 8))).astype(np.float32)
    # win = 50 * 2.5 = 125 at unit scale; 1.05 scale -> 131 > MAX_WIN:
    # unit/min scales pick level 0 per-scale, max scale picks level 1.
    boxes = np.array([[300.0, 240.0, 50.0, 50.0]], np.float32)
    scales = (1 / 1.05, 1.0, 1.05)
    got = np.asarray(roi.extract_patches_scales_pallas(
        jnp.asarray(frame), jnp.asarray(boxes), 2.5, 64, scales,
        interpret=True, dtype=jnp.float32))
    assert np.isfinite(got).all()
    for k, sv in enumerate(scales):
        want = np.asarray(roi.extract_patches_pallas(
            jnp.asarray(frame), jnp.asarray(boxes), 2.5, 64,
            jnp.full((1,), sv, jnp.float32), interpret=True,
            dtype=jnp.float32))
        # max scale shares the level -> exact; smaller scales sample one
        # level coarser than per-scale would: same approximation class
        # as the pyramid (small on smooth content).
        assert np.mean(np.abs(got[k] - want)) < 0.03, (
            k, sv, float(np.mean(np.abs(got[k] - want))))


def test_scales_kernel_u8_pyramid():
    """u8 ingest frames ride the shared-DMA scale kernel with the dequant
    folded into the weights (parity with the f32 pyramid)."""
    rng = np.random.default_rng(3)
    frame_u8 = (rng.random((240, 320)) * 255).astype(np.uint8)
    boxes = np.array([[70.0, 50.0, 20.0, 26.0],
                      [150.0, 120.0, 40.0, 30.0]], np.float32)
    scales = (1 / 1.05, 1.0, 1.05)
    levels = roi.build_pyramid(jnp.asarray(frame_u8))
    got_u8 = np.asarray(roi.extract_patches_scales_pallas(
        jnp.asarray(frame_u8), jnp.asarray(boxes), 2.5, 64, scales,
        interpret=True, levels=levels, frame_hw=frame_u8.shape))
    got_f32 = np.asarray(roi.extract_patches_scales_pallas(
        jnp.asarray(frame_u8.astype(np.float32) / 255.0),
        jnp.asarray(boxes), 2.5, 64, scales, interpret=True,
        dtype=jnp.float32))
    np.testing.assert_allclose(got_u8, got_f32, atol=3e-3)
