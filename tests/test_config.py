"""Config validation (__post_init__) + host-pipeline error-path tests
(VERDICT r1 weak #9 / ADVICE r1 items)."""

import numpy as np
import pytest

from tpu_mot.config import KCFConfig, TrackerConfig


def test_valid_defaults_construct():
    TrackerConfig()
    KCFConfig(feature_type="hog", cell_size=4)


@pytest.mark.parametrize("kw", [
    dict(cell_size=3),                      # 64 % 3 != 0
    dict(template_size=4, cell_size=4),     # feature_size == 1 (hann2d)
    dict(feature_type="sift"),
    dict(padding=0.0),
    dict(scale_step=0.9),
])
def test_bad_kcf_config_rejected(kw):
    with pytest.raises(ValueError):
        KCFConfig(**kw)


@pytest.mark.parametrize("kw", [
    dict(confidence_mode="apce"),
    dict(roi_impl="cuda"),
    dict(max_tracks=0),
    dict(frame_height=0),
])
def test_bad_tracker_config_rejected(kw):
    with pytest.raises(ValueError):
        TrackerConfig(**kw)


def test_step_rejects_frame_config_mismatch():
    """Pallas ROI path must refuse a frame whose shape disagrees with the
    config it derives clamp bounds from (ADVICE r1 medium #2)."""
    import jax.numpy as jnp
    from tpu_mot.tracker import bank as bank_mod, step as step_mod

    cfg = TrackerConfig(max_tracks=4, max_detections=4, frame_height=64,
                        frame_width=96, roi_impl="pallas")
    bank = bank_mod.empty_bank(cfg)
    frame = jnp.zeros((48, 96), jnp.float32)        # wrong height
    dets = jnp.zeros((4, 5), jnp.float32)
    valid = jnp.zeros((4,), bool)
    with pytest.raises(ValueError, match="frame shape"):
        step_mod.step(bank, frame, dets, valid, cfg)


def test_video_pipeline_propagates_decode_errors():
    """A mid-stream decode failure must raise in the consumer, not look
    like a clean EOF (ADVICE r1 low #5)."""
    from tpu_mot.data.video import ChunkedVideoPipeline

    def frames():
        yield np.zeros((8, 8), np.uint8)
        yield np.zeros((8, 8), np.uint8)
        raise OSError("decoder died mid-stream")

    pipe = ChunkedVideoPipeline(frames(), chunk=2)
    it = iter(pipe)
    next(it)                    # first full chunk arrives fine
    with pytest.raises(OSError, match="decoder died"):
        list(it)


def test_cli_synthetic_defaults_frames():
    """CLAUDE.md quickstart `mot --synthetic --score` must run without
    --frames (ADVICE r1 medium #1: it used to crash with TypeError)."""
    from tpu_mot.cli import main
    rc = main(["mot", "--synthetic", "--score", "--no-kcf",
               "--max-tracks", "8", "--max-dets", "8", "--objects", "2",
               "--chunk", "25"])
    assert rc == 0


def test_kcf_precision_auto_resolution():
    """kcf_precision="auto" (r4 default) resolves per impl: "fwd_high"
    on the XLA chain (forward feature DFTs at HIGH rescue the bf16
    spectral-divide corruption; inverse response DFTs stay DEFAULT),
    "highest" on the fused Pallas kernel (Mosaic has no HIGH dot).
    docs/BENCHMARKS.md r4 section carries the evidence."""
    from tpu_mot.config import TrackerConfig

    assert TrackerConfig().kcf_precision == "auto"
    assert TrackerConfig().kcf_precision_resolved == "fwd_high"
    assert (TrackerConfig(kcf_impl="pallas").kcf_precision_resolved
            == "highest")
    # Explicit settings win over the coupling.
    assert (TrackerConfig(kcf_precision="default").kcf_precision_resolved
            == "default")
    # XLA-only modes are rejected on the Pallas kernel at config time.
    for bad in ("high", "fwd_high"):
        with pytest.raises(ValueError, match="XLA chain only"):
            TrackerConfig(kcf_impl="pallas", kcf_precision=bad)
    with pytest.raises(ValueError, match="unknown kcf_precision"):
        TrackerConfig(kcf_precision="bf16")


def test_fft_precision_scope_modes():
    """precision_scope pins the (fwd, inv) einsum precisions at trace
    time and restores on exit; unknown modes are rejected."""
    from tpu_mot.ops import fft as fft_ops

    assert fft_ops.get_default_precision() == "highest"
    with fft_ops.precision_scope("fwd_high"):
        assert fft_ops.get_default_precision() == "fwd_high"
        with fft_ops.precision_scope("default"):
            assert fft_ops.get_default_precision() == "default"
        assert fft_ops.get_default_precision() == "fwd_high"
    assert fft_ops.get_default_precision() == "highest"
    with pytest.raises(ValueError, match="unknown fft precision"):
        fft_ops.precision_scope("bf16").__enter__()
