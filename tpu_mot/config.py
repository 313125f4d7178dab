"""Configuration for the TPU-native MOT framework.

The C++ reference (huangfcn/multiple-object-tracking; mount was empty at survey
time, see SURVEY.md §0) hardcodes its hyper-parameters as compile-time
constants (KCF lambda/sigma/interp factor, patch size, association gates,
track lifecycle ages).  Here every knob lives in one frozen, hashable
dataclass so it can be passed as a jit static argument — the whole per-frame
step specializes on it at trace time, exactly like the reference's #defines
specialize its C code at compile time (SURVEY.md §5 "Config / flag system").
"""

from __future__ import annotations

import dataclasses


@dataclasses.dataclass(frozen=True)
class KCFConfig:
    """Hyper-parameters of the KCF correlation-filter core.

    Defaults follow the published KCF raw-pixel configuration
    (arXiv:1404.7584 §8 / Table 1) and the common C++ KCF lineage the
    reference belongs to (SURVEY.md §2 rows fft2d..kcf_detect).
    """

    # Template (patch) size in pixels; BASELINE.json configs[1] fixes 64x64.
    template_size: int = 64
    # Context padding: the tracked window covers padding * target box.
    padding: float = 2.5
    # Ridge-regression regularizer lambda (arXiv:1404.7584 eq. 17).
    lambda_: float = 1e-4
    # Gaussian kernel bandwidth sigma (arXiv:1404.7584 eq. 31).
    kernel_sigma: float = 0.2
    # Desired-response bandwidth: sigma_y = sqrt(h*w) / padding * this.
    output_sigma_factor: float = 0.125
    # Model EMA learning rate ("interp factor" in the C lineage).
    interp_factor: float = 0.075
    # Feature type: "gray" (raw pixels, 1 channel) or "hog" (fHOG, 31
    # channels over cell_size x cell_size cells — the KCF-HOG mode of the
    # reference lineage, arXiv:1404.7584 §8).
    feature_type: str = "gray"
    cell_size: int = 1
    # Multi-scale search: scale step (1.0 disables; 1.05 = +-5% pyramid).
    scale_step: float = 1.0
    # Penalty applied to non-unit scale responses (scale hysteresis).
    scale_weight: float = 0.95

    def __post_init__(self):
        if self.template_size % self.cell_size != 0:
            raise ValueError(
                f"template_size ({self.template_size}) must be a multiple "
                f"of cell_size ({self.cell_size})")
        if self.template_size // self.cell_size < 2:
            raise ValueError(
                "feature_size (template_size // cell_size = "
                f"{self.template_size // self.cell_size}) must be >= 2 — a "
                "1-pixel feature map degenerates the Hann window and FFT")
        if self.feature_type not in ("gray", "hog"):
            raise ValueError(f"unknown feature_type {self.feature_type!r}")
        if self.padding <= 0:
            raise ValueError("padding must be positive")
        if self.scale_step < 1.0:
            raise ValueError("scale_step must be >= 1.0 (1.0 disables)")

    @property
    def feature_size(self) -> int:
        """Spatial extent of the feature map the FFT runs on."""
        return self.template_size // self.cell_size

    @property
    def num_channels(self) -> int:
        return 31 if self.feature_type == "hog" else 1

    @property
    def spectrum_width(self) -> int:
        """Width of the rfft2 half-spectrum."""
        return self.feature_size // 2 + 1


@dataclasses.dataclass(frozen=True)
class KalmanConfig:
    """Constant-velocity Kalman filter over box state [cx, cy, w, h, v*4].

    The reference hand-rolls small-matrix KF per track (SURVEY.md §2 row
    "kalman"); noise scales follow the SORT lineage.
    """

    pos_std_factor: float = 1.0 / 20.0   # measurement std ~ box size
    init_vel_cov: float = 1e4            # uninformative velocity prior
    process_pos_std: float = 1.0 / 20.0
    process_vel_std: float = 1.0 / 160.0


@dataclasses.dataclass(frozen=True)
class TrackerConfig:
    """Full MOT pipeline configuration (SURVEY.md §2 row "multitracker")."""

    kcf: KCFConfig = KCFConfig()
    kalman: KalmanConfig = KalmanConfig()

    # Static capacity of the track bank (slots). BASELINE north star: 128.
    max_tracks: int = 128
    # Static per-frame detection capacity (padding target).
    max_detections: int = 64

    # Association.  Defaults validated by tools/sweep_defaults.py
    # (occlusion+clutter, 2026-08-16) and tools/sweep_appearance.py
    # (adversarial bounce/cross fixtures, 2026-08-17,
    # tools/sweep_appearance_r3.log): the appearance cost blend is
    # MEASURED REDUNDANT in this architecture — identical MOTA/IDF1/IDSW
    # at every w in {0..0.7} on (a) generic clutter, (b) motion-reversal
    # bounces and dropout-masked crossings with distinct textures, and
    # (c) a direct ambiguous-decoy probe — because the KCF refinement
    # step injects the same appearance signal upstream (refined boxes sit
    # on the matching texture BEFORE IoU is computed; distinct-texture
    # crossings score IDF1 0.97 vs 0.51 for identical textures at w=0).
    # The blend stays implemented (ops/iou.association_cost) and
    # CLI-selectable for refinement-off configurations; the default is
    # the value the evidence supports.
    iou_gate: float = 0.3          # min IoU for a feasible match
    appearance_weight: float = 0.0  # cost = (1-w)*(1-IoU) + w*(1-appearance)
    cost_infeasible: float = 1e4   # cost assigned to gated pairs
    # Carry the auction's (prices, matching) across frames and warm-start
    # the next solve (ops/assignment.auction_assign_warm).  Implemented,
    # proven optimality-safe, and MEASURED A LOSS on the bench fixture
    # (tools/sweep_warm_auction.py, 2026-08-17): a gap-bidding auction
    # terminates with every pair at eps-indifference, so per-frame cost
    # noise breaks roughly half the carried pairs, the budgeted warm
    # phase burns its rounds and falls back cold — mean assign_iters 11.5
    # warm vs 6.0 cold, identical MOTA/IDF1/IDSW.  Default off; the flag
    # stays for near-static-scene deployments (the one fixture frame
    # where the carry held converged in 3 rounds vs 6).
    auction_warm_start: bool = False
    # Class-aware association: detections may carry a class id as a 6th
    # column (dets [D, 6]; models.detector.dets_with_classes builds it).
    # With class_aware=True a track only matches detections of the class
    # it was born with (cross-class pairs are gated infeasible, exactly
    # like the IoU gate), tracks record their class in bank.cls, and
    # StepOutput.cls surfaces it.  Off by default: the reference pipeline
    # tracks a single detector class.  5-column detections under
    # class_aware=True are treated as all class 0 (the gate is trivially
    # true, matching the single-class semantics).
    class_aware: bool = False
    # Which track box hypothesis the association cost scores against the
    # detections: "refined" (the KCF-refined box — the reference blends
    # appearance into association this way), "predicted" (raw Kalman
    # prediction, plain-SORT), or "best" (each pair takes the better IoU
    # of the two — an appearance lock onto a look-alike cannot veto a
    # motion-consistent match; see the identical-texture bounce demo,
    # examples/class_aware_mot.py).  Default "auto" resolves per
    # class_aware (assoc_box_resolved): "refined" single-class, "best"
    # class-aware — the r3c matrix (docs/BENCHMARKS.md;
    # tests/test_class_aware.py bounce fixture) showed class_aware +
    # "refined" lands in its worst regime (gate-only MOTA 0.488, phantom
    # coasting on the gated look-alike) while "best" restores 0.975;
    # VERDICT r3 weak #4 flagged the uncoupled defaults as a user trap.
    assoc_box: str = "auto"

    # Lifecycle (SORT-style tentative/confirmed/lost state machine).
    # n_init 3 -> 2 and max_age_tentative 1 -> 2 (r5, 2026-08-19,
    # tools/bench_hard_sweep_r5.log + the canonical-fixture A/B in the
    # same commit): one frame less birth delay and one missed frame of
    # tentative grace lift the canonical fixture MOTA 0.9688 -> 0.9844 /
    # HOTA 0.923 -> 0.9374 (the whole late-birth gap measured by
    # tools/hota_ceiling.py) and the dropout+FP hard fixture HOTA
    # 0.847 -> 0.874.  n_init=1 COLLAPSES under false positives (every
    # FP births an emitted track: hard-fixture DetA 0.85 -> 0.52) — at
    # FP rates well above ~4/frame@1080p the SORT-lineage n_init=3 may
    # be the safer operating point.
    n_init: int = 2                # hits to confirm a tentative track
    max_age: int = 30              # frames unmatched before a track dies
    max_age_tentative: int = 2     # unmatched frames allowed while tentative

    # KCF integration: run correlation detect to refine predicted boxes.
    use_kcf: bool = True
    # Minimum KCF confidence to trust the correlation update; interpreted
    # per confidence_mode: "peak" (raw max response) or "psr"
    # (peak-to-sidelobe ratio, the MOSSE/KCF-lineage measure).  Defaults
    # validated by tools/sweep_defaults.py (2026-08-16): on the
    # occlusion+clutter fixture psr>=5 lifts MOTA 0.73->0.80 and halves ID
    # switches vs the ungated 0.0 default it replaces; PSR is
    # scale-invariant where raw-peak thresholds drift with feature type.
    # None = per-mode validated default (psr: 5.0, peak: 0.35) — a fixed
    # numeric default cannot serve both modes (raw peaks are <= ~1, so a
    # PSR-calibrated 5.0 would silently disable KCF in peak mode).
    min_psr: float | None = None
    confidence_mode: str = "psr"
    # Detection confidence floor.
    det_score_min: float = 0.0

    # Frame geometry (static shapes for jit).
    frame_height: int = 480
    frame_width: int = 640

    # ROI extraction implementation: "auto" | "pallas" | "xla"
    # (kernels/roi.py vs ops/patch.py; auto = pallas on TPU).
    roi_impl: str = "auto"
    # KCF FFT-chain implementation: "auto" | "pallas" | "xla"
    # (kernels/kcf.py fused VMEM-resident kernel vs ops/kcf.py einsums).
    # "auto" resolves to "xla" everywhere — the fused kernel is far more
    # accurate (3.6e-7 vs 1.3e-3 against a float64 oracle) but loses the
    # full-pipeline bench at every swept tuning point (see
    # ops/kcf._resolve_impl and docs/BENCHMARKS.md).
    kcf_impl: str = "auto"
    # DFT/KCF MXU dot precision.  "auto" (default) resolves per impl
    # (kcf_precision_resolved): the XLA einsum chain gets "fwd_high" —
    # forward feature DFTs at HIGH (3-pass bf16, ~f32-grade; bf16
    # forward spectra corrupt train()'s spectral divide — the r4 bounce
    # fixture collapsed IDF1 0.987 -> ~0.70 at DEFAULT and recovered
    # exactly at fwd HIGH), inverse response DFTs at DEFAULT (the
    # sub-pixel peak tolerates bf16; uniform-HIGH costs ~17% more bench
    # fps for no fixture gain, tools/bench_prec_*_r4.log).  The fused
    # Pallas kernel gets "highest" (Mosaic supports only HIGHEST/DEFAULT
    # dots; "highest" = 6-pass f32, 3.6e-7 vs float64 oracle,
    # tools/bench_kcf_v2_r2.log).  Explicit values: "highest" | "high" |
    # "fwd_high" | "default" (the last three XLA-chain only).  A
    # "fwd_split" constant-split mode was measured accuracy-equal to
    # "default" and removed — see ops/fft._MODES' comment for the record.
    kcf_precision: str = "auto"
    # Fused-kernel tracks per grid program (16 swept best on the v5e).
    kcf_block: int = 16
    # run_sequence lax.scan unroll factor.  >1 lets XLA schedule frame
    # t+1's detection-independent work (pyramid build, frame DMA) against
    # frame t's tracker math inside one fused body — the bounded version
    # of the r5 batched-pyramid hoist (which LOST 1.7% by prefetching the
    # whole chunk up front).  1 = the measured default (r5d bracketed A/B
    # on TPU: ctl 4985.9 / unroll=2 ... / ctl ...; see
    # docs/BENCHMARKS.md r5d section and tools/bench_unroll_*_r5d.log).
    scan_unroll: int = 1
    # (A pyramid_impl knob existed r3c-r4 for a fused one-pass Pallas
    # pyramid kernel; it lost its bench A/B decisively AND was
    # hardware-unstable, so kernel and knob were deleted in r5 — the
    # reduce_window chain in kernels/roi.build_pyramid is the one
    # implementation.  Record: docs/BENCHMARKS.md r4 pyramid section.)
    # Auction assignment implementation: "auto" | "pallas" | "xla"
    # (kernels/auction.py whole-solve-in-VMEM kernel vs
    # ops/assignment.py's lax.while_loop over HBM state).  "auto"
    # resolves to "pallas" on TPU per r4 bench evidence (0.0077 vs
    # 0.0246 ms standalone at 128x160; pipeline 4770 -> 5363 fps,
    # 2026-08-19 v5e, tools/bench_auction_r4.log +
    # bench_assign_pallas_r4.log) and "xla" elsewhere; equality is
    # pinned by tests on both paths.
    assign_impl: str = "auto"

    # Emit only confirmed tracks seen (matched) within this many frames
    # (SORT emits time_since_update < 1; large value = emit all confirmed
    # including coasting tracks, the KCF-pipeline default).
    output_max_tsu: int = 10 ** 6

    # KCF retrain sample site:
    #   "refined" — re-extract patches at the corrected boxes (the C
    #               lineage's behavior: a second ROI extraction + feature
    #               pass per frame);
    #   "detect"  — reuse the DETECT-site patch spectra, phase-aligned to
    #               the corrected centers in the Fourier domain
    #               (ops/kcf.shift_spectrum): no second extraction at
    #               all.  A spatial approximation within the same frame
    #               (circular edge wrap + window off-center by the
    #               sub-pixel displacement, both attenuated by the Hann
    #               window), NOT a temporal one.  Births initialize one
    #               frame late (lr=1 full overwrite on their first
    #               post-birth frame) and KCF refinement is gated off for
    #               that one frame.  Trains through the XLA einsum chain
    #               regardless of kcf_impl (the fused Pallas trainer
    #               takes raw patches, which this mode never builds).
    # Default "detect", validated 2026-08-17 (tools/bench_train_site.py,
    # tools/bench_train_site_r3.log): 1080p@128 default-gray 4009->5060
    # fps with BIT-IDENTICAL MOTA/IDF1/IDSW (0.9688/0.9841/0); heavy
    # fHOG+3-scale 2166->2629 fps and BETTER accuracy on the fixture
    # (MOTA 0.9688 vs 0.9531, 0 vs 2 IDSW); detector-outage coasting and
    # mass-birth parity pinned by tests/test_train_site.py.  "refined"
    # remains the reference-faithful comparison mode.
    train_site: str = "detect"

    def __post_init__(self):
        if self.train_site not in ("refined", "detect"):
            raise ValueError(f"unknown train_site {self.train_site!r}")
        if self.confidence_mode not in ("peak", "psr"):
            raise ValueError(
                f"unknown confidence_mode {self.confidence_mode!r}")
        if self.roi_impl not in ("auto", "pallas", "xla"):
            raise ValueError(f"unknown roi_impl {self.roi_impl!r}")
        if self.kcf_impl not in ("auto", "pallas", "xla"):
            raise ValueError(f"unknown kcf_impl {self.kcf_impl!r}")
        if self.assoc_box not in ("auto", "refined", "predicted", "best"):
            raise ValueError(f"unknown assoc_box {self.assoc_box!r}")
        if self.assign_impl not in ("auto", "pallas", "xla"):
            raise ValueError(f"unknown assign_impl {self.assign_impl!r}")
        if self.kcf_precision not in ("auto", "highest", "high",
                                      "fwd_high", "default"):
            raise ValueError(
                f"unknown kcf_precision {self.kcf_precision!r}")
        if (self.kcf_impl == "pallas"
                and self.kcf_precision in ("high", "fwd_high")):
            raise ValueError(
                f"kcf_precision={self.kcf_precision!r} applies to the XLA "
                "chain only (Mosaic supports only 'highest' and 'default' "
                "dots)")
        if self.kcf_block < 1:
            raise ValueError("kcf_block must be >= 1")
        if self.max_tracks < 1 or self.max_detections < 1:
            raise ValueError("max_tracks and max_detections must be >= 1")
        if self.frame_height < 1 or self.frame_width < 1:
            raise ValueError("frame dimensions must be positive")
        # The Pallas ROI kernel reads through a mip pyramid whose deepest
        # level caps the search window it can cover (kernels/roi.py
        # N_LEVELS/MAX_WIN: 128 * 2**3 = 1024 px); larger windows clamp to
        # the deepest level — a documented soft limit, not a config error.

    @property
    def kcf_precision_resolved(self) -> str:
        """kcf_precision with "auto" resolved per kcf_impl (see the field
        comment): "highest" on the fused Pallas kernel, "fwd_high" on the
        XLA chain (kcf_impl="auto" always resolves to the XLA chain —
        ops/kcf._resolve_impl)."""
        if self.kcf_precision != "auto":
            return self.kcf_precision
        return "highest" if self.kcf_impl == "pallas" else "fwd_high"

    @property
    def assoc_box_resolved(self) -> str:
        """assoc_box with "auto" resolved per class_aware (see comment)."""
        if self.assoc_box != "auto":
            return self.assoc_box
        return "best" if self.class_aware else "refined"

    @property
    def confidence_threshold(self) -> float:
        """min_psr resolved per confidence_mode (see min_psr comment)."""
        if self.min_psr is not None:
            return self.min_psr
        return 5.0 if self.confidence_mode == "psr" else 0.35

    def replace(self, **kw) -> "TrackerConfig":
        return dataclasses.replace(self, **kw)


DEFAULT_CONFIG = TrackerConfig()
