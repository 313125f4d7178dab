"""TPU-tier Pallas parity harness (VERDICT r1 next #6).

The CPU test tier can only run Pallas kernels in interpret mode, so
Mosaic-compiled behavior (DMA alignment, pl.multiple_of claims, layout
passes, precision modes) is invisible to it.  This script runs on the real
TPU and asserts, elementwise:

  1. kernels/roi.extract_patches_pallas  vs  ops/patch.extract_patches
     - level-0 boxes (window <= 128 px), f32 pyramid, HIGHEST resample
       dots: near-exact (atol 1e-4)
     - shipped config (bf16 pyramid, DEFAULT dots): within quantization
       tolerance (atol 8e-3 on [0,1] pixels)
     - higher mip levels + frame-edge boxes: structural tolerance
  2. kernels/kcf detect/train (compiled)  vs  a float64 NumPy oracle:
     response/model errors at f32 round-off (the XLA einsum path sits at
     ~1e-3 on TPU for comparison, measured 2026-08-16).

Run in the bench session:  python tools/tpu_parity.py
Commit the printed log (tools/tpu_parity_rN.log) with the round.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def _boxes_level0_and_edges(h, w, rng, n=32):
    """Mixed box set: small (level-0) boxes, frame-edge/corner boxes."""
    boxes = np.zeros((n, 4), np.float32)
    # Small interior boxes: window = 2.5 * size <= 128 -> size <= 51.
    boxes[:, 0] = rng.uniform(80, w - 80, n)
    boxes[:, 1] = rng.uniform(80, h - 80, n)
    boxes[:, 2] = rng.uniform(16, 48, n)
    boxes[:, 3] = rng.uniform(16, 48, n)
    # Edge/corner cases overwrite the first 6 slots.
    boxes[0] = (2.0, 2.0, 24, 24)               # top-left corner overhang
    boxes[1] = (w - 2.0, h - 2.0, 24, 24)       # bottom-right overhang
    boxes[2] = (w / 2, 1.0, 30, 30)             # top edge
    boxes[3] = (1.0, h / 2, 30, 30)             # left edge
    boxes[4] = (w - 1.0, h / 2, 48, 20)         # right edge, non-square
    boxes[5] = (w / 2, h - 1.0, 20, 48)         # bottom edge
    return boxes


def check_roi():
    from tpu_mot.kernels import roi
    from tpu_mot.ops import patch

    h, w = 1080, 1920
    size = 64
    padding = 2.5
    rng = np.random.default_rng(0)
    gray = jnp.asarray(rng.random((h, w)).astype(np.float32))
    results = {}

    # --- level-0 boxes, f32 pyramid, HIGHEST dots: near-exact ----------
    boxes = jnp.asarray(_boxes_level0_and_edges(h, w, rng))
    want = np.asarray(jax.jit(
        lambda g, b: patch.extract_patches(g, b, padding, size))(gray,
                                                                 boxes))
    old_prec = roi._DOT_PRECISION
    try:
        roi._DOT_PRECISION = jax.lax.Precision.HIGHEST
        levels32 = jax.jit(
            lambda g: roi.build_pyramid(g, dtype=jnp.float32))(gray)
        got = np.asarray(jax.jit(
            lambda g, b, ls: roi.extract_patches_pallas(
                g, b, padding, size, levels=ls, frame_hw=(h, w)))(
            gray, boxes, levels32))
    finally:
        roi._DOT_PRECISION = old_prec
        jax.clear_caches()
    err = np.abs(got - want).max()
    results["roi level0 f32/HIGHEST maxabs"] = float(err)
    assert err < 1e-4, f"level-0 exact parity broken: {err}"

    # --- shipped config (bf16 pyramid, DEFAULT dots) --------------------
    levels = jax.jit(roi.build_pyramid)(gray)
    got = np.asarray(jax.jit(
        lambda g, b, ls: roi.extract_patches_pallas(
            g, b, padding, size, levels=ls, frame_hw=(h, w)))(
        gray, boxes, levels))
    err = np.abs(got - want).max()
    results["roi level0 shipped maxabs"] = float(err)
    assert err < 8e-3, f"shipped-config quantization out of budget: {err}"

    # --- u8 ingest pyramid (the shipped default for uint8 frames) -------
    # Level-0 u8 sampling dequantizes exactly (u8/255), so the only error
    # vs the f32-gray oracle is the DEFAULT-precision dot rounding.
    frame_u8 = jnp.asarray(
        (np.asarray(gray) * 255.0).round().astype(np.uint8))
    gray_q = frame_u8.astype(jnp.float32) / 255.0    # oracle sees u8 grid
    want_q = np.asarray(jax.jit(
        lambda g, b: patch.extract_patches(g, b, padding, size))(gray_q,
                                                                 boxes))
    levels_u8 = jax.jit(roi.build_pyramid)(frame_u8)
    assert all(lv.dtype == jnp.uint8 for lv in levels_u8)
    got_u8 = np.asarray(jax.jit(
        lambda f, b, ls: roi.extract_patches_pallas(
            f, b, padding, size, levels=ls, frame_hw=(h, w)))(
        frame_u8, boxes, levels_u8))
    err = np.abs(got_u8 - want_q).max()
    results["roi level0 u8-pyramid maxabs"] = float(err)
    assert err < 8e-3, f"u8-pyramid parity out of budget: {err}"

    # --- big boxes -> higher mip levels ---------------------------------
    # Oracle = XLA bilinear sampling of the SAME pyramid level with the
    # SAME coordinate mapping — this isolates Mosaic correctness (window
    # DMA alignment, block-origin clamps, level dispatch) from the
    # deliberate mip-prefilter design difference, which is covered by the
    # bench MOTA gate instead.
    big = np.zeros((8, 4), np.float32)
    big[:, 0] = rng.uniform(300, w - 300, 8)
    big[:, 1] = rng.uniform(200, h - 200, 8)
    big[:, 2] = rng.uniform(80, 300, 8)        # window up to 750 px (lvl 3)
    big[:, 3] = rng.uniform(80, 300, 8)
    bigj = jnp.asarray(big)

    def xla_mip_oracle(gray, boxes, levels_list):
        lvl, win_w, win_h, cx, cy = roi._sample_coords(
            boxes, padding, size, None)
        scale = jnp.asarray([float(1 << k)
                             for k in range(roi.N_LEVELS)])[lvl]   # [T]
        shapes = roi._level_shapes(h, w)
        lh = jnp.asarray([-(-h // (1 << k))
                          for k in range(roi.N_LEVELS)],
                         jnp.float32)[lvl]
        lw = jnp.asarray([-(-w // (1 << k))
                          for k in range(roi.N_LEVELS)],
                         jnp.float32)[lvl]
        u = (jnp.arange(size, dtype=jnp.float32) + 0.5) / size - 0.5
        ys = jnp.clip((cy[:, None] + u[None, :] * win_h[:, None] + 0.5)
                      / scale[:, None] - 0.5, 0.0, (lh - 1.0)[:, None])
        xs = jnp.clip((cx[:, None] + u[None, :] * win_w[:, None] + 0.5)
                      / scale[:, None] - 0.5, 0.0, (lw - 1.0)[:, None])
        outs = []
        for k in range(roi.N_LEVELS):
            img = levels_list[k].astype(jnp.float32)
            outs.append(patch.bilinear_sample(img, ys, xs))
        stacked = jnp.stack(outs)                    # [L, T, S, S]
        return jnp.take_along_axis(
            stacked, lvl[None, :, None, None], axis=0)[0]

    old_prec = roi._DOT_PRECISION
    try:
        roi._DOT_PRECISION = jax.lax.Precision.HIGHEST
        want_b = np.asarray(jax.jit(
            lambda g, b, ls: xla_mip_oracle(g, b, ls))(gray, bigj,
                                                       levels32))
        got_b = np.asarray(jax.jit(
            lambda g, b, ls: roi.extract_patches_pallas(
                g, b, padding, size, levels=ls, frame_hw=(h, w)))(
            gray, bigj, levels32))
    finally:
        roi._DOT_PRECISION = old_prec
        jax.clear_caches()
    merr = np.abs(got_b - want_b).max()
    results["roi mip same-level maxabs"] = float(merr)
    assert merr < 1e-4, f"mip-level kernel drift vs XLA oracle: {merr}"

    # --- shared-DMA scales kernel (r3): compiled vs per-scale kernel ----
    # Level-0 boxes: every scale window selects level 0 in both
    # formulations, so the shared-DMA kernel must match the per-scale
    # kernel exactly (same weights, same block, same dots).
    scale_tuple = (1 / 1.05, 1.0, 1.05)
    got_s = np.asarray(jax.jit(
        lambda f, b, ls: roi.extract_patches_scales_pallas(
            f, b, padding, size, scale_tuple, levels=ls,
            frame_hw=(h, w)))(frame_u8, boxes, levels_u8))
    serr = 0.0
    for k, sv in enumerate(scale_tuple):
        per = np.asarray(jax.jit(
            lambda f, b, ls, _sv=sv: roi.extract_patches_pallas(
                f, b, padding, size,
                jnp.full((b.shape[0],), _sv, jnp.float32), levels=ls,
                frame_hw=(h, w)))(frame_u8, boxes, levels_u8))
        serr = max(serr, float(np.abs(got_s[k] - per).max()))
    results["roi scales-kernel vs per-scale maxabs"] = serr
    assert serr < 8e-3, f"scales-kernel parity out of budget: {serr}"
    return results


def check_kcf():
    from tpu_mot.kernels import kcf as fused
    from tpu_mot.ops import kcf as kcf_ops

    rng = np.random.default_rng(0)
    t, c, s = 128, 1, 64
    feat0 = rng.standard_normal((t, c, s, s)).astype(np.float32) * 0.3
    yf = kcf_ops.make_yf(s, 2.5, 0.125, backend="matmul")
    model = jax.tree.map(jnp.asarray, kcf_ops.train(
        jnp.asarray(feat0), yf, 0.2, 1e-4, backend="matmul"))
    feat_np = rng.standard_normal((t, c, s, s)).astype(np.float32) * 0.3
    feat = jnp.asarray(feat_np)
    results = {}

    # float64 oracle of the detect chain from the same model spectra.
    xf = (np.asarray(model.xf.re, np.float64)
          + 1j * np.asarray(model.xf.im, np.float64))
    af = (np.asarray(model.alphaf.re, np.float64)
          + 1j * np.asarray(model.alphaf.im, np.float64))
    resp64 = np.zeros((t, s, s))
    for ti in range(t):
        zf = np.fft.rfft2(feat_np[ti].astype(np.float64))
        zz = (feat_np[ti].astype(np.float64) ** 2).sum()
        xx = sum((np.fft.irfft2(xf[ti, ch], s=(s, s)) ** 2).sum()
                 for ch in range(c))
        cross_f = (zf * np.conj(xf[ti])).sum(axis=0)
        cross = np.fft.irfft2(cross_f, s=(s, s))
        d = np.maximum(xx + zz - 2 * cross, 0.0)
        k = np.exp(-d / (0.2 * 0.2 * s * s * c))
        resp64[ti] = np.fft.irfft2(np.fft.rfft2(k) * af[ti], s=(s, s))
    scale = np.abs(resp64).max()

    got = np.asarray(jax.jit(
        lambda m, f: fused.detect_fused(m, f, 0.2))(model, feat))
    err = np.abs(got - resp64).max()
    results["kcf detect maxabs vs f64 (resp scale %.3f)" % scale] = float(err)
    assert err < scale * 1e-3, f"fused detect drift: {err} vs {scale}"

    xla = np.asarray(jax.jit(
        lambda m, f: kcf_ops.detect(m, f, 0.2, backend="matmul"))(model,
                                                                  feat))
    results["kcf detect XLA-path maxabs vs f64 (context)"] = float(
        np.abs(xla - resp64).max())

    # Detect response under the SHIPPED fwd_high mode, where the
    # response-class assignment puts detect's rfft2(k) at DEFAULT
    # (ops/kcf.gaussian_correlation response_only).  Measured envelope
    # on the v5e: 4.0e-2 relative (tools/bench_respclass_r4.log run,
    # 2026-08-19) — an order above the inverse-only bf16 error because
    # the forward DFT of k now rounds too, but still behaviorally
    # invisible: the sub-pixel peak, PSR gate, bench MOTA 0.9688 and
    # the bounce fixture (IDF1 0.9873, the probe that DOES catch the
    # divide-class corruption at 0.70) are all unchanged.  The bound
    # here is a regression tripwire at 2x the measured value, not an
    # accuracy requirement — the behavioral gates live in
    # tools/bounce_fixture_tpu.py and bench.py's MOTA sanity.
    from tpu_mot.ops import fft as _fft_ops
    with _fft_ops.precision_scope("fwd_high"):
        xla_fh = np.asarray(jax.jit(
            lambda m, f: kcf_ops.detect(m, f, 0.2, backend="matmul"))(
                model, feat))
    rel_fh = float(np.abs(xla_fh - resp64).max()) / scale
    results["kcf detect fwd_high (response-class fwd) rel-err"] = rel_fh
    assert rel_fh < 8e-2, rel_fh

    # Train: float64 oracle (comparing against the XLA path instead would
    # measure ITS default-precision error, ~1e-3 relative, not the
    # kernel's).
    lr_np = rng.uniform(0, 1, (t,)).astype(np.float32)
    lr = jnp.asarray(lr_np)
    yf64 = (np.asarray(yf.re, np.float64)
            + 1j * np.asarray(yf.im, np.float64))
    want = {"xf.re": np.zeros((t, c, s, s // 2 + 1)),
            "xf.im": np.zeros((t, c, s, s // 2 + 1)),
            "alphaf.re": np.zeros((t, s, s // 2 + 1)),
            "alphaf.im": np.zeros((t, s, s // 2 + 1))}
    for ti in range(t):
        f64 = feat_np[ti].astype(np.float64)
        xf_new = np.fft.rfft2(f64)                       # [C, S, Sf]
        xx2 = (f64 ** 2).sum()
        cross = np.fft.irfft2((xf_new * np.conj(xf_new)).sum(axis=0),
                              s=(s, s))
        dd = np.maximum(2 * xx2 - 2 * cross, 0.0)
        kf = np.fft.rfft2(np.exp(-dd / (0.2 * 0.2 * s * s * c)))
        af_new = yf64 / (kf + 1e-4)
        lv = float(lr_np[ti])
        want["xf.re"][ti] = (xf[ti].real * (1 - lv) + xf_new.real * lv)
        want["xf.im"][ti] = (xf[ti].imag * (1 - lv) + xf_new.imag * lv)
        want["alphaf.re"][ti] = (af[ti].real * (1 - lv)
                                 + af_new.real * lv)
        want["alphaf.im"][ti] = (af[ti].imag * (1 - lv)
                                 + af_new.imag * lv)
    got_m = jax.jit(lambda m, f, l: fused.train_fused(
        m, f, yf, 0.2, 1e-4, l))(model, feat, lr)
    for name in ("xf", "alphaf"):
        for part in ("re", "im"):
            g = np.asarray(getattr(getattr(got_m, name), part))
            wv = want[f"{name}.{part}"]
            e = np.abs(g - wv).max()
            sc = max(np.abs(wv).max(), 1e-6)
            results[f"kcf train {name}.{part} maxabs vs f64 "
                    f"(scale {sc:.2e})"] = float(e)
            assert e < sc * 1e-4 + 1e-5, f"train {name}.{part}: {e}"

    # XLA-chain train accuracy per precision MODE (the r4 shipped default
    # is kcf_precision="auto" -> "fwd_high"; the bounce-fixture rescue's
    # corruption channel is alphaf through the spectral divide).  The
    # pre-blend alphaf oracle:
    from tpu_mot.ops import fft as fft_ops
    af_new64 = np.zeros((t, s, s // 2 + 1), np.complex128)
    for ti in range(t):
        f64 = feat_np[ti].astype(np.float64)
        xf_new = np.fft.rfft2(f64)
        xx2 = (f64 ** 2).sum()
        cross = np.fft.irfft2((xf_new * np.conj(xf_new)).sum(axis=0),
                              s=(s, s))
        dd = np.maximum(2 * xx2 - 2 * cross, 0.0)
        kf = np.fft.rfft2(np.exp(-dd / (0.2 * 0.2 * s * s * c)))
        af_new64[ti] = yf64 / (kf + 1e-4)
    sc = max(np.abs(af_new64.real).max(), np.abs(af_new64.imag).max())
    rel = {}
    for mode in ("default", "fwd_high", "high", "highest"):
        with fft_ops.precision_scope(mode):
            got_t = jax.jit(lambda f: kcf_ops.train(
                f, yf, 0.2, 1e-4, backend="matmul"))(feat)
        e = max(np.abs(np.asarray(got_t.alphaf.re) - af_new64.real).max(),
                np.abs(np.asarray(got_t.alphaf.im) - af_new64.imag).max())
        rel[mode] = float(e) / sc
        results[f"kcf train XLA {mode} alphaf rel-err vs f64"] = rel[mode]
    # Measured ladder (2026-08-19 v5e, tools/tpu_parity_r4b.log):
    # default 2.4e-2, fwd_high 4.6e-3, high 1.2e-4, highest 5.1e-6.
    # fwd_high's alphaf error is limited by the mid-chain INVERSE DFT
    # (autocorrelation surface) which it deliberately leaves at bf16 —
    # the bounce-fixture rescue comes from the forward spectra, and
    # 4.6e-3 relative alphaf error is empirically sufficient (identical
    # HOTA/fixture results to uniform HIGH at +8% throughput).  Assert
    # the measured separations with margin, not a speculative bound.
    assert rel["fwd_high"] < rel["default"] / 3, rel
    assert rel["high"] < rel["fwd_high"] / 3, rel
    assert rel["highest"] < rel["high"] / 3, rel
    return results



def check_auction():
    """Compiled whole-solve auction kernel (kernels/auction.py) vs scipy
    optimal and the XLA while_loop formulation at the bench shape."""
    from tpu_mot.ops import assignment, iou as iou_ops

    t_cap, d_cap = 128, 160
    results = {}
    worst = 0.0
    for seed in range(4):
        r = np.random.default_rng(seed)
        tracks = r.uniform(50, 1800, (t_cap, 4)).astype(np.float32)
        tracks[:, 1] = r.uniform(50, 1000, t_cap)
        tracks[:, 2:] = r.uniform(24, 64, (t_cap, 2))
        dets = np.concatenate(
            [tracks[:110] + r.normal(0, 4, (110, 4)),
             r.uniform(50, 1000, (50, 4))]).astype(np.float32)
        cost = np.asarray(iou_ops.association_cost(
            jnp.asarray(tracks), jnp.asarray(dets),
            jnp.ones((t_cap,), bool), jnp.ones((d_cap,), bool),
            iou_gate=0.1, infeasible=1e4)).astype(np.float32)
        feas = cost < 1e3
        want = assignment.scipy_assign(cost, feas)
        for impl in ("xla", "pallas"):
            got, _, conv = assignment.auction_assign_stats(
                jnp.asarray(cost), jnp.asarray(feas), impl=impl)
            got = np.asarray(got)
            assert bool(conv), (seed, impl)
            assert (got >= 0).sum() == (want >= 0).sum(), (seed, impl)
            gap = float(assignment.assignment_cost(cost, got)
                        - assignment.assignment_cost(cost, want))
            assert gap <= 0.05, (seed, impl, gap)
            worst = max(worst, gap)
    results["auction compiled eps-optimality gap vs scipy (worst)"] = worst
    return results


def main():
    dev = jax.devices()[0]
    print(f"device: {dev}")
    if dev.platform == "cpu":
        print("WARNING: running on CPU — this harness is meant for the "
              "TPU tier (kernels fall back to interpret=False compiled "
              "CPU lowering, which may not exist). Aborting.")
        return 2
    all_results = {}
    failures = []
    # Each check is isolated: a hardware abort in one must not silence
    # the remaining checks — the harness reports every failure and
    # exits nonzero at the end.  (A non-gating child-process "pyramid"
    # check existed while the knob-closed fused-pyramid kernel shipped;
    # kernel and check were deleted r5 — docs/BENCHMARKS.md r4 pyramid
    # section keeps the instability record.)
    non_gating = set()
    for name, fn in [("roi", check_roi), ("kcf", check_kcf),
                     ("auction", check_auction)]:
        try:
            res = fn()
        except Exception as e:  # noqa: BLE001 — report-and-continue harness
            import traceback
            if name in non_gating:
                print(f"FAIL (non-gating) {name}: {type(e).__name__}: {e}")
            else:
                failures.append(name)
                print(f"FAIL {name}: {type(e).__name__}: {e}")
            traceback.print_exc()
            continue
        all_results.update(res)
        for k, v in res.items():
            print(f"PASS {k}: {v:.3e}")
    if failures:
        print(f"TPU PARITY: FAILURES in {failures}")
        return 1
    print("TPU PARITY: ALL PASS (gating checks)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
