"""Fused Pallas KCF kernels: the whole FFT-domain detect / train chain of a
block of tracks stays VMEM-resident in a single grid program.

The unfused path (ops/kcf.py + ops/fft.py) is ~20 XLA einsum programs per
stage; every [T, S, S]-sized intermediate (2 MB at the bench shape) round-
trips HBM between them — the XLA chain is HBM-bandwidth-bound.  Here each
grid program loads a block of TB tracks' features + model once (~0.5 MB),
runs the entire chain on MXU/VPU from VMEM, and writes only the final
result:

  detect:  feat → ẑ = rfft2 → k̂ˣᶻ (Gaussian corr, arXiv:1404.7584 eq. 31)
           → IFFT(k̂ ⊙ α̂) → response                (eq. 22)
  train:   feat → x̂ = rfft2 → k̂ˣˣ → α̂ = ŷ/(k̂+λ)  (eq. 17)
           → per-track-lr EMA blend into the model bank

MXU formulation (this is what makes the kernel beat the XLA einsums, which
are already batched):

  * DFTs are the matmul formulation of ops/fft.py, but STACKED: the real
    and imaginary operator matrices are concatenated so each 2-D transform
    is TWO dots instead of six —
       [P|Q]   = x @ [BrT|BiT]                  (forward columns)
       [..4..] = [Pᵀ;Qᵀ] @ [F|Fi]               (forward rows, N = 2S)
    exploiting that DFT matrices are symmetric (Fᵀ = F).
  * All dots are batched over a TRACK BLOCK (TRACK_BLOCK = 16
    tracks/program, swept; ~1 MB of block inputs) by flattening the block
    into the M dimension: [TB·S, S] @ [S, 2S] shapes run the 128×128
    systolic array near-full instead of 64-wide.
  * Spectra live TRANSPOSED ([Sf, S]) between the two dots of a transform,
    so every dot is a right-multiplication and batches over tracks; the
    per-track transposes are minor-dim swaps on VMEM-resident tiles.
  * Hermitian fold-back weights and the 1/(H·W) scale are folded into the
    inverse column operator.

Spectra are split-complex (re, im) pairs — Pallas has no complex dtype
(ops/cfloat.py).  Model layout stays canonical ([.., S, Sf]) for
checkpoint/impl interchange; kernels transpose at the boundary.

Parity: tests/test_kcf_fused.py (interpret mode, CPU) asserts equality
with ops/kcf.py; the TPU-compiled kernel is additionally covered by
tools/tpu_parity.py and the bench MOTA gate.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpu_mot.ops import fft as fft_ops
from tpu_mot.ops.cfloat import CF
from tpu_mot.ops.kcf import KCFModel

# Tracks per grid program (pads T up to a multiple).  Swept on the v5e
# (tools/bench_kcf_v2_r2.log): 16 is ~1.8x faster than 8 (bigger stacked
# dots, fewer grid programs); 32 is flat; >=64 fails remote compile
# (VMEM / unroll blowup).  Default overridable per call and via
# config.kcf_block.
TRACK_BLOCK = 16

# f32 dots on the MXU: Mosaic supports DEFAULT and HIGHEST only.  HIGHEST
# (6-pass) measured 3.6e-7 max error vs a float64 oracle at the bench shape;
# DEFAULT (single-pass bf16 MXU) lands at the same ~1e-3 accuracy class as
# the XLA einsum chain but at ~1/3 the dot cost — both are selectable
# (config.kcf_precision), with per-variant numbers in docs/BENCHMARKS.md.
_PRECISIONS = {
    "highest": jax.lax.Precision.HIGHEST,
    "default": jax.lax.Precision.DEFAULT,
}


def _dot_with(prec):
    p = _PRECISIONS[prec]

    def _dot(a, b):
        return jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                                   precision=p,
                                   preferred_element_type=jnp.float32)
    return _dot


_CONST_NAMES = ("bst", "fst", "est", "gst", "wts")


@functools.lru_cache(maxsize=None)
def _consts(s: int):
    """Stacked DFT operator matrices for an s-point 2-D rFFT (NumPy f32).

    Pallas kernels may not capture array constants, so these are passed as
    broadcast inputs (every grid program maps block (0, 0))."""
    fr, fi = fft_ops._dft_mats(s, half=False)     # F [S, S], symmetric
    br, bi = fft_ops._dft_mats(s, half=True)      # B [Sf, S]
    er, ei = fft_ops._idft_mats(s, half=False)    # E [S, S], symmetric
    gr, gi = fft_ops._idft_mats(s, half=True)     # G [S, Sf]
    wts = fft_ops._hermitian_weights(s)           # [Sf]
    scale = 1.0 / (s * s)
    grtw = (wts[:, None] * gr.T) * scale          # [Sf, S]
    gitw = (wts[:, None] * gi.T) * scale
    return {
        "bst": np.ascontiguousarray(np.concatenate([br.T, bi.T], axis=1)),
        "fst": np.ascontiguousarray(np.concatenate([fr, fi], axis=1)),
        "est": np.ascontiguousarray(np.concatenate([er, ei], axis=1)),
        "gst": np.ascontiguousarray(np.concatenate([grtw, -gitw], axis=0)),
        "wts": np.ascontiguousarray(wts[:, None]),          # [Sf, 1]
    }


def _const_args(s: int):
    cs = _consts(s)
    return tuple(jnp.asarray(cs[k]) for k in _CONST_NAMES)


def _const_specs(s: int):
    cs = _consts(s)
    return [pl.BlockSpec(cs[k].shape, lambda i, *_: (0, 0),
                         memory_space=pltpu.VMEM) for k in _CONST_NAMES]


def _const_dict(refs):
    return {k: r[:] for k, r in zip(_CONST_NAMES, refs)}


def _rfft2t(x, c, s: int, sf: int, *, dot):
    """x [B, S, S] real → transposed half spectrum (zrT, ziT) [B, Sf, S].

    Two stacked dots + one batched minor-dim transpose."""
    b = x.shape[0]
    pq = dot(x.reshape(b * s, s), c["bst"]).reshape(b, s, 2 * sf)
    pqt = jnp.swapaxes(pq, 1, 2)                         # [B, 2Sf, S]
    o = dot(pqt.reshape(b * 2 * sf, s), c["fst"]).reshape(b, 2 * sf, 2 * s)
    zr = o[:, :sf, :s] - o[:, sf:, s:]                   # PᵀF − QᵀFi
    zi = o[:, sf:, :s] + o[:, :sf, s:]                   # QᵀF + PᵀFi
    return zr, zi


def _irfft2t(yrt, yit, c, s: int, sf: int, *, dot):
    """Transposed half spectrum [B, Sf, S] → real spatial x [B, S, S]
    (normal orientation).  Weights/scale pre-folded into gst."""
    b = yrt.shape[0]
    st = jnp.concatenate([yrt, yit], axis=1)             # [B, 2Sf, S]
    bb = dot(st.reshape(b * 2 * sf, s), c["est"]).reshape(b, 2 * sf, 2 * s)
    trb = jnp.swapaxes(bb, 1, 2)                         # [B, 2S, 2Sf]
    m = trb[:, :s, :sf] - trb[:, s:, sf:]                # (E Y)ᵀᵀ re
    n = trb[:, s:, :sf] + trb[:, :s, sf:]                # (E Y)ᵀᵀ im
    mn = jnp.concatenate([m, n], axis=2)                 # [B, S, 2Sf]
    return dot(mn.reshape(b * s, 2 * sf), c["gst"]).reshape(b, s, s)


def _energy_t(zrt, zit, c, s: int):
    """Parseval ||x||² per item from transposed spectra [B, Sf, S] →
    [B, 1, 1].  Reduced one axis at a time: Mosaic's layout pass aborts on
    a fused multi-axis reduce to [B, 1, 1] (bisected 2026-08-16)."""
    p = jnp.sum((zrt * zrt + zit * zit) * c["wts"][None],
                axis=2, keepdims=True)
    return jnp.sum(p, axis=1, keepdims=True) / (s * s)


def _gauss_corr_kft(cross, xx, zz, sigma: float, numel: int, c,
                    s: int, sf: int, *, dot):
    """k = exp(-max(xx+zz-2·cross, 0)/(σ²·numel)) → k̂ᵀ (one fwd).
    xx, zz: [B, 1, 1] energies."""
    d = jnp.maximum(xx + zz - 2.0 * cross, 0.0)
    k = jnp.exp(-d / (sigma * sigma * numel))
    return _rfft2t(k, c, s, sf, dot=dot)


def _tr(x):
    """Batched minor-dim transpose [..., A, B] → [..., B, A]."""
    return jnp.swapaxes(x, -1, -2)


def _detect_kernel(feat_ref, xfr_ref, xfi_ref, afr_ref, afi_ref,
                   *refs, sigma: float, s: int, nc: int, tb: int,
                   prec: str):
    out_ref = refs[-1]
    c = _const_dict(refs[:-1])
    dot = _dot_with(prec)
    sf = s // 2 + 1
    feat = feat_ref[:].reshape(tb * nc, s, s)
    zrt, zit = _rfft2t(feat, c, s, sf, dot=dot)              # [TB·C, Sf, S]
    xrt = _tr(xfr_ref[:].reshape(tb * nc, s, sf))        # model, transposed
    xit = _tr(xfi_ref[:].reshape(tb * nc, s, sf))
    # cross_f = Σ_c ẑ·conj(x̂); energies via Parseval, summed over channels.
    crt = (zrt * xrt + zit * xit).reshape(tb, nc, sf, s).sum(axis=1)
    cit = (zit * xrt - zrt * xit).reshape(tb, nc, sf, s).sum(axis=1)
    zz = _energy_t(zrt, zit, c, s).reshape(tb, nc, 1, 1).sum(axis=1)
    xx = _energy_t(xrt, xit, c, s).reshape(tb, nc, 1, 1).sum(axis=1)
    cross = _irfft2t(crt, cit, c, s, sf, dot=dot)            # [TB, S, S]
    krt, kit = _gauss_corr_kft(cross, zz, xx, sigma, s * s * nc, c, s, sf,
                               dot=dot)
    art = _tr(afr_ref[:])                                # [TB, Sf, S]
    ait = _tr(afi_ref[:])
    # response = IFFT(k̂ ⊙ α̂)
    out_ref[:] = _irfft2t(krt * art - kit * ait,
                          krt * ait + kit * art, c, s, sf, dot=dot)


def _train_kernel(lr_ref, feat_ref, xfr_ref, xfi_ref, afr_ref, afi_ref,
                  yfrt_ref, yfit_ref,
                  *refs, sigma: float, lambda_: float, s: int, nc: int,
                  tb: int, prec: str):
    oxr_ref, oxi_ref, oar_ref, oai_ref = refs[-4:]
    c = _const_dict(refs[:-4])
    dot = _dot_with(prec)
    sf = s // 2 + 1
    g = pl.program_id(0)
    feat = feat_ref[:].reshape(tb * nc, s, s)
    xrt, xit = _rfft2t(feat, c, s, sf, dot=dot)              # fresh x̂ᵀ
    # x̂·conj(x̂) is real; energies summed over channels.
    crt = (xrt * xrt + xit * xit).reshape(tb, nc, sf, s).sum(axis=1)
    xx = _energy_t(xrt, xit, c, s).reshape(tb, nc, 1, 1).sum(axis=1)
    cross = _irfft2t(crt, jnp.zeros_like(crt), c, s, sf, dot=dot)
    krt, kit = _gauss_corr_kft(cross, xx, xx, sigma, s * s * nc, c, s, sf,
                               dot=dot)
    # α̂ = ŷ / (k̂ + λ)  — ŷᵀ is passed pre-transposed (a constant).
    dr = krt + lambda_
    inv = 1.0 / jnp.maximum(dr * dr + kit * kit, 1e-20)
    yrt, yit = yfrt_ref[:][None], yfit_ref[:][None]
    nart = (yrt * dr + yit * kit) * inv
    nait = (yit * dr - yrt * kit) * inv
    # EMA blend with per-track lr (scalar-prefetch), in canonical layout.
    # Per-track unrolled scalar blends: an assembled [TB, 1, 1] lr array
    # hits Mosaic's "broadcast in both sublanes and lanes" limitation;
    # scalar * array is a plain supported splat.
    fx_r = _tr(xrt.reshape(tb, nc, sf, s))               # back to [.., S, Sf]
    fx_i = _tr(xit.reshape(tb, nc, sf, s))
    na_r = _tr(nart)
    na_i = _tr(nait)
    for tt in range(tb):
        lv = lr_ref[g * tb + tt]
        oxr_ref[tt] = xfr_ref[tt] * (1.0 - lv) + fx_r[tt] * lv
        oxi_ref[tt] = xfi_ref[tt] * (1.0 - lv) + fx_i[tt] * lv
        oar_ref[tt] = afr_ref[tt] * (1.0 - lv) + na_r[tt] * lv
        oai_ref[tt] = afi_ref[tt] * (1.0 - lv) + na_i[tt] * lv


def _per_block_specs(tb: int, nc: int, s: int, sf: int):
    one = lambda i, *_: (i, 0, 0, 0)
    two = lambda i, *_: (i, 0, 0)
    return {
        "feat": pl.BlockSpec((tb, nc, s, s), one, memory_space=pltpu.VMEM),
        "xf": pl.BlockSpec((tb, nc, s, sf), one, memory_space=pltpu.VMEM),
        "af": pl.BlockSpec((tb, s, sf), two, memory_space=pltpu.VMEM),
        "resp": pl.BlockSpec((tb, s, s), two, memory_space=pltpu.VMEM),
    }


def _pad_tracks(arrs, t: int, tb: int):
    t_pad = -(-t // tb) * tb
    if t_pad == t:
        return arrs, t_pad
    return [jnp.pad(a, ((0, t_pad - t),) + ((0, 0),) * (a.ndim - 1))
            for a in arrs], t_pad


def detect_fused(model: KCFModel, feat: jnp.ndarray, sigma: float,
                 interpret: bool | None = None, precision: str = "highest",
                 block: int | None = None) -> jnp.ndarray:
    """Fused correlation response of the model bank (ops/kcf.detect parity).

    feat : [T, C, S, S] windowed features → response [T, S, S].
    precision : "highest" (6-pass MXU, ~3500x more accurate than the XLA
        einsum chain) or "default" (single-pass bf16 MXU, ~3x cheaper dots).
    block : tracks per grid program (default TRACK_BLOCK).
    """
    if interpret is None:
        # Mosaic only exists on TPU; on the CPU tier the kernel runs in
        # interpreter mode so kcf_impl="pallas" works everywhere.
        interpret = jax.default_backend() == "cpu"
    t, nc, s, _ = feat.shape
    sf = s // 2 + 1
    tb = min(block or TRACK_BLOCK, t)
    (feat, xr, xi, ar, ai), t_pad = _pad_tracks(
        [feat, model.xf.re, model.xf.im, model.alphaf.re, model.alphaf.im],
        t, tb)
    sp = _per_block_specs(tb, nc, s, sf)
    kernel = functools.partial(_detect_kernel, sigma=float(sigma), s=s,
                               nc=nc, tb=tb, prec=precision)
    out = pl.pallas_call(
        kernel,
        grid=(t_pad // tb,),
        in_specs=[sp["feat"], sp["xf"], sp["xf"], sp["af"], sp["af"]]
                 + _const_specs(s),
        out_specs=sp["resp"],
        out_shape=jax.ShapeDtypeStruct((t_pad, s, s), jnp.float32),
        interpret=interpret,
    )(feat, xr, xi, ar, ai, *_const_args(s))
    return out[:t]


def train_fused(model: KCFModel, feat: jnp.ndarray, yf: CF, sigma: float,
                lambda_: float, lr: jnp.ndarray,
                interpret: bool | None = None, precision: str = "highest",
                block: int | None = None) -> KCFModel:
    """Fused train + EMA blend (ops/kcf.train ∘ blend parity).

    feat [T, C, S, S], yf [S, Sf] shared target spectrum, lr [T] per-track
    learning rate (1.0 births / interp matched / 0.0 dead).
    precision/block: see detect_fused.
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    t, nc, s, _ = feat.shape
    sf = s // 2 + 1
    tb = min(block or TRACK_BLOCK, t)
    (feat, xr, xi, ar, ai, lr1), t_pad = _pad_tracks(
        [feat, model.xf.re, model.xf.im, model.alphaf.re, model.alphaf.im,
         jnp.asarray(lr, jnp.float32).reshape(t)], t, tb)
    sp = _per_block_specs(tb, nc, s, sf)
    yf_spec = pl.BlockSpec((sf, s), lambda i, *_: (0, 0),
                           memory_space=pltpu.VMEM)
    kernel = functools.partial(_train_kernel, sigma=float(sigma),
                               lambda_=float(lambda_), s=s, nc=nc, tb=tb,
                               prec=precision)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,                # lr [T] rides SMEM
        grid=(t_pad // tb,),
        in_specs=[sp["feat"], sp["xf"], sp["xf"], sp["af"], sp["af"],
                  yf_spec, yf_spec] + _const_specs(s),
        out_specs=(sp["xf"], sp["xf"], sp["af"], sp["af"]),
    )
    oxr, oxi, oar, oai = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((t_pad, nc, s, sf), jnp.float32),
            jax.ShapeDtypeStruct((t_pad, nc, s, sf), jnp.float32),
            jax.ShapeDtypeStruct((t_pad, s, sf), jnp.float32),
            jax.ShapeDtypeStruct((t_pad, s, sf), jnp.float32),
        ),
        interpret=interpret,
    )(lr1, feat, xr, xi, ar, ai,
      jnp.swapaxes(yf.re, -1, -2), jnp.swapaxes(yf.im, -1, -2),
      *_const_args(s))
    return KCFModel(xf=CF(oxr[:t], oxi[:t]),
                    alphaf=CF(oar[:t], oai[:t]))
