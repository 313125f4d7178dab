"""Batched 2-D real FFT for the KCF core — TPU-native formulations.

The reference's L0 layer is a CPU FFT library call per track per frame
(SURVEY.md §2 row "fft2d").  On TPU the patch sizes are tiny (64x64,
BASELINE.json configs[1]) and the batch is the whole live-track bank, so the
fastest formulation is not an FFT butterfly at all: a 64-point DFT is a
64x64 matrix, and a batched 2-D DFT is two batched matmuls that map straight
onto the MXU.  Two interchangeable backends are provided:

  * "matmul" — DFT-by-matrix-multiply in pure real arithmetic (6 real
    matmuls per transform), the MXU-native path and the one a Pallas kernel
    fuses.  No complex dtype anywhere (see ops/cfloat.py for why).
  * "xla"    — jnp.fft.rfft2/irfft2 (complex internally, split at the
    boundary), used as a cross-check backend in the CPU test tier.

Both return/accept split-complex CF half-spectra of shape
[..., H, W//2 + 1] so the KCF math is backend-agnostic.
"""

from __future__ import annotations

import contextlib
import functools

import jax
import jax.numpy as jnp
import numpy as np

from tpu_mot.ops.cfloat import CF

# Module-level default backend; tests exercise both explicitly.
_DEFAULT_BACKEND = "matmul"

# DFT matmul precision.  On TPU a DEFAULT-precision dot computes in bf16
# (8 mantissa bits); the r4 bounce-fixture regression (2026-08-19, v5e:
# IDF1 0.987 CPU -> ~0.70 TPU with bf16 spectra, recovered by pinning)
# showed the XLA einsum chain silently ignored cfg.kcf_precision —
# that knob reached only the fused Pallas kernel.  Bisecting the fixture
# further showed the sensitivity is ASYMMETRIC: the FORWARD feature
# spectra feed train()'s spectral divide, where bf16 error corrupts
# alphaf multiplicatively, while the INVERSE transforms only render
# response surfaces whose sub-pixel peak tolerates bf16.  Hence the
# "fwd_high" mode (forward=HIGH 3-pass-bf16 ~f32-grade, inverse=DEFAULT)
# — full fixture parity at a fraction of uniform-HIGH's bench cost
# (tools/bench_prec_*_r4.log; uniform sweep: default 4968 / high 4142 /
# highest 3287 fps at the 1080p@128trk bench shape).
_PRECISIONS = {"highest": jax.lax.Precision.HIGHEST,
               "high": jax.lax.Precision.HIGH,
               "default": jax.lax.Precision.DEFAULT}
# mode -> (forward precision, inverse precision).
# A "fwd_split" mode (2-pass dots against an exact bf16-hi + f32-lo
# decomposition of the trace-time-constant DFT matrix) was built and
# measured r4 (tools/tpu_parity_r4d.log): alphaf rel-err 0.0239 vs
# default's 0.0237 — indistinguishable, because the DATA operand's
# single bf16 rounding dominates the divide-class error; sparing the
# constant's rounding buys nothing.  Only operand-splitting the data
# (exactly what HIGH's 3-pass form does) rescues the spectral divide.
# Mode removed; this comment is the record.
_MODES = {"highest": ("highest", "highest"),
          "high": ("high", "high"),
          "fwd_high": ("high", "default"),
          "default": ("default", "default")}
# Mode default outside any scope (standalone/oracle use stays
# accuracy-first); the tracker scopes each trace per cfg.kcf_precision.
# The scoped mode is THREAD-LOCAL (ADVICE r4): trace-time scoping is
# correct for the cfg-static jit call sites, but concurrent traces
# (e.g. the async API compiling two cfgs from worker threads) must not
# cross-contaminate each other's precision mode.
import threading as _threading

_PREC_TLS = _threading.local()


def set_default_precision(mode: str) -> None:
    if mode not in _MODES:
        raise ValueError(f"unknown fft precision mode {mode!r}")
    _PREC_TLS.mode = mode


def get_default_precision() -> str:
    return getattr(_PREC_TLS, "mode", "highest")


@contextlib.contextmanager
def precision_scope(mode: str):
    """Trace-time scope pinning the DFT matmul precision mode (used by
    the *_auto dispatchers to honor cfg.kcf_precision on the XLA chain;
    safe because configs are jit statics — each cfg traces its own
    program).  Thread-local: concurrent traces do not interact."""
    if mode not in _MODES:
        raise ValueError(f"unknown fft precision mode {mode!r}")
    prev = get_default_precision()
    _PREC_TLS.mode = mode
    try:
        yield
    finally:
        _PREC_TLS.mode = prev


# Per-direction env overrides for A/B experiments (bench sessions only;
# the shipped path is cfg.kcf_precision -> precision_scope).  Validated
# at import (ADVICE r4: a typo'd value used to surface only as a
# KeyError deep inside tracing, and a leaked env var silently overrode
# cfg.kcf_precision) and announced on stderr when active.
import os as _os
import sys as _sys


def _prec_override(env_var: str):
    val = _os.environ.get(env_var)
    if val is None:
        return None
    if val not in _PRECISIONS:
        raise ValueError(
            f"{env_var}={val!r} is not a DFT matmul precision; expected "
            f"one of {sorted(_PRECISIONS)}")
    print(f"tpu_mot.ops.fft: {env_var}={val} overrides cfg.kcf_precision "
          f"for this process", file=_sys.stderr)
    return val


_FWD_OVR = _prec_override("TPU_MOT_FFT_FWD_PREC")
_INV_OVR = _prec_override("TPU_MOT_FFT_INV_PREC")
# Stacked-DFT formulation A/B (see rfft2_matmul's docstring): same dot
# products, 6 matmuls -> 2 per transform.  Default pending TPU evidence.
_STACKED = _os.environ.get("TPU_MOT_FFT_STACKED", "0") == "1"


def _einsum_fwd(*args):
    prec = _FWD_OVR or _MODES[get_default_precision()][0]
    return jnp.einsum(*args, precision=_PRECISIONS[prec])


def _einsum_inv(*args):
    prec = _INV_OVR or _MODES[get_default_precision()][1]
    return jnp.einsum(*args, precision=_PRECISIONS[prec])


def set_default_backend(name: str) -> None:
    global _DEFAULT_BACKEND
    if name not in ("matmul", "xla"):
        raise ValueError(f"unknown fft backend {name!r}")
    _DEFAULT_BACKEND = name


def get_default_backend() -> str:
    return _DEFAULT_BACKEND


@functools.lru_cache(maxsize=None)
def _dft_mats(n: int, half: bool):
    """Forward DFT matrix F[j, k] = exp(-2i*pi*j*k/n), split into (re, im).

    With half=True only the first n//2+1 rows are kept (rfft columns).
    """
    j = np.arange(n // 2 + 1 if half else n)[:, None]
    k = np.arange(n)[None, :]
    w = np.exp(-2j * np.pi * j * k / n)
    return (w.real.astype(np.float32), w.imag.astype(np.float32))


@functools.lru_cache(maxsize=None)
def _idft_mats(n: int, half: bool):
    """Inverse-DFT basis E[m, j] = exp(+2i*pi*j*m/n), split into (re, im).

    With half=True only the first n//2+1 columns are kept.
    """
    m = np.arange(n)[:, None]
    j = np.arange(n // 2 + 1 if half else n)[None, :]
    w = np.exp(2j * np.pi * m * j / n)
    return (w.real.astype(np.float32), w.imag.astype(np.float32))


@functools.lru_cache(maxsize=None)
def _dft_mats_stacked(n: int, half: bool):
    """[re; im] row-stacked forward DFT matrix, [2*rows, n]."""
    return np.concatenate(_dft_mats(n, half), axis=0)


@functools.lru_cache(maxsize=None)
def _idft_row_stacked(n: int):
    """[re; im] row-stacked inverse basis, [2n, n] (full spectrum)."""
    return np.concatenate(_idft_mats(n, half=False), axis=0)


@functools.lru_cache(maxsize=None)
def _idft_col_stacked(n: int):
    """[re | im] column-stacked half inverse basis, [n, 2*(n//2+1)]."""
    return np.concatenate(_idft_mats(n, half=True), axis=1)


@functools.lru_cache(maxsize=None)
def _hermitian_weights(w: int):
    """Column weights folding the conjugate-symmetric half back in: 2 for
    interior columns, 1 for DC and (even w) Nyquist."""
    wf = w // 2 + 1
    wts = np.full((wf,), 2.0, np.float32)
    wts[0] = 1.0
    if w % 2 == 0:
        wts[-1] = 1.0
    return wts


def rfft2_matmul(x: jnp.ndarray, einsum=None) -> CF:
    """2-D real FFT over the last two axes via MXU matmuls.

    Y = F_H @ X @ F_W^T with F_W truncated to the half spectrum:
    6 real matmuls, batched over every leading axis.

    einsum selects the precision class (default the forward/divide
    class; rfft2(response_class=True) passes the inverse/response-
    rendering class — see rfft2's docstring).

    Two element-identical formulations, selected by TPU_MOT_FFT_STACKED
    (A/B experiment knob; every output element is the same dot product
    either way, only the batching of the dots changes):
      * per-term — 6 matmuls against the separate re/im DFT matrices.
      * stacked — 2 matmuls against [re; im] row-stacked matrices; the
        four stage-2 products land as quadrants of one [..., 2H, 2Wf]
        result and re-combine with two adds.  Fewer, larger dots: the
        output lane dim grows Wf=33 → 2Wf=66, halving the MXU's
        pad-to-128 lane waste at the KCF template shape.
    """
    e = einsum or _einsum_fwd
    h, w = x.shape[-2], x.shape[-1]
    wf = w // 2 + 1
    if _STACKED:
        b2 = _dft_mats_stacked(w, half=True)    # [2Wf, W]
        a2 = _dft_mats_stacked(h, half=False)   # [2H, H]
        z1 = e("...hw,fw->...hf", x, b2)        # [..., H, 2Wf] = [P | Q]
        z2 = e("gh,...hf->...gf", a2, z1)       # [..., 2H, 2Wf]
        # Quadrants: [[Ar@P, Ar@Q], [Ai@P, Ai@Q]]
        yr = z2[..., :h, :wf] - z2[..., h:, wf:]
        yi = z2[..., :h, wf:] + z2[..., h:, :wf]
        return CF(yr, yi)
    ar, ai = _dft_mats(h, half=False)       # [H, H]
    br, bi = _dft_mats(w, half=True)        # [Wf, W]
    # P + iQ = X @ B^T  (X real)
    p = e("...hw,fw->...hf", x, br)
    q = e("...hw,fw->...hf", x, bi)
    # (Ar + iAi) @ (P + iQ)
    yr = e("gh,...hf->...gf", ar, p) - e("gh,...hf->...gf", ai, q)
    yi = e("gh,...hf->...gf", ar, q) + e("gh,...hf->...gf", ai, p)
    return CF(yr, yi)


def irfft2_matmul(yf: CF, w: int) -> jnp.ndarray:
    """Inverse of rfft2_matmul: real output [..., H, w] from the half
    spectrum [..., H, w//2+1], using Hermitian column folding.

    x = Re(E_H @ (wts * Y) @ E_W^T) / (H*w); 6 real matmuls — or 2 in
    the stacked formulation (see rfft2_matmul): stage 1 row-stacks the
    basis and lane-concats [Yr | Yi]; stage 2 folds M Gr^T - N Gi^T
    into ONE dot by concatenating [M | -N] along the contraction dim
    against [Gr | Gi].
    """
    h = yf.re.shape[-2]
    wts = _hermitian_weights(w)
    wf = yf.re.shape[-1]
    if _STACKED:
        e2 = _idft_row_stacked(h)               # [2H, H]
        g2 = _idft_col_stacked(w)               # [w, 2Wf]
        ycat = jnp.concatenate([yf.re * wts, yf.im * wts], axis=-1)
        z = _einsum_inv("gh,...hf->...gf", e2, ycat)   # [..., 2H, 2Wf]
        m = z[..., :h, :wf] - z[..., h:, wf:]
        n = z[..., :h, wf:] + z[..., h:, :wf]
        mn = jnp.concatenate([m, -n], axis=-1)         # [..., H, 2Wf]
        x = _einsum_inv("...mf,nf->...mn", mn, g2)
        return x / (h * w)
    er, ei = _idft_mats(h, half=False)      # [H, H]
    gr, gi = _idft_mats(w, half=True)       # [w, Wf]
    yr = yf.re * wts
    yi = yf.im * wts
    # M + iN = E_H @ Yw
    m = _einsum_inv("mh,...hf->...mf", er, yr) - _einsum_inv(
        "mh,...hf->...mf", ei, yi)
    n = _einsum_inv("mh,...hf->...mf", er, yi) + _einsum_inv(
        "mh,...hf->...mf", ei, yr)
    # Re((M + iN) @ (Gr + iGi)^T) = M Gr^T - N Gi^T
    x = _einsum_inv("...mf,nf->...mn", m, gr) - _einsum_inv(
        "...mf,nf->...mn", n, gi)
    return x / (h * w)


def rfft2(x: jnp.ndarray, backend: str | None = None,
          response_class: bool = False) -> CF:
    """Batched 2-D rFFT over the last two axes → CF half spectrum.

    response_class=True assigns this transform to the RESPONSE-RENDERING
    precision class (the mode's inverse slot) instead of the
    divide-feeding forward class.  Rationale (r4 asymmetry finding,
    tools/tpu_parity_r4b.log + the bounce-fixture bisection): bf16 error
    in spectra that reach train()'s spectral divide corrupts alphaf
    multiplicatively, while spectra that only render a response surface
    tolerate bf16 (the sub-pixel peak is insensitive at ~2e-3 relative
    noise).  detect()'s forward DFT of the correlation surface k is
    response-only, so under "fwd_high" it rides DEFAULT with the
    inverse transforms rather than paying the 3-pass HIGH premium.
    On CPU (f32 exact) and in uniform modes (fwd==inv) this is a no-op.
    """
    backend = backend or _DEFAULT_BACKEND
    if backend == "xla":
        yf = jnp.fft.rfft2(x)
        return CF(jnp.real(yf).astype(jnp.float32),
                  jnp.imag(yf).astype(jnp.float32))
    return rfft2_matmul(x, _einsum_inv if response_class else None)


def irfft2(yf: CF, w: int, backend: str | None = None) -> jnp.ndarray:
    """Batched inverse 2-D rFFT → real [..., H, w]."""
    backend = backend or _DEFAULT_BACKEND
    if backend == "xla":
        import jax
        z = jax.lax.complex(yf.re, yf.im)
        return jnp.fft.irfft2(z, s=(yf.re.shape[-2], w)).astype(jnp.float32)
    return irfft2_matmul(yf, w)
