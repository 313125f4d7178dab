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
# mode -> (forward precision, inverse precision)
_MODES = {"highest": ("highest", "highest"),
          "high": ("high", "high"),
          "fwd_high": ("high", "default"),
          "default": ("default", "default")}
# Module default outside any scope (standalone/oracle use stays
# accuracy-first); the tracker scopes each trace per cfg.kcf_precision.
_PREC_MODE = "highest"


def set_default_precision(mode: str) -> None:
    global _PREC_MODE
    if mode not in _MODES:
        raise ValueError(f"unknown fft precision mode {mode!r}")
    _PREC_MODE = mode


def get_default_precision() -> str:
    return _PREC_MODE


@contextlib.contextmanager
def precision_scope(mode: str):
    """Trace-time scope pinning the DFT matmul precision mode (used by
    the *_auto dispatchers to honor cfg.kcf_precision on the XLA chain;
    safe because configs are jit statics — each cfg traces its own
    program)."""
    global _PREC_MODE
    if mode not in _MODES:
        raise ValueError(f"unknown fft precision mode {mode!r}")
    prev = _PREC_MODE
    _PREC_MODE = mode
    try:
        yield
    finally:
        _PREC_MODE = prev


# Per-direction env overrides for A/B experiments (bench sessions only;
# the shipped path is cfg.kcf_precision -> precision_scope).
import os as _os
_FWD_OVR = _os.environ.get("TPU_MOT_FFT_FWD_PREC")
_INV_OVR = _os.environ.get("TPU_MOT_FFT_INV_PREC")


def _einsum_fwd(*args):
    prec = _FWD_OVR or _MODES[_PREC_MODE][0]
    return jnp.einsum(*args, precision=_PRECISIONS[prec])


def _einsum_inv(*args):
    prec = _INV_OVR or _MODES[_PREC_MODE][1]
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
def _hermitian_weights(w: int):
    """Column weights folding the conjugate-symmetric half back in: 2 for
    interior columns, 1 for DC and (even w) Nyquist."""
    wf = w // 2 + 1
    wts = np.full((wf,), 2.0, np.float32)
    wts[0] = 1.0
    if w % 2 == 0:
        wts[-1] = 1.0
    return wts


def rfft2_matmul(x: jnp.ndarray) -> CF:
    """2-D real FFT over the last two axes via MXU matmuls.

    Y = F_H @ X @ F_W^T with F_W truncated to the half spectrum:
    6 real matmuls, batched over every leading axis.
    """
    h, w = x.shape[-2], x.shape[-1]
    ar, ai = _dft_mats(h, half=False)       # [H, H]
    br, bi = _dft_mats(w, half=True)        # [Wf, W]
    # P + iQ = X @ B^T  (X real)
    p = _einsum_fwd("...hw,fw->...hf", x, br)
    q = _einsum_fwd("...hw,fw->...hf", x, bi)
    # (Ar + iAi) @ (P + iQ)
    yr = _einsum_fwd("gh,...hf->...gf", ar, p) - _einsum_fwd(
        "gh,...hf->...gf", ai, q)
    yi = _einsum_fwd("gh,...hf->...gf", ar, q) + _einsum_fwd(
        "gh,...hf->...gf", ai, p)
    return CF(yr, yi)


def irfft2_matmul(yf: CF, w: int) -> jnp.ndarray:
    """Inverse of rfft2_matmul: real output [..., H, w] from the half
    spectrum [..., H, w//2+1], using Hermitian column folding.

    x = Re(E_H @ (wts * Y) @ E_W^T) / (H*w); 6 real matmuls.
    """
    h = yf.re.shape[-2]
    er, ei = _idft_mats(h, half=False)      # [H, H]
    gr, gi = _idft_mats(w, half=True)       # [w, Wf]
    wts = _hermitian_weights(w)
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


def rfft2(x: jnp.ndarray, backend: str | None = None) -> CF:
    """Batched 2-D rFFT over the last two axes → CF half spectrum."""
    backend = backend or _DEFAULT_BACKEND
    if backend == "xla":
        yf = jnp.fft.rfft2(x)
        return CF(jnp.real(yf).astype(jnp.float32),
                  jnp.imag(yf).astype(jnp.float32))
    return rfft2_matmul(x)


def irfft2(yf: CF, w: int, backend: str | None = None) -> jnp.ndarray:
    """Batched inverse 2-D rFFT → real [..., H, w]."""
    backend = backend or _DEFAULT_BACKEND
    if backend == "xla":
        import jax
        z = jax.lax.complex(yf.re, yf.im)
        return jnp.fft.irfft2(z, s=(yf.re.shape[-2], w)).astype(jnp.float32)
    return irfft2_matmul(yf, w)
