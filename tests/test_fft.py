"""Parity tests for the batched rFFT backends (SURVEY.md §4.1)."""

import numpy as np
import jax.numpy as jnp

from tpu_mot.ops import fft as fft_ops
from tpu_mot.ops.cfloat import CF, mul_conj


def _to_np(cf):
    return np.asarray(cf.re) + 1j * np.asarray(cf.im)


def test_rfft2_matmul_matches_numpy():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((3, 2, 64, 64)).astype(np.float32)
    got = _to_np(fft_ops.rfft2(jnp.asarray(x), backend="matmul"))
    want = np.fft.rfft2(x)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-3)


def test_rfft2_xla_matches_numpy():
    rng = np.random.default_rng(1)
    x = rng.standard_normal((2, 64, 64)).astype(np.float32)
    got = _to_np(fft_ops.rfft2(jnp.asarray(x), backend="xla"))
    want = np.fft.rfft2(x)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-3)


def test_irfft2_roundtrip_matmul():
    rng = np.random.default_rng(2)
    x = rng.standard_normal((4, 64, 64)).astype(np.float32)
    xf = fft_ops.rfft2(jnp.asarray(x), backend="matmul")
    back = np.asarray(fft_ops.irfft2(xf, 64, backend="matmul"))
    np.testing.assert_allclose(back, x, rtol=1e-4, atol=1e-4)


def test_irfft2_roundtrip_xla():
    rng = np.random.default_rng(3)
    x = rng.standard_normal((4, 32, 32)).astype(np.float32)
    xf = fft_ops.rfft2(jnp.asarray(x), backend="xla")
    back = np.asarray(fft_ops.irfft2(xf, 32, backend="xla"))
    np.testing.assert_allclose(back, x, rtol=1e-4, atol=1e-4)


def test_irfft2_matmul_odd_width():
    rng = np.random.default_rng(4)
    x = rng.standard_normal((2, 16, 15)).astype(np.float32)
    xf_np = np.fft.rfft2(x)
    xf = CF(jnp.asarray(xf_np.real.astype(np.float32)),
            jnp.asarray(xf_np.imag.astype(np.float32)))
    back = np.asarray(fft_ops.irfft2(xf, 15, backend="matmul"))
    np.testing.assert_allclose(back, x, rtol=1e-4, atol=1e-4)


def test_backends_agree_on_cross_spectrum():
    """The exact spectral product used by gaussian_correlation."""
    rng = np.random.default_rng(5)
    a = rng.standard_normal((2, 64, 64)).astype(np.float32)
    b = rng.standard_normal((2, 64, 64)).astype(np.float32)
    for backend in ("matmul", "xla"):
        af = fft_ops.rfft2(jnp.asarray(a), backend=backend)
        bf = fft_ops.rfft2(jnp.asarray(b), backend=backend)
        got = np.asarray(fft_ops.irfft2(mul_conj(af, bf), 64,
                                        backend=backend))
        want = np.real(np.fft.ifft2(np.fft.fft2(a) * np.conj(np.fft.fft2(b))))
        np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-2)
