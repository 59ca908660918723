"""PSF convolution for fitting.

ref: FitSKIRTcore/Convolution.cpp + FFTConvolution/FftConvolution.hpp:16-42
(FFT convolution when the kernel is large enough; direct otherwise) and
ConvolutionKernel family (GaussianKernel, FitsKernel).
"""

from __future__ import annotations

import numpy as np

from ..io.fits import read_fits


class GaussianKernel:
    """Gaussian PSF, FWHM in pixels (ref: FitSKIRTcore/GaussianKernel.cpp)."""

    def __init__(self, fwhm: float, dimension: int | None = None):
        self.fwhm = float(fwhm)
        sigma = self.fwhm / 2.3548200450309493
        n = int(dimension) if dimension else max(int(np.ceil(sigma * 6)) | 1, 3)
        if n % 2 == 0:
            n += 1
        r = np.arange(n) - n // 2
        g = np.exp(-0.5 * (r / sigma) ** 2)
        k = np.outer(g, g)
        self.data = k / k.sum()


class FitsKernel:
    """PSF read from a FITS image (ref: FitSKIRTcore/FitsKernel.cpp)."""

    def __init__(self, path: str):
        data, _ = read_fits(path)
        if data.ndim == 3:
            data = data[0]
        total = data.sum()
        if total <= 0:
            raise ValueError("kernel has non-positive total")
        self.data = data / total


def convolve(frame: np.ndarray, kernel) -> np.ndarray:
    """'Same'-size FFT convolution of a frame with a normalized kernel.

    ref: FFTConvolution/FftConvolution.cpp (FFTW path) — here numpy FFT.
    """
    k = kernel.data if hasattr(kernel, "data") else np.asarray(kernel)
    ny, nx = frame.shape
    ky, kx = k.shape
    fy, fx = ny + ky - 1, nx + kx - 1
    F = np.fft.rfft2(frame, s=(fy, fx))
    K = np.fft.rfft2(k, s=(fy, fx))
    full = np.fft.irfft2(F * K, s=(fy, fx))
    y0, x0 = (ky - 1) // 2, (kx - 1) // 2
    return full[y0:y0 + ny, x0:x0 + nx]
