"""Chain diagnostics: integrated autocorrelation time and effective samples.

Replaces the reference's optional ``acor`` dependency (PTMCMCSampler.py:15-24,
:510-521) with an FFT-based integrated autocorrelation time using Sokal's
automatic windowing (the standard emcee-style estimator). Used for the
``neff`` early-termination criterion.
"""

from __future__ import annotations

import numpy as np


def _next_pow_two(n):
    i = 1
    while i < n:
        i <<= 1
    return i


def autocorr_function(x):
    """Normalized autocorrelation function of a 1-D series."""
    x = np.asarray(x, dtype=np.float64)
    n = len(x)
    if n < 2:
        return np.ones(1)
    f = np.fft.fft(x - np.mean(x), n=2 * _next_pow_two(n))
    acf = np.fft.ifft(f * np.conjugate(f))[:n].real
    if acf[0] <= 0:
        return np.ones(n)
    return acf / acf[0]


def integrated_autocorr_time(x, c=5.0):
    """Integrated autocorrelation time with Sokal auto-windowing."""
    f = autocorr_function(x)
    taus = 2.0 * np.cumsum(f) - 1.0
    window = np.arange(len(taus)) < c * taus
    if np.any(~window):
        m = int(np.argmin(window))
        return max(taus[m], 1.0)
    return max(taus[-1], 1.0)


def max_autocorr_time(chain):
    """Max integrated autocorrelation time over parameter columns.

    Mirrors the reference's termination statistic
    ``max_i acor(chain[:, i])`` (PTMCMCSampler.py:512-517).
    """
    chain = np.atleast_2d(np.asarray(chain))
    taus = [integrated_autocorr_time(chain[:, i]) for i in range(chain.shape[1])]
    return float(np.nanmax(taus)) if taus else 1.0


def effective_samples(chain, niter=None):
    """N_eff = iterations / max-tau (reference formula, PTMCMCSampler.py:512)."""
    n = niter if niter is not None else len(chain)
    return n / max(1.0, max_autocorr_time(chain))
