"""Temperature-ladder construction.

Behavioral parity with the reference's ``PTSampler.temperatureLadder``
(PTMCMCSampler.py:699-720): geometric ladder ``T_i = Tmin * c**i`` with default
spacing ``c = 1 + sqrt(2/ndim)`` (targets ~25% swap acceptance), or
``c = exp(log(Tmax/Tmin)/(ntemps-1))`` when ``Tmax`` is given; a single chain
gets ``[1.0]``.
"""

from __future__ import annotations

import numpy as np

HOT_TEMP = 1e80  # reference's prior-sampling chain temperature (PTMCMCSampler.py:282)


def temperature_ladder(ndim, ntemps, tmin=1.0, tmax=None, tstep=None):
    """Build a geometric temperature ladder as a host numpy array."""
    if ntemps <= 1:
        # Integer 1, so the chain file is named "chain_1.txt" exactly like the
        # reference's single-chain case (PTMCMCSampler.py:718, :285).
        return np.array([1])
    if tstep is None and tmax is None:
        tstep = 1.0 + np.sqrt(2.0 / ndim)
    elif tstep is None:
        tstep = np.exp(np.log(tmax / tmin) / (ntemps - 1))
    return tmin * tstep ** np.arange(ntemps)


def ladder_betas(ladder, hot_chain=False):
    """Inverse temperatures for the compute path.

    ``hot_chain=True`` replaces the hottest rung with the reference's
    ``temp = 1e80`` prior-sampling chain (PTMCMCSampler.py:281-285). In f32 a
    beta of 1e-80 underflows to exactly 0.0, which `tempered_lnprob` handles
    with the same semantics (a -inf likelihood still rejects).
    """
    ladder = np.asarray(ladder).copy()
    if hot_chain and len(ladder) > 1:
        ladder = ladder.astype(np.float64)
        ladder[-1] = HOT_TEMP
    # Preserve the ladder's dtype for file naming (an int ladder [1] names
    # "chain_1.txt" like the reference); betas are always float.
    return ladder, 1.0 / ladder.astype(np.float64)
