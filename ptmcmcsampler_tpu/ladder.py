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


def adapt_ladder_betas(betas, pair_rates, it, lag=10000.0, time=100.0,
                       skip_top=False, pair_valid=None):
    """One adaptive-ladder update (pure, jittable) — beyond-reference.

    The reference's ladder is static (PTMCMCSampler.py:699-720); the north
    star asks for "temperature-ladder geometry adaptation ... as pure
    functional state updates". This is the standard hyperbolic-decay scheme
    of Vousden, Farr & Mandel (2016): temperature spacings grow/shrink by
    the difference of adjacent pair swap-acceptance rates, equalizing
    acceptance along the ladder. The coldest and hottest rungs stay fixed,
    and interior rungs are projected to stay strictly inside (T_min, T_max):
    when the updated spacings would push a rung past the fixed hottest one,
    they are rescaled proportionally to fit, so the ladder can never invert
    or collapse even under a persistent acceptance-rate imbalance.

    Args:
      betas: [T] inverse temperatures (descending).
      pair_rates: [T] per-pair acceptance rates (index i = pair (i, i+1);
        the last entry is unused).
      it: iteration number (for the hyperbolic decay kappa(t)).
      skip_top: leave the final rung out of the geometry entirely (the
        beta = 0 prior-sampling hot chain, which has no finite temperature).
      pair_valid: optional [T] bool — pairs with no proposal data yet (e.g.
        the inactive parity of the first DEO events). A spacing update only
        applies when both pairs it compares have data; fabricated 0-rates
        would otherwise drive the largest (early, kappa-max) updates.
    Returns new betas [T].
    """
    import jax.numpy as jnp

    t = betas.shape[0] - (1 if skip_top else 0)
    if t < 3:
        return betas
    decay = lag / (it + lag)
    kappa = decay / time
    b = betas[:t]
    rates = pair_rates[: t - 1]
    ds = kappa * (rates[:-1] - rates[1:])  # [t-2]
    if pair_valid is not None:
        ok = pair_valid[: t - 1]
        ds = jnp.where(ok[:-1] & ok[1:], ds, 0.0)
    delta_t = jnp.diff(1.0 / b[:-1]) * jnp.exp(ds)  # spacings T1-T0 .. (scaled)
    # Projection: interior rungs must stay strictly below the fixed hottest
    # temperature. If the summed spacings would overflow the available span,
    # rescale them proportionally into (1 - margin) of it.
    t0 = 1.0 / b[0]
    t_top = 1.0 / b[t - 1]
    avail = t_top - t0
    total = jnp.sum(delta_t)
    scale = jnp.minimum(1.0, 0.995 * avail / jnp.maximum(total, 1e-30))
    delta_t = delta_t * scale
    new_mid = 1.0 / (jnp.cumsum(delta_t) + t0)
    return betas.at[1 : t - 1].set(new_mid.astype(betas.dtype))


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
