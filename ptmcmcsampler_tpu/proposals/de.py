"""Differential-evolution jump from the device-resident history ring buffer.

Parity target: ``DEJump`` (PTMCMCSampler.py:936-985): pick two distinct rows
of the history buffer, jump along their difference restricted to a random
parameter group; with prob 0.5 a "mode jump" (scale=1.0), else
``uniform() * 2.4/sqrt(2*sg) * sqrt(1/beta)``. Symmetric (log_qxy = 0).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .base import GroupEmbed, random_group, safe_temperature, switch_over_groups


def make_de(config):
    groups = [np.asarray(g) for g in config.groups]
    embeds = [GroupEmbed(g, config.ndim, config.dtype) for g in groups]

    def de(key, x, beta, it, ctx):
        kg, km, kn, kp, ku = jax.random.split(key, 5)
        nvalid = jnp.maximum(ctx.de_valid, 2)
        mm = jax.random.randint(km, (), 0, nvalid)
        # The reference redraws until distinct (:963-966), i.e. uniform over
        # ordered distinct pairs. Drawing nn over nvalid-1 and shifting past mm
        # reproduces that law exactly (a +1%nvalid collision remap would make
        # the pair (i, i+1) twice as likely as (i+1, i)).
        nn = jax.random.randint(kn, (), 0, nvalid - 1)
        nn = nn + (nn >= mm)
        prob = jax.random.uniform(kp)
        # sqrt(1/beta) per the reference (:976); the hot chain's beta->0 is
        # clamped so f32 stays finite (reference would produce 1e40).
        temp = jnp.minimum(safe_temperature(beta), 1e30)
        # buf[mm] - buf[nn] as a (+1, -1) one-hot contraction over the ring:
        # per-chain row gathers lower to ~0.4 ms kCustom fusions at [8x8192]
        # on TPU, while the vmapped dot rides the MXU. Exact: the contraction
        # holds a single +1.0 and a single -1.0 (same index draws).
        rows = ctx.de_buf.shape[0]
        iota = jnp.arange(rows)
        ohd = (iota == mm).astype(x.dtype) - (iota == nn).astype(x.dtype)
        sigma_full = ohd @ ctx.de_buf.astype(x.dtype)  # [D] = buf[mm] - buf[nn]

        def branch(gi):
            g = groups[gi]
            sg = len(g)
            base = np.float64(2.4 / np.sqrt(2.0 * sg))
            emb = embeds[gi]

            def apply(x, ctx):
                scale = jnp.where(
                    prob > 0.5,
                    jnp.asarray(1.0, x.dtype),
                    (jax.random.uniform(ku, dtype=x.dtype) * jnp.asarray(base, x.dtype))
                    * jnp.sqrt(temp).astype(x.dtype),
                )
                sigma = emb.take(sigma_full)
                return emb.add_at(x, scale * sigma)

            return apply

        gidx = random_group(kg, len(groups))
        q = switch_over_groups(gidx, [branch(i) for i in range(len(groups))], x, ctx)
        return q, jnp.zeros((), x.dtype)

    return de
