"""Shared proposal helpers.

Proposal kernels follow a single-chain protocol and are vmapped over chains
and temperatures by the step kernel:

    proposal(key, x[D], beta, it, ctx) -> (q[D], log_qxy)

``ctx`` is a :class:`ProposalContext` pytree view of the adaptation state.
This is the JAX-native analogue of the reference's proposal-callable protocol
``proposal(x, iter, beta) -> (q, qxy)`` (PTMCMCSampler.py:1059) with explicit
PRNG keys instead of global numpy RNG state.
"""

from __future__ import annotations

import chex
import jax
import jax.numpy as jnp


@chex.dataclass
class ProposalContext:
    """Adaptation inputs a proposal may read (replicated across chains)."""

    group_u: tuple  # per-group eigenvectors
    group_s: tuple  # per-group eigenvalues
    chol: jax.Array  # [D, D] lower Cholesky of the mass-matrix inverse
    chol_inv: jax.Array  # [D, D]
    de_buf: jax.Array  # [B, D]
    de_valid: jax.Array  # scalar i32


def draw_am_scale(key, beta, dtype):
    """The reference's occasional jump-size modulation.

    PTMCMCSampler.py:843-862 (and identically :899-920): with prob 0.03 a
    "large" 10x jump, with prob 0.07 a "small" 0.2x jump, else 1.0; scaled by
    sqrt(T) for chains with T <= 100.
    """
    prob = jax.random.uniform(key)
    scale = jnp.where(prob > 0.97, 10.0, jnp.where(prob > 0.9, 0.2, 1.0)).astype(dtype)
    temp = safe_temperature(beta)
    scale = jnp.where(temp <= 100.0, scale * jnp.sqrt(temp), scale)
    return scale


def safe_temperature(beta):
    """T = 1/beta with the beta->0 hot chain clamped to a finite huge value."""
    return jnp.where(beta > 0, 1.0 / jnp.maximum(beta, 1e-30), 1e30)


def random_group(key, ngroups):
    """Uniform group choice (PTMCMCSampler.py:839, :897, :955)."""
    if ngroups == 1:
        return jnp.zeros((), jnp.int32)
    return jax.random.randint(key, (), 0, ngroups)


def switch_over_groups(gidx, fns, *args):
    """lax.switch over the (static, usually tiny) list of parameter groups."""
    if len(fns) == 1:
        return fns[0](*args)
    return jax.lax.switch(gidx, fns, *args)
