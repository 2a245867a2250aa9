"""Fused ChEES-HMC trajectory kernel (Pallas/TPU).

The ChEES branch (proposals/chees.py) is the gradient workhorse of the bench
configuration: every selected iteration runs, for the whole [T, C] replica
batch, a whitened leapfrog trajectory of per-chain length ``nsteps`` with a
per-chain step size. The XLA path carries [T, C, D] arrays through a
``lax.while_loop``; with small ``ndim`` the minor dimension occupies <<128
lanes and every loop iteration round-trips the carry through HBM.

This kernel uses the same chains-in-lanes layout as ``ops/hmc_pallas.py``
([D_pad, N] with the flattened batch on the 128-wide lane axis) and runs the
whole trajectory in VMEM. Differences from the HMC kernel:

  * per-lane step size ``eps`` (ChEES adapts one step size per temperature);
  * no divergence break (ChEES trajectories are fixed-length by design);
  * a static masked fori over the ``max_steps`` cap — the construct the HMC
    kernel uses and that is validated inside the scanned step program on
    real hardware (a dynamic while-loop trip count read from SMEM crashed
    the axon TPU worker when embedded in the outer scan, PROFILE_r02.md);
  * returns the full (position, momentum, logp) endpoint state the ChEES
    criterion and MH correction need.

Randomness (momenta, trajectory-length jitter) is drawn outside with the
sampler's typed keys — bit-comparable to the XLA path
(tests/test_pallas_ops.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .hmc_pallas import _LANES, _SUBLANES, _round_up


def _chees_kernel(
    q0_ref, p0_ref, beta_ref, eps_ref, nsteps_ref, chol_ref,
    *rest,
    func_grad, ndim, max_steps, const_shapes,
):
    const_refs = rest[: len(const_shapes)]
    qout_ref, pout_ref, logpout_ref = rest[len(const_shapes):]
    consts = [r[:].reshape(s) for r, s in zip(const_refs, const_shapes)]

    dp = q0_ref.shape[0]
    bn = q0_ref.shape[1]
    dtype = q0_ref.dtype
    chol = chol_ref[:]  # [D_pad, D_pad]; identity on padded rows
    beta = beta_ref[0, :]  # [BN]
    eps = eps_ref[0, :].reshape(1, bn)  # [1, BN] per-lane step size

    def fgw(q):
        """Batched tempered logp + whitened gradient, columns = chains."""
        x = jnp.dot(chol.T, q, preferred_element_type=dtype)

        if dp > ndim:
            def one(col, b, *cs):
                v, g = func_grad(col[:ndim], b, *cs)
                return v, jnp.concatenate([g, jnp.zeros((dp - ndim,), g.dtype)])
        else:
            def one(col, b, *cs):
                return func_grad(col, b, *cs)

        vals, grads = jax.vmap(
            one, in_axes=(1, 0) + (None,) * len(consts), out_axes=(0, 1)
        )(x, beta, *consts)
        gw = jnp.dot(chol, grads, preferred_element_type=dtype)
        return vals.reshape(1, bn), gw

    q0 = q0_ref[:]
    p0 = p0_ref[:]
    logp0, grad0 = fgw(q0)
    nsteps = nsteps_ref[0, :].reshape(1, bn)

    # Static masked fori over the trajectory-length cap: the same construct
    # as the HMC kernel, which is validated inside the scanned step program
    # on real TPU hardware. (A dynamic while_loop bound read from SMEM
    # crashed the axon TPU worker when embedded in the outer scan —
    # PROFILE_r02.md.)
    def body(i, carry):
        q, p, g, logp = carry
        take = i < nsteps  # [1, BN]
        take_d = jnp.broadcast_to(take, (dp, bn))
        # leapfrog with per-lane eps (nutsjump.py:149-169 dynamics)
        ph = p + 0.5 * eps * g
        qn = q + eps * ph
        logpn, gn = fgw(qn)
        pn = ph + 0.5 * eps * gn
        q = jnp.where(take_d, qn, q)
        p = jnp.where(take_d, pn, p)
        g = jnp.where(take_d, gn, g)
        logp = jnp.where(take, logpn, logp)
        return q, p, g, logp

    q, p, _, logp1 = jax.lax.fori_loop(
        0, max_steps, body, (q0, p0, grad0, logp0)
    )

    qout_ref[:] = q
    pout_ref[:] = p
    logpout_ref[:] = jnp.where(jnp.isnan(logp1), -jnp.inf, logp1)


def fused_chees_trajectories(
    q0, p0, beta, eps, nsteps, chol, *, func_grad, ndim, max_steps=None,
    block_n=512, interpret=None,
):
    # block_n: lanes per grid program. Mosaic's scoped-VMEM budget is ~16 MB
    # and this kernel's working set measures ~14 KB/lane on v5e (the
    # vmapped log-density gradient dominates), so 512 lanes/program keeps a
    # comfortable margin; 4096 OOMs the VMEM stack.
    """Run fused whitened fixed-length trajectories for a flat chain batch.

    Args:
      q0, p0: [N, D] whitened positions / momenta (row per chain).
      beta:   [N] inverse temperatures.
      eps:    [N] per-chain leapfrog step sizes.
      nsteps: [N] int32 per-chain trajectory lengths.
      chol:   [D, D] Cholesky factor of the proposal covariance.
    Returns:
      (q1 [N, D], p1 [N, D], logp1 [N]) endpoint state in whitened space.
    """
    n, d = q0.shape
    dtype = q0.dtype
    dp = max(_SUBLANES, _round_up(d, _SUBLANES))
    npad = _round_up(n, _LANES)
    bn = min(block_n, npad)
    npad = _round_up(npad, bn)

    def pad_t(a):  # [N, D] -> [D_pad, N_pad]
        at = jnp.zeros((dp, npad), dtype)
        return jax.lax.dynamic_update_slice(at, a.T.astype(dtype), (0, 0))

    def pad_row(a, dt, fill=0):
        r = jnp.full((1, npad), fill, dt)
        return jax.lax.dynamic_update_slice(r, a.reshape(1, n).astype(dt), (0, 0))

    cholp = jnp.eye(dp, dtype=dtype)
    cholp = jax.lax.dynamic_update_slice(cholp, chol.astype(dtype), (0, 0))

    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    # Hoist jaxpr consts into kernel inputs (see hmc_pallas for rationale).
    closed = jax.make_jaxpr(func_grad)(jnp.zeros((d,), dtype), jnp.zeros((), dtype))
    consts = closed.consts

    def fg_conv(x_col, b, *cs):
        val, grad = jax.core.eval_jaxpr(closed.jaxpr, cs, x_col, b)
        return val, grad

    const_shapes = tuple(tuple(np.shape(c)) for c in consts)
    const_in = [jnp.asarray(c).reshape(1, max(1, int(np.size(c)))) for c in consts]

    if max_steps is None:
        max_steps = 256
    kern = functools.partial(
        _chees_kernel, func_grad=fg_conv, ndim=d, max_steps=int(max_steps),
        const_shapes=const_shapes,
    )
    grid = (npad // bn,)
    col_spec = lambda rows: pl.BlockSpec(  # noqa: E731
        (rows, bn), lambda i: (0, i), memory_space=pltpu.VMEM
    )

    def rep_spec(shape):
        return pl.BlockSpec(shape, lambda i: (0,) * len(shape), memory_space=pltpu.VMEM)

    qt, pt, logp = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            col_spec(dp), col_spec(dp), col_spec(1), col_spec(1), col_spec(1),
            rep_spec((dp, dp)),
        ]
        + [rep_spec(c.shape) for c in const_in],
        out_specs=[col_spec(dp), col_spec(dp), col_spec(1)],
        out_shape=[
            jax.ShapeDtypeStruct((dp, npad), dtype),
            jax.ShapeDtypeStruct((dp, npad), dtype),
            jax.ShapeDtypeStruct((1, npad), dtype),
        ],
        interpret=interpret,
    )(
        pad_t(q0), pad_t(p0),
        pad_row(beta, dtype, 1),
        pad_row(eps, dtype, 0),
        # padded lanes take zero steps -> identity trajectories
        pad_row(nsteps, jnp.int32, 0),
        cholp,
        *const_in,
    )
    return qt[:d, :n].T, pt[:d, :n].T, logp[0, :n]
