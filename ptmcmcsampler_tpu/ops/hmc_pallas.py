"""Fused HMC trajectory kernel (Pallas/TPU).

Reference semantics: ``HMCJump.__call__`` (nutsjump.py:238-291) — whitened
leapfrog trajectory of per-chain random length ``nsteps ∈ [nmin, nmax)`` with
fixed step size and the divergence break ``(joint1 - 1000) < joint0``
(nutsjump.py:285-287), returning the corrected kinetic-energy ``qxy`` (see
``proposals.gradient.make_hmc`` for the documented deviation from the
reference's ``joint1 - joint0``).

TPU-native design. The XLA path (``gradient.make_hmc`` vmapped per chain)
carries [T, C, D] arrays through a ``lax.while_loop``: with small ``ndim``
the minor dimension occupies <<128 lanes, so every VPU op wastes most of the
vector width, and each loop iteration round-trips the carry through HBM.
This kernel instead:

  * lays the batch out **chains-in-lanes**: arrays are [D_pad, N] with the
    flattened (temperature × chain) batch on the 128-wide lane axis and the
    parameter dimension on sublanes — full vector-unit utilization for any
    ``ndim``;
  * runs the *entire* trajectory (all leapfrog steps, gradient evaluations,
    divergence bookkeeping) inside one kernel with every operand resident in
    VMEM — zero HBM traffic between leapfrog steps;
  * handles per-chain trajectory lengths and divergence exits with lane
    masks over a static ``nmax - 1``-step loop (the same bound the vmapped
    ``while_loop`` pays, since its cost is the batch max of ``nsteps``).

Randomness (momenta, trajectory lengths) is drawn *outside* with the
sampler's typed ``jax.random`` keys — bit-identical to the XLA path, which
makes the kernel deterministic given its inputs and exactly testable against
the reference formulation (tests/test_pallas_ops.py).

Off-TPU the kernel runs under the Pallas interpreter (slow but exact), so
the same code path is exercised by the CPU test suite.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANES = 128
_SUBLANES = 8


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _trajectory_kernel(
    q0_ref, p0_ref, beta_ref, nsteps_ref, chol_ref,
    *rest,
    func_grad, ndim, eps, nmax_steps, const_shapes,
):
    const_refs = rest[: len(const_shapes)]
    qout_ref, qxy_ref = rest[len(const_shapes):]
    consts = [
        r[:].reshape(s) for r, s in zip(const_refs, const_shapes)
    ]
    """One grid program: full HMC trajectories for a [D_pad, BN] chain block.

    Whitened coordinates throughout (nutsjump.py:86-90): positions ``q``,
    momenta ``p``; the original-space point is ``x = chol.T @ q`` and the
    whitened gradient is ``chol @ ∂/∂x``.
    """
    dp = q0_ref.shape[0]
    bn = q0_ref.shape[1]
    dtype = q0_ref.dtype
    chol = chol_ref[:]            # [D_pad, D_pad]; identity on padded rows
    beta = beta_ref[0, :]         # [BN]
    epsv = jnp.asarray(eps, dtype)

    def fgw(q):
        """Batched tempered logp + whitened gradient, columns = chains."""
        x = jnp.dot(chol.T, q, preferred_element_type=dtype)  # [D_pad, BN]

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

    def hamiltonian(logp, p):
        h = logp - 0.5 * jnp.sum(p * p, axis=0, keepdims=True)
        return jnp.where(jnp.isnan(h), -jnp.inf, h)

    q0 = q0_ref[:]
    p0 = p0_ref[:]
    logp0, grad0 = fgw(q0)
    joint0 = hamiltonian(logp0, p0)
    nsteps = nsteps_ref[0, :].reshape(1, bn)

    def body(i, carry):
        # `alive` is an int32 {0,1} mask: Mosaic cannot legalize a bool
        # (i1-vector) carry through scf.for.
        q, p, g, logp, joint, alive = carry
        take = (alive > 0) & (i < nsteps)                # [1, BN]
        take_d = jnp.broadcast_to(take, (dp, bn))
        # leapfrog (nutsjump.py:149-169)
        ph = p + 0.5 * epsv * g
        qn = q + epsv * ph
        logpn, gn = fgw(qn)
        pn = ph + 0.5 * epsv * gn
        jn = hamiltonian(logpn, pn)
        diverged = (jn - 1000.0) < joint0                # nutsjump.py:285-287
        q = jnp.where(take_d, qn, q)
        p = jnp.where(take_d, pn, p)
        g = jnp.where(take_d, gn, g)
        logp = jnp.where(take, logpn, logp)
        joint = jnp.where(take, jn, joint)
        alive = jnp.where(take & diverged, jnp.zeros_like(alive), alive)
        return q, p, g, logp, joint, alive

    init = (q0, p0, grad0, logp0, joint0, jnp.ones((1, bn), jnp.int32))
    q, _, _, logp1, joint1, _ = jax.lax.fori_loop(0, nmax_steps, body, init)

    qout_ref[:] = q
    # Kinetic-energy correction (see gradient.make_hmc): the outer MH ratio
    # then equals the Hamiltonian error joint1 - joint0.
    qxy = (joint1 - joint0) - (logp1 - logp0)
    qxy_ref[:] = jnp.where(jnp.isnan(qxy), -jnp.inf, qxy)


def fused_hmc_trajectories(
    q0, p0, beta, nsteps, chol, *, func_grad, ndim, eps, nmax_steps,
    block_n=512, interpret=None,
):
    # block_n: lanes per grid program; see ops/chees_pallas.py — ~14 KB of
    # scoped VMEM per lane on v5e, so 512 stays well under the ~16 MB budget.
    """Run fused whitened-HMC trajectories for a flat chain batch.

    Args:
      q0, p0: [N, D] whitened positions / momenta (row per chain).
      beta:   [N] inverse temperatures.
      nsteps: [N] int32 per-chain trajectory lengths.
      chol:   [D, D] Cholesky factor of the proposal covariance.
    Returns:
      (q1 [N, D] whitened end positions, qxy [N]).
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

    # Pallas kernels cannot capture array constants (user models close over
    # means/bounds/etc.): trace func_grad once, hoist every jaxpr const into
    # an explicit kernel input (shipped to VMEM as a 2-D (1, size) tile and
    # reshaped back inside the kernel), and re-emit the jaxpr in the kernel.
    closed = jax.make_jaxpr(func_grad)(jnp.zeros((d,), dtype), jnp.zeros((), dtype))
    consts = closed.consts

    def fg_conv(x_col, b, *cs):
        val, grad = jax.core.eval_jaxpr(closed.jaxpr, cs, x_col, b)
        return val, grad

    const_shapes = tuple(tuple(np.shape(c)) for c in consts)
    const_in = [jnp.asarray(c).reshape(1, max(1, int(np.size(c)))) for c in consts]

    kern = functools.partial(
        _trajectory_kernel,
        func_grad=fg_conv, ndim=d, eps=eps, nmax_steps=nmax_steps,
        const_shapes=const_shapes,
    )
    grid = (npad // bn,)
    col_spec = lambda rows: pl.BlockSpec(  # noqa: E731
        (rows, bn), lambda i: (0, i), memory_space=pltpu.VMEM
    )
    def rep_spec(shape):
        return pl.BlockSpec(shape, lambda i: (0,) * len(shape), memory_space=pltpu.VMEM)

    qt, qxy = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[col_spec(dp), col_spec(dp), col_spec(1), col_spec(1), rep_spec((dp, dp))]
        + [rep_spec(c.shape) for c in const_in],
        out_specs=[col_spec(dp), col_spec(1)],
        out_shape=[
            jax.ShapeDtypeStruct((dp, npad), dtype),
            jax.ShapeDtypeStruct((1, npad), dtype),
        ],
        interpret=interpret,
    )(
        pad_t(q0), pad_t(p0),
        pad_row(beta, dtype, 1),
        # padded lanes take zero steps -> identity trajectories
        pad_row(nsteps, jnp.int32, 0),
        cholp,
        *const_in,
    )
    return qt[:d, :n].T, qxy[0, :n]


def make_hmc_pallas(config, func_grad, interpret=None):
    """Batch-level HMC branch backed by the fused Pallas kernel.

    Signature matches the batched branch protocol of
    ``proposals.cycle.build_jump_branches``:
        hmc_batch(keys[T,C], x[T,C,D], betas[T], ctx) -> (q[T,C,D], qxy[T,C])

    Randomness (momenta, per-chain ``nsteps``) uses the identical per-chain
    key splits as ``gradient.make_hmc``, so the two paths are bit-comparable.
    """
    ndim = config.ndim
    nmin, nmax = config.hmc_nminsteps, config.hmc_nmaxsteps
    eps = config.hmc_stepsize

    def hmc_batch(keys, x, betas, ctx):
        t, c, d = x.shape
        n = t * c
        kflat = keys.reshape(n)
        kp, kn = jax.vmap(lambda k: tuple(jax.random.split(k)))(kflat)
        p0 = jax.vmap(lambda k: jax.random.normal(k, (d,), dtype=x.dtype))(kp)
        nsteps = jax.vmap(lambda k: jax.random.randint(k, (), nmin, nmax))(kn)

        xf = x.reshape(n, d)
        q0 = xf @ ctx.chol_inv            # rows: forward whitening chol_inv.T @ x
        beta = jnp.repeat(betas, c)

        q1, qxy = fused_hmc_trajectories(
            q0, p0, beta, nsteps, ctx.chol,
            func_grad=func_grad, ndim=ndim, eps=eps,
            nmax_steps=nmax - 1, interpret=interpret,
        )
        xq = q1 @ ctx.chol                # rows: backward chol.T @ q
        return xq.reshape(t, c, d), qxy.reshape(t, c)

    return hmc_batch
