"""Fused NUTS tree kernel (Pallas/TPU).

Reference semantics: ``NUTSJump`` (nutsjump.py:379-840) — slice-sampling NUTS
per Hoffman & Gelman (2011) Algorithm 6, exactly the distribution produced by
the iterative XLA path in ``proposals/nuts.py`` (same doubling loop, same
checkpointed per-subtree U-turn checks, same reservoir subtree sampling, same
divergence guard ``logu - 1000 >= joint``).

Why this kernel exists. The XLA path vmaps a per-chain doubly nested
``lax.while_loop`` over the [T, C] batch; each of the up-to ``2**depth - 1``
sequential leaf bodies round-trips the whole carry through HBM and pays many
small-kernel dispatches, measuring ~1.3 ms *per leaf* for a [8, 1024] batch
(PROFILE_r02.md) — ~84 ms per NUTS iteration at depth 6. This kernel runs the
entire tree in VMEM with chains on the 128-wide lane axis (the layout of
``ops/hmc_pallas.py``), one grid program per lane block.

TPU-native structure:

  * the doubling loop is a static Python ``for`` over levels; each level's
    subtree runs as a static-bound masked ``fori_loop`` over its
    ``2**j`` leaves (depth <= 10 ⇒ <= 1023 leaves total), with the
    checkpoint stack as a dense [depth+1, D, lanes] array and a dynamic top
    pointer — trace/compile size is O(depth) leaf bodies, not
    O(2**depth);
  * per-lane divergence / U-turn / completed-tree states are lane masks over
    the static schedule (the construct validated on hardware by the HMC and
    ChEES kernels; a dynamic trip count crashed the axon TPU worker,
    PROFILE_r02.md);
  * all randomness (momenta, slice exponential, per-doubling directions and
    across-doubling accept uniforms, per-leaf reservoir uniforms) is drawn
    *outside* with the sampler's typed keys and shipped in as kernel inputs,
    so the kernel is a deterministic function of its inputs;
  * dual averaging (nutsjump.py:804-816) and the one-time
    ``find_reasonable_epsilon`` initialization (:671-682) stay outside in
    plain XLA — they are O(T*C) scalar math. The init runs under a *scalar*
    ``lax.cond`` at batch level (every lane initializes at the first NUTS
    call), so later calls never trace through the search loop.

Fallback: ``proposals/nuts.py`` remains the path for
``nuts_max_depth > MAX_UNROLL_DEPTH``, trajectory capture (which re-runs the
XLA kernel's exact key splits), and ``nuts_force_trajlen``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..proposals.gradient import find_reasonable_epsilon, make_whitened_funcs
from ..proposals.nuts import GAMMA, KAPPA, T0

#: Largest tree depth the kernel supports (2**10 - 1 = 1023 leaves; the
#: reference's doubling loop is unbounded, nutsjump.py:716, and real-world
#: hard targets want depth 9-10 trees — worst-case cost is linear in leaves
#: (the block-wide level early-exit usually skips the deep tail), and the
#: per-leaf reservoir-uniform input block at depth 10 is ~0.5 MB of VMEM at
#: the default 128-lane block).
MAX_UNROLL_DEPTH = 10

from .hmc_pallas import _LANES, _SUBLANES, _round_up


def _trailing_ones(k: int) -> int:
    """Trailing 1-bits of a *static* leaf index."""
    kp = k + 1
    return ((kp & -kp)).bit_length() - 1


def _nuts_kernel(
    q0_ref, r0_ref, beta_ref, eps_ref, expo_ref, dirs_ref, accu_ref, resu_ref,
    chol_ref,
    *rest,
    func_grad, ndim, max_depth, const_shapes,
):
    const_refs = rest[: len(const_shapes)]
    (qout_ref, logp0_ref, logpprop_ref, alpha_ref, nalpha_ref,
     alive_ref) = rest[len(const_shapes):]
    consts = [r[:].reshape(s) for r, s in zip(const_refs, const_shapes)]

    dp = q0_ref.shape[0]
    bn = q0_ref.shape[1]
    dtype = q0_ref.dtype
    chol = chol_ref[:]
    beta = beta_ref[0, :]
    eps = eps_ref[0, :].reshape(1, bn)

    def fgw(q):
        """Batched tempered logp + whitened gradient, columns = chains
        (same construction as ops/chees_pallas.py)."""
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

    def rdot(a, b):  # [dp, bn] x [dp, bn] -> [1, bn]
        return jnp.sum(a * b, axis=0, keepdims=True)

    q0 = q0_ref[:]
    r0 = r0_ref[:]
    logp0, grad0 = fgw(q0)
    joint0 = logp0 - 0.5 * rdot(r0, r0)
    joint0 = jnp.where(jnp.isnan(joint0), -jnp.inf, joint0)
    # Slice variable logu = joint0 - Exp(1) (nutsjump.py:695).
    logu = joint0 - expo_ref[0, :].reshape(1, bn)

    # Trajectory-level state (proposals/nuts.py ``init``).
    zm, zp = q0, q0
    rm, rp = r0, r0
    gm, gp = grad0, grad0
    z_prop = q0
    logp_prop = logp0
    n = jnp.ones((1, bn), dtype)
    # Padded lanes (eps == 0) start dead: their identity leapfrogs never
    # diverge or U-turn, so a live padded lane would hold its whole block in
    # the doubling loop and defeat the block-wide early exit below. Their
    # outputs are sliced off by the caller either way.
    s = eps > 0
    alpha = jnp.zeros((1, bn), dtype)
    nalpha = jnp.zeros((1, bn), dtype)

    # Checkpoint stacks as dense [K, dp, bn] arrays with a *dynamic* top
    # pointer, so the per-subtree leaf loop is a static-bound ``fori_loop``
    # (the masked-fori construct hardware-validated by the HMC/ChEES kernels)
    # instead of a full static unroll. Trace/compile size is O(max_depth)
    # leaf bodies, not O(2**max_depth) — the unrolled form took minutes to
    # compile at depth >= 6 and grew ~3x per extra level.
    K = max_depth + 1
    ar_k = jax.lax.broadcasted_iota(jnp.int32, (K, 1), 0)  # [K, 1]

    # Block-wide early exit over doubling levels: level j costs 2**j leaves,
    # but typical trees U-turn at depth 2-4, so once EVERY lane in this
    # block has stopped, the (exponentially dominant) remaining levels are
    # pure masked no-ops — skip them with a scalar lax.cond. Results are
    # bitwise identical: a skipped level only ever touches dead lanes. With
    # the default depth-10 cap this collapses the per-iteration cost from
    # the worst case (1023 leaves) to the batch's actual tree depth.
    carry = (zm, rm, gm, zp, rp, gp, z_prop, logp_prop, n,
             s.astype(jnp.int32), alpha, nalpha)

    for j in range(max_depth):
        def do_level(carry, j=j):
            (zm, rm, gm, zp, rp, gp, z_prop, logp_prop, n, s_i,
             alpha, nalpha) = carry
            alive = s_i > 0
            v = dirs_ref[j, :].reshape(1, bn)  # +-1
            vneg = v < 0
            vneg_d = jnp.broadcast_to(vneg, (dp, bn))
            veps = v * eps

            # Working point = trajectory frontier in direction v.
            z = jnp.where(vneg_d, zm, zp)
            r = jnp.where(vneg_d, rm, rp)
            g = jnp.where(vneg_d, gm, gp)

            n_leaves_j = 1 << j
            gl0 = n_leaves_j - 1  # leaves before doubling j (global row offset)
            # Static slice of this subtree's reservoir uniforms: [2**j, bn].
            resu_j = resu_ref[gl0 : gl0 + n_leaves_j, :]
            ar_rows = jax.lax.broadcasted_iota(jnp.int32, (n_leaves_j, 1), 0)

            def leaf_step(k, carry, veps=veps, v=v, resu_j=resu_j, ar_rows=ar_rows,
                          alive=alive):
                (z, r, g, s_sub, n_sub, zps, lps, alpha, nalpha,
                 stz, str_, top) = carry
                active = s_sub > 0  # i32 mask -> bool (i1 can't be a fori carry)
                active_d = jnp.broadcast_to(active, (dp, bn))

                # leapfrog with signed step (nutsjump.py:149-169)
                rh = r + 0.5 * veps * g
                z1 = z + veps * rh
                logp1, g1 = fgw(z1)
                r1 = rh + 0.5 * veps * g1
                joint = logp1 - 0.5 * rdot(r1, r1)
                joint = jnp.where(jnp.isnan(joint), -jnp.inf, joint)

                valid = logu < joint
                diverged = (logu - 1000.0) >= joint  # nutsjump.py:506

                # Reservoir: uniform among valid leaves of this subtree. Row k
                # of the subtree's pre-drawn uniforms via a masked reduction
                # (dynamic row indexing legalizes poorly on the sublane axis).
                n_sub = n_sub + jnp.where(active & valid, 1.0, 0.0).astype(dtype)
                u_res = jnp.sum(
                    jnp.where(ar_rows == k, resu_j, jnp.zeros_like(resu_j)),
                    axis=0, keepdims=True,
                )
                take = active & valid & (u_res < 1.0 / jnp.maximum(n_sub, 1.0))
                take_d = jnp.broadcast_to(take, (dp, bn))
                zps = jnp.where(take_d, z1, zps)
                lps = jnp.where(take, logp1, lps)

                alpha = alpha + jnp.where(
                    active, jnp.minimum(1.0, jnp.exp(joint - joint0)), 0.0
                ).astype(dtype)
                nalpha = nalpha + jnp.where(active, 1.0, 0.0).astype(dtype)

                # Checkpointed per-subtree U-turn scheme (proposals/nuts.py):
                # even leaves push (z1, r1) at the dynamic stack top; odd leaves
                # check against the trailing_ones(k) topmost checkpoints. The
                # push is a masked write over the stack axis; the checks run
                # against every stack row with a [top - t_ones, top) window mask.
                kp = k + 1
                # popcount of the trailing-ones mask, unrolled over the <=
                # max_depth bits it can occupy (Mosaic has no scalar popcount).
                t_mask = (kp & -kp) - 1
                t_ones = jnp.zeros((), jnp.int32)
                for b in range(max_depth):
                    t_ones = t_ones + ((t_mask >> b) & 1)
                is_even = (k % 2) == 0

                push = (ar_k == top) & is_even & active  # [K, bn] via broadcast
                push_d = push[:, None, :]
                stz = jnp.where(push_d, z1[None], stz)
                str_ = jnp.where(push_d, r1[None], str_)

                dzv = v[None] * (z1[None] - stz)  # [K, dp, bn]
                d_ck = jnp.sum(dzv * str_, axis=1)  # [K, bn]
                d_r1 = jnp.sum(dzv * r1[None], axis=1)  # [K, bn]
                cont = (d_ck >= 0) & (d_r1 >= 0)
                window = (ar_k >= top - t_ones) & (ar_k < top)  # [K, 1]
                turning = (~is_even) & jnp.any(
                    window & ~cont, axis=0, keepdims=True
                )  # [1, bn]

                top = top + jnp.where(is_even, 1, -(t_ones - 1))

                s_sub = jnp.where(
                    active & ~diverged & ~turning, s_sub, jnp.zeros_like(s_sub)
                )
                z = jnp.where(active_d, z1, z)
                r = jnp.where(active_d, r1, r)
                g = jnp.where(active_d, g1, g)
                return (z, r, g, s_sub, n_sub, zps, lps, alpha, nalpha,
                        stz, str_, top)

            def leaf_body(k, carry):
                # Within-level early exit: once every lane's subtree has
                # died (divergence or subtree U-turn), the remaining leaves
                # of this doubling are masked no-ops — skip the leapfrog +
                # gradient entirely (bitwise identical; every state update
                # in leaf_step is already masked by ``active``).
                return jax.lax.cond(
                    jnp.any(carry[3] > 0),
                    lambda c: leaf_step(k, c),
                    lambda c: c,
                    carry,
                )

            init = (
                z, r, g,
                alive.astype(jnp.int32),
                jnp.zeros((1, bn), dtype),
                z,
                jnp.full((1, bn), -jnp.inf, dtype),
                alpha, nalpha,
                jnp.zeros((K, dp, bn), dtype),
                jnp.zeros((K, dp, bn), dtype),
                jnp.zeros((), jnp.int32),
            )
            (z, r, g, s_sub_i, n_sub, zps, lps, alpha, nalpha, _, _, _) = (
                jax.lax.fori_loop(0, n_leaves_j, leaf_body, init)
            )
            s_sub = s_sub_i > 0

            # Advance the frontier in direction v (masked: dead lanes keep state).
            upd_m = jnp.broadcast_to(alive & vneg, (dp, bn))
            upd_p = jnp.broadcast_to(alive & ~vneg, (dp, bn))
            zm = jnp.where(upd_m, z, zm)
            rm = jnp.where(upd_m, r, rm)
            gm = jnp.where(upd_m, g, gm)
            zp = jnp.where(upd_p, z, zp)
            rp = jnp.where(upd_p, r, rp)
            gp = jnp.where(upd_p, g, gp)

            # Progressive across-doubling sample (nutsjump.py:786-791).
            u_acc = accu_ref[j, :].reshape(1, bn)
            accept = s_sub & (u_acc < n_sub / jnp.maximum(n, 1.0))
            accept_d = jnp.broadcast_to(accept, (dp, bn))
            z_prop = jnp.where(accept_d, zps, z_prop)
            logp_prop = jnp.where(accept, lps, logp_prop)
            n = n + n_sub  # n_sub == 0 on dead lanes by construction

            # Whole-trajectory U-turn (stop_criterion, nutsjump.py:465-493).
            dz = zp - zm
            cont = (rdot(dz, rm) >= 0) & (rdot(dz, rp) >= 0)
            s_new = alive & s_sub & cont
            return (zm, rm, gm, zp, rp, gp, z_prop, logp_prop, n,
                    s_new.astype(jnp.int32), alpha, nalpha)

        carry = jax.lax.cond(jnp.any(carry[9] > 0), do_level, lambda c: c, carry)

    (zm, rm, gm, zp, rp, gp, z_prop, logp_prop, n, _s_i, alpha, nalpha) = carry

    qout_ref[:] = z_prop
    logp0_ref[:] = logp0
    logpprop_ref[:] = logp_prop
    alpha_ref[:] = alpha
    nalpha_ref[:] = nalpha
    # Lanes still alive after the last doubling: their tree was cut by the
    # depth cap, not by the U-turn/divergence criterion. The two-pass
    # dispatcher below uses this to route only cap-cut lanes into the deep
    # kernel (completed lanes' outputs are already the full-depth outputs:
    # the deeper levels would have been masked no-ops).
    alive_ref[:] = jnp.where(_s_i > 0, jnp.ones((1, bn), dtype), jnp.zeros((1, bn), dtype))


def fused_nuts_trees(
    q0, r0, beta, eps, expo, dirs, accu, resu, chol,
    *, func_grad, ndim, max_depth, block_n=256, interpret=None,
):
    """Run fused whitened NUTS trees for a flat chain batch.

    Args:
      q0, r0: [N, D] whitened positions / momenta.
      beta:   [N] inverse temperatures.
      eps:    [N] per-chain step sizes.
      expo:   [N] Exp(1) slice draws.
      dirs:   [N, max_depth] +-1 doubling directions.
      accu:   [N, max_depth] across-doubling accept uniforms.
      resu:   [N, n_leaves] per-leaf reservoir uniforms (n_leaves = 2**depth - 1).
      chol:   [D, D] Cholesky factor of the proposal covariance.
    Returns:
      (q_prop [N, D], logp0 [N], logp_prop [N], alpha [N], nalpha [N],
       alive [N] — 1.0 where the tree was cut by the depth cap).
    """
    if max_depth > MAX_UNROLL_DEPTH:
        raise ValueError(
            f"fused_nuts_trees unrolls the leaf schedule; max_depth <= "
            f"{MAX_UNROLL_DEPTH} required (got {max_depth})"
        )
    n, d = q0.shape
    dtype = q0.dtype
    n_leaves = max(1, (1 << max_depth) - 1)
    dp = max(_SUBLANES, _round_up(d, _SUBLANES))
    npad = _round_up(n, _LANES)
    bn = min(block_n, npad)
    npad = _round_up(npad, bn)

    def pad_t(a, rows, fill=0.0):  # [N, cols<=rows] -> [rows, N_pad]
        at = jnp.full((rows, npad), fill, dtype)
        return jax.lax.dynamic_update_slice(at, a.T.astype(dtype), (0, 0))

    def pad_row(a, fill=0.0):
        return pad_t(a.reshape(n, 1), 1, fill)

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

    kern = functools.partial(
        _nuts_kernel, func_grad=fg_conv, ndim=d, max_depth=int(max_depth),
        const_shapes=const_shapes,
    )
    grid = (npad // bn,)
    col_spec = lambda rows: pl.BlockSpec(  # noqa: E731
        (rows, bn), lambda i: (0, i), memory_space=pltpu.VMEM
    )

    def rep_spec(shape):
        return pl.BlockSpec(shape, lambda i: (0,) * len(shape), memory_space=pltpu.VMEM)

    q_prop, logp0, logp_prop, alpha, nalpha, alive = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            col_spec(dp), col_spec(dp), col_spec(1), col_spec(1), col_spec(1),
            col_spec(max_depth), col_spec(max_depth), col_spec(n_leaves),
            rep_spec((dp, dp)),
        ]
        + [rep_spec(c.shape) for c in const_in],
        out_specs=[col_spec(dp), col_spec(1), col_spec(1), col_spec(1),
                   col_spec(1), col_spec(1)],
        out_shape=[
            jax.ShapeDtypeStruct((dp, npad), dtype),
            jax.ShapeDtypeStruct((1, npad), dtype),
            jax.ShapeDtypeStruct((1, npad), dtype),
            jax.ShapeDtypeStruct((1, npad), dtype),
            jax.ShapeDtypeStruct((1, npad), dtype),
            jax.ShapeDtypeStruct((1, npad), dtype),
        ],
        interpret=interpret,
    )(
        pad_t(q0, dp),
        pad_t(r0, dp),
        pad_row(beta, 1.0),
        # padded lanes: eps 0 -> identity leapfrogs, harmless
        pad_row(eps, 0.0),
        pad_row(expo, 0.0),
        pad_t(dirs, max_depth, 1.0),
        pad_t(accu, max_depth, 1.0),
        pad_t(resu, n_leaves, 1.0),
        cholp,
        *const_in,
    )
    return (
        q_prop[:d, :n].T, logp0[0, :n], logp_prop[0, :n],
        alpha[0, :n], nalpha[0, :n], alive[0, :n],
    )


def make_nuts_pallas(config, func_grad, interpret=None):
    """Batch-level NUTS branch backed by the fused Pallas tree kernel.

    Signature matches the batched branch protocol of
    ``proposals.cycle.build_jump_branches``:
        nuts_batch(keys[T,C], x[T,C,D], betas[T], it, ctx, ss) ->
            (q[T,C,D], qxy[T,C], new_ss)

    Semantics match ``proposals.nuts.make_nuts`` (same tree law, same dual
    averaging); the key-split layout differs (randomness is pre-drawn as
    batched arrays), so the two paths are compared statistically, not bitwise
    (tests/test_pallas_nuts.py).
    """
    ndim = config.ndim
    max_depth = config.nuts_max_depth
    block_n = getattr(config, "pallas_nuts_block_n", 128)
    n_leaves = max(1, (1 << max_depth) - 1)
    delta = config.nuts_delta
    force_eps = config.nuts_force_epsilon
    nburn = config.burn
    d1 = int(getattr(config, "nuts_pass1_depth", 0) or 0)
    two_pass = 0 < d1 < max_depth
    forward, backward, fgw = make_whitened_funcs(func_grad)

    def gen_resu(kres, depth):
        """Per-leaf reservoir uniforms, drawn LEVEL BY LEVEL from fold_in
        streams: level j's 2**j leaves use ``fold_in(k_res, j)``, so a
        shallow (pass-1) tree consumes exactly the prefix of the deep tree's
        stream — the bitwise-replay property the two-pass dispatch requires.
        Concatenation order matches the kernel's row offsets (level j reads
        rows [2**j - 1, 2**(j+1) - 1))."""
        parts = [
            jax.vmap(
                lambda k, j=j: jax.random.uniform(
                    jax.random.fold_in(k, j), (1 << j,), dtype=jnp.float32
                )
            )(kres)
            for j in range(depth)
        ]
        return jnp.concatenate(parts, axis=-1)

    def nuts_batch(keys, x, betas, it, ctx, ss):
        t, c, d = x.shape
        nn = t * c
        dt = x.dtype
        kflat = keys.reshape(nn)
        kk = jax.vmap(lambda k: tuple(jax.random.split(k, 6)))(kflat)
        k_eps, k_mom, k_slice, k_dir, k_acc, k_res = kk

        r0 = jax.vmap(lambda k: jax.random.normal(k, (d,), dtype=dt))(k_mom)
        expo = jax.vmap(lambda k: jax.random.exponential(k, dtype=dt))(k_slice)
        dirs = jnp.where(
            jax.vmap(lambda k: jax.random.uniform(k, (max_depth,), dtype=dt))(k_dir)
            < 0.5,
            -1.0,
            1.0,
        ).astype(dt)
        accu = jax.vmap(lambda k: jax.random.uniform(k, (max_depth,), dtype=dt))(k_acc)

        xf = x.reshape(nn, d)
        q0 = xf @ ctx.chol_inv  # rows: forward whitening chol_inv.T @ x
        beta = jnp.repeat(betas, c)

        # Step-size initialization (nutsjump.py:671-682) under a *scalar*
        # cond: all lanes initialize together at the first NUTS call, so the
        # search loops are only executed then — unlike a vmapped per-lane
        # cond, which lowers to select and runs both branches every call.
        eps_state = ss["epsilon"].reshape(nn).astype(dt)
        if force_eps is not None:
            epsilon = jnp.full((nn,), force_eps, dt)
            mu = jnp.log(10.0 * epsilon)
        else:
            need = jnp.any(eps_state <= 0)

            def init_eps(_):
                def one(k, q, b):
                    logp0, grad0 = fgw(ctx, q, b)
                    return find_reasonable_epsilon(k, fgw, ctx, b, q, grad0, logp0)

                return jax.vmap(one)(k_eps, q0, beta)

            eps_init = jax.lax.cond(need, init_eps, lambda _: eps_state, None)
            epsilon = jnp.where(eps_state <= 0, eps_init, eps_state)
            mu = jnp.where(
                eps_state <= 0, jnp.log(10.0 * epsilon), ss["mu"].reshape(nn).astype(dt)
            )

        if not two_pass:
            resu = gen_resu(k_res, max_depth).astype(dt)
            q_prop, logp0, logp_prop, alpha, nalpha, _ = fused_nuts_trees(
                q0, r0, beta, epsilon, expo, dirs, accu, resu, ctx.chol,
                func_grad=func_grad, ndim=ndim, max_depth=max_depth,
                block_n=block_n, interpret=interpret,
            )
        else:
            # Two-pass depth bucketing (round 5, VERDICT r4 item 3). A level
            # of the tree kernel is only skipped when EVERY lane of its
            # 128-wide block has stopped; with typical trees stopping at
            # depth 2-4 and a depth-10 cap, nearly every block still pays
            # the exponentially-dominant deep levels for a few stragglers.
            # Pass 1 runs a cheap depth-d1 kernel for all lanes; the lanes
            # whose tree the CAP cut (not the U-turn/divergence criterion)
            # are packed to the front and REPLAYED from scratch at full
            # depth — identical randomness (prefix-consistent streams), so
            # the composite is bitwise the plain depth-10 kernel — while the
            # packed tail's dead lanes make whole blocks skip every level.
            resu1 = gen_resu(k_res, d1).astype(dt)
            q1, logp0, lp1, alpha1, nalpha1, alive1 = fused_nuts_trees(
                q0, r0, beta, epsilon, expo, dirs[:, :d1], accu[:, :d1],
                resu1, ctx.chol,
                func_grad=func_grad, ndim=ndim, max_depth=d1,
                block_n=block_n, interpret=interpret,
            )
            notdone = alive1 > 0
            nd = notdone.astype(jnp.int32)
            n_s = jnp.sum(nd)
            # Stable partition: cap-cut lanes to slots [0, n_s), completed
            # lanes after — computed with two cumsums plus one scatter (a
            # full argsort costs more at this width).
            pos_nd = jnp.cumsum(nd) - 1
            pos_dn = n_s + jnp.cumsum(1 - nd) - 1
            dest = jnp.where(notdone, pos_nd, pos_dn)  # lane -> slot
            perm = jnp.zeros((nn,), jnp.int32).at[dest].set(
                jnp.arange(nn, dtype=jnp.int32)
            )  # slot -> lane
            slot_live = jnp.arange(nn) < n_s
            # One packed gather for the f32 inputs; keys gather separately.
            packed = jnp.concatenate(
                [q0, r0, beta[:, None], epsilon[:, None], expo[:, None],
                 dirs, accu], axis=1,
            )[perm]
            q0p, r0p = packed[:, :d], packed[:, d : 2 * d]
            betap = packed[:, 2 * d]
            epsp = jnp.where(slot_live, packed[:, 2 * d + 1], 0.0)
            expop = packed[:, 2 * d + 2]
            dirsp = packed[:, 2 * d + 3 : 2 * d + 3 + max_depth]
            accup = packed[:, 2 * d + 3 + max_depth :]
            resup = gen_resu(k_res[perm], max_depth).astype(dt)
            q2, _, lp2, alpha2, nalpha2, _ = fused_nuts_trees(
                q0p, r0p, betap, epsp, expop, dirsp, accup, resup, ctx.chol,
                func_grad=func_grad, ndim=ndim, max_depth=max_depth,
                block_n=block_n, interpret=interpret,
            )
            # Scatter back: lane i's deep result sits at slot dest[i].
            q_prop = jnp.where(notdone[:, None], q2[dest], q1)
            logp_prop = jnp.where(notdone, lp2[dest], lp1)
            alpha = jnp.where(notdone, alpha2[dest], alpha1)
            nalpha = jnp.where(notdone, nalpha2[dest], nalpha1)

        xq = q_prop @ ctx.chol  # rows: backward chol.T @ q
        qxy = (logp0 - logp_prop).astype(dt)
        qxy = jnp.where(jnp.isnan(qxy), -jnp.inf, qxy)

        # Dual averaging (nutsjump.py:804-816) — identical equations and
        # constants to proposals/nuts.py, vectorized over the batch.
        new_ss = dict(ss)
        ncalls = ss["ncalls"] + 1.0
        new_ss["ncalls"] = ncalls
        new_ss["mu"] = mu.reshape(t, c).astype(ss["mu"].dtype)
        if force_eps is not None:
            e = epsilon.reshape(t, c).astype(ss["epsilon"].dtype)
            new_ss["epsilon"] = e
            new_ss["epsilonbar"] = e
        else:
            alpha2 = alpha.reshape(t, c).astype(ss["hbar"].dtype)
            nalpha2 = jnp.maximum(nalpha.reshape(t, c), 1.0).astype(ss["hbar"].dtype)
            eta = 1.0 / (ncalls + T0)
            hbar = (1.0 - eta) * ss["hbar"] + eta * (delta - alpha2 / nalpha2)
            in_burn = it <= nburn
            mu2 = mu.reshape(t, c).astype(ss["hbar"].dtype)
            eps_burn = jnp.exp(mu2 - jnp.sqrt(ncalls) / GAMMA * hbar)
            eta2 = ncalls**-KAPPA
            epsbar_burn = jnp.exp(
                (1.0 - eta2) * jnp.log(jnp.maximum(ss["epsilonbar"], 1e-30))
                + eta2 * jnp.log(eps_burn)
            )
            new_ss["hbar"] = hbar
            new_ss["epsilon"] = jnp.where(in_burn, eps_burn, ss["epsilonbar"]).astype(
                ss["epsilon"].dtype
            )
            new_ss["epsilonbar"] = jnp.where(
                in_burn, epsbar_burn, ss["epsilonbar"]
            ).astype(ss["epsilonbar"].dtype)

        return xq.reshape(t, c, d), qxy.reshape(t, c), new_ss

    return nuts_batch
