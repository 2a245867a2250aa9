"""No-U-Turn sampler jump, iterative and trace-compatible.

Parity target: ``NUTSJump`` (nutsjump.py:379-840) — slice-sampling NUTS per
Hoffman & Gelman (2011) Algorithm 6 with dual-averaging step-size adaptation.

The reference builds trees by recursion (``build_tree``, nutsjump.py:495-652),
which cannot be traced by XLA. This implementation produces the *same
distribution over trajectories* with an iterative scheme:

* the outer doubling loop is a ``lax.while_loop`` over tree depth
  (nutsjump.py:716-802);
* each depth-``j`` subtree is built by a flat inner ``lax.while_loop`` of at
  most ``2**j`` leapfrog leaves;
* the recursion's per-subtree U-turn checks (``stop_criterion`` applied at
  every internal combine, nutsjump.py:624-630) are reproduced exactly with the
  standard checkpoint scheme: left boundaries of power-of-two blocks are
  pushed on a depth-bounded stack at even leaf indices, and every odd leaf
  checks against the ``trailing_ones`` topmost checkpoints;
* the recursion's uniform-among-valid-leaves subtree proposal (the
  ``nprime2/(nprime+nprime2)`` combination rule, nutsjump.py:615) is
  reproduced by reservoir sampling (replace with prob ``1/n_valid``), which
  has the identical marginal law;
* across doublings, the new half-tree's proposal is accepted with prob
  ``min(1, nprime/n)`` (nutsjump.py:786-791), as in the reference;
* divergence guard ``logu - 1000 < joint`` (nutsjump.py:506) and the slice
  variable ``logu = joint - Exp(1)`` (nutsjump.py:695) are kept verbatim;
* dual averaging uses the reference constants gamma=0.05, t0=10, kappa=0.75
  (nutsjump.py:414-420) and the reference's update equations (:804-816),
  including ``epsilon = epsilonbar`` after burn-in;
* ``qxy = logp0 - logp_final`` so the outer MH step always accepts
  (nutsjump.py:837-840).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .gradient import find_reasonable_epsilon, leapfrog, loghamiltonian, make_whitened_funcs

GAMMA = 0.05
T0 = 10.0
KAPPA = 0.75


def _trailing_ones(k):
    """Number of trailing 1-bits of ``k`` (= trailing zeros of k+1)."""
    kp = k + 1
    return jax.lax.population_count((kp & -kp) - 1)


def make_nuts(config, func_grad, capture=False):
    """Build the NUTS kernel. With ``capture=True`` the returned function also
    returns a trajectory-capture dict (plus/minus branch buffers + used index,
    reference nutsjump.py:294-376, :522-527) for the trajectoryDir facility."""
    forward, backward, fgw = make_whitened_funcs(func_grad)
    ndim = config.ndim
    max_depth = config.nuts_max_depth
    n_buf = 1 << max_depth
    delta = config.nuts_delta
    force_eps = config.nuts_force_epsilon
    force_trajlen = config.nuts_force_trajlen
    nburn = config.burn

    def cont_criterion(dz, r_a, r_b, total_leaves):
        """stop_criterion (nutsjump.py:465-493): True = keep going."""
        cont = (jnp.dot(dz, r_a) >= 0) & (jnp.dot(dz, r_b) >= 0)
        if force_trajlen is not None:
            cont = total_leaves < force_trajlen
        return cont

    def build_subtree(
        key, z, r, grad, v, depth, eps, logu, joint0, beta, ctx, leaves_before, cap=None
    ):
        """Integrate up to 2**depth leaves in direction v from (z, r, grad)."""
        dt = z.dtype
        n_leaves = jnp.left_shift(jnp.ones((), jnp.int32), depth)
        ckpt_z0 = jnp.zeros((max_depth + 1, ndim), dt)
        ckpt_r0 = jnp.zeros((max_depth + 1, ndim), dt)

        def cond(c):
            return (c["k"] < n_leaves) & c["s_sub"]

        def body(c):
            key, k_take = jax.random.split(c["key"])
            k = c["k"]
            z1, r1, g1, logp1 = leapfrog(fgw, ctx, beta, c["z"], c["r"], c["grad"], v * eps)
            joint = loghamiltonian(logp1, r1)
            valid = logu < joint
            diverged = (logu - 1000.0) >= joint

            # Reservoir: uniform among valid leaves of this subtree.
            n_sub = c["n_sub"] + valid.astype(jnp.int32)
            take = valid & (
                jax.random.uniform(k_take) < 1.0 / jnp.maximum(n_sub, 1).astype(dt)
            )
            z_prop = jnp.where(take, z1, c["z_prop"])
            logp_prop = jnp.where(take, logp1, c["logp_prop"])

            alpha = c["alpha"] + jnp.minimum(1.0, jnp.exp(joint - joint0)).astype(dt)
            nalpha = c["nalpha"] + 1.0

            extra = {}
            if capture:
                # Record the leaf in the branch buffer with its global
                # leapfrog-step index (nutsjump.py:522-527).
                gind = c["gind"] + 1
                is_plus = v > 0
                extra = dict(
                    gind=gind,
                    tb_plus=jnp.where(
                        is_plus, c["tb_plus"].at[c["lp_len"]].set(z1), c["tb_plus"]
                    ),
                    ti_plus=jnp.where(
                        is_plus, c["ti_plus"].at[c["lp_len"]].set(gind), c["ti_plus"]
                    ),
                    tb_minus=jnp.where(
                        is_plus, c["tb_minus"], c["tb_minus"].at[c["lm_len"]].set(z1)
                    ),
                    ti_minus=jnp.where(
                        is_plus, c["ti_minus"], c["ti_minus"].at[c["lm_len"]].set(gind)
                    ),
                    lp_len=c["lp_len"] + is_plus.astype(jnp.int32),
                    lm_len=c["lm_len"] + (~is_plus).astype(jnp.int32),
                    used_ind=jnp.where(take, gind, c["used_ind"]),
                )

            # Checkpoint U-turn bookkeeping.
            is_even = (k % 2) == 0
            top = c["top"]
            ckpt_z = jnp.where(
                is_even, c["ckpt_z"].at[top].set(z1), c["ckpt_z"]
            )
            ckpt_r = jnp.where(
                is_even, c["ckpt_r"].at[top].set(r1), c["ckpt_r"]
            )

            t_ones = _trailing_ones(k)

            # Vectorized U-turn check against the ``t_ones`` topmost
            # checkpoints (replaces a per-leaf fori_loop: one gather + two
            # batched dot products instead of max_depth+1 sequential steps).
            ar = jnp.arange(max_depth + 1)
            idxs = jnp.clip(top - 1 - ar, 0, max_depth)
            z_cks = c["ckpt_z"][idxs]  # [K, D]
            r_cks = c["ckpt_r"][idxs]  # [K, D]
            dzv = v * (z1[None, :] - z_cks)
            cont = (jnp.einsum("kd,kd->k", dzv, r_cks) >= 0) & (dzv @ r1 >= 0)
            if force_trajlen is not None:
                cont = jnp.broadcast_to(
                    (leaves_before + k + 1) < force_trajlen, cont.shape
                )
            turning = (~is_even) & jnp.any((ar < t_ones) & ~cont)
            top = jnp.where(is_even, top + 1, top - (t_ones - 1))

            s_sub = ~diverged & ~turning
            return dict(
                dict(
                    key=key,
                    k=k + 1,
                    z=z1,
                    r=r1,
                    grad=g1,
                    n_sub=n_sub,
                    z_prop=z_prop,
                    logp_prop=logp_prop,
                    s_sub=s_sub,
                    diverged=c["diverged"] | diverged,
                    alpha=alpha,
                    nalpha=nalpha,
                    ckpt_z=ckpt_z,
                    ckpt_r=ckpt_r,
                    top=top,
                ),
                **extra,
            )

        init = dict(
            key=key,
            k=jnp.zeros((), jnp.int32),
            z=z,
            r=r,
            grad=grad,
            n_sub=jnp.zeros((), jnp.int32),
            z_prop=z,
            logp_prop=jnp.asarray(-jnp.inf, dt),
            s_sub=jnp.ones((), bool),
            diverged=jnp.zeros((), bool),
            alpha=jnp.zeros((), dt),
            nalpha=jnp.zeros((), dt),
            ckpt_z=ckpt_z0,
            ckpt_r=ckpt_r0,
            top=jnp.zeros((), jnp.int32),
        )
        if capture:
            init.update(cap)
        out = jax.lax.while_loop(cond, body, init)
        return out

    def nuts(key, x, beta, it, ctx, ss):
        """One NUTS trajectory for a single chain.

        ``ss`` is a dict of scalars: epsilon, epsilonbar, hbar, mu, ncalls.
        Returns (q, qxy, new_ss).
        """
        dt = x.dtype
        k_eps, k_mom, k_slice, k_tree = jax.random.split(key, 4)

        q0 = forward(ctx, x)
        logp0, grad0 = fgw(ctx, q0, beta)

        # Step-size initialization (nutsjump.py:671-682).
        if force_eps is not None:
            epsilon = jnp.asarray(force_eps, dt)
            mu = jnp.log(10.0 * epsilon)
        else:
            need_init = ss["epsilon"] <= 0

            def init_eps(_):
                return find_reasonable_epsilon(k_eps, fgw, ctx, beta, q0, grad0, logp0)

            epsilon = jax.lax.cond(need_init, init_eps, lambda _: ss["epsilon"], None)
            mu = jnp.where(need_init, jnp.log(10.0 * epsilon), ss["mu"])

        ncalls = ss["ncalls"] + 1.0

        r0 = jax.random.normal(k_mom, (ndim,), dtype=dt)
        joint0 = loghamiltonian(logp0, r0)
        logu = joint0 - jax.random.exponential(k_slice, dtype=dt)

        def cond(c):
            return c["s"] & (c["j"] < max_depth)

        def body(c):
            key, k_dir, k_sub, k_acc = jax.random.split(c["key"], 4)
            v = jnp.where(jax.random.uniform(k_dir) < 0.5, -1.0, 1.0).astype(dt)
            go_minus = v < 0

            z_edge = jnp.where(go_minus, c["z_minus"], c["z_plus"])
            r_edge = jnp.where(go_minus, c["r_minus"], c["r_plus"])
            g_edge = jnp.where(go_minus, c["g_minus"], c["g_plus"])
            leaves_before = c["n_leaves"]

            cap = None
            if capture:
                cap = dict(
                    gind=c["gind"],
                    tb_plus=c["tb_plus"],
                    ti_plus=c["ti_plus"],
                    tb_minus=c["tb_minus"],
                    ti_minus=c["ti_minus"],
                    lp_len=c["lp_len"],
                    lm_len=c["lm_len"],
                    used_ind=c["used_ind"],
                )
            sub = build_subtree(
                k_sub, z_edge, r_edge, g_edge, v, c["j"], epsilon, logu, joint0, beta,
                ctx, leaves_before, cap,
            )

            z_minus = jnp.where(go_minus, sub["z"], c["z_minus"])
            r_minus = jnp.where(go_minus, sub["r"], c["r_minus"])
            g_minus = jnp.where(go_minus, sub["grad"], c["g_minus"])
            z_plus = jnp.where(go_minus, c["z_plus"], sub["z"])
            r_plus = jnp.where(go_minus, c["r_plus"], sub["r"])
            g_plus = jnp.where(go_minus, c["g_plus"], sub["grad"])

            # Progressive across-doubling sample (nutsjump.py:786-791).
            accept = sub["s_sub"] & (
                jax.random.uniform(k_acc)
                < sub["n_sub"].astype(dt) / jnp.maximum(c["n"], 1).astype(dt)
            )
            z_prop = jnp.where(accept, sub["z_prop"], c["z_prop"])
            logp_prop = jnp.where(accept, sub["logp_prop"], c["logp_prop"])

            n_leaves = leaves_before + sub["k"]
            dz = z_plus - z_minus
            s = sub["s_sub"] & cont_criterion(dz, r_minus, r_plus, n_leaves)

            extra = {}
            if capture:
                # The used index advances only if the subtree's proposal was
                # taken (reference trajind bookkeeping, nutsjump.py:736-791).
                extra = dict(
                    gind=sub["gind"],
                    tb_plus=sub["tb_plus"],
                    ti_plus=sub["ti_plus"],
                    tb_minus=sub["tb_minus"],
                    ti_minus=sub["ti_minus"],
                    lp_len=sub["lp_len"],
                    lm_len=sub["lm_len"],
                    used_ind=jnp.where(accept, sub["used_ind"], c["used_ind"]),
                )
            return dict(
                dict(
                    key=key,
                z_minus=z_minus,
                r_minus=r_minus,
                g_minus=g_minus,
                z_plus=z_plus,
                r_plus=r_plus,
                g_plus=g_plus,
                z_prop=z_prop,
                logp_prop=logp_prop,
                    n=c["n"] + sub["n_sub"],
                    s=s,
                    j=c["j"] + 1,
                    alpha=c["alpha"] + sub["alpha"],
                    nalpha=c["nalpha"] + sub["nalpha"],
                    n_leaves=n_leaves,
                ),
                **extra,
            )

        init = dict(
            key=k_tree,
            z_minus=q0,
            r_minus=r0,
            g_minus=grad0,
            z_plus=q0,
            r_plus=r0,
            g_plus=grad0,
            z_prop=q0,
            logp_prop=logp0,
            n=jnp.ones((), jnp.int32),
            s=jnp.ones((), bool),
            j=jnp.zeros((), jnp.int32),
            alpha=jnp.zeros((), dt),
            nalpha=jnp.zeros((), dt),
            n_leaves=jnp.zeros((), jnp.int32),
        )
        if capture:
            # Start sample goes on the plus buffer with index 0
            # (nutsjump.py:712-713).
            init.update(
                gind=jnp.zeros((), jnp.int32),
                tb_plus=jnp.zeros((n_buf, ndim), dt).at[0].set(q0),
                ti_plus=jnp.zeros((n_buf,), jnp.int32),
                tb_minus=jnp.zeros((n_buf, ndim), dt),
                ti_minus=jnp.zeros((n_buf,), jnp.int32),
                lp_len=jnp.ones((), jnp.int32),
                lm_len=jnp.zeros((), jnp.int32),
                used_ind=jnp.zeros((), jnp.int32),
            )
        out = jax.lax.while_loop(cond, body, init)

        # Dual averaging (nutsjump.py:804-816).
        new_ss = dict(ss)
        new_ss["ncalls"] = ncalls
        new_ss["mu"] = mu
        if force_eps is not None:
            new_ss["epsilon"] = epsilon
            new_ss["epsilonbar"] = epsilon
        else:
            nalpha = jnp.maximum(out["nalpha"], 1.0)
            eta = 1.0 / (ncalls + T0)
            hbar = (1.0 - eta) * ss["hbar"] + eta * (delta - out["alpha"] / nalpha)
            in_burn = it <= nburn
            eps_burn = jnp.exp(mu - jnp.sqrt(ncalls) / GAMMA * hbar)
            eta2 = ncalls**-KAPPA
            epsbar_burn = jnp.exp(
                (1.0 - eta2) * jnp.log(jnp.maximum(ss["epsilonbar"], 1e-30)) + eta2 * jnp.log(eps_burn)
            )
            new_ss["hbar"] = hbar
            new_ss["epsilon"] = jnp.where(in_burn, eps_burn, ss["epsilonbar"]).astype(dt)
            new_ss["epsilonbar"] = jnp.where(in_burn, epsbar_burn, ss["epsilonbar"]).astype(dt)

        qxy = (logp0 - out["logp_prop"]).astype(dt)
        qxy = jnp.where(jnp.isnan(qxy), -jnp.inf, qxy)
        if capture:
            cap = dict(
                plus=out["tb_plus"],
                minus=out["tb_minus"],
                ind_plus=out["ti_plus"],
                ind_minus=out["ti_minus"],
                len_plus=out["lp_len"],
                len_minus=out["lm_len"],
                used_ind=out["used_ind"],
                active=jnp.ones((), bool),
            )
            return backward(ctx, out["z_prop"]), qxy, new_ss, cap
        return backward(ctx, out["z_prop"]), qxy, new_ss

    return nuts
