#!/usr/bin/env python
"""Isolate NUTS per-iteration cost drivers on the real chip.

Variants:
  base          — NUTS branch as-is (depth from arg)
  force_eps     — nuts_force_epsilon set: no find_reasonable_epsilon branch,
                  no dual averaging (isolates the vmapped-cond eps-init cost)
Usage: python tools/nuts_probe.py [depth=6] [nchains=1024] [iters=60]
"""

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def log(m):
    print(f"[probe {time.strftime('%H:%M:%S')}] {m}", file=sys.stderr, flush=True)


def main():
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    import jax.numpy as jnp
    import numpy as np

    from ptmcmcsampler_tpu.config import JumpSpec, SamplerConfig, KIND_NUTS
    from ptmcmcsampler_tpu.kernel import build_step
    from ptmcmcsampler_tpu.ladder import ladder_betas, temperature_ladder
    from ptmcmcsampler_tpu.models import CurvedLikelihood
    from ptmcmcsampler_tpu.state import init_state

    kwargs = dict(a.split("=", 1) for a in sys.argv[1:] if "=" in a)
    depth = int(kwargs.get("depth", "6"))
    nc = int(kwargs.get("nchains", "1024"))
    iters = int(kwargs.get("iters", "60"))
    ntemps = 8

    model = CurvedLikelihood()
    x0 = np.array([-0.1, -0.5])

    def func_grad(x, beta):
        ll, gll = model.lnlikefn_grad(x)
        lp, glp = model.lnpriorfn_grad(x)
        return beta * ll + lp, beta * gll + glp

    bn = int(kwargs.get("block_n", "256"))
    variants = [
        # nuts_impl pinned: "auto" now rides the Pallas kernel on TPU, so
        # the XLA baseline must force the portable path explicitly.
        ("base", {"nuts_impl": "xla"}),
        ("force_eps", {"nuts_force_epsilon": 0.12, "nuts_impl": "xla"}),
        ("pallas", {"nuts_impl": "pallas", "pallas_nuts_block_n": bn}),
    ]
    only = kwargs.get("only")
    if only:
        variants = [v for v in variants if v[0] in only.split(",")]
    for name, extra in variants:
        cfg = SamplerConfig(
            ndim=model.ndim, ntemps=ntemps, nchains=nc,
            groups=(tuple(range(model.ndim)),),
            jumps=(JumpSpec("N", KIND_NUTS, 1),),
            tskip=100, cov_update=1000, burn=500, thin=1, de_size=2000,
            nuts_max_depth=depth, **extra,
        )
        step, run_block = build_step(cfg, model.lnlikefn, model.lnpriorfn, func_grad)
        ladder = temperature_ladder(model.ndim, ntemps)
        _, betas = ladder_betas(ladder)
        xs = jnp.broadcast_to(jnp.asarray(x0, cfg.dtype), (ntemps, nc, model.ndim))
        ll0 = jax.vmap(jax.vmap(model.lnlikefn))(xs)
        lp0 = jax.vmap(jax.vmap(model.lnpriorfn))(xs)
        state = init_state(cfg, jax.random.key(1), x0, np.eye(model.ndim), betas, ll0, lp0)

        log(f"{name} depth={depth} nchains={nc}: compiling...")
        t0 = time.time()
        state, out = run_block(state, iters)
        float(jax.device_get(jnp.sum(out.lnlike)))
        compile_s = time.time() - t0
        t0 = time.time()
        state, out = run_block(state, iters)
        float(jax.device_get(jnp.sum(out.lnlike)))
        dt = time.time() - t0
        print(json.dumps(dict(
            variant=name, depth=depth, nchains=nc,
            per_iter_us=round(dt / iters * 1e6, 1), compile_s=round(compile_s, 1),
        )), flush=True)


if __name__ == "__main__":
    main()
