#!/usr/bin/env python
"""Statistical parity check: sample the curved-likelihood posterior with BOTH
the reference PTMCMCSampler (run from /root/reference, not copied) and this
framework, and compare cold-chain posterior moments.

Trajectory-level comparison is impossible (different RNGs by construction,
SURVEY.md §7 "hard parts"), so parity is defined distributionally: means,
variances, and the x0-x1 covariance of the cold chain must agree within
Monte-Carlo error. Writes PARITY_MEASURED.json.

Usage: python tools/compare_reference.py [niter_ref] [niter_tpu]
"""

import json
import os
import sys
import time
import types

import numpy as np

sys.path.insert(0, "/root/reference")
_v = types.ModuleType("PTMCMCSampler.version")
_v.version = "0.0.0-local"
sys.modules["PTMCMCSampler.version"] = _v
from PTMCMCSampler import PTMCMCSampler as RefSampler  # noqa: E402

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def ref_moments(niter=200000, outdir="/tmp/ref_parity_chains"):
    """Run the reference sampler (AM/SCAM/DE cycle) on the curved target."""
    pmin = np.array([-10.0, -10.0])
    pmax = np.array([10.0, 10.0])

    def lnlike(x):
        ll = np.exp(-x[0] ** 2 - (9 + 4 * x[0] ** 2 + 9 * x[1]) ** 2) + 0.5 * np.exp(
            -8 * x[0] ** 2 - 8 * (x[1] - 2) ** 2
        )
        with np.errstate(divide="ignore"):
            return np.log(ll)

    def lnprior(x):
        if np.all(pmin < x) and np.all(x < pmax):
            return 0.0
        return -np.inf

    s = RefSampler.PTSampler(
        2, lnlike, lnprior, np.eye(2) * 0.1**2,
        outDir=outdir, verbose=False,
    )
    t0 = time.time()
    s.sample(
        np.array([-0.1, -0.5]), niter, burn=10000, thin=1, covUpdate=500,
        SCAMweight=20, AMweight=20, DEweight=20, NUTSweight=0, HMCweight=0,
        MALAweight=0,
    )
    dt = time.time() - t0
    chain = np.loadtxt(os.path.join(outdir, "chain_1.txt"))
    x = chain[niter // 5 :, :2]
    return x, dt


def tpu_moments(niter=20000, nchains=512, outdir="/tmp/tpu_parity_chains"):
    import jax

    from ptmcmcsampler_tpu import PTSampler
    from ptmcmcsampler_tpu.models import CurvedLikelihood

    cl = CurvedLikelihood()
    s = PTSampler(
        2, cl.lnlikefn, cl.lnpriorfn, np.eye(2) * 0.1**2,
        outDir=outdir, verbose=False, ntemps=4, nchains=nchains, seed=1234,
    )
    t0 = time.time()
    state = s.sample(
        np.array([-0.1, -0.5]), niter, burn=niter // 5, thin=1, isave=niter,
        covUpdate=500, SCAMweight=20, AMweight=20, DEweight=20, NUTSweight=0,
        HMCweight=0, MALAweight=0, Tskip=100,
    )
    dt = time.time() - t0
    # Pool the post-burn cold-chain batch across all vmapped chains: grab the
    # final positions plus the thinned history of chain 0.
    hist = s.chain[niter // 4 :]
    finals = np.asarray(jax.device_get(state.x[0]))  # [C, 2]
    x = np.concatenate([hist, finals], axis=0)
    return x, dt


def main():
    niter_ref = int(sys.argv[1]) if len(sys.argv) > 1 else 200000
    niter_tpu = int(sys.argv[2]) if len(sys.argv) > 2 else 20000

    xr, t_ref = ref_moments(niter_ref)
    xt, t_tpu = tpu_moments(niter_tpu)

    def stats(x):
        return dict(
            mean=x.mean(axis=0).tolist(),
            var=x.var(axis=0).tolist(),
            cov01=float(np.cov(x.T)[0, 1]),
            n=int(len(x)),
        )

    sr, st = stats(xr), stats(xt)
    # MC error of the reference mean (tau ~ 400 measured for this cycle).
    tau = 400.0
    se = np.sqrt(np.array(sr["var"]) * tau / len(xr))
    dmean = np.abs(np.array(sr["mean"]) - np.array(st["mean"]))
    ok_mean = bool(np.all(dmean < 6 * se + 0.05))
    ok_var = bool(
        np.all(
            np.abs(np.array(sr["var"]) - np.array(st["var"]))
            < 0.35 * np.array(sr["var"]) + 0.02
        )
    )
    out = dict(
        reference=sr,
        tpu=st,
        ref_seconds=round(t_ref, 1),
        tpu_seconds=round(t_tpu, 1),
        mean_abs_diff=dmean.tolist(),
        mean_tolerance=(6 * se + 0.05).tolist(),
        ok_mean=ok_mean,
        ok_var=ok_var,
        ok=ok_mean and ok_var,
    )
    path = os.path.join(os.path.dirname(__file__), "..", "PARITY_MEASURED.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out, indent=2))
    return out


if __name__ == "__main__":
    main()
