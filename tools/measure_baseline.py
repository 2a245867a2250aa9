"""Measure the reference PTMCMCSampler's throughput on the curved likelihood.

The reference publishes no benchmark numbers (BASELINE.md), so the baseline is
measured operationally: run the reference sampler single-process (the
`nompi4py` fallback — mpirun is unavailable in this environment; note that
`mpirun -np 8` runs the 8 temperature ranks concurrently, so its cold-chain
wall-clock per iteration is the same as single-process while swaps improve
mixing somewhat) on the curved-likelihood workload of
examples/curved_likelihood.ipynb and record iterations/sec and effective
samples/sec of the cold chain.

Usage: python tools/measure_baseline.py [niter]
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, "/root/reference")

# The reference package expects a setuptools_scm-generated version module;
# stub it since we import straight from the source tree.
import types  # noqa: E402

_v = types.ModuleType("PTMCMCSampler.version")
_v.version = "0.0.0-local"
sys.modules["PTMCMCSampler.version"] = _v

from PTMCMCSampler import PTMCMCSampler  # noqa: E402

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from ptmcmcsampler_tpu import diagnostics  # noqa: E402


class CurvedLikelihood(object):
    """Curved likelihood exactly as in curved_likelihood.ipynb cell 1."""

    def __init__(self):
        self.pmin = np.array([-10.0, -10.0])
        self.pmax = np.array([10.0, 10.0])

    def lnlikefn(self, x):
        ll = np.exp(-x[0] ** 2 - (9 + 4 * x[0] ** 2 + 9 * x[1]) ** 2) + 0.5 * np.exp(
            -8 * x[0] ** 2 - 8 * (x[1] - 2) ** 2
        )
        return np.log(ll)

    def lnlikefn_grad(self, x):
        ll_0 = -x[0] ** 2 - (9 + 4 * x[0] ** 2 + 9 * x[1]) ** 2
        ll_1 = -8 * x[0] ** 2 - 8 * (x[1] - 2) ** 2
        ll_0_grad = np.array(
            [-2.0 * x[0] - 2.0 * (9 + 4 * x[0] ** 2 + 9 * x[1]) * (8 * x[0]),
             -18.0 * (9 + 4 * x[0] ** 2 + 9 * x[1])]
        )
        ll_1_grad = np.array([-16 * x[0], -16 * (x[1] - 2)])
        lik = np.exp(ll_0) + 0.5 * np.exp(ll_1)
        ll_grad = (np.exp(ll_0) * ll_0_grad + 0.5 * np.exp(ll_1) * ll_1_grad) / lik
        return np.log(lik), ll_grad

    def lnpriorfn(self, x):
        if np.all(self.pmin < x) and np.all(self.pmax > x):
            return 0.0
        return -np.inf

    def lnpriorfn_grad(self, x):
        return self.lnpriorfn(x), np.zeros_like(x)


def main(niter=20000, burn_frac=0.2, with_grads=True, outdir="/tmp/ref_chains"):
    cl = CurvedLikelihood()
    p0 = np.array([-0.1, -0.5])
    cov = np.diag([1.0, 1.0])
    kwargs = dict(outDir=outdir, verbose=False)
    if with_grads:
        kwargs.update(logl_grad=cl.lnlikefn_grad, logp_grad=cl.lnpriorfn_grad)
    sampler = PTMCMCSampler.PTSampler(2, cl.lnlikefn, cl.lnpriorfn, np.copy(cov), **kwargs)

    t0 = time.time()
    sampler.sample(
        p0, niter, burn=int(niter * burn_frac), thin=1,
        SCAMweight=10, AMweight=10, DEweight=10,
        NUTSweight=10 if with_grads else 0,
        HMCweight=10 if with_grads else 0,
        MALAweight=0, HMCsteps=50, HMCstepsize=0.08,
    )
    elapsed = time.time() - t0

    chain = np.loadtxt(os.path.join(outdir, "chain_1.txt"), ndmin=2)
    burn_rows = int(niter * burn_frac)
    post = chain[burn_rows:, :2]
    tau = diagnostics.max_autocorr_time(post)
    ess = len(post) / tau
    result = dict(
        niter=niter,
        elapsed_sec=elapsed,
        iters_per_sec=niter / elapsed,
        max_tau=tau,
        ess=ess,
        ess_per_sec=ess / elapsed,
        with_grads=with_grads,
    )
    print(json.dumps(result))
    return result


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 20000
    grads = "--no-grads" not in sys.argv
    main(n, with_grads=grads)
