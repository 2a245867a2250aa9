#!/usr/bin/env python
"""The curved ("banana") likelihood — the reference's headline workload
(examples/curved_likelihood.ipynb) with parallel tempering, the full jump
cycle including NUTS/HMC, and vmapped chains.

Run: python examples/curved_likelihood.py
"""

from pathlib import Path

import numpy as np

from ptmcmcsampler_tpu import PTSampler
from ptmcmcsampler_tpu.models import CurvedLikelihood

cl = CurvedLikelihood()
p0 = np.array([-0.1, -0.5])
cov = np.diag([1.0, 1.0])

sampler = PTSampler(
    2,
    cl.lnlikefn,
    cl.lnpriorfn,
    np.copy(cov),
    logl_grad=cl.lnlikefn_grad,
    logp_grad=cl.lnpriorfn_grad,
    outDir=str(Path(__file__).parent / "chains_curved"),
    ntemps=8,
    nchains=256,
    seed=0,
)

sampler.sample(
    p0, 100000, burn=10000, thin=1,
    SCAMweight=10, AMweight=10, DEweight=10, NUTSweight=10, HMCweight=10,
    MALAweight=0, HMCsteps=50, HMCstepsize=0.08,
)

chain = sampler.chain[20000:]
print("\ncold-chain mean:", chain.mean(axis=0))
