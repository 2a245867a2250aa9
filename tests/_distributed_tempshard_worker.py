"""Worker for the 2-process TEMPERATURE-sharded PTSampler test.

The complementary layout to ``_distributed_sampler_worker.py`` (which tiles
the chain axis across processes): here the temperature axis itself spans the
two processes, so the replica-exchange collective crosses the process
boundary every ``tskip`` iterations and each process drains the chain files
of the temperatures it owns. With ``swap_mode`` left unset this also proves
the auto-DEO routing (a sharded temp axis must select the ppermute exchange)
in a real multi-process run, and the neff termination check exercises the
non-owner stop-vote gating (the process without the cold chain must vote 0).

Usage: python _distributed_tempshard_worker.py <pid> <nproc> <port> <outdir>
"""

import os
import sys

pid = int(sys.argv[1])
nproc = int(sys.argv[2])
port = int(sys.argv[3])
outdir = sys.argv[4]

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from ptmcmcsampler_tpu.parallel import initialize_distributed  # noqa: E402
from ptmcmcsampler_tpu.parallel.mesh import make_temp_mesh  # noqa: E402

initialize_distributed(
    coordinator_address=f"localhost:{port}",
    num_processes=nproc,
    process_id=pid,
    cluster_detection_method="deactivate",
)
assert jax.process_count() == nproc

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from ptmcmcsampler_tpu import PTSampler  # noqa: E402

# 1-D mesh over ALL devices: the temperature axis spans both processes.
mesh = make_temp_mesh(4 * nproc)
ndim, ntemps, nchains = 2, 4 * nproc, 4


def logl(x):
    return -0.5 * jnp.sum(x**2)


def logp(x):
    return jnp.where(jnp.all(jnp.abs(x) < 20.0), 0.0, -jnp.inf)


s = PTSampler(
    ndim, logl, logp, np.eye(ndim),
    ntemps=ntemps, nchains=nchains, outDir=outdir,
    verbose=(pid == 0), resume=False, seed=11,
    mesh=mesh,  # swap_mode left unset: must auto-route to DEO
)
s.sample(
    np.zeros(ndim) + 0.1, 160, burn=20, thin=1, isave=40, Tskip=5,
    covUpdate=40, SCAMweight=5, AMweight=5, DEweight=5, neff=10**9,
)

assert s.config.swap_mode == "deo", s.config.swap_mode
# The process owning (temp 0, chain 0) is the only one allowed to vote a
# nonzero neff; the mesh's first devices belong to process 0.
owns = s._owns_cold
assert owns == (pid == 0), (pid, owns)

from jax.sharding import NamedSharding, PartitionSpec as P  # noqa: E402

rep = NamedSharding(mesh, P())
swaps = jax.jit(
    lambda st: jnp.sum(st.counters.swaps_accepted), out_shardings=rep
)(s.state)
jp, ja, mean_acc = s._pooled_stats_fn(s.state)
it_rep = jax.jit(lambda st: st.it, out_shardings=rep)(s.state)
print(
    "RESULT", pid,
    int(np.asarray(jax.device_get(it_rep))),
    int(jax.device_get(swaps)),
    int(np.asarray(jax.device_get(jp)).sum()),
    round(float(jax.device_get(mean_acc)), 6),
    int(owns),
    flush=True,
)
