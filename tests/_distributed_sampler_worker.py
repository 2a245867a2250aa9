"""Worker for the 2-process user-facing PTSampler test (run as a subprocess).

The full ``mpirun -np N script.py`` user experience of the reference
(README.md:40-46): every process runs the SAME driver script — constructs a
``PTSampler`` over a multi-process mesh, calls ``sample()``, and the sampler
itself handles per-process chain-file I/O, pooled statistics, checkpointing,
and the collective stop decision. Phase 2 re-runs with ``resume=True`` to
exercise the multi-process checkpoint-resume path.

Usage: python _distributed_sampler_worker.py <process_id> <nproc> <port> <outdir>
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

from ptmcmcsampler_tpu.parallel import initialize_distributed, make_pt_mesh  # noqa: E402

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

# temp axis within each process's 4 devices; chain axis tiles the processes.
mesh = make_pt_mesh(ntemp_devices=4, nchain_devices=nproc)

ndim, ntemps, nchains = 2, 4, 4 * nproc


def logl(x):
    return -0.5 * jnp.sum(x**2)


def logp(x):
    return jnp.where(jnp.all(jnp.abs(x) < 20.0), 0.0, -jnp.inf)


def make_sampler(resume):
    return PTSampler(
        ndim, logl, logp, np.eye(ndim),
        ntemps=ntemps, nchains=nchains, outDir=outdir,
        verbose=(pid == 0), resume=resume, seed=42,
        mesh=mesh, swap_mode="deo",
    )


s = make_sampler(False)
# neff (astronomically high, so it never stops the run early) forces the
# ESS termination check to run on the chain-sharded host history every
# drain — a global-width seed row mixed with local-width drain blocks used
# to crash np.concatenate here and hang the peers (round-3 review fix).
s.sample(
    np.zeros(ndim) + 0.2, 120, burn=20, thin=1, isave=30, Tskip=5,
    covUpdate=30, SCAMweight=5, AMweight=5, DEweight=5, neff=10**9,
)
# The all-chain accessor must concatenate the local blocks cleanly on every
# process (owners hold local-width rows, non-owners an empty window).
chs = s.chains
assert chs.ndim == 3 and chs.shape[2] == ndim, chs.shape

# Pooled (replicated) counters must be identical across processes.
jp, ja, mean_acc = s._pooled_stats_fn(s.state)
print(
    "PHASE1", pid,
    int(np.asarray(jax.device_get(jp)).sum()),
    int(np.asarray(jax.device_get(ja)).sum()),
    round(float(jax.device_get(mean_acc)), 6),
    flush=True,
)

# Resume across the process group from the multi-process checkpoint.
s2 = make_sampler(True)
s2.sample(
    np.zeros(ndim) + 0.2, 240, burn=20, thin=1, isave=30, Tskip=5,
    covUpdate=30, SCAMweight=5, AMweight=5, DEweight=5,
)
it_after = int(np.asarray(jax.device_get(
    jax.jit(lambda st: st.it,
            out_shardings=jax.sharding.NamedSharding(
                mesh, jax.sharding.PartitionSpec()))(s2.state)
)))
jp2, ja2, mean_acc2 = s2._pooled_stats_fn(s2.state)
print(
    "PHASE2", pid, it_after,
    int(np.asarray(jax.device_get(jp2)).sum()),
    round(float(jax.device_get(mean_acc2)), 6),
    flush=True,
)
