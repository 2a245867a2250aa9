"""Worker for the real 2-process jax.distributed test (run as a subprocess).

The SPMD analogue of actually launching the reference under ``mpirun -np N``
(README.md:40-46), which its CI never does (SURVEY.md §4): two OS processes
join a coordinator, build the hybrid (temp x chain) mesh with the chain axis
tiling processes, run the jitted sampler step program collectively, and print
replicated results that the test asserts are identical across processes.

Usage: python _distributed_worker.py <process_id> <num_processes> <port>
"""

import os
import sys

pid = int(sys.argv[1])
nproc = int(sys.argv[2])
port = int(sys.argv[3])

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
assert jax.process_count() == nproc, jax.process_count()
assert jax.device_count() == 4 * nproc

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from ptmcmcsampler_tpu.config import SamplerConfig, build_default_jumps  # noqa: E402
from ptmcmcsampler_tpu.kernel import build_step  # noqa: E402
from ptmcmcsampler_tpu.ladder import ladder_betas, temperature_ladder  # noqa: E402
from ptmcmcsampler_tpu.parallel.mesh import shard_state_global  # noqa: E402
from ptmcmcsampler_tpu.state import init_state  # noqa: E402

# temp axis inside each process's devices, chain axis across processes.
mesh = make_pt_mesh(ntemp_devices=4, nchain_devices=nproc)
assert mesh.shape == {"temp": 4, "chain": nproc}

# BASELINE.json config 5 shape: many-rung ADAPTIVE ladder sharded over the
# mesh, ppermute (DEO) replica exchange, DE buffer in the cycle — across two
# real OS processes.
ndim, ntemps, nchains = 3, 8, 2 * nproc


def logl(x):
    return -0.5 * jnp.sum(x**2)


def logp(x):
    return jnp.where(jnp.all(jnp.abs(x) < 20.0), 0.0, -jnp.inf)


cfg = SamplerConfig(
    ndim=ndim, ntemps=ntemps, nchains=nchains,
    groups=(tuple(range(ndim)),),
    jumps=build_default_jumps(burn=20),
    tskip=5, cov_update=20, burn=1000, thin=1, de_size=50,
    swap_mode="deo", adapt_ladder=True, ladder_adapt_lag=100.0,
    ladder_adapt_time=5.0,
)
step, run_block = build_step(cfg, logl, logp, mesh=mesh, temp_axis="temp")
ladder = temperature_ladder(ndim, ntemps)
_, betas = ladder_betas(ladder)
x0 = np.zeros(ndim) + 0.3
xs = np.broadcast_to(x0, (ntemps, nchains, ndim))
ll0 = np.asarray([[float(-0.5 * np.sum(x**2)) for x in row] for row in xs])
lp0 = np.zeros((ntemps, nchains))
betas0 = np.array(betas)
state = init_state(cfg, jax.random.key(0), x0, np.eye(ndim) * 0.1, betas, ll0, lp0)
state = shard_state_global(state, mesh, axis="temp", chain_axis="chain")

state, out = run_block(state, 200)

# Replicated state (the covariance every device computes identically) is
# addressable everywhere; sharded leaves must be reduced to replicated
# outputs through jit before a host fetch.
cov = np.asarray(jax.device_get(state.adapt.cov))
from jax.sharding import NamedSharding, PartitionSpec as P  # noqa: E402

total_acc = jax.jit(
    lambda s: jnp.sum(s.counters.naccepted),
    out_shardings=NamedSharding(mesh, P()),
)(state)
swap_acc = jax.jit(
    lambda s: jnp.sum(s.counters.swaps_accepted),
    out_shardings=NamedSharding(mesh, P()),
)(state)
# The adaptive (sharded) ladder must have moved and stayed ordered.
betas_rep = jax.jit(
    lambda s: s.betas, out_shardings=NamedSharding(mesh, P())
)(state)
betas_host = np.asarray(jax.device_get(betas_rep))
assert np.all(np.diff(betas_host) < 0) and np.all(betas_host > 0), betas_host
assert not np.allclose(betas_host, betas0), betas_host  # geometry adapted
print(
    "RESULT",
    pid,
    int(jax.device_get(total_acc)),
    int(jax.device_get(swap_acc)),
    round(float(np.trace(cov)), 6),
    round(float(betas_host[1]), 6),
    flush=True,
)
