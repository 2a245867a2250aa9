"""Multi-host distribution helpers.

The reference distributes with ``mpirun -np N`` over mpi4py (README.md:40-46,
PTMCMCSampler.py:9-13); the TPU-native equivalent is one SPMD program over a
multi-host device mesh: ``jax.distributed.initialize`` forms the runtime
process group, and a 2-D (temperature x chain) mesh lays temperatures out so
replica-exchange collectives ride ICI within a slice while the chain axis
(pure data parallelism: no cross-chain communication except the shared
covariance moments) spans DCN across hosts.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.experimental import mesh_utils
from jax.sharding import Mesh

_initialized = False


def initialize_distributed(
    coordinator_address=None, num_processes=None, process_id=None, **kwargs
):
    """Join the multi-host process group (idempotent).

    On Cloud TPU pods the arguments are auto-detected from the environment;
    pass them explicitly elsewhere. Single-process runs are a no-op, mirroring
    the reference's ``nompi4py.MPIDummy`` serial fallback (nompi4py.py:1-37).
    """
    global _initialized
    if _initialized:
        return
    if num_processes in (None, 1) and coordinator_address is None:
        try:
            if jax.process_count() <= 1:
                _initialized = True
                return
        except RuntimeError:
            pass
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
        **kwargs,
    )
    _initialized = True


def make_pt_mesh(ntemp_devices=None, nchain_devices=1, devices=None,
                 temp_axis="temp", chain_axis="chain"):
    """2-D (temp, chain) device mesh.

    ``temp`` is the replica-exchange axis: adjacent temperatures exchange
    state every ``tskip`` iterations, so this axis should stay within an ICI
    domain. ``chain`` is embarrassingly parallel (only the psum'd covariance
    moments cross it) and can safely span DCN. On a multi-host platform the
    mesh is built with ``create_hybrid_device_mesh`` so the chain axis maps to
    the DCN (inter-host) dimension.
    """
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if ntemp_devices is None:
        ntemp_devices = n // nchain_devices
    assert ntemp_devices * nchain_devices <= n, (
        f"mesh {ntemp_devices}x{nchain_devices} needs more than {n} devices"
    )
    shape = (ntemp_devices, nchain_devices)
    try:
        if jax.process_count() > 1:
            # chain (DP-like) across hosts, temp within a host's ICI domain.
            dmesh = mesh_utils.create_hybrid_device_mesh(
                mesh_shape=(ntemp_devices, nchain_devices // max(jax.process_count(), 1) or 1),
                dcn_mesh_shape=(1, jax.process_count()),
                devices=devices,
            )
        else:
            dmesh = mesh_utils.create_device_mesh(shape, devices=devices[: ntemp_devices * nchain_devices])
    except Exception:
        dmesh = np.asarray(devices[: ntemp_devices * nchain_devices]).reshape(shape)
    return Mesh(dmesh, (temp_axis, chain_axis))


def process_local_block(sampler_state, mesh, temp_axis="temp"):
    """Addressable (this-host) slice of a sharded state's positions — the
    analogue of an MPI rank's local chain for host-side I/O."""
    x = sampler_state.x
    return [s.data for s in x.addressable_shards]
