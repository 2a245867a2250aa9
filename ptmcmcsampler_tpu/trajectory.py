"""NUTS trajectory capture and dump facility.

Parity target: the reference's ``Trajectory`` buffer (nutsjump.py:294-376) and
the ``trajectoryDir`` / ``write_burnin`` dump mechanism (nutsjump.py:400-433,
:818-835), which write every NUTS trajectory's plus branch, minus branch, and
the used (start -> chosen sample) path to text files for debugging and
visualization.

TPU-native design: the reference grows numpy buffers imperatively inside the
recursion; here the capture kernel (``proposals.nuts.make_nuts(capture=True)``)
fills fixed-size device buffers for the designated chain (temperature 0,
chain 0) inside the jitted program, and the host-side :class:`TrajectoryWriter`
formats them into files with the reference's exact naming scheme. The
:class:`Trajectory` class mirrors the reference buffer API for users who drove
it directly.

Positions are recorded in the whitened coordinate system, as in the reference
(nutsjump.py:523-527 stores ``thetaprime``, the whitened leapfrog position).
"""

from __future__ import annotations

import os

import chex
import jax
import jax.numpy as jnp
import numpy as np


@chex.dataclass
class TrajCapture:
    """Device-side capture of one NUTS trajectory for one designated chain.

    ``ind`` values are the global leapfrog-step indices of the reference
    (nutsjump.py:713-714, :522-527): the start sample has index 0 on the plus
    buffer, and every subsequent leaf increments a global counter regardless of
    branch.
    """

    plus: jax.Array  # [L, D] whitened positions, plus branch
    minus: jax.Array  # [L, D] whitened positions, minus branch
    ind_plus: jax.Array  # [L] global step index per plus row
    ind_minus: jax.Array  # [L] global step index per minus row
    len_plus: jax.Array  # scalar i32
    len_minus: jax.Array  # scalar i32
    used_ind: jax.Array  # scalar i32: global index of the chosen sample
    active: jax.Array  # scalar bool: a NUTS jump ran this iteration


def empty_capture(config) -> TrajCapture:
    leaves = 1 << config.nuts_max_depth
    d, dt = config.ndim, config.dtype
    return TrajCapture(
        plus=jnp.zeros((leaves, d), dt),
        minus=jnp.zeros((leaves, d), dt),
        ind_plus=jnp.zeros((leaves,), jnp.int32),
        ind_minus=jnp.zeros((leaves,), jnp.int32),
        len_plus=jnp.zeros((), jnp.int32),
        len_minus=jnp.zeros((), jnp.int32),
        used_ind=jnp.zeros((), jnp.int32),
        active=jnp.zeros((), bool),
    )


class Trajectory:
    """Host-side trajectory buffer, API-compatible with the reference
    ``Trajectory`` (nutsjump.py:294-376): ``add_sample`` / ``get_trajectory`` /
    ``get_used_trajectory`` / ``reset`` / ``length``."""

    def __init__(self, ndim, bufsize=1000):
        self.ndim = ndim
        self.bufadd = bufsize
        self.bufsize_plus = bufsize
        self.bufsize_minus = bufsize
        self.trajlen_plus = 0
        self.trajlen_minus = 0
        self.trajbuf_plus = np.zeros((self.bufsize_plus, ndim))
        self.trajind_plus = np.zeros(self.bufsize_plus)
        self.trajbuf_minus = np.zeros((self.bufsize_minus, ndim))
        self.trajind_minus = np.zeros(self.bufsize_minus)

    def reset(self):
        self.trajlen_plus = 0
        self.trajlen_minus = 0

    def _grow(self, which):
        if which == "plus":
            self.trajbuf_plus = np.append(
                self.trajbuf_plus, np.zeros((self.bufadd, self.ndim)), axis=0
            )
            self.trajind_plus = np.append(self.trajind_plus, np.zeros(self.bufadd))
            self.bufsize_plus += self.bufadd
        else:
            self.trajbuf_minus = np.append(
                self.trajbuf_minus, np.zeros((self.bufadd, self.ndim)), axis=0
            )
            self.trajind_minus = np.append(self.trajind_minus, np.zeros(self.bufadd))
            self.bufsize_minus += self.bufadd

    def add_sample(self, theta, ind, which="plus"):
        if which == "plus":
            if self.trajlen_plus >= self.bufsize_plus:
                self._grow("plus")
            self.trajbuf_plus[self.trajlen_plus, :] = theta
            self.trajind_plus[self.trajlen_plus] = ind
            self.trajlen_plus += 1
        else:
            if self.trajlen_minus >= self.bufsize_minus:
                self._grow("minus")
            self.trajbuf_minus[self.trajlen_minus, :] = theta
            self.trajind_minus[self.trajlen_minus] = ind
            self.trajlen_minus += 1

    def length(self):
        return self.trajlen_plus + self.trajlen_minus

    def get_trajectory(self, which="both"):
        if which == "both":
            return (
                np.append(
                    self.trajbuf_minus[: self.trajlen_minus][::-1, :],
                    self.trajbuf_plus[: self.trajlen_plus, :],
                    axis=0,
                ),
                np.append(
                    self.trajind_minus[: self.trajlen_minus][::-1],
                    self.trajind_plus[: self.trajlen_plus],
                ),
            )
        if which == "plus":
            return (
                self.trajbuf_plus[: self.trajlen_plus],
                self.trajind_plus[: self.trajlen_plus],
            )
        return (
            self.trajbuf_minus[: self.trajlen_minus],
            self.trajind_minus[: self.trajlen_minus],
        )

    def get_used_trajectory(self, ind):
        """Path from the start point to the sample with global index ``ind``
        (nutsjump.py:364-375)."""
        tiplus = self.trajind_plus[: self.trajlen_plus]
        timinus = self.trajind_minus[: self.trajlen_minus]
        if ind in tiplus:
            index = int(np.where(tiplus == ind)[0][0]) + 1
            return self.trajbuf_plus[:index, :]
        if ind in timinus:
            index = int(np.where(timinus == ind)[0][0]) + 1
            return np.append(
                self.trajbuf_plus[:1, :], self.trajbuf_minus[:index, :], axis=0
            )
        raise ValueError("Index not found")


def capture_to_trajectory(cap: dict, ndim: int) -> Trajectory:
    """Materialize a host :class:`Trajectory` from device capture arrays."""
    tr = Trajectory(ndim, bufsize=max(int(cap["len_plus"]), int(cap["len_minus"]), 1))
    for i in range(int(cap["len_plus"])):
        tr.add_sample(np.asarray(cap["plus"][i]), int(cap["ind_plus"][i]), "plus")
    for i in range(int(cap["len_minus"])):
        tr.add_sample(np.asarray(cap["minus"][i]), int(cap["ind_minus"][i]), "minus")
    return tr


class TrajectoryWriter:
    """Writes captured trajectories with the reference's file layout
    (nutsjump.py:818-835): during burn-in (and only if ``write_burnin``)
    ``burnin-{plus,minus,used}-NNNNNN.txt``, afterwards
    ``{plus,minus,used}-NNNNNN.txt`` numbered from the end of burn-in."""

    def __init__(self, trajectory_dir, nburn, write_burnin=False):
        if os.path.isfile(trajectory_dir):
            raise IOError("Not a directory: {0}".format(trajectory_dir))
        os.makedirs(trajectory_dir, exist_ok=True)
        self.dir = trajectory_dir
        self.nburn = nburn
        self.write_burnin = write_burnin

    def write(self, it, cap):
        """``cap``: host-side dict of TrajCapture leaves for one iteration."""
        if not bool(cap["active"]):
            return
        if it <= self.nburn and not self.write_burnin:
            return
        if it <= self.nburn:
            names = ["burnin-plus", "burnin-minus", "burnin-used"]
            num = it
        else:
            names = ["plus", "minus", "used"]
            num = it - self.nburn
        tr = capture_to_trajectory(cap, cap["plus"].shape[-1])
        paths = [
            os.path.join(self.dir, "{0}-{1:06d}.txt".format(n, num)) for n in names
        ]
        np.savetxt(paths[0], tr.get_trajectory("plus")[0])
        np.savetxt(paths[1], tr.get_trajectory("minus")[0])
        np.savetxt(paths[2], tr.get_used_trajectory(int(cap["used_ind"])))
