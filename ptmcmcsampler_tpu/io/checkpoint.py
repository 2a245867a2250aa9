"""Full-state structured checkpointing.

The reference's only recovery story is re-reading chain text files, which
loses all adaptation state (covariance, DE buffer, NUTS step size, RNG) —
SURVEY.md §5 / PTMCMCSampler.py:290-319. Here the complete
:class:`SamplerState` pytree round-trips through one ``.npz`` plus a small
JSON sidecar, so a resumed run continues *exactly* (same RNG stream, same
adaptation trajectory).
"""

from __future__ import annotations

import json
import os

import jax
import numpy as np


def _is_typed_key(leaf):
    try:
        import jax.numpy as jnp

        return jnp.issubdtype(jnp.asarray(leaf).dtype, jax.dtypes.prng_key)
    except TypeError:
        return False


def save_checkpoint(path, state, meta=None):
    leaves, treedef = jax.tree_util.tree_flatten(state)
    arrays = {}
    for i, leaf in enumerate(leaves):
        if _is_typed_key(leaf):
            # Typed PRNG keys serialize as their raw uint32 data.
            leaf = jax.random.key_data(leaf)
        arrays[f"leaf_{i}"] = np.asarray(jax.device_get(leaf))
    tmp = path + ".tmp.npz"
    np.savez(tmp, **arrays)
    os.replace(tmp, path)
    if meta is not None:
        with open(path + ".json", "w") as f:
            json.dump(meta, f)


def load_checkpoint(path, template_state):
    """Restore a state pytree saved by :func:`save_checkpoint`.

    ``template_state`` provides the tree structure (build it with the same
    config used originally).
    """
    leaves, treedef = jax.tree_util.tree_flatten(template_state)
    with np.load(path) as data:
        loaded = [data[f"leaf_{i}"] for i in range(len(leaves))]
    for i, (tpl, new) in enumerate(zip(leaves, loaded)):
        if _is_typed_key(tpl):
            # Restore the typed key with the template's PRNG impl.
            impl = jax.random.key_impl(tpl)
            if jax.random.key_data(tpl).shape != new.shape:
                raise ValueError(
                    f"checkpoint leaf {i} (PRNG key) shape {new.shape} does "
                    f"not match current impl {impl}"
                )
            loaded[i] = jax.random.wrap_key_data(new, impl=impl)
            continue
        if np.shape(tpl) != new.shape:
            raise ValueError(
                f"checkpoint leaf {i} shape {new.shape} does not match "
                f"current config {np.shape(tpl)}"
            )
    meta = None
    if os.path.isfile(path + ".json"):
        with open(path + ".json") as f:
            meta = json.load(f)
    return jax.tree_util.tree_unflatten(treedef, loaded), meta
