"""Sampler checkpoint/resume.

The reference's only resilience is append-on-accept sample files — a
crashed chain keeps its samples but cannot resume (no position, RNG state
or step count is persisted; SURVEY.md §5, reference: inversion/hmc.py:241-
249,256-258 and the OOM-killed global run in example/global/logout_T1.txt).

Here the full sampler state — chain positions, cached potential/gradient,
device-resident sample buffers, acceptance counters, the base RNG key and
the chunk index — is one pytree snapshotted atomically to ``.npz``.
Resuming reproduces the exact continuation of an uninterrupted run because
per-chunk keys are derived as ``fold_in(base_key, chunk_idx)``
(inversion/hmc.py run_chunk), not from mutable host RNG state.
"""
from __future__ import annotations

import json
import os

import numpy as np

import jax
import jax.numpy as jnp


def save_state(path, carry, n_chunks, base_key, meta=None):
    """Atomically snapshot a sampler carry pytree + loop counters."""
    leaves, treedef = jax.tree_util.tree_flatten(carry)
    payload = {f"leaf_{i}": np.asarray(l) for i, l in enumerate(leaves)}
    payload["n_chunks"] = np.asarray(n_chunks)
    payload["base_key"] = np.asarray(jax.random.key_data(base_key))
    payload["meta"] = np.frombuffer(
        json.dumps(meta or {}).encode(), dtype=np.uint8)
    tmp = path + ".tmp.npz"
    np.savez(tmp, **payload)
    os.replace(tmp, path)


def load_state(path, like_carry=None, dtype=None):
    """Load a snapshot; returns (carry, n_chunks, base_key, meta).

    ``like_carry`` (optional) provides the pytree structure and per-leaf
    dtypes to restore into; otherwise leaves come back in saved order as a
    tuple.
    """
    with np.load(path) as z:
        n_leaves = sum(1 for k in z.files if k.startswith("leaf_"))
        leaves = [z[f"leaf_{i}"] for i in range(n_leaves)]
        n_chunks = int(z["n_chunks"])
        base_key = jax.random.wrap_key_data(jnp.asarray(z["base_key"]))
        meta = json.loads(bytes(z["meta"].tobytes()).decode() or "{}")
    if like_carry is not None:
        ref_leaves, treedef = jax.tree_util.tree_flatten(like_carry)
        if len(ref_leaves) != len(leaves):
            raise ValueError(
                f"checkpoint has {len(leaves)} leaves, expected "
                f"{len(ref_leaves)} — config mismatch?")
        leaves = [jnp.asarray(l, r.dtype)
                  for l, r in zip(leaves, ref_leaves)]
        carry = jax.tree_util.tree_unflatten(treedef, leaves)
    else:
        carry = tuple(jnp.asarray(l) for l in leaves)
    return carry, n_chunks, base_key, meta
