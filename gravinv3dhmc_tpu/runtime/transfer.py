"""Link-safe host<->device transfer helpers.

The tunnelled TPU link this framework targets stalls on bulk eager
copies (>~100 KB can take minutes, CLAUDE.md); these helpers keep every
transfer either on the jit-argument upload path (h2d, which sustains
tens of MB/s) or chunked below the stall threshold (d2h).
"""
from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

_identity = jax.jit(lambda v: v)


def h2d(x, dtype=jnp.float32):
    """Bulk host->device through the jit-argument upload path.

    A value that is ALREADY a device array passes through with at most a
    device-side cast — ``np.asarray`` on it would be a d2h stall followed
    by a pointless re-upload."""
    if isinstance(x, jax.Array):
        return x if x.dtype == jnp.dtype(dtype) else _identity(
            x.astype(dtype))
    return _identity(np.asarray(x, jnp.dtype(dtype).name))


def d2h_chunked(x, chunk_bytes=65536):
    """Device->host transfer of a 1-D array in sub-stall-size chunks."""
    x = jnp.ravel(x)
    n = x.shape[0]
    step = max(int(chunk_bytes // jnp.dtype(x.dtype).itemsize), 1)
    if n <= step:
        return np.asarray(x)
    parts = [np.asarray(x[i: i + step]) for i in range(0, n, step)]
    return np.concatenate(parts)
