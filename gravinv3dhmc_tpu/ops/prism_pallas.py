"""Pallas TPU kernel for the prism-gz sensitivity matrix.

The f32 device path of :mod:`.prism` expressed as a hand-tiled Pallas
kernel: the (obs x cells) plane is cut into (TILE_O, TILE_C) VMEM blocks;
each program evaluates the eight Nagy corner terms for its block entirely
on the VPU (two logs + one atan2 + one rsqrt per corner) and writes one
output tile — no HBM round-trips for the per-corner temporaries the
XLA-fused jnp version may spill.

Precision note (SURVEY.md §7 "hard parts"): the corner-difference formula
cancels in f32 for distant cells (measured ~1-4% per-column error on the
example meshes), so this path — like the jnp f32 path — is for large
meshes where build speed matters and the inversion's own noise floor
dominates; the f64 host builder remains the default.
"""
from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp

TILE_O = 8
TILE_C = 512


def _safe_log(x):
    return jnp.where(x == 0, 0.0, jnp.log(jnp.where(x == 0, 1.0, x)))


def _atan_poly(t):
    """Branchless f32 arctan (Cephes atanf polynomial + range reduction);
    Pallas TPU has no atan/atan2 lowering."""
    at = jnp.abs(t)
    big = at > 2.414213562373095    # tan(3*pi/8)
    mid = at > 0.4142135623730950   # tan(pi/8)
    x = jnp.where(big, -1.0 / jnp.where(at == 0, 1.0, at),
                  jnp.where(mid, (at - 1.0) / (at + 1.0), at))
    base = jnp.where(big, np.pi / 2, jnp.where(mid, np.pi / 4, 0.0))
    z = x * x
    poly = (((8.05374449538e-2 * z - 1.38776856032e-1) * z
             + 1.99777106478e-1) * z - 3.33329491539e-1) * z * x + x
    return jnp.sign(t) * (base + poly)


def _safe_atan2(y, x):
    """The reference's shifted atan2 (gravmag/_prism.pyx:16-26) equals
    atan(y/x) on x != 0 — the +-pi shifts exactly cancel atan2's branch
    offsets — with sign(y)*pi/2 on the x == 0 axis and 0 for y == 0."""
    ratio = y / jnp.where(x == 0, 1.0, x)
    res = jnp.where(x == 0, jnp.sign(y) * (np.pi / 2), _atan_poly(ratio))
    return jnp.where(y == 0, 0.0, res)


def _gz_tile_kernel(obs_ref, cell_ref, out_ref):
    """One (TILE_O, TILE_C) block of the gz kernel matrix.

    ``obs_ref`` is (TILE_O, 3) in SMEM: per-row obs scalars (x, y, z) —
    scalar broadcasts avoid any cross-lane transpose; ``cell_ref`` is
    (8, TILE_C) in VMEM: rows x1, x2, y1, y2, z1, z2 along the lanes.
    Each program writes TILE_O rows sequentially.
    """
    from jax.experimental import pallas as pl

    xs = (cell_ref[1:2, :], cell_ref[0:1, :])  # (1, TILE_C); idx 0 = upper
    ys = (cell_ref[3:4, :], cell_ref[2:3, :])
    zs = (cell_ref[5:6, :], cell_ref[4:5, :])

    def row(o, _):
        xo = obs_ref[o, 0]
        yo = obs_ref[o, 1]
        zo = obs_ref[o, 2]
        acc = jnp.zeros((1, xs[0].shape[1]), out_ref.dtype)
        for i in range(2):
            dx = xs[i] - xo
            for j in range(2):
                dy = ys[j] - yo
                for k in range(2):
                    dz = zs[k] - zo
                    r = jnp.sqrt(dx * dx + dy * dy + dz * dz)
                    term = -(dx * _safe_log(dy + r) + dy * _safe_log(dx + r)
                             - dz * _safe_atan2(dx * dy, dz * r))
                    sign = -1.0 if (i + j + k) % 2 else 1.0
                    acc = acc + sign * term
        out_ref[pl.ds(o, 1), :] = acc
        return 0

    jax.lax.fori_loop(0, TILE_O, row, 0)


@functools.partial(jax.jit, static_argnames=("interpret",))
def gz_kernel_matrix_pallas(obs, cells, scale, interpret=False):
    """(D, M) gz kernel matrix in output units (f32).

    ``obs`` is (D, 3) [x, y, z]; ``cells`` is (M, 6) bounds; ``scale`` is
    the unit factor (G * SI2MGAL for gz). Inputs are padded to tile
    multiples; padded cells use far-away dummy geometry and are sliced off.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    D, M = obs.shape[0], cells.shape[0]
    Dp = -(-D // TILE_O) * TILE_O
    Mp = -(-M // TILE_C) * TILE_C
    obs_p = jnp.zeros((Dp, 3), jnp.float32)
    obs_p = obs_p.at[:D].set(obs.astype(jnp.float32))
    # pad cells with unit cubes far away (avoids 0-size singularities)
    cells_p = jnp.full((8, Mp), 1e7, jnp.float32)
    cells_p = cells_p.at[jnp.asarray([1, 3, 5]), :].set(1e7 + 1.0)
    cells_p = cells_p.at[:6, :M].set(cells.astype(jnp.float32).T)

    grid = (Dp // TILE_O, Mp // TILE_C)
    # index maps must return i32 under the package-wide jax_enable_x64
    # (same Mosaic i64 legalization failure as ops/leapfrog_pallas.py)
    _i32 = lambda v: jax.lax.convert_element_type(v, np.int32)
    out = pl.pallas_call(
        _gz_tile_kernel,
        out_shape=jax.ShapeDtypeStruct((Dp, Mp), jnp.float32),
        grid=grid,
        in_specs=[pl.BlockSpec((TILE_O, 3),
                               lambda i, j: (_i32(i), np.int32(0)),
                               memory_space=pltpu.SMEM),
                  pl.BlockSpec((8, TILE_C),
                               lambda i, j: (np.int32(0), _i32(j)))],
        out_specs=pl.BlockSpec((TILE_O, TILE_C),
                               lambda i, j: (_i32(i), _i32(j))),
        interpret=interpret,
    )(obs_p, cells_p)
    return out[:D, :M] * scale
