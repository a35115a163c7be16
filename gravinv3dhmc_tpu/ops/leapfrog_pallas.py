"""Fused leapfrog-step Pallas kernel — the sampler's speed-of-light path.

One leapfrog step of the HMC trajectory (reference semantics:
inversion/hmc.py:105-155 — drift, 'mandatory' clamp+negate, fresh
misfit+gradient, momentum kick) is a chain of XLA ops that each stream
the (C, M) chain state through HBM: measured on a TPU v5e chip the
XLA-fused step reaches ~1.2M grad-evals/s while the two matmuls alone
run at ~9.3M. This kernel fuses the WHOLE step — drift, boundary,
forward matvec, mean-removed misfit, regularizer gradient, kick — into
one pass:

* the kernel matrix A (D x M) sits VMEM-resident in bf16 (7.2 MB for
  the 600x6000 flagship; fetched once per pallas_call since its block
  index never changes) with f32 MXU accumulation;
* chains stream as (TC, M) tiles of x and p — the only HBM traffic per
  step is x,p in + x,p out (~105 MB vs ~300 MB for the XLA chain);
* the carried gradient costs nothing: with the in-kernel full kick
  p' = p - eps*g(x'), the trajectory loop recovers
  g = (p_prev - p')/eps and the trailing half-kick momentum
  (p_prev + p')/2 algebraically, so g is never written to HBM.

Supports the configurations every shipped example samples with
(mandatory boundary, MS/Damping regularizers, dense kernel, optional
frozen-cell grav_fix); other configs use the XLA path
(inversion/hmc.py) unchanged.
"""
from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128


def _round_up(x, m):
    return (x + m - 1) // m * m


def _invoke_x64_off(fn, *args):
    """Trace a pallas_call with jax_enable_x64 OFF: the package enables
    x64 globally, and under it Mosaic's layout pass hits a fatal
    `bitwidth_ <= 32` check (SIGABRT, uncatchable) for some kernel
    features — measured: the NT-contraction single-resident layout and
    the prism-gz builder crash under x64 and compile cleanly without it.
    All operands are concrete f32/i32 arrays, so disabling promotion for
    the kernel trace changes no semantics."""
    with jax.enable_x64(False):
        return fn(*args)


# Mosaic scoped-VMEM we are willing to request; v5e physical VMEM is
# 128 MB — leave headroom for the compiler's own scratch
VMEM_CAP_BYTES = 120 << 20


def traj_vmem_estimate(D, M, tile_c, matvec_dtype=jnp.bfloat16,
                       resident="dual"):
    """Approximate scoped-VMEM bytes the fused trajectory kernel needs —
    the same arithmetic its vmem_limit uses. Callers use this to SKIP
    infeasible tile sizes by arithmetic instead of burning ~12 s per
    doomed remote compile (round-3 verdict item 7: the realdata f32
    probe spent 24 s on two tiles that could never fit).

    ``resident='single'`` models the one-matrix layout (forward matvec
    via a transposed contraction against the same resident A) — half the
    matrix bytes, the configuration that lets realdata-scale f32 fit."""
    Mp = _round_up(M, LANE)
    Dp = _round_up(D, LANE)
    n_mats = 1 if resident == "single" else 2
    mat_bytes = n_mats * Dp * Mp * jnp.dtype(matvec_dtype).itemsize
    tile_bytes = 30 * tile_c * Mp * 4
    return int(2 * mat_bytes + tile_bytes + (1 << 24))


def traj_vmem_feasible(D, M, tile_c, matvec_dtype=jnp.bfloat16,
                       resident="dual"):
    return (traj_vmem_estimate(D, M, tile_c, matvec_dtype, resident)
            <= VMEM_CAP_BYTES)


def _step_kernel(scal_ref, x_ref, p_ref, A_ref, At_ref, dobs_ref, fix_ref,
                 dmask_ref, aprior_ref, wmsq_ref, low_ref, high_ref,
                 im_ref, x_out, p_out, U_out, ud_out, um_out, *,
                 regularization, beta, n_obs, matvec_dtype):
    eps = scal_ref[0, 0]
    alpha = scal_ref[0, 1]
    x = x_ref[:]
    p = p_ref[:]
    low = low_ref[:]
    high = high_ref[:]

    # drift + 'mandatory' boundary (clamp, negate momentum component);
    # im is the diagonal inverse mass (ones = identity metric)
    x = x + eps * (im_ref[:] * p)
    over = x > high
    under = x < low
    x = jnp.clip(x, low, high)
    p = jnp.where(over | under, -p, p)

    # forward matvec: d = x @ A^T via the resident transposed copy —
    # Mosaic wants standard (last-dim, first-dim) contractions
    xc = x.astype(matvec_dtype)
    d = jax.lax.dot_general(
        xc, At_ref[:], dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)          # (TC, D)
    d = d + fix_ref[:]
    # mean-removed residual (reference: inversion/potential.py:706-708).
    # Padded observation columns hold d == 0 (their A rows and fix are
    # zero): the mean divides by the true n_obs, and the residual is
    # masked so pads contribute nothing to the misfit.
    mean = jnp.sum(d, axis=1, keepdims=True) * (1.0 / n_obs)
    r = ((d - mean) - dobs_ref[:]) * dmask_ref[:]
    ud = jnp.sum(r * r, axis=1, keepdims=True)       # (TC, 1)

    # gradient of the data term: 2 A^T r (the mean-removal projector is
    # idempotent here because dobs is centered, so no correction term)
    gdata = jax.lax.dot_general(
        r.astype(matvec_dtype), A_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)          # (TC, M)

    dm = x - aprior_ref[:]
    if regularization == "MS":
        dm2 = dm * dm
        denom = dm2 + beta
        um = jnp.sum(wmsq_ref[:] * dm2 / denom, axis=1, keepdims=True)
        gm = wmsq_ref[:] * (2.0 * beta) * dm / (denom * denom)
    else:  # Damping
        um = jnp.sum(dm * dm, axis=1, keepdims=True)
        gm = 2.0 * dm
    g = 2.0 * gdata + alpha * gm

    x_out[:] = x
    p_out[:] = p - eps * g      # always a full kick; see module docstring
    U_out[:] = ud + alpha * um
    ud_out[:] = ud
    um_out[:] = um


def _traj_kernel(scal_ref, L_ref, x_ref, p_ref, *refs,
                 regularization, beta, matvec_dtype, single=False):
    """The WHOLE leapfrog trajectory in one kernel invocation.

    The chain-state tile (x, p) stays VMEM-resident across all L steps:
    HBM sees x,p once in and x,p,g once out per *trajectory* instead of
    once per *step* — the step-level kernel (above) still paid
    O(L) passes. L arrives as a runtime SMEM scalar; the body is a
    ``lax.fori_loop`` with a dynamic trip count (supported by Mosaic).

    ``single=True`` drops the transposed resident copy: the forward
    matvec contracts x's last dim against A's LAST dim (the MXU's native
    NT layout) so one resident matrix serves both products — half the
    matrix VMEM, which is what lets realdata-scale f32 fit on-chip.
    """
    if single:
        (A_ref, dobs_ref, dmask_ref, aprior_ref, wmsq_ref, low_ref,
         high_ref, im_ref, x_out, p_out, g_out, U_out, ud_out,
         um_out) = refs
    else:
        (A_ref, At_ref, dobs_ref, dmask_ref, aprior_ref, wmsq_ref,
         low_ref, high_ref, im_ref, x_out, p_out, g_out, U_out, ud_out,
         um_out) = refs
    eps = scal_ref[0, 0]
    alpha = scal_ref[0, 1]
    L = L_ref[0]
    low = low_ref[:]
    high = high_ref[:]
    A = A_ref[:]
    At = None if single else At_ref[:]
    dobs = dobs_ref[:]   # dobs_centered - fix_centered, premerged on host
    dmask = dmask_ref[:]
    aprior = aprior_ref[:]
    wmsq = wmsq_ref[:]
    im = im_ref[:]  # diagonal inverse mass (ones = identity metric)
    # loop-invariant scales hoisted out of the VPU-bound body:
    # the kick folds g = 2 gdata + alpha gm directly into p via two FMAs
    # (p -= 2 eps gdata; p -= eps alpha gm) — g itself is never formed in
    # the loop and is recovered after it as (p_prekick - p)/eps
    gm_scale = wmsq * (2.0 * beta)
    s_data = 2.0 * eps
    s_mod = eps * alpha * (2.0 if regularization != "MS" else 1.0)

    # The body is deliberately lean on VPU work: the misfit VALUES
    # (ud, um, U) are not reduced per step — only the final state's are
    # needed, so the small masked residual r is carried and the sums run
    # once after the loop. The mean-removal projector is folded into the
    # resident matrices on host (A_c = (I - 11^T/D) A; exact because the
    # masked residual is centered, so A_c^T r == A^T r), which removes
    # the per-step mean reduce + subtract. MS uses a single reciprocal
    # (inv) instead of two divides; the boundary test is clip + compare
    # (reference semantics unchanged: negate exactly where the clamp
    # moved the coordinate, inversion/hmc.py:135-141).
    def body(_, s):
        x, p, pk, r = s
        x = x + eps * (im * p)
        xc = jnp.clip(x, low, high)
        hit = x != xc
        x = xc
        p = jnp.where(hit, -p, p)
        pk = p  # momentum before this step's kick (for g recovery)
        if single:
            # NT contraction against the one resident matrix: (TC, Mp)
            # x (Dp, Mp) over the shared last dim -> (TC, Dp)
            d = jax.lax.dot_general(
                x.astype(matvec_dtype), A,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
        else:
            d = jax.lax.dot_general(
                x.astype(matvec_dtype), At,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        r = (d - dobs) * dmask
        gdata = jax.lax.dot_general(
            r.astype(matvec_dtype), A,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dm = x - aprior
        if regularization == "MS":
            inv = 1.0 / (dm * dm + beta)
            gm = gm_scale * dm * (inv * inv)
        else:  # Damping
            gm = dm
        p = p - s_data * gdata - s_mod * gm  # full kick, two FMAs
        return (x, p, pk, r)

    r0 = jnp.zeros((x_ref.shape[0], dobs_ref.shape[1]), jnp.float32)
    x, p, pk, r = jax.lax.fori_loop(
        0, L, body, (x_ref[:], p_ref[:], p_ref[:], r0))
    # gradient at the final state, recovered from the last kick
    g = (pk - p) * (1.0 / eps)
    # misfit values of the final state (once per trajectory, not per step)
    ud = jnp.sum(r * r, axis=1, keepdims=True)
    dm = x - aprior
    dm2 = dm * dm
    if regularization == "MS":
        um = jnp.sum(wmsq * dm2 / (dm2 + beta), axis=1, keepdims=True)
    else:
        um = jnp.sum(dm2, axis=1, keepdims=True)
    x_out[:] = x
    p_out[:] = 0.5 * (pk + p)      # undo half of the last full kick
    g_out[:] = g
    U_out[:] = ud + alpha * um
    ud_out[:] = ud
    um_out[:] = um


def make_fused_trajectory(A, dobs_centered, grav_fix, aprior, wm_sq, low,
                          high, *, regularization="MS", beta=0.001,
                          tile_c=128, matvec_dtype=jnp.bfloat16,
                          resident="auto", interpret=False):
    """Build ``traj(x, p_half, L, eps, alpha) -> (x', p', g', U, ud, um)``.

    ``p_half`` must already carry the leading half kick (the sampler does
    it with the carried gradient); the returned ``p'`` includes the
    trailing half kick and ``g'`` is the gradient at ``x'`` for the next
    iteration's leading half kick. Semantics per step match
    :func:`make_fused_step` (reference: inversion/hmc.py:105-155).

    ``resident`` picks the matrix layout: ``'dual'`` keeps A and A^T
    both VMEM-resident (both matmuls in the MXU's NN layout);
    ``'single'`` keeps only A and runs the forward matvec as an NT
    contraction — half the matrix VMEM, the layout that fits
    realdata-scale f32 on-chip. ``'auto'`` chooses dual when it fits the
    VMEM cap, else single.
    """
    if regularization not in ("MS", "Damping"):
        raise ValueError("fused trajectory supports MS/Damping only")
    D, M = A.shape
    Mp = _round_up(M, LANE)
    Dp = _round_up(D, LANE)
    if resident == "auto":
        resident = ("dual" if traj_vmem_feasible(D, M, tile_c,
                                                 matvec_dtype, "dual")
                    else "single")
    single = resident == "single"

    def pad2(v, n):
        v = np.asarray(v, np.float32).reshape(1, -1)
        return np.pad(v, ((0, 0), (0, n - v.shape[1])))

    # fold the mean-removal projector into the resident matrix: with
    # A_c = (I - 11^T/D) A (true rows only; pad rows stay zero) the
    # per-step residual is r = (A_c x - (dobs_c - fix_c)) * dmask — no
    # mean reduce/subtract in the loop. Exact: r sums to zero over true
    # rows, so the gradient A_c^T r == A^T r.
    A64 = np.asarray(A, np.float64)
    A_p = np.zeros((Dp, Mp), np.float32)
    A_p[:D, :M] = (A64 - A64.mean(axis=0)).astype(np.float32)
    A_dev = jnp.asarray(A_p, matvec_dtype)
    At_dev = (None if single
              else jnp.asarray(A_p.T.copy(), matvec_dtype))
    fix = (np.asarray(grav_fix, np.float64) if grav_fix is not None
           else np.zeros(D))
    dobs_merged = (np.asarray(dobs_centered, np.float64)
                   - (fix - fix.mean()))
    dobs_p = jnp.asarray(pad2(dobs_merged, Dp))
    aprior_p = jnp.asarray(pad2(aprior, Mp))
    wmsq_p = jnp.asarray(pad2(wm_sq, Mp))
    low_p = jnp.asarray(pad2(low, Mp))
    high_p = jnp.asarray(pad2(high, Mp))
    dmask = np.zeros((1, Dp), np.float32)
    dmask[0, :D] = 1.0
    dmask_p = jnp.asarray(dmask)

    # the resident arrays are exposed as a params pytree so outer jits can
    # thread them as ARGUMENTS: captured in a closure they would be traced
    # as constants and embedded in the executable (15.4 MB of bf16 matrix
    # at the flagship scale), which the tunnelled link then re-ships on
    # every compile / cache load
    fused_params = {
        "A": A_dev, "dobs": dobs_p,
        "dmask": dmask_p, "aprior": aprior_p, "wmsq": wmsq_p,
        "low": low_p, "high": high_p,
        # identity metric by default; pass inv_mass= to traj() after
        # warmup mass adaptation (padding cells keep im=1, harmless:
        # low=high pins their x)
        "im": jnp.ones((1, Mp), jnp.float32),
    }
    if not single:
        fused_params["At"] = At_dev

    kernel = functools.partial(
        _traj_kernel, regularization=regularization, beta=float(beta),
        matvec_dtype=matvec_dtype, single=single)

    # the dynamic-trip-count loop keeps far more temporaries live than the
    # straight-line step kernel (measured: 45.8 MB at tile_c=8 on v5e, i.e.
    # ~2x the resident matrices + ~30 buffers of loop state) — budget
    # generously and cap below the hardware size; callers pre-check
    # traj_vmem_feasible and step down tile_c on probe failure
    vmem_limit = min(traj_vmem_estimate(D, M, tile_c, matvec_dtype,
                                        resident),
                     VMEM_CAP_BYTES)

    def traj(x, p, L, eps, alpha, params=None, inv_mass=None):
        prm = fused_params if params is None else params
        if inv_mass is not None:
            im = jnp.pad(jnp.asarray(inv_mass, jnp.float32).reshape(1, -1),
                         ((0, 0), (0, Mp - M)), constant_values=1.0)
            prm = dict(prm, im=im)
        C, Mx = x.shape
        assert Mx == M, (Mx, M)
        assert C % tile_c == 0, (C, tile_c)
        xp = jnp.pad(x, ((0, 0), (0, Mp - M)))
        pp = jnp.pad(p, ((0, 0), (0, Mp - M)))
        scal = jnp.stack([eps, alpha]).astype(jnp.float32).reshape(1, 2)
        Ls = jnp.asarray(L, jnp.int32).reshape(1)
        n_tiles = C // tile_c
        tile_map = lambda i: (jax.lax.convert_element_type(i, np.int32),
                              np.int32(0))
        zero_map = lambda i: (np.int32(0), np.int32(0))
        vspec = lambda shape, imap: pl.BlockSpec(shape, imap,
                                                 memory_space=pltpu.VMEM)
        const = lambda shape: vspec(shape, zero_map)
        mat_specs = [const((Dp, Mp))]                     # A_c (resident)
        mat_args = [prm["A"]]
        if not single:
            mat_specs.append(const((Mp, Dp)))             # A_c^T (resident)
            mat_args.append(prm["At"])
        out = pl.pallas_call(
            kernel,
            grid=(n_tiles,),
            in_specs=[
                pl.BlockSpec((1, 2), zero_map, memory_space=pltpu.SMEM),
                pl.BlockSpec((1,), lambda i: (np.int32(0),),
                             memory_space=pltpu.SMEM),
                vspec((tile_c, Mp), tile_map),            # x
                vspec((tile_c, Mp), tile_map),            # p
                *mat_specs,
                const((1, Dp)),                           # dobs_c - fix_c
                const((1, Dp)),                           # dmask
                const((1, Mp)),                           # aprior
                const((1, Mp)),                           # wm_sq
                const((1, Mp)),                           # low
                const((1, Mp)),                           # high
                const((1, Mp)),                           # inv mass
            ],
            out_specs=[
                vspec((tile_c, Mp), tile_map),
                vspec((tile_c, Mp), tile_map),
                vspec((tile_c, Mp), tile_map),
                vspec((tile_c, 1), tile_map),
                vspec((tile_c, 1), tile_map),
                vspec((tile_c, 1), tile_map),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((C, Mp), jnp.float32),
                jax.ShapeDtypeStruct((C, Mp), jnp.float32),
                jax.ShapeDtypeStruct((C, Mp), jnp.float32),
                jax.ShapeDtypeStruct((C, 1), jnp.float32),
                jax.ShapeDtypeStruct((C, 1), jnp.float32),
                jax.ShapeDtypeStruct((C, 1), jnp.float32),
            ],
            interpret=interpret,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=vmem_limit),
        )
        out = _invoke_x64_off(
            out, scal, Ls, xp, pp, *mat_args, prm["dobs"],
            prm["dmask"], prm["aprior"], prm["wmsq"], prm["low"],
            prm["high"], prm["im"])
        x2, p2, g2, U, ud, um = out
        return (x2[:, :M], p2[:, :M], g2[:, :M], U[:, 0], ud[:, 0],
                um[:, 0])

    traj.D = D
    traj.M = M
    traj.tile_c = tile_c
    traj.resident = resident
    traj.params = fused_params
    return traj


def _iter_kernel(scal_ref, L_ref, seed_ref, x_ref, g_ref, U_ref, ud_ref,
                 um_ref, *refs, regularization, beta, matvec_dtype,
                 single=False):
    """ONE FULL HMC ITERATION in a single kernel invocation.

    Extends the trajectory kernel with everything the sampler wrapper
    used to do between kernel calls: the momentum refresh (in-kernel
    Box-Muller over the hardware PRNG — p never touches HBM at all),
    the kinetic energies, the Metropolis accept draw and the
    accept/select of the carried state. HBM traffic per iteration drops
    to x,g in + x,g out; everything else is VMEM-resident.

    NOTE the PRNG stream differs from the XLA path's threefry (the
    sampler documents this): momentum and the accept uniform come from
    the TPU hardware PRNG seeded per (chunk-iteration, chain-tile).
    """
    if single:
        (A_ref, dobs_ref, dmask_ref, aprior_ref, wmsq_ref, low_ref,
         high_ref, im_ref, pscale_ref, x_out, g_out, U_out, ud_out,
         um_out, acc_out) = refs
    else:
        (A_ref, At_ref, dobs_ref, dmask_ref, aprior_ref, wmsq_ref,
         low_ref, high_ref, im_ref, pscale_ref, x_out, g_out, U_out,
         ud_out, um_out, acc_out) = refs
    eps = scal_ref[0, 0]
    alpha = scal_ref[0, 1]
    L = L_ref[0]
    low = low_ref[:]
    high = high_ref[:]
    A = A_ref[:]
    At = None if single else At_ref[:]
    dobs = dobs_ref[:]
    dmask = dmask_ref[:]
    aprior = aprior_ref[:]
    wmsq = wmsq_ref[:]
    im = im_ref[:]
    pscale = pscale_ref[:]  # Sigma*mask (identity) or mask/sqrt(im)
    gm_scale = wmsq * (2.0 * beta)
    s_data = 2.0 * eps
    s_mod = eps * alpha * (2.0 if regularization != "MS" else 1.0)

    x_in = x_ref[:]
    g_in = g_ref[:]
    U_in = U_ref[:]

    # ---- momentum refresh: Box-Muller over the hardware PRNG ---------
    # One u32 draw yields TWO normals: the 16-bit halves give (u1, u2)
    # and the full cos/sin Box-Muller pair is used — 4x less PRNG
    # traffic than naive (two full-width draws, cos only). 16-bit
    # resolution truncates the refresh at ~4.9 sigma, irrelevant for a
    # momentum draw. Falls back to full-width draws when the half-tile
    # is not lane-aligned.
    # 2-word seed material, mixed by the hardware PRNG (Mosaic caps
    # prng_seed at two values): (per-run salt, global iteration counter
    # folded with the chain tile as counter*n_tiles + tile — injective,
    # so streams are unique by construction within a run). The earlier
    # single-word random seed risked birthday collisions in the 2^31
    # space over ~30k+ iterations, replaying a tile's momentum/accept
    # stream.
    pltpu.prng_seed(seed_ref[0],
                    seed_ref[1] * pl.num_programs(0) + pl.program_id(0))
    shape = x_in.shape

    def u24(bits):
        # top 24 bits as a float in [0, 1): shift on uint32, REINTERPRET
        # as int32 (value < 2^24, sign-safe) and cast — Mosaic has no
        # uint32->float32 cast
        return pltpu.bitcast(bits >> 8, jnp.int32).astype(jnp.float32) \
            * (1.0 / (1 << 24))

    def u16(bits_i32):
        return bits_i32.astype(jnp.float32) * (1.0 / (1 << 16))

    TWO_PI = 2.0 * np.float32(np.pi)
    if shape[1] % (2 * LANE) == 0:
        half = (shape[0], shape[1] // 2)
        b = pltpu.bitcast(pltpu.prng_random_bits(half), jnp.uint32)
        u1 = u16(pltpu.bitcast(b >> 16, jnp.int32)) + (0.5 / (1 << 16))
        u2 = u16(pltpu.bitcast(b & jnp.uint32(0xFFFF), jnp.int32))
        R = jnp.sqrt(-2.0 * jnp.log(u1))
        n01 = jnp.concatenate(
            [R * jnp.cos(TWO_PI * u2), R * jnp.sin(TWO_PI * u2)], axis=1)
    else:
        b1 = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
        b2 = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
        u1 = u24(b1) + (0.5 / (1 << 24))  # (0, 1]: the log stays finite
        u2 = u24(b2)
        n01 = jnp.sqrt(-2.0 * jnp.log(u1)) * jnp.cos(TWO_PI * u2)
    p0 = pscale * n01
    K0 = 0.5 * jnp.sum(im * p0 * p0, axis=1, keepdims=True)
    H0 = K0 + U_in
    p = p0 - 0.5 * eps * g_in

    def body(_, s):
        x, p, pk, r = s
        x = x + eps * (im * p)
        xc = jnp.clip(x, low, high)
        hit = x != xc
        x = xc
        p = jnp.where(hit, -p, p)
        pk = p
        if single:
            d = jax.lax.dot_general(
                x.astype(matvec_dtype), A,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
        else:
            d = jax.lax.dot_general(
                x.astype(matvec_dtype), At,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        r = (d - dobs) * dmask
        gdata = jax.lax.dot_general(
            r.astype(matvec_dtype), A,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dm = x - aprior
        if regularization == "MS":
            inv = 1.0 / (dm * dm + beta)
            gm = gm_scale * dm * (inv * inv)
        else:
            gm = dm
        p = p - s_data * gdata - s_mod * gm
        return (x, p, pk, r)

    r0 = jnp.zeros((shape[0], dobs_ref.shape[1]), jnp.float32)
    x, p, pk, r = jax.lax.fori_loop(0, L, body, (x_in, p, p, r0))
    g1 = (pk - p) * (1.0 / eps)
    p_half = 0.5 * (pk + p)
    K1 = 0.5 * jnp.sum(im * p_half * p_half, axis=1, keepdims=True)
    ud1 = jnp.sum(r * r, axis=1, keepdims=True)
    dm = x - aprior
    dm2 = dm * dm
    if regularization == "MS":
        um1 = jnp.sum(wmsq * dm2 / (dm2 + beta), axis=1, keepdims=True)
    else:
        um1 = jnp.sum(dm2, axis=1, keepdims=True)
    U1 = ud1 + alpha * um1
    H1 = K1 + U1

    # ---- Metropolis accept + select ----------------------------------
    bu = pltpu.bitcast(pltpu.prng_random_bits((shape[0], LANE)),
                       jnp.uint32)
    u = u24(bu[:, :1])
    acc = (H1 < H0) | (u < jnp.exp(-(H1 - H0)))  # (TC, 1); NaN -> reject
    x_out[:] = jnp.where(acc, x, x_in)
    g_out[:] = jnp.where(acc, g1, g_in)
    U_out[:] = jnp.where(acc, U1, U_in)
    ud_out[:] = jnp.where(acc, ud1, ud_ref[:])
    um_out[:] = jnp.where(acc, um1, um_ref[:])
    acc_out[:] = acc.astype(jnp.float32)


def make_fused_iteration(A, dobs_centered, grav_fix, aprior, wm_sq, low,
                         high, *, regularization="MS", beta=0.001,
                         tile_c=128, matvec_dtype=jnp.bfloat16,
                         resident="auto", Sigma=1.0, interpret=False):
    """Build the one-call-per-iteration kernel:

        it(x, U, g, ud, um, seed, L, eps, alpha, params=, inv_mass=)
            -> (x', U', g', ud', um', accept)

    where ``accept`` is a float (C,) vector of 0/1 flags and every other
    output is the POST-SELECT carried state. The momentum refresh and
    the Metropolis draw happen in-kernel on the hardware PRNG, so the
    sampler wrapper shrinks to the L draw, the seed derivation and the
    sample store (see inversion/hmc.py). Resident layouts and semantics
    match :func:`make_fused_trajectory`.
    """
    if regularization not in ("MS", "Damping"):
        raise ValueError("fused iteration supports MS/Damping only")
    D, M = A.shape
    Mp = _round_up(M, LANE)
    Dp = _round_up(D, LANE)
    if resident == "auto":
        resident = ("dual" if traj_vmem_feasible(D, M, tile_c,
                                                 matvec_dtype, "dual")
                    else "single")
    single = resident == "single"

    def pad2(v, n):
        v = np.asarray(v, np.float32).reshape(1, -1)
        return np.pad(v, ((0, 0), (0, n - v.shape[1])))

    A64 = np.asarray(A, np.float64)
    A_p = np.zeros((Dp, Mp), np.float32)
    A_p[:D, :M] = (A64 - A64.mean(axis=0)).astype(np.float32)
    A_dev = jnp.asarray(A_p, matvec_dtype)
    At_dev = (None if single
              else jnp.asarray(A_p.T.copy(), matvec_dtype))
    fix = (np.asarray(grav_fix, np.float64) if grav_fix is not None
           else np.zeros(D))
    dobs_merged = (np.asarray(dobs_centered, np.float64)
                   - (fix - fix.mean()))
    mmask = np.zeros((1, Mp), np.float32)
    mmask[0, :M] = 1.0
    dmask = np.zeros((1, Dp), np.float32)
    dmask[0, :D] = 1.0
    fused_params = {
        "A": A_dev, "dobs": jnp.asarray(pad2(dobs_merged, Dp)),
        "dmask": jnp.asarray(dmask),
        "aprior": jnp.asarray(pad2(aprior, Mp)),
        "wmsq": jnp.asarray(pad2(wm_sq, Mp)),
        "low": jnp.asarray(pad2(low, Mp)),
        "high": jnp.asarray(pad2(high, Mp)),
        "im": jnp.ones((1, Mp), jnp.float32),
        # momentum scale: Sigma*mask (the reference's tempered identity
        # kinetic); replaced by mask/sqrt(im) under an adapted metric
        "pscale": jnp.asarray(mmask * np.float32(Sigma)),
        "mmask": jnp.asarray(mmask),
    }
    if not single:
        fused_params["At"] = At_dev

    kernel = functools.partial(
        _iter_kernel, regularization=regularization, beta=float(beta),
        matvec_dtype=matvec_dtype, single=single)
    vmem_limit = min(traj_vmem_estimate(D, M, tile_c, matvec_dtype,
                                        resident),
                     VMEM_CAP_BYTES)

    def it(x, U, g, ud, um, seed, L, eps, alpha, params=None,
           inv_mass=None):
        prm = fused_params if params is None else params
        if inv_mass is not None:
            imp = jnp.pad(
                jnp.asarray(inv_mass, jnp.float32).reshape(1, -1),
                ((0, 0), (0, Mp - M)), constant_values=1.0)
            prm = dict(prm, im=imp,
                       pscale=prm["mmask"] / jnp.sqrt(imp))
        C, Mx = x.shape
        assert Mx == M, (Mx, M)
        assert C % tile_c == 0, (C, tile_c)
        xp = jnp.pad(x, ((0, 0), (0, Mp - M)))
        gp = jnp.pad(g, ((0, 0), (0, Mp - M)))
        scal = jnp.stack([eps, alpha]).astype(jnp.float32).reshape(1, 2)
        Ls = jnp.asarray(L, jnp.int32).reshape(1)
        # seed: scalar (legacy, second word 0) or (salt, counter) pair
        seeds = jnp.asarray(seed, jnp.int32).reshape(-1)
        if seeds.shape[0] == 1:
            seeds = jnp.concatenate([seeds, jnp.zeros(1, jnp.int32)])
        n_tiles = C // tile_c
        tile_map = lambda i: (jax.lax.convert_element_type(i, np.int32),
                              np.int32(0))
        zero_map = lambda i: (np.int32(0), np.int32(0))
        vspec = lambda shape, imap: pl.BlockSpec(shape, imap,
                                                 memory_space=pltpu.VMEM)
        const = lambda shape: vspec(shape, zero_map)
        mat_specs = [const((Dp, Mp))]
        mat_args = [prm["A"]]
        if not single:
            mat_specs.append(const((Mp, Dp)))
            mat_args.append(prm["At"])
        out = pl.pallas_call(
            kernel,
            grid=(n_tiles,),
            in_specs=[
                pl.BlockSpec((1, 2), zero_map, memory_space=pltpu.SMEM),
                pl.BlockSpec((1,), lambda i: (np.int32(0),),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((2,), lambda i: (np.int32(0),),
                             memory_space=pltpu.SMEM),    # 2-word seed
                vspec((tile_c, Mp), tile_map),            # x
                vspec((tile_c, Mp), tile_map),            # g
                vspec((tile_c, 1), tile_map),             # U
                vspec((tile_c, 1), tile_map),             # ud
                vspec((tile_c, 1), tile_map),             # um
                *mat_specs,
                const((1, Dp)),                           # dobs_c - fix_c
                const((1, Dp)),                           # dmask
                const((1, Mp)),                           # aprior
                const((1, Mp)),                           # wm_sq
                const((1, Mp)),                           # low
                const((1, Mp)),                           # high
                const((1, Mp)),                           # inv mass
                const((1, Mp)),                           # pscale
            ],
            out_specs=[
                vspec((tile_c, Mp), tile_map),
                vspec((tile_c, Mp), tile_map),
                vspec((tile_c, 1), tile_map),
                vspec((tile_c, 1), tile_map),
                vspec((tile_c, 1), tile_map),
                vspec((tile_c, 1), tile_map),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((C, Mp), jnp.float32),
                jax.ShapeDtypeStruct((C, Mp), jnp.float32),
                jax.ShapeDtypeStruct((C, 1), jnp.float32),
                jax.ShapeDtypeStruct((C, 1), jnp.float32),
                jax.ShapeDtypeStruct((C, 1), jnp.float32),
                jax.ShapeDtypeStruct((C, 1), jnp.float32),
            ],
            interpret=interpret,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=vmem_limit),
        )
        out = _invoke_x64_off(
            out, scal, Ls, seeds, xp, gp, U.reshape(C, 1),
            ud.reshape(C, 1), um.reshape(C, 1), *mat_args, prm["dobs"],
            prm["dmask"], prm["aprior"], prm["wmsq"], prm["low"],
            prm["high"], prm["im"], prm["pscale"])
        x2, g2, U2, ud2, um2, acc = out
        return (x2[:, :M], U2[:, 0], g2[:, :M], ud2[:, 0], um2[:, 0],
                acc[:, 0])

    it.D = D
    it.M = M
    it.tile_c = tile_c
    it.resident = resident
    it.params = fused_params
    return it


def make_fused_step(A, dobs_centered, grav_fix, aprior, wm_sq, low, high, *,
                    regularization="MS", beta=0.001, tile_c=32,
                    matvec_dtype=jnp.bfloat16, interpret=False):
    """Build ``step(x, p, eps, alpha) -> (x', p', U', ud', um')``.

    ``A`` is the weighted kernel (D, M). All M-length vectors are in the
    weighted (mw) domain like the XLA potential
    (:meth:`GravMagModule.make_potential`). The chain count must be a
    multiple of ``tile_c`` (the samplers use powers of two).
    """
    if regularization not in ("MS", "Damping"):
        raise ValueError("fused step supports MS/Damping only")
    D, M = A.shape
    Mp = _round_up(M, LANE)
    Dp = _round_up(D, LANE)

    def pad2(v, n):
        v = np.asarray(v, np.float32).reshape(1, -1)
        return np.pad(v, ((0, 0), (0, n - v.shape[1])))

    A_p = np.zeros((Dp, Mp), np.float32)
    A_p[:D, :M] = np.asarray(A, np.float32)
    A_dev = jnp.asarray(A_p, matvec_dtype)
    At_dev = jnp.asarray(A_p.T.copy(), matvec_dtype)
    dobs_p = jnp.asarray(pad2(dobs_centered, Dp))
    fix_p = jnp.asarray(pad2(grav_fix if grav_fix is not None
                             else np.zeros(D), Dp))
    aprior_p = jnp.asarray(pad2(aprior, Mp))
    wmsq_p = jnp.asarray(pad2(wm_sq, Mp))
    # padding cells: low=high=0 pins x at 0; aprior=0 keeps their
    # regularizer contribution zero for Damping and MS alike
    low_p = jnp.asarray(pad2(low, Mp))
    high_p = jnp.asarray(pad2(high, Mp))
    dmask = np.zeros((1, Dp), np.float32)
    dmask[0, :D] = 1.0
    dmask_p = jnp.asarray(dmask)

    # see make_fused_trajectory: resident arrays as a threadable pytree,
    # not closure constants
    fused_params = {
        "A": A_dev, "At": At_dev, "dobs": dobs_p, "fix": fix_p,
        "dmask": dmask_p, "aprior": aprior_p, "wmsq": wmsq_p,
        "low": low_p, "high": high_p,
        "im": jnp.ones((1, Mp), jnp.float32),
    }

    kernel = functools.partial(
        _step_kernel, regularization=regularization, beta=float(beta),
        n_obs=float(D), matvec_dtype=matvec_dtype)

    # Mosaic's default scoped-VMEM limit is 16 MB; the resident A + A^T
    # (bf16) alone reach 15.4 MB at the 600x6000 flagship. v5e physical
    # VMEM is far larger — raise the limit to what the buffers actually
    # need (matrices + double-buffered chain tiles + elementwise
    # intermediates, with 2x headroom), capped below the hardware size.
    mat_bytes = 2 * Dp * Mp * jnp.dtype(matvec_dtype).itemsize
    tile_bytes = 16 * tile_c * Mp * 4  # in/out x,p (double-buffered) + temps
    vmem_limit = min(int(mat_bytes + 2 * tile_bytes + (1 << 22)), 120 << 20)

    def step(x, p, eps, alpha, params=None, inv_mass=None):
        prm = fused_params if params is None else params
        if inv_mass is not None:
            im = jnp.pad(jnp.asarray(inv_mass, jnp.float32).reshape(1, -1),
                         ((0, 0), (0, Mp - M)), constant_values=1.0)
            prm = dict(prm, im=im)
        C, Mx = x.shape
        assert Mx == M, (Mx, M)
        assert C % tile_c == 0, (C, tile_c)
        xp = jnp.pad(x, ((0, 0), (0, Mp - M)))
        pp = jnp.pad(p, ((0, 0), (0, Mp - M)))
        scal = jnp.stack([eps, alpha]).astype(jnp.float32).reshape(1, 2)
        n_tiles = C // tile_c
        # index maps must return i32: the package enables jax_enable_x64
        # globally, under which a bare python-int index map traces as i64
        # and Mosaic rejects the block-index function
        # ("failed to legalize 'func.return' (i64, i64)"). np.int32
        # scalars trace as i32 literals (jnp constants would trip the
        # no-captured-constants check on index maps).
        tile_map = lambda i: (jax.lax.convert_element_type(i, np.int32),
                              np.int32(0))
        zero_map = lambda i: (np.int32(0), np.int32(0))
        vspec = lambda shape, imap: pl.BlockSpec(shape, imap,
                                                 memory_space=pltpu.VMEM)
        const = lambda shape: vspec(shape, zero_map)
        out = pl.pallas_call(
            kernel,
            grid=(n_tiles,),
            in_specs=[
                pl.BlockSpec((1, 2), zero_map,
                             memory_space=pltpu.SMEM),
                vspec((tile_c, Mp), tile_map),            # x
                vspec((tile_c, Mp), tile_map),            # p
                const((Dp, Mp)),                          # A (resident)
                const((Mp, Dp)),                          # A^T (resident)
                const((1, Dp)),                           # dobs_centered
                const((1, Dp)),                           # grav_fix
                const((1, Dp)),                           # dmask
                const((1, Mp)),                           # aprior
                const((1, Mp)),                           # wm_sq
                const((1, Mp)),                           # low
                const((1, Mp)),                           # high
                const((1, Mp)),                           # inv mass
            ],
            out_specs=[
                vspec((tile_c, Mp), tile_map),
                vspec((tile_c, Mp), tile_map),
                vspec((tile_c, 1), tile_map),
                vspec((tile_c, 1), tile_map),
                vspec((tile_c, 1), tile_map),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((C, Mp), jnp.float32),
                jax.ShapeDtypeStruct((C, Mp), jnp.float32),
                jax.ShapeDtypeStruct((C, 1), jnp.float32),
                jax.ShapeDtypeStruct((C, 1), jnp.float32),
                jax.ShapeDtypeStruct((C, 1), jnp.float32),
            ],
            interpret=interpret,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=vmem_limit),
        )
        out = _invoke_x64_off(
            out, scal, xp, pp, prm["A"], prm["At"], prm["dobs"],
            prm["fix"], prm["dmask"], prm["aprior"], prm["wmsq"],
            prm["low"], prm["high"], prm["im"])
        x2, p2, U, ud, um = out
        return (x2[:, :M], p2[:, :M], U[:, 0], ud[:, 0], um[:, 0])

    step.D = D
    step.M = M
    step.params = fused_params
    return step
