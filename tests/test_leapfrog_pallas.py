"""Fused Pallas leapfrog trajectory vs the XLA sampler path.

Runs the Pallas kernel in interpreter mode (CPU) with f32 matvecs so the
comparison against the XLA shared-L trajectory is exact up to f32
rounding; on TPU the kernel runs compiled with bf16 A + f32 accumulation
(validated separately on hardware via bench.py accept ratios).
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax import random

from gravinv3dhmc_tpu.inversion import hmc
from gravinv3dhmc_tpu.ops.leapfrog_pallas import (
    make_fused_iteration,
    make_fused_step,
    make_fused_trajectory,
)


def _setup(module, dobs, reg="MS"):
    M = module.n_active
    wdiag = module.wdiag
    low = wdiag * np.zeros(M)
    high = wdiag * np.ones(M)
    aprior = wdiag * np.full(M, 0.001)
    pot = module.make_potential(aprior, low, high, constraint="mandatory",
                                regularization=reg, beta=0.001,
                                dtype=jnp.float32)
    fstep = make_fused_step(
        np.asarray(module.Aw), np.asarray(dobs) - np.mean(dobs), None,
        aprior, wdiag * wdiag, low, high, regularization=reg, beta=0.001,
        tile_c=8, matvec_dtype=jnp.float32, interpret=True)
    return pot, fstep, low, high, aprior


def test_fused_step_matches_potential(small_module):
    module, dobs, _ = small_module
    pot, fstep, low, high, aprior = _setup(module, dobs)
    M = module.n_active
    C = 8
    rng = np.random.RandomState(0)
    x = jnp.asarray(0.2 + 0.1 * rng.rand(C, M), jnp.float32)
    p = jnp.asarray(0.01 * rng.randn(C, M), jnp.float32)
    eps = jnp.asarray(0.01, jnp.float32)
    alpha = jnp.asarray(1.0, jnp.float32)

    x2, p2, U2, ud2, um2 = fstep(x, p, eps, alpha)

    # XLA reference: drift + clamp + negate + potential + kick
    x_ref = x + eps * p
    hit = (x_ref > jnp.asarray(high)) | (x_ref < jnp.asarray(low))
    x_ref = jnp.clip(x_ref, jnp.asarray(low, jnp.float32),
                     jnp.asarray(high, jnp.float32))
    p_ref = jnp.where(hit, -p, p)
    U_r, g_r, (_, ud_r, um_r) = pot(x_ref, 1.0)
    p_ref = p_ref - eps * g_r

    np.testing.assert_allclose(np.asarray(x2), np.asarray(x_ref),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(U2), np.asarray(U_r), rtol=2e-4)
    np.testing.assert_allclose(np.asarray(ud2), np.asarray(ud_r),
                               rtol=2e-4)
    np.testing.assert_allclose(np.asarray(um2), np.asarray(um_r),
                               rtol=2e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(p2), np.asarray(p_ref),
                               rtol=2e-3, atol=2e-4)


@pytest.mark.parametrize("reg", ["MS", "Damping"])
def test_fused_trajectory_matches_shared_L(small_module, reg):
    """A whole sampling chunk via the fused engine equals the XLA
    shared-L engine: same RNG stream => same accept decisions and
    posterior buffers up to f32 rounding."""
    module, dobs, _ = small_module
    pot, fstep, low, high, aprior = _setup(module, dobs, reg)
    M = module.n_active
    C, nsamples, chunk = 8, 16, 24

    def build(fused):
        return hmc.make_chunk_sampler(
            pot, dt=0.01, Lmin=3, Lmax=8, Sigma=0.001, low=low, high=high,
            constraint="mandatory", alpha=1.0, chunk_size=chunk,
            nsamples=nsamples, ndraws=0, wdiag_inv=module.wdiag_inv,
            data_size=dobs.size, dtype=jnp.float32, shared_L=True,
            fused_step=fstep if fused else None)

    x0 = jnp.asarray(np.tile(np.full(M, 0.3, np.float32)[None, :] *
                             np.asarray(module.wdiag, np.float32),
                             (C, 1)), jnp.float32)
    U, g, (_, ud, um) = pot(x0, 1.0)

    def carry0():
        # fresh copies per sampler: run_chunk DONATES the carry (the
        # arrays are deleted after the call), so the two paths cannot
        # share leaves
        return (jnp.array(x0), jnp.array(U), jnp.array(g), jnp.array(ud),
                jnp.array(um), jnp.zeros(C, jnp.int32),
                jnp.zeros((C, nsamples, M), jnp.float32),
                jnp.zeros((C, nsamples, 7), jnp.float32))

    key = random.PRNGKey(42)
    c_x, s_x = build(False)(carry0(), key, 0, pot.params)
    c_f, s_f = build(True)(carry0(), key, 0, pot.params)

    # identical accept decisions and trajectory lengths
    np.testing.assert_array_equal(np.asarray(s_x[..., 0]),
                                  np.asarray(s_f[..., 0]))
    np.testing.assert_array_equal(np.asarray(s_x[..., 4]),
                                  np.asarray(s_f[..., 4]))
    np.testing.assert_array_equal(np.asarray(c_x[5]), np.asarray(c_f[5]))
    # same end states and sample buffers up to rounding
    np.testing.assert_allclose(np.asarray(c_x[0]), np.asarray(c_f[0]),
                               rtol=5e-3, atol=5e-4)
    np.testing.assert_allclose(np.asarray(c_x[6]), np.asarray(c_f[6]),
                               rtol=5e-3, atol=5e-4)
    np.testing.assert_allclose(np.asarray(s_x[..., 1]),
                               np.asarray(s_f[..., 1]), rtol=1e-3)


@pytest.mark.parametrize("reg", ["MS", "Damping"])
def test_fused_trajectory_kernel_matches_shared_L(small_module, reg):
    """The whole-trajectory kernel (one pallas_call per L steps, chain
    state VMEM-resident) drives a sampling chunk to the same result as the
    XLA shared-L engine."""
    module, dobs, _ = small_module
    pot, _, low, high, aprior = _setup(module, dobs, reg)
    M = module.n_active
    wdiag = module.wdiag
    ftraj = make_fused_trajectory(
        np.asarray(module.Aw), np.asarray(dobs) - np.mean(dobs), None,
        aprior, wdiag * wdiag, low, high, regularization=reg, beta=0.001,
        tile_c=8, matvec_dtype=jnp.float32, interpret=True)
    C, nsamples, chunk = 8, 16, 24

    def build(fused):
        return hmc.make_chunk_sampler(
            pot, dt=0.01, Lmin=3, Lmax=8, Sigma=0.001, low=low, high=high,
            constraint="mandatory", alpha=1.0, chunk_size=chunk,
            nsamples=nsamples, ndraws=0, wdiag_inv=module.wdiag_inv,
            data_size=dobs.size, dtype=jnp.float32, shared_L=True,
            fused_trajectory=ftraj if fused else None)

    x0 = jnp.asarray(np.tile(np.full(M, 0.3, np.float32)[None, :] *
                             np.asarray(module.wdiag, np.float32),
                             (C, 1)), jnp.float32)
    U, g, (_, ud, um) = pot(x0, 1.0)

    def carry0():
        # fresh copies per sampler: run_chunk DONATES the carry (the
        # arrays are deleted after the call), so the two paths cannot
        # share leaves
        return (jnp.array(x0), jnp.array(U), jnp.array(g), jnp.array(ud),
                jnp.array(um), jnp.zeros(C, jnp.int32),
                jnp.zeros((C, nsamples, M), jnp.float32),
                jnp.zeros((C, nsamples, 7), jnp.float32))

    key = random.PRNGKey(42)
    c_x, s_x = build(False)(carry0(), key, 0, pot.params)
    c_f, s_f = build(True)(carry0(), key, 0, pot.params)

    np.testing.assert_array_equal(np.asarray(s_x[..., 0]),
                                  np.asarray(s_f[..., 0]))
    np.testing.assert_array_equal(np.asarray(s_x[..., 4]),
                                  np.asarray(s_f[..., 4]))
    np.testing.assert_array_equal(np.asarray(c_x[5]), np.asarray(c_f[5]))
    np.testing.assert_allclose(np.asarray(c_x[0]), np.asarray(c_f[0]),
                               rtol=5e-3, atol=5e-4)
    np.testing.assert_allclose(np.asarray(c_x[6]), np.asarray(c_f[6]),
                               rtol=5e-3, atol=5e-4)
    np.testing.assert_allclose(np.asarray(s_x[..., 1]),
                               np.asarray(s_f[..., 1]), rtol=1e-3)
    # the carried gradient must also match (it seeds the next half kick)
    np.testing.assert_allclose(np.asarray(c_x[2]), np.asarray(c_f[2]),
                               rtol=5e-3, atol=5e-3)


@pytest.mark.parametrize("reg", ["MS", "Damping"])
def test_fused_trajectory_single_resident_matches_dual(small_module, reg):
    """The single-resident-matrix layout (forward matvec as an NT
    contraction against A, no A^T copy — the realdata-scale f32
    configuration) must produce identical trajectories to the dual
    layout at f32."""
    module, dobs, _ = small_module
    pot, _, low, high, aprior = _setup(module, dobs, reg)
    M = module.n_active
    wdiag = module.wdiag
    fargs = (np.asarray(module.Aw), np.asarray(dobs) - np.mean(dobs),
             None, aprior, wdiag * wdiag, low, high)
    fkw = dict(regularization=reg, beta=0.001, tile_c=8,
               matvec_dtype=jnp.float32, interpret=True)
    dual = make_fused_trajectory(*fargs, resident="dual", **fkw)
    single = make_fused_trajectory(*fargs, resident="single", **fkw)
    assert "At" not in single.params and single.resident == "single"
    C = 16
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.uniform(0.1, 0.6, (C, M))
                    * np.asarray(wdiag)[None, :], jnp.float32)
    p = jnp.asarray(rng.randn(C, M) * 1e-3, jnp.float32)
    out_d = dual(x, p, jnp.int32(5), jnp.float32(0.01), jnp.float32(1.0),
                 params=dual.params)
    out_s = single(x, p, jnp.int32(5), jnp.float32(0.01),
                   jnp.float32(1.0), params=single.params)
    for a, b in zip(out_d, out_s):
        # NT vs NN contraction accumulate in different orders: identical
        # trajectories up to f32 reduction rounding
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=1e-6)


@pytest.mark.parametrize("reg", ["MS", "Damping"])
def test_fused_trajectory_with_diagonal_metric(small_module, reg):
    """The fused trajectory under a non-identity diagonal inverse mass
    matches the XLA shared-L path — the configuration warmup mass
    adaptation leaves behind (round-2 silently disabled the fused path
    whenever adapt_mass was on)."""
    module, dobs, _ = small_module
    pot, _, low, high, aprior = _setup(module, dobs, reg)
    M = module.n_active
    wdiag = module.wdiag
    ftraj = make_fused_trajectory(
        np.asarray(module.Aw), np.asarray(dobs) - np.mean(dobs), None,
        aprior, wdiag * wdiag, low, high, regularization=reg, beta=0.001,
        tile_c=8, matvec_dtype=jnp.float32, interpret=True)
    C, nsamples, chunk = 8, 16, 12
    rng = np.random.RandomState(7)
    inv_mass = jnp.asarray(10.0 ** rng.uniform(-2, 0, M), jnp.float32)

    def build(fused):
        return hmc.make_chunk_sampler(
            pot, dt=0.01, Lmin=3, Lmax=8, Sigma=0.001, low=low, high=high,
            constraint="mandatory", alpha=1.0, chunk_size=chunk,
            nsamples=nsamples, ndraws=0, wdiag_inv=module.wdiag_inv,
            data_size=dobs.size, dtype=jnp.float32, shared_L=True,
            fused_trajectory=ftraj if fused else None)

    x0 = jnp.asarray(np.tile(np.full(M, 0.3, np.float32)[None, :] *
                             np.asarray(module.wdiag, np.float32),
                             (C, 1)), jnp.float32)
    U, g, (_, ud, um) = pot(x0, 1.0)

    def carry0():
        return (jnp.array(x0), jnp.array(U), jnp.array(g), jnp.array(ud),
                jnp.array(um), jnp.zeros(C, jnp.int32),
                jnp.zeros((C, nsamples, M), jnp.float32),
                jnp.zeros((C, nsamples, 7), jnp.float32))

    key = random.PRNGKey(11)
    c_x, s_x = build(False)(carry0(), key, 0, pot.params,
                            inv_mass=inv_mass)
    c_f, s_f = build(True)(carry0(), key, 0, pot.params,
                           inv_mass=inv_mass)

    np.testing.assert_array_equal(np.asarray(s_x[..., 0]),
                                  np.asarray(s_f[..., 0]))
    np.testing.assert_array_equal(np.asarray(c_x[5]), np.asarray(c_f[5]))
    np.testing.assert_allclose(np.asarray(c_x[0]), np.asarray(c_f[0]),
                               rtol=5e-3, atol=5e-4)
    np.testing.assert_allclose(np.asarray(c_x[6]), np.asarray(c_f[6]),
                               rtol=5e-3, atol=5e-4)


@pytest.mark.parametrize("reg", ["MS", "Damping"])
def test_fused_iteration_matches_trajectory(small_module, reg):
    """The full-iteration kernel (in-kernel momentum refresh + accept)
    must integrate the same trajectory as the trajectory kernel when fed
    the same momentum. The TPU interpreter stubs prng_random_bits to
    ZEROS, which makes the in-kernel Box-Muller produce a KNOWN constant
    momentum (u1=2^-25, u2=0 -> n01=sqrt(50 ln 2)) and accept uniform
    u=0 — so the iteration is fully deterministic here and can be
    replayed through make_fused_trajectory for comparison. (Statistical
    PRNG quality is validated on hardware: tools/verify_fused_tpu.py.)"""
    from jax.experimental.pallas import tpu as pltpu

    module, dobs, _ = small_module
    pot, _, low, high, aprior = _setup(module, dobs, reg)
    M = module.n_active
    wdiag = module.wdiag
    Sigma = 0.001
    fargs = (np.asarray(module.Aw), np.asarray(dobs) - np.mean(dobs),
             None, aprior, wdiag * wdiag, low, high)
    fkw = dict(regularization=reg, beta=0.001, tile_c=8,
               matvec_dtype=jnp.float32)
    it = make_fused_iteration(*fargs, Sigma=Sigma, **fkw)
    traj = make_fused_trajectory(*fargs, **fkw, interpret=True)
    C = 8
    rng = np.random.RandomState(5)
    x0 = jnp.asarray(rng.uniform(0.2, 0.8, (C, M))
                     * np.asarray(wdiag)[None, :], jnp.float32)
    U0, g0, (_, ud0, um0) = pot(x0, 1.0)
    eps = jnp.float32(0.01)
    alpha = jnp.float32(1.0)
    L = 4
    with pltpu.force_tpu_interpret_mode():
        x1, U1, g1, ud1, um1, acc = it(x0, U0, g0, ud0, um0,
                                       jnp.int32(7), jnp.int32(L), eps,
                                       alpha, params=it.params)
    # stubbed PRNG (zeros): the refresh becomes a known deterministic
    # pattern. Paired 16-bit path (padded width divisible by 256):
    # sqrt(-2 ln 2^-17) on the first half of the padded columns (cos
    # branch), exactly 0 on the second (sin). Fallback full-width path:
    # sqrt(-2 ln 2^-25) everywhere.
    Mp = -(-M // 128) * 128
    p0_np = np.zeros((C, M), np.float32)
    if Mp % 256 == 0:
        n16 = np.sqrt(-2.0 * np.log(np.float32(2.0 ** -17)))
        p0_np[:, :min(Mp // 2, M)] = Sigma * np.float32(n16)
    else:
        n24 = np.sqrt(-2.0 * np.log(np.float32(2.0 ** -25)))
        p0_np[:, :] = Sigma * np.float32(n24)
    p0 = jnp.asarray(p0_np)
    p_half = p0 - 0.5 * eps * g0
    xt, pt, gt, Ut, udt, umt = traj(x0, p_half, jnp.int32(L), eps, alpha,
                                    params=traj.params)
    # accept uniform is 0 -> accept unless exp(-dH) underflows to exactly
    # 0; at these scales every chain accepts
    np.testing.assert_array_equal(np.asarray(acc), 1.0)
    np.testing.assert_allclose(np.asarray(x1), np.asarray(xt),
                               rtol=2e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(gt),
                               rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(U1), np.asarray(Ut),
                               rtol=2e-4)


def test_fused_iteration_rejection_keeps_state(small_module):
    """A chain whose Delta-H underflows exp() to exactly 0 must reject
    (accept uniform is 0 in the interpreter) and keep its carried
    state bit-for-bit."""
    from jax.experimental.pallas import tpu as pltpu

    module, dobs, _ = small_module
    pot, _, low, high, aprior = _setup(module, dobs, "Damping")
    M = module.n_active
    wdiag = module.wdiag
    fargs = (np.asarray(module.Aw), np.asarray(dobs) - np.mean(dobs),
             None, aprior, wdiag * wdiag, low, high)
    it = make_fused_iteration(*fargs, regularization="Damping",
                              beta=0.001, tile_c=8,
                              matvec_dtype=jnp.float32, Sigma=0.001)
    C = 8
    x0 = jnp.asarray(np.tile(0.5 * np.asarray(wdiag, np.float32),
                             (C, 1)), jnp.float32)
    g0 = jnp.zeros((C, M), jnp.float32)
    # claim U_in is hugely negative: H1 - H0 is astronomically positive,
    # exp underflows to 0.0 and u=0 is NOT < 0 -> reject everywhere
    U0 = jnp.full((C,), -1e30, jnp.float32)
    ud0 = jnp.full((C,), 1.0, jnp.float32)
    um0 = jnp.full((C,), 2.0, jnp.float32)
    with pltpu.force_tpu_interpret_mode():
        x1, U1, g1, ud1, um1, acc = it(x0, U0, g0, ud0, um0,
                                       jnp.int32(3), jnp.int32(3),
                                       jnp.float32(0.01),
                                       jnp.float32(1.0), params=it.params)
    np.testing.assert_array_equal(np.asarray(acc), 0.0)
    np.testing.assert_array_equal(np.asarray(x1), np.asarray(x0))
    np.testing.assert_array_equal(np.asarray(g1), np.asarray(g0))
    np.testing.assert_array_equal(np.asarray(U1), np.asarray(U0))
    np.testing.assert_array_equal(np.asarray(ud1), np.asarray(ud0))
    np.testing.assert_array_equal(np.asarray(um1), np.asarray(um0))


def test_fused_rejects_bad_config(small_module):
    module, dobs, _ = small_module
    pot, fstep, low, high, _ = _setup(module, dobs)
    with pytest.raises(ValueError):
        hmc.make_chunk_sampler(
            pot, dt=0.01, Lmin=3, Lmax=8, Sigma=0.001, low=low, high=high,
            constraint="logarithmic", alpha=1.0, chunk_size=4,
            nsamples=4, ndraws=0, wdiag_inv=module.wdiag_inv,
            data_size=dobs.size, shared_L=True, fused_step=fstep)
