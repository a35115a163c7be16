"""On-hardware verification of the fused Pallas leapfrog step.

Mosaic-compiles (NOT interpret mode) ``make_fused_step`` on the attached
device and checks its numerics against the XLA potential path on-device:
only reduced scalars cross the host link (the tunnelled TPU link stalls on
bulk copies — CLAUDE.md). Run as a verify-skill step:

    python tools/verify_fused_tpu.py            # full flagship size

The fused step carries bf16 matvecs with f32 accumulation, so it is
compared against an XLA potential built with matvec_dtype=bf16; tolerances
reflect a single step's bf16 rounding, not the f64 kernel-construction
parity (tests/test_prism_ops.py covers that).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp


def main():
    sys.path.insert(0, os.getcwd())
    from bench import build_problem
    from gravinv3dhmc_tpu.ops.leapfrog_pallas import make_fused_step

    module, dobs = build_problem()
    M = module.n_active
    wdiag = module.wdiag
    aprior = wdiag * np.full(M, 0.001)
    low = wdiag * np.zeros(M)
    high = wdiag * np.ones(M)

    dev = jax.devices()[0]
    print(f"device: {dev}", flush=True)

    fused = make_fused_step(
        np.asarray(module.Aw), np.asarray(dobs) - np.mean(dobs), None,
        aprior, wdiag * wdiag, low, high, regularization="MS", beta=0.001)

    potential_fn = module.make_potential(
        aprior, low, high, constraint="mandatory", regularization="MS",
        beta=0.001, dtype=jnp.float32, matvec_dtype=jnp.bfloat16)
    low_d = jnp.asarray(low, jnp.float32)
    high_d = jnp.asarray(high, jnp.float32)
    dt = jnp.float32(0.01)
    alpha = jnp.float32(1.0)

    C = 64
    rng = np.random.RandomState(0)
    x0 = jnp.asarray(
        np.clip(rng.uniform(0.0, 1.0, (C, M)) * wdiag[None, :],
                low[None, :], high[None, :]), jnp.float32)
    p0 = jnp.asarray(rng.randn(C, M).astype(np.float32) * 0.001)

    @jax.jit
    def xla_step(x, p, prm):
        # the exact semantics of the fused kernel: drift, mandatory
        # boundary, full kick (inversion/hmc.py leapfrog body)
        x = x + dt * p
        over = x > high_d
        under = x < low_d
        x = jnp.clip(x, low_d, high_d)
        p = jnp.where(over | under, -p, p)
        U, g, (_, ud, um) = potential_fn.fn(x, alpha, prm)
        return x, p - dt * g, U, ud, um

    @jax.jit
    def compare(x0, p0, prm):
        xa, pa, Ua, uda, uma = x0, p0, None, None, None
        xb, pb = x0, p0
        max_dx = jnp.float32(0)
        max_dp = jnp.float32(0)
        max_du = jnp.float32(0)
        for _ in range(5):
            xa, pa, Ua, uda, uma = fused(xa, pa, dt, alpha)
            xb, pb, Ub, udb, umb = xla_step(xb, pb, prm)
            scale_u = jnp.maximum(jnp.abs(Ub), 1.0)
            max_dx = jnp.maximum(max_dx, jnp.max(jnp.abs(xa - xb)))
            max_dp = jnp.maximum(max_dp, jnp.max(jnp.abs(pa - pb)))
            max_du = jnp.maximum(max_du,
                                 jnp.max(jnp.abs(Ua - Ub) / scale_u))
            # resync trajectories so bf16 rounding does not compound
            # chaotically across steps — each step is verified from the
            # same state
            xa, pa = xb, pb
        return max_dx, max_dp, max_du

    t0 = time.time()
    max_dx, max_dp, max_du = compare(x0, p0, potential_fn.params)
    dx, dp_, du = float(max_dx), float(max_dp), float(max_du)  # 3 scalars
    dt_wall = time.time() - t0
    print(f"5-step fused-vs-XLA (both bf16 matvec, f32 accum), C={C}, "
          f"problem {module.Aw.shape}: max|dx|={dx:.3e} max|dp|={dp_:.3e} "
          f"max relative dU={du:.3e}  ({dt_wall:.1f}s)", flush=True)
    # x carries positions O(wdiag*rho) ~ O(1e-3..1); p accumulates the
    # bf16-matvec gradient; dU is relative. The two paths do the matvecs
    # in a different order (fused pads to lanes), so exact equality is not
    # expected — these bounds catch structural errors, not rounding.
    assert dx < 1e-4, dx
    assert dp_ < 2e-2, dp_
    assert du < 1e-3, du
    print("VERIFY FUSED: OK", flush=True)

    # ---- prism-gz Pallas kernel: Mosaic-compile + numerics ------------
    from gravinv3dhmc_tpu import constants
    from gravinv3dhmc_tpu.ops.prism_pallas import gz_kernel_matrix_pallas

    rng = np.random.RandomState(1)
    n_obs, n_cells = 32, 512
    obs = np.column_stack([rng.uniform(0, 2000, n_obs),
                           rng.uniform(0, 3000, n_obs),
                           np.zeros(n_obs)])
    x1 = rng.uniform(0, 1900, n_cells)
    y1 = rng.uniform(0, 2900, n_cells)
    z1 = rng.uniform(50, 900, n_cells)
    cells = np.column_stack([x1, x1 + 100, y1, y1 + 100, z1, z1 + 100])
    scale = constants.G * constants.SI2MGAL
    k_dev = gz_kernel_matrix_pallas(jnp.asarray(obs, jnp.float32),
                                    jnp.asarray(cells, jnp.float32), scale)
    # compare on device against an f64 host build (tiny h2d)
    from gravinv3dhmc_tpu.ops.prism import prism_kernel_matrix
    k_host = prism_kernel_matrix("gz", obs[:, 0], obs[:, 1], obs[:, 2],
                                 cells)
    ref = jnp.asarray(np.asarray(k_host, np.float32))
    denom = jnp.maximum(jnp.max(jnp.abs(ref)), 1e-30)
    rel = float(jnp.max(jnp.abs(k_dev - ref)) / denom)  # scalar d2h
    print(f"prism-gz Pallas vs f64 host build ({n_obs}x{n_cells}): "
          f"max rel err {rel:.3e}", flush=True)
    assert rel < 5e-3, rel  # f32 corner-difference cancellation bound
    print("VERIFY PRISM PALLAS: OK", flush=True)


if __name__ == "__main__":
    main()
