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
    from gravinv3dhmc_tpu.bench import build_problem
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

    # two SMALL programs compared step-by-step in python (one monolithic
    # unrolled-compare jit took >12 min of fresh remote AOT compile; the
    # per-step diff reduce transfers 3 scalars per step)
    diff3 = jax.jit(lambda xa, xb, pa, pb, Ua, Ub: (
        jnp.max(jnp.abs(xa - xb)), jnp.max(jnp.abs(pa - pb)),
        jnp.max(jnp.abs(Ua - Ub) / jnp.maximum(jnp.abs(Ub), 1.0))))

    t0 = time.time()
    dx = dp_ = du = 0.0
    xb, pb = x0, p0
    for _ in range(5):
        xa, pa, Ua, uda, uma = fused(xb, pb, dt, alpha)
        xb, pb, Ub, udb, umb = xla_step(xb, pb, potential_fn.params)
        d1, d2, d3 = diff3(xa, xb, pa, pb, Ua, Ub)
        # resync each step so bf16 rounding does not compound chaotically
        dx = max(dx, float(d1))
        dp_ = max(dp_, float(d2))
        du = max(du, float(d3))
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

    # ---- whole-trajectory kernel: Mosaic-compile + numerics -----------
    from gravinv3dhmc_tpu.ops.leapfrog_pallas import make_fused_trajectory

    traj = make_fused_trajectory(
        np.asarray(module.Aw), np.asarray(dobs) - np.mean(dobs), None,
        aprior, wdiag * wdiag, low, high, regularization="MS", beta=0.001,
        tile_c=32)
    L = 5
    inv_mass = jnp.asarray(
        10.0 ** rng.uniform(-1, 0, M).astype(np.float32))

    @jax.jit
    def xla_traj(x, p, prm, im):
        # shared-L trajectory with leading half kick already in p:
        # L full-kick steps, then undo half of the last kick
        def body(i, s):
            x, p, g = s
            x = x + dt * (p if im is None else im * p)
            over = x > high_d
            under = x < low_d
            x = jnp.clip(x, low_d, high_d)
            p = jnp.where(over | under, -p, p)
            U, g, (_, ud, um) = potential_fn.fn(x, alpha, prm)
            return (x, p - dt * g, g)

        x, p, g = jax.lax.fori_loop(0, L, body,
                                    (x, p, jnp.zeros_like(x)))
        return x, p + 0.5 * dt * g, g

    # start mid-box with small momenta so no chain hits a boundary in L
    # steps: a single bf16 rounding flip of the clamp-negate sign would
    # diverge the two paths chaotically (the per-step check above and the
    # exact interpret-mode tests cover the boundary semantics). The two
    # paths also round A differently (the trajectory kernel folds the
    # mean-removal projector into A), so tolerances are L-step bf16
    # accumulation bounds relative to each output's scale.
    xm = jnp.broadcast_to(jnp.asarray(0.5 * wdiag, jnp.float32),
                          (32, M)).astype(jnp.float32)
    pm = p0[:32] * 0.01
    for im in (None, inv_mass):
        xt, pt, gt, Ut, udt, umt = traj(xm, pm, jnp.int32(L),
                                        dt, alpha, inv_mass=im)
        xr, pr, gr = xla_traj(xm, pm, potential_fn.params, im)
        sx = float(jnp.max(jnp.abs(xr)))
        sp = float(jnp.max(jnp.abs(pr)))
        ddx = float(jnp.max(jnp.abs(xt - xr))) / max(sx, 1e-30)
        ddp = float(jnp.max(jnp.abs(pt - pr))) / max(sp, 1e-30)
        tag = "identity" if im is None else "diag-metric"
        print(f"trajectory kernel ({tag}, L={L}): rel|dx|={ddx:.3e} "
              f"rel|dp|={ddp:.3e}", flush=True)
        assert ddx < 2e-2, ddx
        assert ddp < 2e-2, ddp
    print("VERIFY FUSED TRAJECTORY: OK", flush=True)

    # ---- prism-gz Pallas kernel: Mosaic-compile + numerics ------------
    # via the PRODUCTION path (backend="pallas"), which traces the kernel
    # with x64 OFF — calling gz_kernel_matrix_pallas raw under the
    # package-wide x64 SIGABRTs Mosaic's layout pass (bitwidth check)
    from gravinv3dhmc_tpu.ops.prism import prism_kernel_matrix

    rng = np.random.RandomState(1)
    n_obs, n_cells = 32, 512
    obs = np.column_stack([rng.uniform(0, 2000, n_obs),
                           rng.uniform(0, 3000, n_obs),
                           np.zeros(n_obs)])
    x1 = rng.uniform(0, 1900, n_cells)
    y1 = rng.uniform(0, 2900, n_cells)
    z1 = rng.uniform(50, 900, n_cells)
    cells = np.column_stack([x1, x1 + 100, y1, y1 + 100, z1, z1 + 100])
    k_dev = prism_kernel_matrix("gz", obs[:, 0], obs[:, 1], obs[:, 2],
                                cells, backend="pallas")
    k_host = prism_kernel_matrix("gz", obs[:, 0], obs[:, 1], obs[:, 2],
                                 cells)
    rel = float(np.abs(k_dev - k_host).max()
                / max(np.abs(k_host).max(), 1e-30))
    print(f"prism-gz Pallas vs f64 host build ({n_obs}x{n_cells}): "
          f"max rel err {rel:.3e}", flush=True)
    assert rel < 2e-2, rel  # f32 corner-difference cancellation bound
    print("VERIFY PRISM PALLAS: OK", flush=True)

    # ---- single-resident layout at realdata scale (f32) ---------------
    # ISOLATED IN A SUBPROCESS: the NT contraction SIGABRTs the Mosaic
    # compiler on some jax builds (layout.h bitwidth check), which no
    # try/except can catch — the child dying must not kill the verify.
    import subprocess

    r = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--single-resident"],
        capture_output=True, text=True, timeout=560)
    sys.stdout.write(r.stdout)
    if r.returncode != 0:
        print(f"VERIFY SINGLE-RESIDENT REALDATA: FAILED (rc="
              f"{r.returncode}; known Mosaic NT-layout crash — the "
              "sampler gates this layout behind GRAVINV_FUSED_SINGLE=1)",
              flush=True)


def single_resident_check():
    """The VMEM-oversize configuration that round 3 could not compile:
    625x10427 f32 needs ~54 MB dual-resident; the single-matrix NT
    layout halves that. Mosaic-compiles on the real chip and checks
    numerics against an XLA matvec reference at realdata scale."""
    from gravinv3dhmc_tpu.bench import build_realdata_problem
    from gravinv3dhmc_tpu.ops.leapfrog_pallas import make_fused_trajectory

    dev = jax.devices()[0]
    rd_module, rd_dobs = build_realdata_problem()
    Mr = rd_module.n_active
    wdr = np.asarray(rd_module.wdiag)
    apr_r = wdr * np.full(Mr, 0.001)
    low_r = wdr * np.full(Mr, -0.5)
    high_r = wdr * np.full(Mr, 0.5)
    traj_s = make_fused_trajectory(
        np.asarray(rd_module.Aw), np.asarray(rd_dobs) - np.mean(rd_dobs),
        np.asarray(rd_module.grav_fix), apr_r, wdr * wdr, low_r, high_r,
        regularization="Damping", beta=0.01, tile_c=32,
        matvec_dtype=jnp.float32, resident="auto")
    assert traj_s.resident == "single", traj_s.resident
    rd_pot = rd_module.make_potential(
        apr_r, low_r, high_r, constraint="mandatory",
        regularization="Damping", beta=0.01, dtype=jnp.float32)
    low_rd = jnp.asarray(low_r, jnp.float32)
    high_rd = jnp.asarray(high_r, jnp.float32)
    dtr = jnp.float32(0.005)
    alpha_r = jnp.float32(0.05)

    @jax.jit
    def xla_traj_rd(x, p, prm, L):
        def body(i, s):
            x, p, g = s
            x = x + dtr * p
            over = x > high_rd
            under = x < low_rd
            x = jnp.clip(x, low_rd, high_rd)
            p = jnp.where(over | under, -p, p)
            U, g, (_, ud, um) = rd_pot.fn(x, alpha_r, prm)
            return (x, p - dtr * g, g)

        x, p, g = jax.lax.fori_loop(0, L, body, (x, p, jnp.zeros_like(x)))
        return x, p + 0.5 * dtr * g

    Cr = 64
    rngr = np.random.RandomState(2)
    xr0 = jnp.broadcast_to(jnp.asarray(0.2 * wdr, jnp.float32),
                           (Cr, Mr)).astype(jnp.float32)
    pr0 = jnp.asarray(rngr.randn(Cr, Mr).astype(np.float32) * 1e-4)
    Lr = 5
    xt, pt, gt, Ut, udt, umt = traj_s(xr0, pr0, jnp.int32(Lr), dtr,
                                      alpha_r)
    xr, pr = xla_traj_rd(xr0, pr0, rd_pot.params, Lr)
    sx = float(jnp.max(jnp.abs(xr)))
    sp = float(jnp.max(jnp.abs(pr)))
    ddx = float(jnp.max(jnp.abs(xt - xr))) / max(sx, 1e-30)
    ddp = float(jnp.max(jnp.abs(pt - pr))) / max(sp, 1e-30)
    print(f"single-resident trajectory (realdata {rd_module.Aw.shape}, "
          f"f32, L={Lr}): rel|dx|={ddx:.3e} rel|dp|={ddp:.3e}", flush=True)
    assert ddx < 2e-3, ddx  # both sides f32; only reduction order differs
    assert ddp < 2e-3, ddp
    print("VERIFY SINGLE-RESIDENT REALDATA: OK", flush=True)


if __name__ == "__main__":
    if "--single-resident" in sys.argv:
        single_resident_check()
    else:
        main()
