"""Roofline decomposition of the fused-trajectory HMC sampler.

Answers "where does each millisecond of the sampler iteration go?" by
timing, on the real device, each layer of the stack at the flagship
600x6000 scale:

  1. the bare matmul pair d = x A^T; g = r A (the MXU ceiling),
  2. the fused Pallas trajectory kernel alone at several L (slope =
     per-leapfrog-step cost, intercept = per-invocation overhead),
  3. the sampler-side per-iteration work outside the trajectory
     (momentum refresh RNG — threefry AND rbg — and Metropolis
     accept/select),
  4. full production chunks under each sample-storage discipline
     (store_mode none / chain / accepted) — the difference isolates the
     storage cost that round-3 left as a 7.4 ms "unaccounted" bucket.

Timing methodology — two rules learned the hard way on the tunnelled
axon platform:

* ``jax.block_until_ready`` DOES NOT block for real here (it returns
  after dispatch, not completion — measured: an 800-iteration matmul
  loop "completed" in 0.1 ms). Every measurement ends with a SCALAR
  READBACK of the output, the only reliable completion barrier (and
  tunnel-safe: one float crosses the link).
* every loop measurement takes the SLOPE between two trip counts
  n1 < n2 so the constant dispatch+readback overhead cancels (the
  round-3 baseline-subtraction at n=30 vs n=0 measured 1751 TFLOPS on a
  197 TFLOP chip — pure noise). The matmul ceiling is sanity-checked
  against the hardware peak.

Writes tools/roofline.json and prints one JSON line.

Usage:  python tools/roofline.py          (run on the TPU)
Knobs:  ROOFLINE_NCHAINS (1024), ROOFLINE_REPS (200), ROOFLINE_TILE_C
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from gravinv3dhmc_tpu.runtime.compile_cache import enable_compile_cache

enable_compile_cache()

import jax
import jax.numpy as jnp
from jax import random

from gravinv3dhmc_tpu.bench import build_problem
from gravinv3dhmc_tpu.inversion import hmc
from gravinv3dhmc_tpu.ops.leapfrog_pallas import make_fused_trajectory

# v5e (TPU v5 lite) peak dense throughput; used only as a sanity bound
V5E_PEAK_BF16_TFLOPS = 197.0


def force(out):
    """Completion barrier: scalar readback of the first output leaf
    (block_until_ready returns at DISPATCH on the axon tunnel)."""
    leaf = jax.tree_util.tree_leaves(out)[0]
    return float(jnp.asarray(leaf).ravel()[0])


def timed(fn, *args, reps=3):
    """Median wall time of fn(*args) with a scalar-readback barrier."""
    ts = []
    for _ in range(reps):
        t0 = time.time()
        out = fn(*args)
        force(out)
        ts.append(time.time() - t0)
    return float(np.median(ts)), out


def slope_time(fn, args_for_n, n1, n2):
    """Per-iteration time as the slope between trip counts n1 < n2 —
    immune to the constant dispatch/roundtrip overhead that swamped the
    round-3 baseline-subtraction."""
    t1, _ = timed(fn, *args_for_n(n1))
    t2, _ = timed(fn, *args_for_n(n2))
    return max(t2 - t1, 1e-9) / (n2 - n1)


def main():
    C = int(os.environ.get("ROOFLINE_NCHAINS", "1024"))
    reps = int(os.environ.get("ROOFLINE_REPS", "200"))
    tile_c = int(os.environ.get("ROOFLINE_TILE_C", "128"))
    interpret = os.environ.get("ROOFLINE_INTERPRET", "0") == "1"

    module, dobs = build_problem()
    M = module.n_active
    D = dobs.size
    wdiag = module.wdiag
    aprior = wdiag * np.full(M, 0.001)
    low = wdiag * np.zeros(M)
    high = wdiag * np.ones(M)

    traj = make_fused_trajectory(
        np.asarray(module.Aw), np.asarray(dobs) - np.mean(dobs), None,
        aprior, wdiag * wdiag, low, high, regularization="MS",
        beta=0.001, tile_c=tile_c, interpret=interpret)
    A = traj.params["A"]          # (Dp, Mp) bf16, mean-projected
    At = traj.params["At"]
    Dp, Mp = A.shape
    flops_per_step = 4.0 * Dp * Mp  # two matvecs per chain

    x0 = jnp.broadcast_to(jnp.asarray(0.5 * wdiag, jnp.float32),
                          (C, M)).astype(jnp.float32)
    xp0 = jnp.zeros((C, Mp), jnp.float32).at[:, :M].set(x0)

    # ---- 1. matmul-only ceiling: n x (d = x At; g = r A) -------------
    @jax.jit
    def matmul_pair_loop(xp, A, At, n):
        def body(_, x):
            d = jax.lax.dot_general(
                x.astype(A.dtype), At, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            g = jax.lax.dot_general(
                d.astype(A.dtype), A, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            # rescale to keep values bounded without extra HBM traffic
            return x + 1e-6 * g
        return jax.lax.fori_loop(0, n, body, xp)

    pair_s = slope_time(matmul_pair_loop,
                        lambda n: (xp0, A, At, n), reps, 4 * reps)
    matmul_ge_per_s = C / pair_s
    matmul_tflops = C * flops_per_step / pair_s / 1e12
    matmul_sane = matmul_tflops <= 1.05 * V5E_PEAK_BF16_TFLOPS
    if not matmul_sane:
        print(f"WARNING: matmul microbench measured {matmul_tflops:.0f} "
              f"TFLOPS > {V5E_PEAK_BF16_TFLOPS} peak — still noise-bound; "
              "raise ROOFLINE_REPS", file=sys.stderr, flush=True)

    # ---- 2. fused trajectory at several L ----------------------------
    p0 = 0.001 * xp0[:, :M]
    eps = jnp.float32(1e-4)
    alpha = jnp.float32(1.0)

    @jax.jit
    def traj_loop(x, p, L, n, params):
        def body(_, s):
            x, p = s
            x2, p2, g2, U, ud, um = traj(x, p, L, eps, alpha,
                                         params=params)
            return (x2, p2 * 0.999)
        return jax.lax.fori_loop(0, n, body, (x, p))

    Ls = [1, 4, 16, 48]
    t_by_L = {}
    for L in Ls:
        # per-call time via slope between two trip counts; budget the trip
        # counts so each L's measured difference is ~equally long
        n2 = max(4, int(round(reps * 16 / max(L, 4))))
        n1 = n2 // 4
        t_by_L[L] = slope_time(traj_loop,
                               lambda n: (x0, p0, jnp.int32(L), n,
                                          traj.params), n1, n2)
    # least-squares slope/intercept of t(L) = a + b L
    Larr = np.array(Ls, float)
    Tarr = np.array([t_by_L[L] for L in Ls])
    b, a = np.polyfit(Larr, Tarr, 1)
    traj_ge_per_s = C / max(b, 1e-12)
    traj_tflops = C * flops_per_step / max(b, 1e-12) / 1e12

    # ---- 3. sampler-side per-iteration work --------------------------
    key = random.PRNGKey(0)
    key_rbg = random.key(0, impl="rbg")

    def make_rng_loop():
        @jax.jit
        def rng_refresh_loop(x, key, n):
            def body(i, s):
                x, key = s
                key, sub = random.split(key)
                p = random.normal(sub, x.shape, x.dtype)
                return (x + 0.0 * p, key)
            return jax.lax.fori_loop(0, n, body, (x, key))
        return rng_refresh_loop

    rng_loop = make_rng_loop()
    rng_s = slope_time(rng_loop, lambda n: (x0, key, n), reps // 4, reps)
    rng_rbg_s = slope_time(rng_loop, lambda n: (x0, key_rbg, n),
                           reps // 4, reps)

    @jax.jit
    def accept_select_loop(x, key, n):
        def body(i, s):
            x, key = s
            key, sub = random.split(key)
            acc = random.uniform(sub, (x.shape[0],)) < 0.8
            x2 = jnp.where(acc[:, None], x * 0.999, x)
            return (x2, key)
        return jax.lax.fori_loop(0, n, body, (x, key))

    accept_s = slope_time(accept_select_loop, lambda n: (x0, key, n),
                          reps // 4, reps)

    # ---- 4. full production chunks by store_mode ---------------------
    potential_fn = module.make_potential(
        aprior, low, high, constraint="mandatory", regularization="MS",
        beta=0.001, dtype=jnp.float32)
    nsamples = 64
    chunk_size = 128

    def chunk_time(store_mode):
        run_chunk = hmc.make_chunk_sampler(
            potential_fn, dt=0.01, Lmin=5, Lmax=20, Sigma=0.001, low=low,
            high=high, constraint="mandatory", alpha=1.0,
            chunk_size=chunk_size, nsamples=nsamples, ndraws=0,
            wdiag_inv=module.wdiag_inv, data_size=D, dtype=jnp.float32,
            shared_L=True, fused_trajectory=traj, store_mode=store_mode)
        # fresh chain state per mode: run_chunk DONATES its carry, so the
        # previous mode's call invalidated any shared x0 (reusing it made
        # jit lowering fetch a deleted buffer -> opaque TPU backend error)
        x_c = jnp.broadcast_to(jnp.asarray(0.5 * wdiag, jnp.float32),
                               (C, M)).astype(jnp.float32)
        U, g, (_, u_data, u_model) = potential_fn(x_c, 1.0)
        carry = (x_c, U, g, u_data, u_model, jnp.zeros(C, jnp.int32),
                 jnp.zeros((C, nsamples, M), jnp.float32),
                 jnp.zeros((C, nsamples, 7), jnp.float32))
        carry, stats = run_chunk(carry, key, 0, potential_fn.params)
        force(stats)  # warmup/compile barrier
        t0 = time.time()
        n_timed = 3
        ge = jnp.zeros((), jnp.float32)
        for i in range(1, n_timed + 1):
            carry, stats = run_chunk(carry, key, i, potential_fn.params)
            ge = ge + jnp.sum(stats[..., 4])
        ge_f = float(ge)  # scalar readback INSIDE the timed window
        dt_s = time.time() - t0
        return (dt_s / (n_timed * chunk_size), ge_f / dt_s)

    chunk = {}
    for mode in ("none", "chain", "accepted"):
        per_iter, ge_per_s = chunk_time(mode)
        chunk[mode] = {"s_per_iter": per_iter,
                       "grad_evals_per_s": ge_per_s}
        print(f"store_mode={mode}: {per_iter*1e3:.2f} ms/iter, "
              f"{ge_per_s/1e6:.2f}M grad-evals/s", file=sys.stderr,
              flush=True)

    per_iter_s = chunk["accepted"]["s_per_iter"]
    # E[L]=12.5 -> expected trajectory time per iteration from the fit
    traj_part = a + b * 12.5
    # NOTE store_mode="none" measures SLOWER than the storing modes: with
    # the buffers carried through the scan untouched, XLA fails to hoist
    # them as loop invariants and copies the 1.6 GB per iteration —
    # updating them in place is cheaper than not touching them. "none" is
    # a measurement mode only; the budget below is the production (chain)
    # chunk decomposed against the trajectory-kernel fit.
    chain_iter = chunk["chain"]["s_per_iter"]
    out = {
        "device": str(jax.devices()[0]),
        "problem": [D, M],
        "padded": [int(Dp), int(Mp)],
        "nchains": C,
        "tile_c": tile_c,
        "matmul_pair_s": pair_s,
        "matmul_only_grad_evals_per_s": matmul_ge_per_s,
        "matmul_only_tflops": matmul_tflops,
        "matmul_tflops_sane": bool(matmul_sane),
        "peak_bf16_tflops": V5E_PEAK_BF16_TFLOPS,
        "traj_s_by_L": {str(L): t_by_L[L] for L in Ls},
        "traj_per_step_s": b,
        "traj_per_call_overhead_s": a,
        "traj_kernel_grad_evals_per_s": traj_ge_per_s,
        "traj_kernel_tflops": traj_tflops,
        "rng_refresh_s_per_iter": rng_s,
        "rng_refresh_rbg_s_per_iter": rng_rbg_s,
        "accept_select_s_per_iter": accept_s,
        "chunk_by_store_mode": chunk,
        "chunk_s_per_iter": per_iter_s,
        "chunk_grad_evals_per_s": chunk["accepted"]["grad_evals_per_s"],
        # production (chain-mode) per-iteration budget: the trajectory
        # kernel from the t(L) fit, plus everything else the sampler
        # wrapper does (momentum-refresh RNG, H/accept/select, in-place
        # sample store, scan step) — the isolated rng/accept microbenches
        # measure ~0 because those ops fuse into neighbours; they are not
        # separable line items
        "iter_budget": {
            "trajectory(E[L]=12.5)": traj_part,
            "wrapper(rng+accept+store+scan)": chain_iter - traj_part,
            "accepted_mode_extra": per_iter_s - chain_iter,
        },
    }
    with open(os.path.join(os.path.dirname(__file__), "roofline.json"),
              "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
