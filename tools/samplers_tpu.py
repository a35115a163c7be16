"""TPU measurement of the adaptive samplers (NUTS / ChEES-HMC).

docs/SAMPLERS.md's round-2 comparison was measured on a 2-core CPU
backend; this tool produces the TPU rows: compile time, sampling wall
time, ESS/s, R-hat, acceptance and divergences for NUTS and ChEES on
the uniformgrid flagship problem — with the sample buffers kept
device-resident and diagnostics computed on device (the tunnelled link
stalls on bulk device->host copies), so only scalars cross the link.

The ``realdata`` stage (round-4 verdict Missing #2: the adaptive
samplers had never been measured on the north-star problem) runs ChEES
on the full-feature South China case — spherical tesseroids, segmented
depths, topography carve, frozen water cells. Targets and anchors,
stated precisely (each result row carries a ``target_note``):

* at SAMPLERS_RD_TEMP=1.0 the m-space objective matches the fixed-L
  HMC bench block's ADAPTED kernel (proper diagonal metric => the
  stationary law is exp(-U); boundary handling differs: logistic
  transform here vs clamp there);
* the reference-kernel anchor (tools/refkernel_f64.json, 0.32 ESS/s)
  measures the reference's own effective target — the Sigma-tempered
  quirk exp(-U/Sigma^2) — so EVERY ratio against it is cross-target;
* the conservative anchor (BASELINE 12.42 samples/s) is raw wall-clock
  throughput, target-agnostic by construction;
* SAMPLERS_RD_TEMP=auto samples the CALIBRATED honest posterior
  (sigma_hat from the bounded-MAP misfit floor) — a different, flatter
  target than all of the above; its ratios measure what a user doing
  defensible inference gets per second, not a same-target speedup.

Usage:  python tools/samplers_tpu.py [nuts] [chees] [realdata]  (on TPU)
Knobs:  SAMPLERS_NCHAINS (8), SAMPLERS_NSAMPLES (200),
        SAMPLERS_NWARMUP (200), SAMPLERS_SUB (64),
        SAMPLERS_RD_NCHAINS (64), SAMPLERS_RD_NSAMPLES (256),
        SAMPLERS_RD_NWARMUP (256)
Writes tools/samplers_tpu.json and prints one JSON line per sampler.
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
from gravinv3dhmc_tpu.diagnostics import ess_jax
from gravinv3dhmc_tpu.inversion.potential import (logistic_to_mw,
                                                  mw_to_logistic)


def rhat_jax(chains):
    """Split-chain R-hat on device. chains: (C, N, K) -> (K,)."""
    c, n, k = chains.shape
    half = n // 2
    sp = jnp.concatenate([chains[:, :half], chains[:, half: 2 * half]],
                         axis=0)  # (2C, half, K)
    means = jnp.mean(sp, axis=1)                      # (2C, K)
    vars_ = jnp.var(sp, axis=1, ddof=1)               # (2C, K)
    B = half * jnp.var(means, axis=0, ddof=1)         # (K,)
    W = jnp.mean(vars_, axis=0)
    W = jnp.where(W == 0, 1e-30, W)
    return jnp.sqrt((half - 1) / half + B / (half * W))


def main():
    which = [a for a in sys.argv[1:] if not a.startswith("-")] or \
        ["nuts", "chees", "realdata"]
    C = int(os.environ.get("SAMPLERS_NCHAINS", "8"))
    N = int(os.environ.get("SAMPLERS_NSAMPLES", "200"))
    W = int(os.environ.get("SAMPLERS_NWARMUP", "200"))
    nsub = int(os.environ.get("SAMPLERS_SUB", "64"))
    dtype = jnp.float32

    module, dobs = build_problem()
    M = module.n_active
    wdiag = np.asarray(module.wdiag)
    aprior = wdiag * np.full(M, 0.001)
    low = wdiag * np.zeros(M)
    high = wdiag * np.ones(M)
    log_factor = 1000.0
    # the proper Bayesian target: logistic box transform + log-Jacobian,
    # T=1 (docs/SAMPLERS.md "same-target mode")
    batched = module.make_potential(
        aprior, low, high, constraint="logarithmic",
        log_factor=log_factor, regularization="MS", beta=0.001,
        dtype=dtype, jacobian=True, temperature=1.0)
    x0 = mw_to_logistic(
        np.clip(wdiag * np.full(M, 0.001),
                low + 1e-9 * (high - low + 1e-30),
                high - 1e-9 * (high - low + 1e-30)),
        low, high, log_factor)
    x0 = np.where(np.isfinite(x0), x0, 0.0)
    x0_b = jnp.asarray(np.tile(x0[None, :], (C, 1)), dtype)
    low_d = jnp.asarray(low, dtype)
    high_d = jnp.asarray(high, dtype)
    sub = jnp.asarray(np.random.RandomState(0).choice(
        M, size=min(M, nsub), replace=False))

    def summarize(xs_cnm, elapsed_s, compile_s, extra):
        """xs_cnm: (C, N, M) device array in x (logistic) space.

        ``elapsed_s`` times the ONE compiled call that runs warmup AND
        sampling (they live in a single jit), so throughput fields are
        named total_s / *_per_total_s: ESS and grad-eval counts cover the
        N sampling draws only, making these end-to-end (conservative)
        rates, not sampling-phase rates."""
        mw = logistic_to_mw(xs_cnm[:, :, sub], low_d[sub], high_d[sub],
                            log_factor)
        ess = ess_jax(mw)
        rh = rhat_jax(mw)
        out = dict(
            nchains=C, nsamples=N, nwarmup=W,
            compile_s=round(compile_s, 1),
            total_s=round(elapsed_s, 2),
            ess_min=float(jnp.min(ess)),
            ess_median=float(jnp.median(ess)),
            ess_per_total_s_median=float(jnp.median(ess)) / elapsed_s,
            rhat_max=float(jnp.max(rh)),
        )
        out.update(extra)
        return out

    out_path = os.path.join(os.path.dirname(__file__),
                            "samplers_tpu.json")
    # merge into the existing artifact: a stage-selective invocation
    # must not clobber the other stages' recorded rows
    results = {}
    if os.path.exists(out_path):
        try:
            results = json.load(open(out_path))
        except Exception:  # noqa: BLE001 — corrupt file: start fresh
            results = {}
    results.update(device=str(jax.devices()[0]),
                   problem=[dobs.size, M])

    if "nuts" in which:
        from gravinv3dhmc_tpu.inversion.nuts import run_nuts

        def _run(x, k, P):
            def pot_single(xx):
                u, g, _ = batched.fn(xx, 1.0, P)
                return u, g
            return run_nuts(pot_single, x, k, n_warmup=W, n_samples=N,
                            step_size0=0.01, max_depth=8, dtype=dtype)

        keys = random.split(random.PRNGKey(100), C)
        runner = jax.jit(jax.vmap(_run, in_axes=(0, 0, None)))
        t0 = time.time()
        compiled = runner.lower(x0_b, keys, batched.params).compile()
        compile_s = time.time() - t0
        t0 = time.time()
        xs, stats = compiled(x0_b, keys, batched.params)
        float(xs[0, 0, 0])  # scalar readback: the only real completion
        # barrier on the axon tunnel (block_until_ready returns at
        # dispatch — it timed this very call at 0.0 s)
        elapsed = time.time() - t0
        depths = stats["depths"]
        res = summarize(xs, elapsed, compile_s, dict(
            sampler="nuts",
            mean_accept=float(jnp.mean(stats["accept_probs"])),
            mean_depth=float(jnp.mean(depths.astype(jnp.float32))),
            divergences=int(jnp.sum(stats["divergences"])),
            grad_evals=int(jnp.sum(2 ** depths.astype(jnp.int32) - 1)),
            step_size_mean=float(jnp.mean(stats["step_size"])),
        ))
        res["grad_evals_per_total_s"] = res["grad_evals"] / elapsed
        results["nuts"] = res
        print(json.dumps({"sampler": "nuts", **res}), flush=True)

    if "chees" in which:
        from gravinv3dhmc_tpu.inversion.chees import run_chees

        def _run_chees(x, k, P):
            def pot_batch(xx):
                u, g, _ = batched.fn(xx, 1.0, P)
                return u, g
            return run_chees(pot_batch, x, k, n_warmup=W, n_samples=N,
                             step_size0=0.01, dtype=dtype)

        runner = jax.jit(_run_chees, static_argnums=())
        t0 = time.time()
        compiled = runner.lower(x0_b, random.PRNGKey(100),
                                batched.params).compile()
        compile_s = time.time() - t0
        t0 = time.time()
        xs, stats = compiled(x0_b, random.PRNGKey(100), batched.params)
        float(xs[0, 0, 0])  # scalar readback barrier (see nuts above)
        elapsed = time.time() - t0
        xs_cnm = jnp.swapaxes(xs, 0, 1)  # (N, C, M) -> (C, N, M)
        # stats["L"] is the shared per-iteration trajectory length; every
        # chain runs it, so grad evals = C * sum(L) (sampling phase only)
        res = summarize(xs_cnm, elapsed, compile_s, dict(
            sampler="chees",
            mean_accept=float(jnp.mean(stats["accept"])),
            step_size=float(jnp.asarray(stats["step_size"]).reshape(-1)[0]),
            trajectory_time=float(
                jnp.asarray(stats["trajectory_time"]).reshape(-1)[0]),
            grad_evals=int(C * jnp.sum(stats["L"])),
        ))
        res["grad_evals_per_total_s"] = res["grad_evals"] / elapsed
        results["chees"] = res
        print(json.dumps({"sampler": "chees", **res}), flush=True)

    if "realdata" in which:
        from gravinv3dhmc_tpu.bench import (BASELINE_REALDATA_SAMPLES_PER_S,
                                            build_realdata_problem)
        from gravinv3dhmc_tpu.inversion.chees import run_chees

        Cr = int(os.environ.get("SAMPLERS_RD_NCHAINS", "64"))
        Nr = int(os.environ.get("SAMPLERS_RD_NSAMPLES", "256"))
        Wr = int(os.environ.get("SAMPLERS_RD_NWARMUP", "256"))
        # target temperature. 1.0 = the reference's raw exp(-U) target
        # (razor-sharp: identity-metric ChEES freezes there — measured
        # eps 2.7e-10 with L saturated; the metric-adapted fixed-L HMC
        # is the right kernel for it, bench.py realdata stage). "auto" =
        # the CALIBRATED honest posterior: sigma^2 estimated from the
        # bounded-MAP data-misfit floor (real data has no known noise
        # sigma), temperature = 2 sigma_hat^2.
        rd_temp = os.environ.get("SAMPLERS_RD_TEMP", "1.0")
        module_r, dobs_r = build_realdata_problem()
        Mr = module_r.n_active
        wdiag_r = np.asarray(module_r.wdiag)
        # the realdata bench block's exact objective: Damping toward the
        # 0.001 prior, alpha=0.05, box [-0.5, 0.5], frozen water cells
        # (bench.py realdata_stage; reference example/realdata/
        # main_real.py:43). Same exp(-U) target as the fixed-L HMC run,
        # so ESS/s compares like for like against both anchors.
        alpha_r = 0.05
        apr_r = wdiag_r * np.full(Mr, 0.001)
        low_r = wdiag_r * np.full(Mr, -0.5)
        high_r = wdiag_r * np.full(Mr, 0.5)
        if rd_temp == "auto":
            from gravinv3dhmc_tpu.inversion.reginv import cg_device
            cg = cg_device(module_r, dobs_r, (-0.5, 0.5),
                           regularization="Damping", maxk=400,
                           dtype=dtype, alpha=alpha_r)
            dp = module_r.predict(cg["mw"])
            dzc = jnp.asarray(dobs_r, dtype)
            rr = (dp - jnp.mean(dp)) - (dzc - jnp.mean(dzc))
            sigma_hat2 = float(jnp.mean(rr * rr))
            temperature_r = 2.0 * sigma_hat2
        else:
            temperature_r = float(rd_temp)
        batched_r = module_r.make_potential(
            apr_r, low_r, high_r, constraint="logarithmic",
            log_factor=log_factor, regularization="Damping", beta=0.01,
            dtype=dtype, jacobian=True, temperature=temperature_r)
        x0r = mw_to_logistic(
            np.clip(wdiag_r * np.full(Mr, 0.01),
                    low_r + 1e-9 * (high_r - low_r + 1e-30),
                    high_r - 1e-9 * (high_r - low_r + 1e-30)),
            low_r, high_r, log_factor)
        x0r = np.where(np.isfinite(x0r), x0r, 0.0)
        x0r_b = jnp.asarray(np.tile(x0r[None, :], (Cr, 1)), dtype)
        low_rd = jnp.asarray(low_r, dtype)
        high_rd = jnp.asarray(high_r, dtype)
        sub_r = jnp.asarray(np.random.RandomState(0).choice(
            Mr, size=min(Mr, nsub), replace=False))

        def _run_rd(x, k, P):
            def pot_batch(xx):
                u, g, _ = batched_r.fn(xx, alpha_r, P)
                return u, g
            return run_chees(pot_batch, x, k, n_warmup=Wr, n_samples=Nr,
                             step_size0=0.01, dtype=dtype)

        runner = jax.jit(_run_rd)
        t0 = time.time()
        compiled = runner.lower(x0r_b, random.PRNGKey(100),
                                batched_r.params).compile()
        compile_s = time.time() - t0
        t0 = time.time()
        xs, stats = compiled(x0r_b, random.PRNGKey(100), batched_r.params)
        float(xs[0, 0, 0])  # scalar readback barrier (see nuts above)
        elapsed = time.time() - t0
        xs_cnm = jnp.swapaxes(xs, 0, 1)
        mw_r = logistic_to_mw(xs_cnm[:, :, sub_r], low_rd[sub_r],
                              high_rd[sub_r], log_factor)
        ess_r = ess_jax(mw_r)
        rh_r = rhat_jax(mw_r)
        ess_med = float(jnp.median(ess_r))
        res = dict(
            sampler="chees", workload="realdata_southchina",
            problem=[int(dobs_r.size), int(Mr)],
            nchains=Cr, nsamples=Nr, nwarmup=Wr,
            RegulFactor=alpha_r, temperature=temperature_r,
            compile_s=round(compile_s, 1),
            total_s=round(elapsed, 2),
            ess_min=float(jnp.min(ess_r)),
            ess_median=ess_med,
            ess_per_total_s_median=round(ess_med / elapsed, 2),
            rhat_max=float(jnp.max(rh_r)),
            mean_accept=float(jnp.mean(stats["accept"])),
            step_size=float(jnp.asarray(
                stats["step_size"]).reshape(-1)[0]),
            trajectory_time=float(jnp.asarray(
                stats["trajectory_time"]).reshape(-1)[0]),
            mean_L=float(stats["mean_L"]),
            max_steps_saturated=float(stats["max_steps_saturated"]),
            grad_evals=int(Cr * jnp.sum(stats["L"])),
            target_note=(
                "calibrated honest posterior (T=2*sigma_hat^2, flatter "
                "than every anchor's target): ratios measure defensible-"
                "inference throughput, not a same-target speedup"
                if rd_temp == "auto" else
                "raw exp(-U) objective (matches the bench's adapted HMC "
                "in m-space; the reference-kernel anchor's own target "
                "is the Sigma-tempered quirk, so that ratio is "
                "cross-target)"),
        )
        res["grad_evals_per_total_s"] = round(res["grad_evals"] / elapsed,
                                              1)
        # conservative anchor: reference samples/s (>= its ESS/s) from
        # its own logged realdata T1 run — the north-star denominator
        res["vs_baseline_ess"] = round(
            res["ess_per_total_s_median"] / BASELINE_REALDATA_SAMPLES_PER_S,
            1)
        # like-for-like anchor: the reference kernel's measured
        # ESS/sample x its logged samples/s (tools/refkernel_f64.json)
        try:
            art = json.load(open(os.path.join(os.path.dirname(__file__),
                                              "refkernel_f64.json")))
            ref_ess_s = (BASELINE_REALDATA_SAMPLES_PER_S
                         * art["measured"]["ess_per_sample"])
            res["vs_reference_kernel_ess"] = round(
                res["ess_per_total_s_median"] / ref_ess_s, 1)
        except Exception:  # noqa: BLE001 — anchor file optional
            pass
        key = ("realdata_chees_honest" if rd_temp == "auto"
               else "realdata_chees")
        results[key] = res
        print(json.dumps({"stage": "realdata", **res}), flush=True)

    with open(out_path, "w") as f:
        json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
