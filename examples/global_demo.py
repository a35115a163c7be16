"""Whole-Earth (global) inversion demo — the reference's OOM case, on TPU.

The reference attempted this 7381 x 72000 spherical inversion on a 72-CPU
/ 251 GB node and was OOM-killed mid-sampling
(reference: example/global/logout_T1.txt, "Killed (signal 9)"). This
script runs it end-to-end on one TPU chip over a high-latency tunnelled
link, producing a committed evidence artifact (GLOBAL_r02.json).

Link-safety design (the tunnel stalls on bulk eager copies):
* the sensitivity kernel is built ON DEVICE from ~3 MB of geometry
  (ops/tesseroid.tesseroid_kernel_device): far-field pairs evaluate as
  depth-0 GLQ on the accelerator; near-field pairs (~1.8%) are
  overwritten with exact host-engine values;
* every remaining bulk host->device transfer goes through a jitted
  identity (the jit-argument upload path sustains ~39 MB/s where eager
  device_put stalls);
* sampling runs with device-resident sample buffers
  (HamiltonianMC.transfer_samples=False); posterior mean/std, RMSD, RMSM
  and ESS are computed on device — only scalars cross the link.

Usage:  python examples/global_demo.py [--nsamples 128] [--nchains 32]
        [--kernel-cache cache/global_kernel.npy] [--out GLOBAL_r02.json]
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))  # sibling workloads.py
try:
    import gravinv3dhmc_tpu  # noqa: F401 — installed package?
except ImportError:  # uninstalled checkout: repo root on the path
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

from gravinv3dhmc_tpu.runtime.compile_cache import enable_compile_cache

enable_compile_cache()

import workloads as W  # noqa: E402
from gravinv3dhmc_tpu import utils  # noqa: E402
from gravinv3dhmc_tpu.inversion import hmc  # noqa: E402
from gravinv3dhmc_tpu.inversion.potential import (  # noqa: E402
    GravMagModule,
    sensitivity_weighting,
)
from gravinv3dhmc_tpu.ops import tesseroid as tess  # noqa: E402


def h2d(x, dtype=jnp.float32):
    """Bulk host->device through the jit-argument upload path."""
    return jax.jit(lambda v: v)(np.asarray(x, dtype))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scale", type=float, default=1.0)
    ap.add_argument("--nsamples", type=int, default=128)
    ap.add_argument("--ndraws", type=int, default=32)
    ap.add_argument("--nchains", type=int, default=32)
    ap.add_argument("--chunk-size", type=int, default=32)
    ap.add_argument("--kernel-cache", default="cache/global_kernel.npy")
    ap.add_argument("--out", default="GLOBAL_r02.json")
    args = ap.parse_args()

    log = lambda m: print(f"[global +{time.time() - T0:.1f}s] {m}",
                          flush=True)
    T0 = time.time()
    art = {"problem": "global whole-Earth tesseroid gz inversion",
           "device": str(jax.devices()[0]),
           "reference_outcome": "OOM-killed at ~0.6% sampling on a 72-CPU"
                                " 251GB node (example/global/logout_T1.txt:"
                                " kernel 246.5s + weighting 228.3s, then"
                                " signal 9)"}

    wl = W.global_tess(scale=args.scale)
    lons, lats, heights = wl["obs"]
    rho = wl["rho"]
    cells = wl["mesh"].cell_bounds(only_active=True)
    D, M = lons.size, cells.shape[0]
    art["D"], art["M"] = int(D), int(M)
    log(f"mesh built: D={D} obs, M={M} tesseroids")

    # ---- host kernel (cache) for synthetic data + corrections --------
    t = time.time()
    if os.path.exists(args.kernel_cache):
        K_host = np.load(args.kernel_cache, mmap_mode=None)
        meta = os.path.join(os.path.dirname(args.kernel_cache),
                            "global_build_meta.json")
        art["kernel_build_host_s"] = (
            json.load(open(meta))["kernel_build_s"]
            if os.path.exists(meta) else None)
        log(f"host kernel loaded from cache ({time.time() - t:.1f}s)")
    else:
        K_host = tess.tesseroid_kernel_matrix("gz", lons, lats, heights,
                                              wl["mesh"])
        art["kernel_build_host_s"] = time.time() - t
        log(f"host kernel built in {art['kernel_build_host_s']:.1f}s "
            f"(reference: 246.5s on 72 CPUs)")

    dpre = K_host @ rho
    dobs = utils.contaminate(dpre, 0.02 * np.abs(dpre).max(), seed=1)

    # ---- weighting (host vectors only) --------------------------------
    t = time.time()
    _, wdiag, wdiag_inv = sensitivity_weighting(K_host)
    art["weighting_s"] = time.time() - t
    log(f"sensitivity weighting {art['weighting_s']:.2f}s "
        "(reference: 228.3s python loop)")

    # ---- device kernel build ------------------------------------------
    t = time.time()
    Aw_dev, (oi, ci) = tess.tesseroid_kernel_device(
        "gz", lons, lats, heights, cells, host_kernel=K_host,
        winv=wdiag_inv, obs_block=int(os.environ.get("GLOBAL_OBS_BLOCK",
                                                     "256")))
    Aw_dev.block_until_ready()
    art["kernel_build_device_s"] = time.time() - t
    art["nearfield_pairs"] = int(oi.size)
    art["nearfield_frac"] = float(oi.size / (D * M))
    log(f"device kernel built in {art['kernel_build_device_s']:.1f}s "
        f"({oi.size} near-field host corrections, "
        f"{art['nearfield_frac']:.2%})")

    # validate: sampled entries vs the host kernel (scalar d2h only)
    rng = np.random.RandomState(0)
    si = rng.randint(0, D, 2000)
    sj = rng.randint(0, M, 2000)
    host_vals = (K_host[si, sj] * wdiag_inv[sj]).astype(np.float64)
    dev_vals = jax.jit(lambda A, i, j: A[i, j])(
        Aw_dev, jnp.asarray(si), jnp.asarray(sj))
    err = float(jnp.max(jnp.abs(dev_vals - h2d(host_vals)))
                / max(np.abs(host_vals).max(), 1e-30))
    art["device_vs_host_max_rel_err"] = err
    log(f"device kernel vs host sample check: max rel err {err:.2e}")
    assert err < 1e-4, "device-built kernel disagrees with host"
    del K_host

    # ---- module shim: inject the device kernel ------------------------
    class _Shim:
        pass

    module = _Shim()
    module.Aw = None
    module.dobs = dobs
    module.wdiag = wdiag
    module.wdiag_inv = wdiag_inv
    module.fixed = False
    module.grav_fix = None
    module.Awcp = None
    module.wavelet = False
    module._active3d = None
    module.dtype = jnp.float32
    gm = GravMagModule.__new__(GravMagModule)
    gm.__dict__.update(module.__dict__)
    gm.mshape = wl["mesh"].shape
    gm._model_transform = None
    gm._dev = {"float32": {"Aw": Aw_dev,
                           "dobs": h2d(dobs),
                           "grav_fix": None}}
    gm._potential_cache = {}

    # ---- sampling (reference config: example/global/main_global.py) ---
    C = args.nchains
    boundaries = np.stack([np.full(M, wl["rhomin"]),
                           np.full(M, wl["rhomax"])], axis=1)
    chain = hmc.HamiltonianMC(gm)
    chain.dt = 0.005
    chain.Lrange = [5, 20]
    chain.Sigma = 0.001
    chain.RegulFactor = 0.05
    chain.regularization = "Damping"
    chain.beta = 0.01
    chain.nchains = C
    chain.chunk_size = args.chunk_size
    chain.seed = 100
    chain.verbose = True
    chain.write_files = False
    chain.shared_L = True
    chain.transfer_samples = False  # scalars only over the link
    wb = wdiag * boundaries.T
    chain.low, chain.high = wb[0], wb[1]
    chain.initial_model = wdiag * np.full(M, 0.001)
    chain.aprior_model = wdiag * np.full(M, 0.001)
    chain.dobs = dobs

    log(f"sampling: {C} chains x {args.nsamples} samples "
        f"(+{args.ndraws} warm-up), chunk={args.chunk_size}")
    stats = chain.sample(args.nsamples, args.ndraws)
    art.update(
        sampling_s=stats["elapsed_s"],
        grad_evals=stats["grad_evals"],
        grad_evals_per_s=stats["grad_evals_per_s"],
        accept_ratio=stats["accept_ratio"],
        ess_per_s_median=stats["ess_per_s_median"],
        nchains=C, nsamples=args.nsamples,
    )
    log(f"sampling done in {stats['elapsed_s']:.1f}s: "
        f"{stats['grad_evals_per_s']:.0f} grad-evals/s, "
        f"accept {stats['accept_ratio']:.2%}")

    # ---- posterior statistics ON DEVICE --------------------------------
    buf = stats["samples_device"]           # (C, nsamples, M) unweighted m
    n_common = int(min(stats["n_stored"].min(), args.nsamples))
    mean_m = jnp.mean(buf[:, :n_common], axis=(0, 1))
    std_m = jnp.std(buf[:, :n_common], axis=(0, 1))
    dpre_mean = jax.jit(
        lambda A, m, w: A @ (m * w))(Aw_dev, mean_m, h2d(wdiag))
    dobs_dev = h2d(dobs)
    rmsd = float(jnp.sqrt(jnp.mean((dobs_dev - dpre_mean) ** 2)))
    rho_dev = h2d(rho)
    rmsm = float(jnp.sqrt(jnp.mean((mean_m - rho_dev) ** 2)))
    corr = float(jnp.corrcoef(jnp.stack([mean_m, rho_dev]))[0, 1])
    art.update(n_common=n_common, RMSD=rmsd, RMSM=rmsm,
               posterior_truth_corr=corr,
               mean_model_max=float(jnp.max(mean_m)),
               std_model_max=float(jnp.max(std_m)),
               total_s=time.time() - T0)
    log(f"posterior: RMSD={rmsd:.4f} mGal, RMSM={rmsm:.4f} g/cc, "
        f"corr(mean, truth)={corr:.3f}")

    with open(args.out, "w") as f:
        json.dump(art, f, indent=1)
    log(f"artifact written: {args.out}")
    print(json.dumps({k: art[k] for k in
                      ("D", "M", "grad_evals_per_s", "accept_ratio",
                       "RMSD", "RMSM", "posterior_truth_corr",
                       "total_s")}))


if __name__ == "__main__":
    main()
