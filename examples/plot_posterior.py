"""Posterior statistics + figures from chain sample folders.

The equivalent of the reference's per-workload plot scripts
(reference: example/uniformgrid/plot_uniform.py,
example/realdata/plot_real_multichain.py): loads ``<folder><c>/model.dat``
for all chains, merges them, computes posterior mean/std, R-hat/ESS,
re-forwards the mean through the forward operator, reports RMSD (and RMSM
when a truth model file is given), and writes layer-panel + profile
figures.

    python examples/plot_posterior.py result/model01T1_chain --chains 2 \
        --workload uniformgrid [--truth modeldata/rho.dat] [--outdir picture]
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import matplotlib

matplotlib.use("Agg")
import numpy as np

from gravinv3dhmc_tpu import diagnostics, utils
from gravinv3dhmc_tpu.ops import prism
from gravinv3dhmc_tpu.ops import tesseroid as tess
from gravinv3dhmc_tpu.vis import mpl as vmpl

import workloads as W


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("save_folder", help="chain folder prefix (no index)")
    ap.add_argument("--chains", type=int, default=2)
    ap.add_argument("--ndraws", type=int, default=0)
    ap.add_argument("--workload", default="uniformgrid",
                    choices=["uniformgrid", "segmentgrid", "ratiogrid",
                             "global", "realdata"])
    ap.add_argument("--truth", default=None,
                    help="optional dense truth-model file")
    ap.add_argument("--outdir", default="picture")
    ap.add_argument("--mask", default=None,
                    help="maskindex file for carved meshes (carve2rho)")
    args = ap.parse_args()

    chains = diagnostics.load_chains(args.save_folder, args.chains,
                                     ndraws=args.ndraws)
    mean, std = diagnostics.posterior_stats(chains)

    builders = {"uniformgrid": W.uniformgrid, "segmentgrid": W.segmentgrid,
                "ratiogrid": W.ratiogrid,
                "global": lambda: W.global_tess(1.0)}
    out = {
        "chains": int(chains.shape[0]),
        "samples_per_chain": int(chains.shape[1]),
        "rhat_max": float(np.nanmax(diagnostics.split_rhat(chains))),
        "ess_min": float(np.nanmin(diagnostics.effective_sample_size(chains))),
    }

    mesh = None
    dense_mean = mean
    if args.workload in builders:
        wl = builders[args.workload]()
        mesh = wl["mesh"]
        xo, yo, zo = wl["obs"]
        # re-forward the posterior mean (reference re-forwards via
        # prism.gz / tesseroidforward.gz, plot_uniform.py:118)
        if args.mask:
            maskidx = np.loadtxt(args.mask).astype(int)
            dense_mean = utils.carve2rho(mean, np.zeros(mesh.size), maskidx)
        if wl.get("mesh_kwargs", {}).get("coordinate") == "spherical":
            dpre = (tess.tesseroid_kernel_matrix("gz", xo, yo, zo, mesh)
                    @ dense_mean[mesh.active])
        else:
            k = prism.prism_kernel_matrix("gz", xo, yo, zo, mesh)
            dpre = k @ dense_mean[mesh.active]
        if "rho" in wl:
            out["RMSM"] = diagnostics.rmsm(dense_mean, wl["rho"])
        _, dobs = W.forward_with_noise(wl)
        out["RMSD"] = diagnostics.rmsd(dobs, dpre)

    if args.truth:
        truth = np.loadtxt(args.truth).ravel()
        out["RMSM_vs_file"] = diagnostics.rmsm(dense_mean, truth)

    os.makedirs(args.outdir, exist_ok=True)
    if mesh is not None:
        fig = vmpl.layers(mesh, dense_mean, suptitle="posterior mean")
        fig.savefig(os.path.join(args.outdir, "posterior_mean_layers.png"),
                    dpi=200)
        dense_std = (utils.carve2rho(std, np.zeros(mesh.size),
                                     np.loadtxt(args.mask).astype(int))
                     if args.mask else std)
        fig = vmpl.layers(mesh, dense_std, suptitle="posterior std")
        fig.savefig(os.path.join(args.outdir, "posterior_std_layers.png"),
                    dpi=200)
        fig = vmpl.profile(mesh, dense_mean, axis="x",
                           index=mesh.shape[1] // 2)
        fig.savefig(os.path.join(args.outdir, "posterior_mean_profile.png"),
                    dpi=200)
        out["figures"] = args.outdir
    print(json.dumps(out))


if __name__ == "__main__":
    main()
