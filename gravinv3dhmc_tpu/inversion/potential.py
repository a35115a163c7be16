"""Misfit/gradient provider for gravity & magnetic inversion.

TPU-first re-design of the reference's ``GravMagModule``
(reference: inversion/potential.py:34-845). The module

1. builds the mesh and the dense sensitivity matrix for the requested
   (coordinate, field) pair — vectorised host/f64 or device/f32 builders
   replace the multiprocessing pool (reference: gravmag/prism.py:998-1038);
2. applies sensitivity (depth) weighting as a single reduction,
   ``w_j = (sum_i A_ij^2)^weightfactor`` — replacing the O(D*M) pure-Python
   double loop that cost as much as the kernel build itself
   (reference: inversion/potential.py:240-244);
3. exposes the potential energy ``U(x) = U_data + alpha * U_model`` and its
   gradient through one scalar JAX function differentiated with
   ``jax.value_and_grad`` — replacing hand-coded per-regularizer gradients
   (reference: inversion/potential.py:688-810). The analytic gradients of
   the reference are reproduced exactly by autodiff for all four
   regularizers (verified in tests).

Semantics preserved from the reference, including its quirks:

* mean-removed data residual (inversion/potential.py:706-708);
* regularizers act on the *weighted* model mw (inversion/potential.py:719);
* ``weightfactor`` applies to the column sum of squares, so the default 0.5
  weights by the column norm (inversion/potential.py:245);
* frozen-cell data correction ``grav_fix`` added to the prediction
  (inversion/potential.py:699-703).

One deliberate fix: under the 'logarithmic' constraint the reference
returns the gradient with respect to mw, omitting the Jacobian of the
logistic transform (inversion/potential.py:812-845 never chains it).
Autodiff here differentiates through the transform, which is the
mathematically correct HMC gradient; the shipped examples all use
'mandatory', where the two coincide.
"""
from __future__ import annotations

import time

import numpy as np

import jax
import jax.numpy as jnp

from .. import mesher
from ..ops import fd, prism
from ..ops import wavelet as wavelet_ops
from ..utils.units import ang2vec


def logistic_to_mw(x, low, high, log_factor, xp=jnp):
    """x -> mw under the 'logarithmic' boundary constraint
    (reference: inversion/potential.py:596-601). Written in the
    numerically stable sigmoid form of the reference's
    (low + high*e^{kx}) / (1 + e^{kx}); for jax the custom-JVP sigmoid
    keeps gradients finite deep in the saturated tails."""
    if xp is jnp:
        s = jax.nn.sigmoid(log_factor * x)
    else:
        t = log_factor * np.asarray(x)
        s = np.where(t >= 0, 1.0 / (1.0 + np.exp(-np.abs(t))),
                     np.exp(-np.abs(t)) / (1.0 + np.exp(-np.abs(t))))
    return low + (high - low) * s


def mw_to_logistic(mw, low, high, log_factor, xp=np):
    """mw -> x, the inverse transform (reference: inversion/hmc.py:270-278)."""
    return (1.0 / log_factor) * xp.log((mw - low) / (high - mw))


def sensitivity_weighting(A, weightfactor=0.5):
    """Depth weighting from column energies.

    Returns (Aw, wdiag, wdiag_inv): ``wdiag_j = (sum_i A_ij^2)^wf`` and
    ``Aw = A / wdiag`` with zero columns left unscaled
    (reference: inversion/potential.py:232-264, minus its zero-column bug).
    """
    col_sq = np.einsum("ij,ij->j", A, A)
    wdiag = np.power(col_sq, weightfactor)
    wdiag_inv = np.where(wdiag == 0, 0.0, 1.0 / np.where(wdiag == 0, 1.0, wdiag))
    Aw = A * wdiag_inv[None, :]
    return Aw, wdiag, wdiag_inv


class Potential:
    """Potential energy callable with explicit device parameters.

    ``fn(x, alpha, params) -> (U, grad, (dpre, U_data, U_model))`` is pure;
    ``params`` is a pytree of (large) device arrays threaded through every
    jit boundary as arguments, so the kernel matrix is never baked into an
    executable as a captured constant. Calling the object directly uses an
    internally cached jit of ``fn``.
    """

    def __init__(self, fn, params):
        self.fn = fn
        self.params = params
        self._jitted = jax.jit(fn)

    def __call__(self, x, alpha):
        return self._jitted(x, alpha, self.params)


class GravMagModule:
    """Builds kernel + weighting and provides jitted misfit/gradient.

    Constructor signature mirrors the reference
    (inversion/potential.py:35-182). ``njobs`` is accepted for API parity
    and ignored — the kernel build is vectorised, not process-pooled.
    Any extra keyword argument is treated as the topography triple
    ``mtopo = (x, y, height)``, as in the reference (potential.py:94-98).
    """

    def __init__(self, dobs, mrange, mspacing, obsurface, fixed=False,
                 grav_fix=(), mratio=1, mseg=False, mdivisionsection=(),
                 weightfactor=0.5, coordinate="cartesian", njobs=1,
                 field="gravity", mangle=(90, 0), wavelet_mode=None,
                 wavelet=False, kernel_backend="numpy", dtype=jnp.float32,
                 kernel_cache=None, kernel_device=False, verbose=True,
                 **kwargs):
        self.dobs = np.asarray(dobs, dtype=np.float64)
        self.fixed = fixed
        self.grav_fix = np.asarray(grav_fix, dtype=np.float64) if fixed else None
        self.mrange = mrange
        self.mspacing = mspacing
        self.mratio = mratio
        self.weightfactor = weightfactor
        self.mseg = mseg
        self.mdivisionsection = mdivisionsection
        self.lonobs = np.asarray(obsurface[0], dtype=np.float64)
        self.latobs = np.asarray(obsurface[1], dtype=np.float64)
        self.heightobs = np.asarray(obsurface[2], dtype=np.float64)
        self.inc, self.dec = mangle
        self.coordinate = coordinate
        self.field = field
        self.dtype = dtype
        self.topocarve = False
        self.mask = []
        # reference passes wavelet via the positional name 'wavelet'
        self.wavelet = wavelet_mode if wavelet_mode is not None else wavelet

        mtopo = None
        for _key, value in kwargs.items():
            self.topocarve = True
            mtopo = value

        if coordinate not in ("cartesian", "spherical"):
            raise ValueError(
                "Please choose coordinate from(cartesian, spherical) and "
                "field from(gravity, magnetic)!")
        if field not in ("gravity", "magnetic"):
            raise ValueError(
                "Please choose coordinate from(cartesian, spherical) and "
                "field from(gravity, magnetic)!")
        # NOTE spherical + magnetic is now IMPLEMENTED here (Poisson's
        # relation over the tesseroid GLQ tensor, ops/tesseroid.py tf) —
        # an extension beyond the reference, which stubs that branch
        # (inversion/potential.py:106-108; readme.md:9-18 "not
        # implemented").

        # ----- mesh ------------------------------------------------------
        if coordinate == "spherical":
            if mseg:
                mesh = mesher.TesseroidMeshSegment(mrange, mspacing,
                                                   mdivisionsection)
            else:
                mesh = mesher.TesseroidMesh(mrange, mspacing, mratio)
        else:
            if mseg:
                mesh = mesher.PrismMeshSegment(mrange, mspacing,
                                               mdivisionsection)
            else:
                mesh = mesher.PrismMesh(mrange, mspacing, mratio)
        if mtopo is not None:
            self.mask = mesh.carvetopo(mtopo[0], mtopo[1], mtopo[2])
        self.mesh = mesh
        self.mshape = mesh.shape
        self.mxs = mesh.get_xs()
        self.mys = mesh.get_ys()
        self.mzs = mesh.get_zs()

        # ----- kernel matrix ---------------------------------------------
        if kernel_device:
            # ON-DEVICE kernel build (spherical gravity): far-field GLQ on
            # the accelerator + native near-field corrections + device-side
            # weighting. The dense (D, M) matrix never crosses the host
            # link — essential for the whole-Earth case over a tunnelled
            # TPU (2.1 GB h2d otherwise) and faster than the host build.
            if not (coordinate == "spherical" and field == "gravity"):
                raise NotImplementedError(
                    "kernel_device=True is implemented for spherical "
                    "gravity (the tesseroid device builder)")
            if self.wavelet:
                raise NotImplementedError(
                    "wavelet compression needs the host kernel; drop "
                    "kernel_device or wavelet")
            self._init_kernel_device(kernel_cache, weightfactor, verbose)
            return
        if verbose:
            print("Calculating {} field in {} coordinate.".format(field, coordinate))
            print("Start of calculate kernel")
        start = time.time()
        # disk cache: the reference rebuilt the kernel once per MPI rank
        # (SURVEY.md parallelism table); here one build serves every run
        import os as _os
        if kernel_cache and _os.path.exists(kernel_cache):
            kernel = np.load(kernel_cache, mmap_mode=None)
            if verbose:
                print(f"loaded kernel from {kernel_cache}")
            self._finish_init(kernel, weightfactor, verbose, start)
            return
        if coordinate == "cartesian" and field == "gravity":
            mesh.addprop("density", np.zeros(mesh.size))
            kernel = prism.prism_kernel_matrix(
                "gz", self.lonobs, self.latobs, self.heightobs, mesh,
                backend=kernel_backend)
        elif coordinate == "cartesian" and field == "magnetic":
            mesh.addprop("magnetization",
                         ang2vec(np.zeros(mesh.size), self.inc, self.dec))
            _, kernel = prism.tf(self.lonobs, self.latobs, self.heightobs,
                                 mesh, self.inc, self.dec)
        elif coordinate == "spherical" and field == "magnetic":
            # EXTENSION: the reference stubs this branch
            # (inversion/potential.py:106-108). Total-field kernel via
            # Poisson's relation over the tesseroid GLQ tensor
            # (ops/tesseroid.py tf; flat-earth parity pinned in
            # tests/test_tesseroid_magnetic.py).
            from ..ops import tesseroid as tess
            mesh.addprop("magnetization",
                         ang2vec(np.zeros(mesh.size), self.inc, self.dec))
            _, kernel = tess.tf(self.lonobs, self.latobs, self.heightobs,
                                mesh, self.inc, self.dec)
        else:  # spherical gravity
            from ..ops import tesseroid as tess
            mesh.addprop("density", np.zeros(mesh.size))
            kernel = tess.tesseroid_kernel_matrix(
                "gz", self.lonobs, self.latobs, self.heightobs, mesh)
        if verbose:
            print("End of calculate kernel:%.6f s" % (time.time() - start))
        if kernel_cache:
            np.save(kernel_cache if kernel_cache.endswith(".npy")
                    else kernel_cache + ".npy", kernel)
            if kernel_cache and not kernel_cache.endswith(".npy"):
                _os.replace(kernel_cache + ".npy", kernel_cache)
        self._finish_init(kernel, weightfactor, verbose, start)

    def _init_kernel_device(self, kernel_cache, weightfactor, verbose):
        """Device-built weighted kernel: GravMagModule surface with the
        matrix resident on the accelerator (self.A/self.Aw stay None
        unless a host cache supplied the exact values)."""
        import os as _os

        from ..ops import tesseroid as tess
        from ..runtime.transfer import d2h_chunked, h2d

        t0 = time.time()
        self.mesh.addprop("density", np.zeros(self.mesh.size))
        cells = self.mesh.cell_bounds(only_active=True)
        K_host = None
        if kernel_cache and _os.path.exists(kernel_cache):
            K_host = np.load(kernel_cache, mmap_mode=None)
            if verbose:
                print(f"loaded host kernel cache {kernel_cache} for "
                      "near-field corrections")
        if verbose:
            print("Start of calculate kernel (device builder)")
        K_dev, (oi, ci) = tess.tesseroid_kernel_device(
            "gz", self.lonobs, self.latobs, self.heightobs, cells,
            host_kernel=K_host, dtype=self.dtype)
        self.nearfield_pairs = int(oi.size)
        if verbose:
            print("End of calculate kernel:%.6f s" % (time.time() - t0))
            print("Start to weight kernel")
        t1 = time.time()
        # device-side weighting, FULLY device-resident: even the (M,)
        # wdiag d2h can stall for minutes on a flaky tunnelled link
        # (measured: 0.1 s to >300 s for the same 288 KB), so the
        # diagonal stays on device and every consumer (HMCSample bounds
        # scaling, sample storage, posterior summaries) computes with it
        # there. Host copies are available lazily via wdiag_host().
        import jax as _jax

        wdiag_dev, wdiag_inv_dev, Aw_dev = _jax.jit(
            lambda K, w: (
                (cs := jnp.sum(K.astype(jnp.float32) ** 2, axis=0) ** w),
                (wi := jnp.where(cs == 0, 0.0, 1.0 / jnp.where(
                    cs == 0, 1.0, cs))),
                K * wi[None, :].astype(K.dtype)),
            donate_argnums=(0,), static_argnums=(1,))(
                K_dev, float(weightfactor))
        Aw_dev.block_until_ready()
        if verbose:
            print("End of weighting kernel: %.6f s" % (time.time() - t1))
        self.A = np.asarray(K_host) if K_host is not None else None
        self.Aw = None
        if self.A is not None:
            wdiag_host = d2h_chunked(wdiag_dev).astype(np.float64)
            wdiag_inv_host = np.where(wdiag_host == 0, 0.0, 1.0 / np.where(
                wdiag_host == 0, 1.0, wdiag_host))
            self.Aw = self.A * wdiag_inv_host[None, :]
        self.wdiag = wdiag_dev          # device-resident (M,) f32
        self.wdiag_inv = wdiag_inv_dev  # device-resident (M,) f32
        self.n_active = int(cells.shape[0])
        self._active3d = (self.mesh.active.reshape(self.mesh.shape)
                          if not self.mesh.active.all() else None)
        self.Awcp = None
        self._model_transform = None
        key = jnp.dtype(self.dtype).name
        self._dev = {key: {
            "Aw": Aw_dev,
            "dobs": h2d(self.dobs, self.dtype),
            "grav_fix": (h2d(self.grav_fix, self.dtype)
                         if self.fixed else None),
        }}
        self._potential_cache = {}
        # accounted like the reference's log: kernel build and weighting
        # are separate stages (reference: example/global/logout_T1.txt —
        # 246.5 s build + 228.3 s weighting on 72 CPUs). The weighting
        # stage includes the one (M,) wdiag d2h over the tunnelled link.
        self.kernel_build_s = t1 - t0
        self.weighting_s = time.time() - t1

    def _finish_init(self, kernel, weightfactor, verbose, start):
        # ----- weighting --------------------------------------------------
        if verbose:
            print("Start to weight kernel")
        start = time.time()
        Aw, wdiag, wdiag_inv = sensitivity_weighting(kernel, weightfactor)
        if verbose:
            print("End of weighting kernel: %.6f s" % (time.time() - start))
        self.A = kernel
        self.Aw = Aw
        self.wdiag = wdiag
        self.wdiag_inv = wdiag_inv
        self.n_active = Aw.shape[1]

        # active-cell grid for carved Smoothness/TV
        self._active3d = (self.mesh.active.reshape(self.mesh.shape)
                          if not self.mesh.active.all() else None)

        # ----- wavelet compression ---------------------------------------
        self.Awcp = None
        self._model_transform = None
        if self.wavelet == "1D":
            if verbose:
                print("Using 1D wavelet to compress kernel.")
            self.Awcp = wavelet_ops.kernelcompressor_1d(Aw)
            self._model_transform = wavelet_ops.make_model_transform(mode="1D")
        elif self.wavelet == "3D":
            if verbose:
                print("Using 3D wavelet to compress kernel.")
            self.Awcp = wavelet_ops.kernelcompressor_3d(Aw, self.mshape)
            self._model_transform = wavelet_ops.make_model_transform(
                mshape=self.mshape, mode="3D")

        # ----- device arrays ---------------------------------------------
        self._dev = {}
        self._potential_cache = {}

    # ------------------------------------------------------------------ API
    def kernelw(self):
        """Weighted kernel and (vector) weighting diagonals.

        Unlike the reference, the diagonals are returned as 1-D vectors
        rather than sparse matrices (reference: inversion/potential.py:583-589
        returns Aw, WmInv, Wm).
        """
        return self.Aw, self.wdiag_inv, self.wdiag

    def device_arrays(self, dtype=None):
        """Kernel/observation arrays staged on device at the given dtype."""
        dtype = dtype or self.dtype
        key = jnp.dtype(dtype).name
        if key not in self._dev:
            arrs = {
                "Aw": jnp.asarray(self.Aw, dtype=dtype),
                "dobs": jnp.asarray(self.dobs, dtype=dtype),
                "grav_fix": (jnp.asarray(self.grav_fix, dtype=dtype)
                             if self.fixed else None),
            }
            if self.Awcp is not None:
                from jax.experimental import sparse as jsparse
                coo = self.Awcp.tocoo()
                arrs["Awcp"] = jsparse.BCOO(
                    (jnp.asarray(coo.data, dtype=dtype),
                     jnp.column_stack([jnp.asarray(coo.row), jnp.asarray(coo.col)])),
                    shape=self.Awcp.shape)
            self._dev[key] = arrs
        return self._dev[key]

    def predict(self, mw, use_wavelet=None):
        """Predicted (weighted-domain) data for a model batch ``(..., M)``."""
        arrs = self.device_arrays()
        use_wavelet = self.wavelet if use_wavelet is None else use_wavelet
        if use_wavelet and self.Awcp is not None:
            mcp = self._model_transform(mw)
            return (arrs["Awcp"] @ mcp.T).T if mw.ndim > 1 else arrs["Awcp"] @ mcp
        return mw @ arrs["Aw"].T

    # ----------------------------------------------------- potential energy
    def make_potential(self, aprior_mw, low, high, constraint="mandatory",
                       log_factor=1000.0, regularization="Damping",
                       beta=0.01, use_wavelet=None, dtype=None,
                       matvec_dtype=None, jacobian=False, temperature=1.0):
        """Return jittable ``U(x, alpha) -> (U, (dpre, U_data, U_model))``.

        ``x`` may be a single model (M,) or a chain batch (C, M) — all
        operations are batched over leading axes so vmapped chains share one
        MXU matmul. ``aprior_mw``, ``low``, ``high`` are in the weighted
        (mw) domain, as in the reference sampler
        (reference: inversion/hmc.py:393-401).
        """
        if regularization not in ("MS", "Damping", "Smoothness", "TV"):
            raise ValueError(
                "Please choose regularization from 'MS','Damping', "
                "'Smoothness', 'TV'.")
        if constraint not in ("mandatory", "logarithmic", "reflective"):
            # 'reflective' extends the reference's two modes with the true
            # billiard reflection it keeps commented out (hmc.py:128-134);
            # the potential treats it like 'mandatory' (identity transform)
            raise ValueError(
                "Please choose right boundary constraint(mandatory, "
                "logarithmic)!")
        dtype = dtype or self.dtype
        arrs = self.device_arrays(dtype)
        use_wavelet = self.wavelet if use_wavelet is None else use_wavelet
        use_wavelet = use_wavelet if self.Awcp is not None else False

        # all large arrays travel through ``params`` as jit ARGUMENTS —
        # closing over them would bake multi-GB constants into the
        # executable (fatal for the 72000-cell global kernel on TPU)
        params = {
            "Aw": (arrs["Aw"].astype(matvec_dtype) if matvec_dtype
                   else arrs["Aw"]),
            "dobs_centered": arrs["dobs"] - jnp.mean(arrs["dobs"]),
            "aprior_mw": jnp.asarray(aprior_mw, dtype=dtype),
            "low": jnp.asarray(low, dtype=dtype),
            "high": jnp.asarray(high, dtype=dtype),
            "wm_sq": jnp.asarray(self.wdiag * self.wdiag, dtype=dtype),
            "grav_fix": arrs["grav_fix"],
        }
        if use_wavelet:
            params["Awcp"] = arrs["Awcp"]
        if self._active3d is not None:
            params["active3d"] = jnp.asarray(self._active3d)
            params["active_idx"] = jnp.asarray(
                np.flatnonzero(self.mesh.active))
        mshape = self.mshape
        model_transform = self._model_transform
        lf = float(log_factor)
        beta = float(beta)
        has_fix = self.fixed
        has_carve = self._active3d is not None

        def data_term(mw, P):
            if use_wavelet:
                dpre = P["Awcp"] @ model_transform(mw)
            else:
                A = P["Aw"]
                # reduced-precision storage (e.g. bf16) halves HBM traffic
                # of the two A passes per leapfrog step; accumulation stays
                # f32 via preferred_element_type
                dpre = jnp.dot(A, mw.astype(A.dtype),
                               preferred_element_type=dtype)
            dinv = dpre + P["grav_fix"] if has_fix else dpre
            r = (dinv - jnp.mean(dinv)) - P["dobs_centered"]
            return jnp.sum(r * r), dpre

        def scatter_full(dm, P):
            # packed active-cell vector -> dense grid vector (carved
            # Smoothness/TV; the reference cannot regularise carved
            # meshes with fd3d at all)
            if not has_carve:
                return dm
            full = jnp.zeros(int(np.prod(mshape)), dtype=dm.dtype)
            return full.at[P["active_idx"]].set(dm)

        def model_term(mw, P):
            dm = mw - P["aprior_mw"]
            if regularization == "MS":
                dm2 = dm * dm
                return jnp.sum(P["wm_sq"] * dm2 / (dm2 + beta))
            if regularization == "Damping":
                return jnp.sum(dm * dm)
            act = P["active3d"] if has_carve else None
            if regularization == "Smoothness":
                return fd.smoothness_value(scatter_full(dm, P), mshape, jnp,
                                           act)
            # TV
            return fd.tv_value(scatter_full(dm, P), mshape, beta, jnp, act)

        def potential_scalar(x, alpha, P):
            if constraint == "logarithmic":
                mw = logistic_to_mw(x, P["low"], P["high"], lf)
            else:
                mw = x
            u_data, dpre = data_term(mw, P)
            u_model = model_term(mw, P)
            # temperature: target exp(-U/T). The reference's sampler draws
            # p ~ N(0, Sigma^2) under a unit-mass kinetic
            # (inversion/hmc.py:44-50,95), which makes its stationary
            # distribution ~= exp(-U/Sigma^2); adaptive samplers pass
            # temperature=Sigma^2 to explore that same effective target
            # with CORRECT dynamics instead of reproducing the quirk.
            U = (u_data + alpha * u_model) * (1.0 / float(temperature))
            if constraint == "logarithmic" and jacobian:
                # -log|dmw/dx|: makes the x-space target PROPER (uniform
                # in mw within the box). The reference omits this
                # (inversion/potential.py:812-845 — its clamp-HMC tolerates
                # the improper tails), but trajectory-adaptive samplers
                # (NUTS/ChEES) random-walk to |x| -> inf without it.
                # dmw/dx = (high-low) * k * s(1-s);
                # -log s(1-s) = softplus(kx) + softplus(-kx)
                kx = lf * x
                width = P["high"] - P["low"]
                log_const = jnp.where(width > 0,
                                      jnp.log(jnp.where(width > 0, width,
                                                        1.0) * lf), 0.0)
                U = U + jnp.sum(jax.nn.softplus(kx) + jax.nn.softplus(-kx)
                                - log_const)
            return U, (dpre, u_data, u_model)

        grad_fn = jax.value_and_grad(potential_scalar, has_aux=True)

        def fn(x, alpha, P):
            x = jnp.asarray(x, dtype=dtype)
            alpha = jnp.asarray(alpha, dtype=dtype)
            if x.ndim == 1:
                (u, aux), g = grad_fn(x, alpha, P)
                return u, g, aux
            (u, aux), g = jax.vmap(lambda xi: grad_fn(xi, alpha, P))(x)
            return u, g, aux

        return Potential(fn, params)

    # --------------------------------------------- reference-compatible API
    def misfit_and_grad(self, x, mwapr, low, high, constraint, log_fator,
                        alpha, regulization="Damping", beta=0.01):
        """Drop-in for the reference's duck-typed sampler interface
        (reference: inversion/potential.py:812-845). Returns
        (misfit, grad, dpre, data_value, model_value) as numpy arrays."""
        key = (regulization, constraint, float(beta), float(log_fator))
        if key not in self._potential_cache:
            self._potential_cache[key] = self.make_potential(
                mwapr, low, high, constraint=constraint, log_factor=log_fator,
                regularization=regulization, beta=beta)
        fn = self._potential_cache[key]
        u, g, (dpre, u_data, u_model) = fn(
            jnp.asarray(x, dtype=self.dtype), float(alpha))
        return (float(u), np.asarray(g), np.asarray(dpre),
                float(u_data), float(u_model))

    def data(self, x, low, high, constraint, log_fator):
        """Data-term value only (adaptive-alpha helper,
        reference: inversion/potential.py:591-609)."""
        if constraint == "logarithmic":
            mw = logistic_to_mw(np.asarray(x), np.asarray(low),
                                np.asarray(high), log_fator, xp=np)
        elif constraint == "mandatory":
            mw = np.asarray(x)
        else:
            raise ValueError(
                "Please choose right boundary constraint(mandatory, "
                "logarithmic)!")
        if self.wavelet == "1D" and self.Awcp is not None:
            dpre = wavelet_ops.modelcompressor_1d(mw, self.Awcp)
        elif self.wavelet == "3D" and self.Awcp is not None:
            dpre = wavelet_ops.modelcompressor_3d(mw, self.Awcp, self.mshape)
        else:
            dpre = self.Aw @ mw
        r = (dpre - dpre.mean()) - (self.dobs - self.dobs.mean())
        return float(r @ r)
