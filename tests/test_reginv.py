"""CG + Bootstrap tests: the jitted solver is checked step-for-step
against a literal numpy transcription of the reference's iteration
(reference: inversion/reginv.py:357-491, 631-713)."""
import numpy as np
import pytest

import jax.numpy as jnp

from gravinv3dhmc_tpu import mesher, utils
from gravinv3dhmc_tpu.inversion.reginv import BootStrap, ConjugateGradient
from gravinv3dhmc_tpu.ops import prism


def reference_cg_numpy(Aw, dobs, wdiag, mw0, apr, rhomin, rhomax, beta, q,
                       maxk, weights=None, bootstrap_ms=False,
                       stop_abs=False):
    """Literal transcription of the reference CG loop (MS regularizer),
    with optional row weights standing in for row resampling."""
    c = np.ones(Aw.shape[0]) if weights is None else weights
    wm_sq = wdiag ** 2
    wdiag_inv = np.where(wdiag == 0, 0, 1 / np.where(wdiag == 0, 1, wdiag))

    def data(mw):
        r = Aw @ mw - dobs
        return float(np.sum(c * r * r))

    def data_g(mw):
        r = Aw @ mw - dobs
        return 2 * (c * r) @ Aw

    if bootstrap_ms:
        def model(mw):
            m2 = mw * mw
            return float(np.sum(wm_sq * m2 / (m2 + beta ** 2)))

        def model_g(mw):
            m2 = mw * mw
            return 2 * wm_sq * mw * beta ** 2 / (m2 + beta ** 2) ** 2
    else:
        def model(mw):
            d2 = (mw - apr) ** 2
            return float(np.sum(wm_sq * d2 / (d2 + beta)))

        def model_g(mw):
            d = mw - apr
            return 2 * beta * wm_sq * d / (d * d + beta) ** 2

    def project(mw):
        m = np.clip(wdiag_inv * mw, rhomin, rhomax)
        return wdiag * m

    def aw_norm_sq(v):
        av = Aw @ v
        return float(np.sum(c * av * av))

    mw = mw0.copy()
    data_hist, model_hist, regul = [], [], []
    alpha = 0.0
    mw_new = None
    for k in range(maxk):
        if k == 0:
            alpha = 0.0
        elif k == 1:
            alpha = data(mw_new) / model(mw_new)
        else:
            if data(mw) - data(mw_new) < 0.01 * data(mw):
                alpha = q * alpha
        regul.append(alpha)
        if k == 0:
            data_hist.append(data(mw) / Aw.shape[0])
            model_hist.append(model(mw) / Aw.shape[1])
            I = data_g(mw) + alpha * model_g(mw)
            Iw = I
            kstep = Iw @ I / (aw_norm_sq(Iw) + alpha * Iw @ Iw)
            mw_new = project(mw - kstep * Iw)
        else:
            I_old, Iw_old = I, Iw
            mw = mw_new
            I = data_g(mw) + alpha * model_g(mw)
            mu = (I @ I) / (I_old @ I_old)
            Iw = I + mu * Iw_old
            kstep = Iw @ I / (aw_norm_sq(Iw) + alpha * Iw @ Iw)
            mw_new = project(mw - kstep * Iw)
            if stop_abs and data(mw_new) < 0.1:
                break
            data_hist.append(data(mw_new) / Aw.shape[0])
            model_hist.append(model(mw_new) / Aw.shape[1])
            if not stop_abs and data(mw_new) / Aw.shape[0] < 0.001:
                break
    return mw_new, np.array(data_hist), np.array(model_hist), np.array(regul)


@pytest.fixture(scope="module")
def cg_problem():
    bounds = (0, 1000, 0, 1500, 0, 500)
    spacing = (100, 100, 100)
    mesh = mesher.PrismMesh(bounds, spacing)
    rho3 = np.zeros(mesh.shape)
    rho3[1:4, 5:10, 3:7] = 0.8
    mesh.addprop("density", rho3.ravel())
    xo, yo, zo = utils.regular((0, 1000, 0, 1500), (10, 15), z=0.0)
    dobs, _ = prism.gz(xo, yo, zo, mesh)
    dobs = utils.contaminate(dobs, 0.02 * dobs.max(), seed=4)
    inv = ConjugateGradient(dobs, bounds, spacing, (xo, yo, zo),
                            verbose=False)
    return inv, dobs, rho3.ravel()


def test_cg_matches_reference_transcription(cg_problem):
    inv, dobs, rho = cg_problem
    M = inv.msize
    init = np.zeros(M)
    apr = np.zeros(M)
    maxk = 30
    model_inv, data_inv, d_h, m_h, r_h = inv.CG(
        init, apr, (0.0, 1.0), regularization="MS", beta=0.001, q=0.7,
        maxk=maxk)
    mw_ref, d_ref, m_ref, r_ref = reference_cg_numpy(
        inv.Aw, dobs, inv.wdiag, inv.wdiag * init, inv.wdiag * apr,
        0.0, 1.0, 0.001, 0.7, maxk)
    model_ref = np.where(inv.wdiag == 0, 0, mw_ref / inv.wdiag)
    np.testing.assert_allclose(model_inv, model_ref, rtol=1e-6, atol=1e-9)
    np.testing.assert_allclose(d_h, d_ref, rtol=1e-6)
    np.testing.assert_allclose(m_h, m_ref, rtol=1e-6, atol=1e-12)
    np.testing.assert_allclose(r_h, r_ref, rtol=1e-6, atol=1e-12)


def test_cg_recovers_body(cg_problem):
    inv, dobs, rho = cg_problem
    M = inv.msize
    model_inv, data_inv, d_h, m_h, r_h = inv.CG(
        np.zeros(M), np.zeros(M), (0.0, 1.0), regularization="MS",
        beta=0.001, q=0.7, maxk=100)
    # data misfit decreases strongly
    assert d_h[-1] < 0.05 * d_h[0]
    # recovered model correlates with the truth
    corr = np.corrcoef(model_inv, rho)[0, 1]
    assert corr > 0.5
    assert model_inv.max() <= 1.0 + 1e-9
    assert model_inv.min() >= -1e-9


def test_cg_device_matches_host_cg(cg_problem):
    """cg_device (arrays threaded as jit args, the global warm-start
    path) must reproduce ConjugateGradient.CG up to f32/f64 on the same
    module."""
    from gravinv3dhmc_tpu.inversion.reginv import cg_device

    inv, dobs, rho = cg_problem
    M = inv.msize
    maxk = 30
    model_inv, _, d_h, m_h, r_h = inv.CG(
        np.zeros(M), np.zeros(M), (0.0, 1.0), regularization="MS",
        beta=0.001, q=0.7, maxk=maxk)
    out = cg_device(inv._mod, dobs, (0.0, 1.0), regularization="MS",
                    beta=0.001, q=0.7, maxk=maxk, dtype=jnp.float64)
    np.testing.assert_allclose(np.asarray(out["m"], np.float64), model_inv,
                               rtol=1e-6, atol=1e-9)
    np.testing.assert_allclose(out["data_hist"], d_h, rtol=1e-6)
    assert out["n_iters"] == len(d_h)
    # f32 (the global-scale dtype) still recovers the same body
    out32 = cg_device(inv._mod, dobs, (0.0, 1.0), regularization="MS",
                      beta=0.001, q=0.7, maxk=maxk, dtype=jnp.float32)
    corr = np.corrcoef(np.asarray(out32["m"], np.float64), model_inv)[0, 1]
    assert corr > 0.99


def test_cg_device_fixed_alpha_bounded_map(cg_problem):
    """Fixed-alpha projected CG (the bounded-MAP ladder mode, round-4
    verdict Missing #3): constant alpha from the k=0 step on, hard box
    projection, monotone objective descent."""
    from gravinv3dhmc_tpu.inversion.reginv import cg_device

    inv, dobs, rho = cg_problem
    out = cg_device(inv._mod, dobs, (0.0, 1.0), regularization="Damping",
                    maxk=60, dtype=jnp.float64, alpha=0.5)
    m = np.asarray(out["m"], np.float64)
    # the reported alpha history is the constant (no adaptive schedule)
    assert np.allclose(out["regul_hist"][1:], 0.5)
    # box respected and the data misfit strongly reduced
    assert m.max() <= 1.0 + 1e-9 and m.min() >= -1e-9
    assert out["data_hist"][-1] < 0.2 * out["data_hist"][0]
    # the FIXED objective decreases end-to-end (iteration-to-iteration
    # monotonicity is NOT promised: the hard box projection breaks
    # conjugacy, like the reference's own projected steps). Histories
    # are size-normalised per term (d/D, m/M), so un-normalise first.
    D, M = inv.dsize, inv.msize
    obj = (np.asarray(out["data_hist"]) * D
           + 0.5 * np.asarray(out["model_hist"]) * M)
    assert obj[-1] < 0.5 * obj[0]
    # a gentler alpha fits the data at least as well as a harsher one
    out_hi = cg_device(inv._mod, dobs, (0.0, 1.0),
                       regularization="Damping", maxk=60,
                       dtype=jnp.float64, alpha=50.0)
    assert out["data_hist"][-1] <= out_hi["data_hist"][-1] + 1e-12


def test_bootstrap_weights_equal_explicit_resampling(cg_problem):
    inv, dobs, rho = cg_problem
    bounds = (0, 1000, 0, 1500, 0, 500)
    bs = BootStrap(bounds, (100, 100, 100),
                   (inv._mod.lonobs, inv._mod.latobs, inv._mod.heightobs),
                   dobs, (0.0, 1.0), samples=3, beta=0.01, maxk=12,
                   verbose=False)
    models, d_h, m_h, r_h = bs.BSCG(np.zeros(bs.msize))
    assert models.shape == (3, bs.msize)
    # replicate sample 0 explicitly: resampled rows == multiplicity weights
    rng = np.random.RandomState(0)
    idx = rng.choice(np.arange(bs.dsize), size=bs.dsize, replace=True)
    Aw_s = bs.Aw[idx]
    dobs_s = dobs[idx]
    mw_ref, d_ref, m_ref, r_ref = reference_cg_numpy(
        Aw_s, dobs_s, bs.wdiag, bs.wdiag * np.zeros(bs.msize), None,
        0.0, 1.0, 0.01, 0.9, 12, bootstrap_ms=True, stop_abs=True)
    model_ref = np.where(bs.wdiag == 0, 0, mw_ref / bs.wdiag)
    np.testing.assert_allclose(models[0], model_ref, rtol=1e-5, atol=1e-8)


def test_bootstrap_spread_reflects_noise(cg_problem):
    inv, dobs, rho = cg_problem
    bounds = (0, 1000, 0, 1500, 0, 500)
    bs = BootStrap(bounds, (100, 100, 100),
                   (inv._mod.lonobs, inv._mod.latobs, inv._mod.heightobs),
                   dobs, (0.0, 1.0), samples=8, beta=0.01, maxk=10,
                   verbose=False)
    models, *_ = bs.BSCG(np.zeros(bs.msize))
    std = models.std(axis=0)
    assert std.max() > 0  # replicates differ
    assert np.isfinite(models).all()
