"""No-U-Turn Sampler (iterative, jit-compiled) + warmup adaptation.

Extends the reference's fixed-L HMC (inversion/hmc.py) with the samplers
the north star asks for (BASELINE.json): NUTS with a fixed maximum tree
depth, dual-averaging step-size adaptation, and diagonal mass-matrix
estimation. All device-side, vmappable over chains.

The NUTS implementation is the iterative formulation (as in Stan/numpyro):
a trajectory is doubled up to ``max_depth`` times; each subtree is built
leaf by leaf with U-turn checks at every power-of-two boundary using a
checkpoint stack of size ``max_depth`` (leaf ``m`` with ``t`` trailing
zeros is the left endpoint of subtrees of size 2^1..2^t, so storing it at
slot ctz(m) is safe until its last use). Proposals are multinomial
(progressive within a subtree, biased across subtrees); the turning
criterion is Stan's momentum-sum rule ``rho . v_ends < 0`` with the
diagonal inverse mass applied.

Note: NUTS assumes an unconstrained target. Use the 'logarithmic'
constraint transform for box-bounded densities — the reference's
'mandatory' clamp (inversion/hmc.py:135-141) is incompatible with U-turn
trajectories and is not offered here.
"""
from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax, random

MAX_DELTA_H = 1000.0  # divergence threshold


def _ctz(n):
    """Count trailing zeros of int32 array/scalar (n > 0): the lowest set
    bit isolated via n & -n is an exact power of two <= 2^30, so float32
    log2 recovers its index exactly."""
    return jnp.int32(jnp.log2(jnp.bitwise_and(n, -n).astype(jnp.float32))
                     + 0.5)


def make_nuts_kernel(potential_fn, *, max_depth=8, dtype=jnp.float32):
    """Build a one-transition NUTS kernel for a single chain.

    ``potential_fn(x) -> (U, grad)`` on a single (M,) position. Returns
    ``step(x, U, g, key, step_size, inv_mass) ->
    (x', U', g', stats_dict)`` — vmap over chains at the call site.
    """

    def leapfrog(x, p, g, eps, inv_mass):
        p = p - 0.5 * eps * g
        x = x + eps * inv_mass * p
        U, g = potential_fn(x)
        p = p - 0.5 * eps * g
        return x, p, U, g

    def kinetic(p, inv_mass):
        return 0.5 * jnp.sum(inv_mass * p * p)

    def is_turning(p_left, p_right, rho, inv_mass):
        v_left = inv_mass * p_left
        v_right = inv_mass * p_right
        return (jnp.dot(rho, v_left) <= 0) | (jnp.dot(rho, v_right) <= 0)

    def step(x0, U0, g0, key, step_size, inv_mass):
        M = x0.shape[0]
        kp, kd, ku = random.split(key, 3)
        p0 = random.normal(kp, (M,), dtype) / jnp.sqrt(inv_mass)
        H0 = U0 + kinetic(p0, inv_mass)

        # tree state
        # endpoints: (x, p, g) left and right
        init = dict(
            x_left=x0, p_left=p0, g_left=g0,
            x_right=x0, p_right=p0, g_right=g0,
            x_prop=x0, U_prop=U0, g_prop=g0,
            logw=jnp.asarray(0.0, dtype),          # logsumexp of tree weights
            rho=p0,                                 # momentum sum over tree
            sum_accept=jnp.asarray(0.0, dtype),
            n_leaves=jnp.asarray(1, jnp.int32),
            depth=jnp.asarray(0, jnp.int32),
            turning=jnp.asarray(False),
            diverging=jnp.asarray(False),
            key=kd,
        )

        def build_subtree(tree, direction, n):
            """Add n = 2^depth leaves in ``direction`` off the tree edge."""
            eps = jnp.where(direction > 0, step_size, -step_size)
            x_e = jnp.where(direction > 0, tree["x_right"], tree["x_left"])
            p_e = jnp.where(direction > 0, tree["p_right"], tree["p_left"])
            g_e = jnp.where(direction > 0, tree["g_right"], tree["g_left"])

            ck_x = jnp.zeros((max_depth + 1, M), dtype)
            ck_p = jnp.zeros((max_depth + 1, M), dtype)
            ck_S = jnp.zeros((max_depth + 1, M), dtype)  # rho before ckpt

            sub = dict(
                x=x_e, p=p_e, g=g_e,
                x_prop=x_e, U_prop=jnp.asarray(0.0, dtype),
                g_prop=g_e, logw=jnp.asarray(-jnp.inf, dtype),
                rho=jnp.zeros((M,), dtype),
                sum_accept=jnp.asarray(0.0, dtype),
                leaf=jnp.asarray(0, jnp.int32),
                turning=jnp.asarray(False),
                diverging=jnp.asarray(False),
                ck_x=ck_x, ck_p=ck_p, ck_S=ck_S,
                key=tree["key"],
            )

            def leaf_cond(s):
                return (s["leaf"] < n) & ~s["turning"] & ~s["diverging"]

            def leaf_body(s):
                k = s["leaf"]
                key, ks = random.split(s["key"])
                # checkpoint BEFORE moving: even leaves are left endpoints
                slot = jnp.int32(jnp.round(jnp.log2(
                    jnp.bitwise_and(k, -k).astype(jnp.float32) + 1e-30)))
                slot = jnp.clip(slot, 0, max_depth)
                rho_before = s["rho"]
                x, p, U, g = leapfrog(s["x"], s["p"], s["g"], eps, inv_mass)
                store = (k % 2 == 0)
                ck_x = jnp.where(store, s["ck_x"].at[slot].set(x), s["ck_x"])
                ck_p = jnp.where(store, s["ck_p"].at[slot].set(p), s["ck_p"])
                ck_S = jnp.where(store, s["ck_S"].at[slot].set(rho_before),
                                 s["ck_S"])
                H = U + kinetic(p, inv_mass)
                dH = H - H0
                # NaN-robust: treat non-finite energies as divergences
                diverging = ~(dH < MAX_DELTA_H)
                dH = jnp.where(diverging, jnp.inf, dH)
                logw_leaf = -dH
                # progressive multinomial proposal within the subtree
                logw_new = jnp.logaddexp(s["logw"], logw_leaf)
                take = (jnp.log(random.uniform(ks, dtype=dtype))
                        < logw_leaf - logw_new)
                x_prop = jnp.where(take, x, s["x_prop"])
                U_prop = jnp.where(take, U, s["U_prop"])
                g_prop = jnp.where(take, g, s["g_prop"])
                rho = rho_before + p
                accept_p = jnp.minimum(1.0, jnp.exp(-dH))
                # u-turn checks at completed power-of-two boundaries:
                # for each j>=1 with 2^j | (k+1), subtree [k+1-2^j, k]
                kk = k + 1

                def check(j, turning):
                    size = jnp.int32(2) ** j
                    applies = (kk % size == 0) & (size <= kk)
                    m = kk - size  # leftmost leaf of that subtree
                    mslot = jnp.int32(jnp.round(jnp.log2(
                        jnp.bitwise_and(jnp.maximum(m, 1), -jnp.maximum(m, 1))
                        .astype(jnp.float32) + 1e-30)))
                    mslot = jnp.where(m == 0, 0, jnp.clip(mslot, 0,
                                                          max_depth))
                    xl = jnp.where(m == 0, ck_x[0], ck_x[mslot])
                    pl = jnp.where(m == 0, ck_p[0], ck_p[mslot])
                    Sl = jnp.where(m == 0, ck_S[0], ck_S[mslot])
                    rho_sub = rho - Sl
                    turn = is_turning(pl, p, rho_sub, inv_mass)
                    return turning | (applies & turn)

                turning = lax.fori_loop(1, max_depth + 1, check,
                                        s["turning"])
                return dict(
                    x=x, p=p, g=g, x_prop=x_prop, U_prop=U_prop,
                    g_prop=g_prop, logw=logw_new, rho=rho,
                    sum_accept=s["sum_accept"] + accept_p,
                    leaf=k + 1, turning=turning, diverging=diverging,
                    ck_x=ck_x, ck_p=ck_p, ck_S=ck_S, key=key)

            sub = lax.while_loop(leaf_cond, leaf_body, sub)
            return sub

        def doubling_cond(tree):
            return ((tree["depth"] < max_depth) & ~tree["turning"]
                    & ~tree["diverging"])

        def doubling_body(tree):
            key, kdir, kmerge = random.split(tree["key"], 3)
            tree = {**tree, "key": key}
            direction = jnp.where(random.bernoulli(kdir), 1, -1)
            n = jnp.int32(2) ** tree["depth"]
            sub = build_subtree(tree, direction, n)
            ok = ~sub["turning"] & ~sub["diverging"]
            # merge proposal: biased progressive across subtrees
            logw_new = jnp.logaddexp(tree["logw"], sub["logw"])
            take = (jnp.log(random.uniform(kmerge, dtype=dtype))
                    < sub["logw"] - tree["logw"]) & ok
            x_prop = jnp.where(take, sub["x_prop"], tree["x_prop"])
            U_prop = jnp.where(take, sub["U_prop"], tree["U_prop"])
            g_prop = jnp.where(take, sub["g_prop"], tree["g_prop"])
            # extend endpoints
            fwd = direction > 0
            upd = lambda new, old: jnp.where(ok, new, old)
            x_right = jnp.where(fwd, upd(sub["x"], tree["x_right"]),
                                tree["x_right"])
            p_right = jnp.where(fwd, upd(sub["p"], tree["p_right"]),
                                tree["p_right"])
            g_right = jnp.where(fwd, upd(sub["g"], tree["g_right"]),
                                tree["g_right"])
            x_left = jnp.where(fwd, tree["x_left"],
                               upd(sub["x"], tree["x_left"]))
            p_left = jnp.where(fwd, tree["p_left"],
                               upd(sub["p"], tree["p_left"]))
            g_left = jnp.where(fwd, tree["g_left"],
                               upd(sub["g"], tree["g_left"]))
            rho = tree["rho"] + jnp.where(ok, sub["rho"], 0.0)
            whole_turn = is_turning(p_left, p_right, rho, inv_mass)
            return dict(
                x_left=x_left, p_left=p_left, g_left=g_left,
                x_right=x_right, p_right=p_right, g_right=g_right,
                x_prop=x_prop, U_prop=U_prop, g_prop=g_prop,
                logw=jnp.where(ok, logw_new, tree["logw"]),
                rho=rho,
                sum_accept=tree["sum_accept"] + sub["sum_accept"],
                n_leaves=tree["n_leaves"] + sub["leaf"],
                depth=tree["depth"] + 1,
                turning=sub["turning"] | whole_turn,
                diverging=sub["diverging"],
                key=tree["key"],
            )

        tree = lax.while_loop(doubling_cond, doubling_body, init)
        # the initial point participates with weight exp(0); proposals were
        # sampled progressively against it via init logw=0
        U_new, g_new = tree["U_prop"], tree["g_prop"]
        x_new = tree["x_prop"]
        stats = dict(
            accept_prob=tree["sum_accept"]
            / jnp.maximum(tree["n_leaves"] - 1, 1).astype(dtype),
            depth=tree["depth"],
            n_leapfrog=tree["n_leaves"] - 1,
            diverging=tree["diverging"],
        )
        return x_new, U_new, g_new, stats

    return step


# ---------------------------------------------------------------------------
# warmup adaptation (dual averaging + diagonal mass), shared by HMC & NUTS
# ---------------------------------------------------------------------------

def dual_averaging_init(step_size0, target=0.8):
    return dict(
        log_eps=jnp.log(step_size0),
        log_eps_avg=jnp.log(step_size0),
        h_bar=jnp.asarray(0.0),
        mu=jnp.log(10.0 * step_size0),
        t=jnp.asarray(0.0),
        target=jnp.asarray(target),
    )


def dual_averaging_update(state, accept_prob, gamma=0.05, t0=10.0,
                          kappa=0.75):
    """Nesterov dual averaging on log step size (Hoffman & Gelman 2014)."""
    t = state["t"] + 1.0
    eta_h = 1.0 / (t + t0)
    h_bar = (1 - eta_h) * state["h_bar"] + eta_h * (state["target"]
                                                    - accept_prob)
    log_eps = state["mu"] - jnp.sqrt(t) / gamma * h_bar
    eta = t ** (-kappa)
    log_eps_avg = eta * log_eps + (1 - eta) * state["log_eps_avg"]
    return {**state, "t": t, "h_bar": h_bar, "log_eps": log_eps,
            "log_eps_avg": log_eps_avg}


def welford_init(m):
    return dict(mean=jnp.zeros(m), m2=jnp.zeros(m),
                count=jnp.asarray(0.0))


def welford_update(state, x):
    count = state["count"] + 1.0
    delta = x - state["mean"]
    mean = state["mean"] + delta / count
    m2 = state["m2"] + delta * (x - mean)
    return dict(mean=mean, m2=m2, count=count)


def welford_variance(state, regularize=True):
    var = state["m2"] / jnp.maximum(state["count"] - 1.0, 1.0)
    if regularize:
        # Stan's shrinkage toward unit metric
        n = state["count"]
        var = (n / (n + 5.0)) * var + 1e-3 * (5.0 / (n + 5.0))
    return var


def run_nuts(potential_fn_single, x0, key, *, n_warmup=200, n_samples=500,
             step_size0=0.1, max_depth=8, adapt_mass=True,
             dtype=jnp.float32):
    """Single-chain adaptive NUTS driver (vmap externally for chains).

    ``potential_fn_single(x) -> (U, grad)``. Returns (samples (N, M),
    stats dict with per-draw depth/accept/divergence and the adapted step
    size / inverse mass).
    """
    x0 = jnp.asarray(x0, dtype)
    M = x0.shape[0]
    kernel = make_nuts_kernel(potential_fn_single, max_depth=max_depth,
                              dtype=dtype)

    def warm_body(carry, k):
        x, U, g, da, wf, inv_mass = carry
        x, U, g, st = kernel(x, U, g, k, jnp.exp(da["log_eps"]).astype(dtype),
                             inv_mass)
        da = dual_averaging_update(da, st["accept_prob"])
        wf = welford_update(wf, x)
        return (x, U, g, da, wf, inv_mass), st["accept_prob"]

    def sample_body(carry, k):
        x, U, g, eps, inv_mass = carry
        x, U, g, st = kernel(x, U, g, k, eps, inv_mass)
        return (x, U, g, eps, inv_mass), (x, st["depth"], st["accept_prob"],
                                          st["diverging"])

    U0, g0 = potential_fn_single(x0)
    inv_mass = jnp.ones(M, dtype)
    keys = random.split(key, n_warmup + n_samples)
    # Stan-style two-window warmup: tune eps under the unit metric while
    # estimating variances, then swap the metric in and re-tune eps — a
    # step size tuned for one metric is invalid under another.
    n_a = max(n_warmup * 2 // 5, 1)
    n_b = max(n_warmup - n_a, 1)
    da = dual_averaging_init(step_size0)
    wf = welford_init(M)
    (x, U, g, da, wf, _), _ = lax.scan(
        warm_body, (x0, U0, g0, da, wf, inv_mass), keys[:n_a])
    if adapt_mass:
        inv_mass = welford_variance(wf).astype(dtype)
    eps_a = jnp.exp(da["log_eps_avg"])
    da = dual_averaging_init(1.0)
    da["log_eps"] = jnp.log(eps_a)
    da["log_eps_avg"] = jnp.log(eps_a)
    da["mu"] = jnp.log(10.0 * eps_a)
    wf = welford_init(M)
    (x, U, g, da, wf, _), _ = lax.scan(
        warm_body, (x, U, g, da, wf, inv_mass), keys[n_a: n_a + n_b])
    eps = jnp.exp(da["log_eps_avg"]).astype(dtype)
    (x, U, g, _, _), (xs, depths, accepts, divs) = lax.scan(
        sample_body, (x, U, g, eps, inv_mass), keys[n_warmup:])
    stats = dict(step_size=eps, inv_mass=inv_mass, depths=depths,
                 accept_probs=accepts, divergences=divs)
    return xs, stats


def NUTSSample(model, nsamples, nwarmup, initial_model, aprior_model,
               boundaries, dobs, RegulFactor=1.0, regularization="Damping",
               beta=0.01, seed=100, log_factor=100.0, step_size0=0.05,
               max_depth=8, myrank=0, save_folder=None, nchains=2,
               dtype=jnp.float32, verbose=True, temperature=1.0):
    """Adaptive multi-chain NUTS on a :class:`GravMagModule` potential.

    The counterpart of :func:`hmc.HMCSample` for NUTS: the box constraint
    is handled by the logistic ('logarithmic') transform — correct
    gradients through the transform, no momentum clamping — and chains are
    vmapped into one compiled program. Writes the same
    ``model.dat``/``misfit.dat`` layout when ``save_folder`` is given.
    """
    from .potential import logistic_to_mw, mw_to_logistic

    wdiag = np.asarray(model.wdiag)
    boundaries = np.asarray(boundaries, dtype=np.float64)
    low = wdiag * boundaries[:, 0]
    high = wdiag * boundaries[:, 1]
    aprior_mw = wdiag * np.asarray(aprior_model, dtype=np.float64)
    init_mw = wdiag * np.asarray(initial_model, dtype=np.float64)
    M = init_mw.shape[0]

    batched = model.make_potential(
        aprior_mw, low, high, constraint="logarithmic",
        log_factor=log_factor, regularization=regularization, beta=beta,
        dtype=dtype, jacobian=True, temperature=temperature)

    x0 = mw_to_logistic(np.clip(init_mw, low + 1e-9 * (high - low + 1e-30),
                                high - 1e-9 * (high - low + 1e-30)),
                        low, high, log_factor)
    x0 = np.where(np.isfinite(x0), x0, 0.0)
    x0_b = jnp.asarray(np.tile(x0[None, :], (nchains, 1)), dtype)
    keys = random.split(random.fold_in(random.PRNGKey(seed), myrank),
                        nchains)

    def _run(x, k, P):
        # thread the kernel matrix through jit as an argument, never as a
        # captured constant (see Potential)
        def pot_single(xx):
            u, g, _ = batched.fn(xx, RegulFactor, P)
            return u, g
        return run_nuts(pot_single, x, k, n_warmup=nwarmup,
                        n_samples=nsamples, step_size0=step_size0,
                        max_depth=max_depth, dtype=dtype)

    runner = jax.jit(jax.vmap(_run, in_axes=(0, 0, None)))
    import time as _time
    t0 = _time.time()
    xs, stats = runner(x0_b, keys, batched.params)
    xs = np.asarray(xs, dtype=np.float64)  # (C, N, M) in x-space
    elapsed = _time.time() - t0
    # x -> mw -> m
    mw = logistic_to_mw(xs, low[None, None, :], high[None, None, :],
                        log_factor, xp=np)
    wdiag_inv = np.asarray(model.wdiag_inv)
    samples = mw * wdiag_inv[None, None, :]
    depths = np.asarray(stats["depths"]).astype(np.int64)
    out = {
        "samples": samples,
        "step_size": np.asarray(stats["step_size"]),
        "inv_mass": np.asarray(stats["inv_mass"]),
        "mean_accept": float(np.mean(np.asarray(stats["accept_probs"]))),
        "mean_depth": float(np.mean(depths)),
        "divergences": int(np.asarray(stats["divergences"]).sum()),
        "elapsed_s": elapsed,
        # a depth-d tree evaluates 2^d - 1 new leapfrog gradients
        # (sampling phase only; warmup trees are not counted)
        "grad_evals": int((2 ** depths - 1).sum()),
    }
    if save_folder is not None:
        try:
            from ..runtime.sink import SampleSink as Sink
        except Exception:
            from ..runtime.sink_py import PySampleSink as Sink
        folders = []
        for c in range(nchains):
            w = Sink(f"{save_folder}{myrank + c}")
            for i in range(samples.shape[1]):
                w.append(samples[c, i], np.zeros(7))
            w.close()
            folders.append(w.folder)
        out["folders"] = folders
    return out
