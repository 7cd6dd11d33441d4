"""Quasi-Monte-Carlo latent streams for variance-reduced integration.

Neural importance sampling composes beautifully with randomized QMC: the
trained flow maps the unit cube to the target measure, and feeding it a
*low-discrepancy* point set instead of iid uniforms upgrades the MC error
from O(N^-1/2) toward O(N^-1) for smooth integrand-times-Jacobian
compositions.  The reference has nothing like this (its latents are
``torch.rand``, reference manager.py:221-222,390).

Scrambled Sobol points come from scipy.stats.qmc on the host (generated
once per replication, outside jit — generation is negligible next to the
mapped evaluation).  Owen scrambling makes each replication an unbiased
estimator, so averaging R independent replications gives both the estimate
and a valid standard error (the standard RQMC recipe).
"""

from __future__ import annotations

import math

import numpy as np


def sobol_latents(n, dim, seed, dtype=np.float64):
    """One scrambled-Sobol replication of ``n`` points in [0, 1)^dim.

    ``n`` is rounded UP to the next power of two (Sobol balance property;
    the actual count is returned via the array shape).
    """
    from scipy.stats import qmc

    m = max(int(math.ceil(math.log2(max(n, 1)))), 0)
    eng = qmc.Sobol(dim, scramble=True, seed=seed)
    pts = eng.random_base2(m)
    # keep strictly inside (0, 1): the flow clamps at 1 - 1e-6 anyway, but
    # exact 0/1 corners can hit log/0-width edges.  The upper bound must be
    # dtype-aware — clipping to 1-1e-9 *before* an f32 cast rounds back to
    # exactly 1.0 — so clip after the cast to the largest value below 1.
    dtype = np.dtype(dtype)
    eps = np.finfo(dtype).tiny
    upper = np.nextafter(dtype.type(1.0), dtype.type(0.0))
    return np.clip(pts.astype(dtype), eps, upper)


def rqmc_integrate(eval_mean, n_flow, nitn, neval, seed, dtype=np.float64):
    """Randomized-QMC estimate: ``nitn`` independently scrambled Sobol
    replications of ``neval`` (rounded up to a power of two) points.

    ``eval_mean(w) -> scalar`` must return the mean of f(T(w))*J(w) over
    the batch (jit-compiled by the caller).  Returns ``(sig, sig_err,
    n_actual)`` with the standard error computed ACROSS replications —
    the within-replication variance is meaningless for QMC points.
    """
    means = []
    for i in range(nitn):
        w = sobol_latents(neval, n_flow, seed=seed + i, dtype=dtype)
        means.append(float(eval_mean(w)))
    means = np.asarray(means)
    sig = means.mean()
    sig_err = means.std(ddof=1) / math.sqrt(nitn) if nitn > 1 else float("inf")
    return float(sig), float(sig_err), len(w)
