"""Jax-native classic VEGAS (separable adaptive importance sampling).

The reference benchmarks NIS against the external ``vegas`` package
(reference utils/experiment_mgv.py:37-40); this module provides the same
baseline capability on-device so comparisons run without host round-trips.
Implements the standard G.P. Lepage algorithm: per-dimension adaptive grid,
damped importance redistribution, inverse-variance iteration combining.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


class VegasIntegrator:
    def __init__(self, n_dim, n_bins=50, alpha=0.75, seed=0, dtype=None):
        self.n_dim = n_dim
        self.n_bins = n_bins
        self.alpha = alpha
        if dtype is None:
            dtype = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
        self.dtype = dtype
        # edges: [n_dim, n_bins+1], uniformly initialized
        self.edges = jnp.tile(
            jnp.linspace(0.0, 1.0, n_bins + 1, dtype=dtype)[None, :], (n_dim, 1))
        self._key = jax.random.PRNGKey(seed)

    def _next_key(self):
        self._key, sub = jax.random.split(self._key)
        return sub

    @partial(jax.jit, static_argnums=(0,))
    def _map(self, edges, y):
        """Map uniform y [B, D] through the grid; returns (x, jac [B])."""
        nb = self.n_bins
        z = y * nb
        iy = jnp.clip(jnp.floor(z).astype(jnp.int32), 0, nb - 1)
        frac = z - iy
        # gather per-dim edges: edges [D, nb+1]; iy [B, D]
        e_lo = jnp.stack([edges[d, :][iy[:, d]] for d in range(self.n_dim)], axis=1)
        e_hi = jnp.stack([edges[d, :][iy[:, d] + 1] for d in range(self.n_dim)], axis=1)
        width = e_hi - e_lo
        x = e_lo + frac * width
        jac = jnp.prod(nb * width, axis=1)
        return x, jac, iy

    def _refine(self, edges, d_acc):
        """Redistribute edges from per-bin importance d_acc [D, nb]."""
        nb = self.n_bins
        # smooth (Lepage's (d[i-1]+6d[i]+d[i+1])/8) and damp
        d = d_acc
        d = jnp.concatenate([
            ((7.0 * d[:, :1] + d[:, 1:2]) / 8.0),
            ((d[:, :-2] + 6.0 * d[:, 1:-1] + d[:, 2:]) / 8.0),
            ((d[:, -2:-1] + 7.0 * d[:, -1:]) / 8.0)], axis=1)
        dsum = jnp.sum(d, axis=1, keepdims=True)
        r = d / jnp.where(dsum > 0, dsum, 1.0)
        r = jnp.where(r > 0, ((r - 1.0) / jnp.log(jnp.clip(r, 1e-30, None))) ** self.alpha, 0.0)
        # note: standard damping ((1-r)/log(1/r))^alpha; r in (0,1)
        rsum = jnp.sum(r, axis=1, keepdims=True)
        r = r / jnp.where(rsum > 0, rsum, 1.0)

        # new edges: invert the cumulative importance
        cum = jnp.concatenate([jnp.zeros_like(r[:, :1]), jnp.cumsum(r, axis=1)], axis=1)
        targets = jnp.linspace(0.0, 1.0, nb + 1, dtype=edges.dtype)

        def per_dim(cum_d, edges_d):
            idx = jnp.clip(jnp.searchsorted(cum_d, targets, side="right") - 1, 0, nb - 1)
            c_lo = cum_d[idx]
            c_w = cum_d[idx + 1] - c_lo
            e_lo = edges_d[idx]
            e_w = edges_d[idx + 1] - e_lo
            frac = jnp.where(c_w > 0, (targets - c_lo) / jnp.where(c_w > 0, c_w, 1.0), 0.0)
            new = e_lo + frac * e_w
            return new.at[0].set(0.0).at[-1].set(1.0)

        return jax.vmap(per_dim)(cum, edges)

    def run(self, f, nitn=10, neval=10000):
        """Adaptive integration; returns (mean, sdev) combined over iterations."""
        means, variances = [], []
        for _ in range(nitn):
            y = jax.random.uniform(self._next_key(), (neval, self.n_dim),
                                   dtype=self.dtype)
            x, jac, iy = self._map(self.edges, y)
            fx = f(x) * jac
            means.append(float(jnp.mean(fx)))
            variances.append(float(jnp.var(fx, ddof=1) / neval))
            # per-bin importance: sum of (f*jac)^2 per bin per dim
            w2 = fx ** 2
            d_acc = jnp.stack([
                jnp.zeros(self.n_bins, self.dtype).at[iy[:, d]].add(w2)
                for d in range(self.n_dim)], axis=0)
            self.edges = self._refine(self.edges, d_acc)
        means = np.asarray(means)
        variances = np.clip(np.asarray(variances), 1e-300, None)
        inv = 1.0 / variances
        mean = float(np.sum(means * inv) / np.sum(inv))
        sdev = float(np.sqrt(1.0 / np.sum(inv)))
        return mean, sdev

    def sample(self, n):
        """Draw n points through the adapted map; returns (x, jac)."""
        y = jax.random.uniform(self._next_key(), (n, self.n_dim), dtype=self.dtype)
        x, jac, _ = self._map(self.edges, y)
        return x, jac
