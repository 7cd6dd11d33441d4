"""Parton distribution functions for the phase-space generator.

The reference calls the host-side LHAPDF C++ API per batch
(``pdf.xfxQ2(pdg, x, scale2)``, reference flat_phase_space_generator.py:120-137),
which would force a host round-trip inside every jitted training step.  Here
PDFs are jax-native so the whole latent->phase-space->matrix-element pipeline
fuses on device:

  * :class:`ToyPDF` — a CTEQ-like analytic parametrization, fully traceable;
    good for tests and benchmarks.
  * :class:`GridPDF` — bilinear interpolation of a tabulated (log x, log Q2)
    grid; build one from any LHAPDF member via :func:`GridPDF.from_lhapdf`
    (host-side, once, outside jit) or from raw arrays.
  * :class:`CallbackPDF` — escape hatch wrapping a host PDF via
    ``jax.pure_callback`` (works under jit, breaks fusion; mirrors the
    reference's behavior).

All return x*f(x) from ``xfxQ2`` like LHAPDF, and the generator divides by x
(reference flat_phase_space_generator.py:137).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp


class ToyPDF:
    """Analytic valence+sea toy PDF: x f(x) = N * x^a * (1-x)^b.

    Not a fit to data — a smooth, strictly-positive stand-in with realistic
    small-x growth and large-x falloff, adequate for integration tests and
    benchmarking the PDF-convolution code path.
    """

    _params = {  # pdg -> (N, a, b)
        0: (1.0, 0.0, 0.0),
        21: (3.0, -0.2, 5.0),
        1: (0.7, 0.5, 4.0), 2: (1.4, 0.5, 3.0),
        -1: (0.2, -0.2, 6.0), -2: (0.15, -0.2, 6.0),
        3: (0.15, -0.2, 6.0), -3: (0.15, -0.2, 6.0),
        4: (0.08, -0.2, 6.0), -4: (0.08, -0.2, 6.0),
        5: (0.03, -0.2, 6.0), -5: (0.03, -0.2, 6.0),
        6: (0.0, 0.0, 0.0), -6: (0.0, 0.0, 0.0),
    }

    def xfxQ2(self, pdg, x, q2):
        n, a, b = self._params.get(int(pdg), (1.0, 0.0, 0.0))
        x = jnp.clip(x, 1e-10, 1.0)
        return n * x ** a * (1.0 - x) ** b


class GridPDF:
    """Bilinear interpolation of x*f(x) on a (log x, log Q2) grid.

    ``grids`` maps pdg -> [n_x, n_q2] arrays of x*f values sampled at
    ``xs`` x ``q2s``.  Interpolation is in (log x, log Q2), clamped at the
    grid edges; fully jittable.
    """

    def __init__(self, xs, q2s, grids: dict):
        self.log_xs = jnp.asarray(np.log(np.asarray(xs)))
        self.log_q2s = jnp.asarray(np.log(np.asarray(q2s)))
        self.grids = {int(k): jnp.asarray(v) for k, v in grids.items()}

    @classmethod
    def from_lhapdf(cls, pdf, pdgs, n_x=128, n_q2=32,
                    x_range=(1e-6, 1.0 - 1e-9), q2_range=(1.0, 1e8)):
        """Tabulate a host LHAPDF member once (outside jit)."""
        xs = np.geomspace(x_range[0], x_range[1], n_x)
        q2s = np.geomspace(q2_range[0], q2_range[1], n_q2)
        grids = {}
        for pdg in pdgs:
            g = np.empty((n_x, n_q2))
            for i, x in enumerate(xs):
                for j, q2 in enumerate(q2s):
                    g[i, j] = pdf.xfxQ2(int(pdg), float(x), float(q2))
            grids[int(pdg)] = g
        return cls(xs, q2s, grids)

    def xfxQ2(self, pdg, x, q2):
        grid = self.grids[int(pdg)]
        lx = jnp.log(jnp.clip(x, 1e-300, None))
        lq = jnp.log(jnp.clip(jnp.broadcast_to(q2, x.shape), 1e-300, None))

        def locate(vals, axis_pts):
            i = jnp.clip(jnp.searchsorted(axis_pts, vals) - 1, 0, axis_pts.shape[0] - 2)
            t = (vals - axis_pts[i]) / (axis_pts[i + 1] - axis_pts[i])
            return i, jnp.clip(t, 0.0, 1.0)

        ix, tx = locate(lx, self.log_xs)
        iq, tq = locate(lq, self.log_q2s)
        g00 = grid[ix, iq]
        g10 = grid[ix + 1, iq]
        g01 = grid[ix, iq + 1]
        g11 = grid[ix + 1, iq + 1]
        return ((1 - tx) * (1 - tq) * g00 + tx * (1 - tq) * g10
                + (1 - tx) * tq * g01 + tx * tq * g11)


class CallbackPDF:
    """Host PDF via ``jax.pure_callback`` (e.g. a real lhapdf member)."""

    def __init__(self, host_pdf):
        self._pdf = host_pdf

    def xfxQ2(self, pdg, x, q2):
        pdg = int(pdg)

        def host(xv, q2v):
            xv = np.asarray(xv, dtype=np.float64)
            q2v = np.broadcast_to(np.asarray(q2v, dtype=np.float64), xv.shape)
            return np.asarray(
                [self._pdf.xfxQ2(pdg, float(a), float(b)) for a, b in zip(xv.ravel(), q2v.ravel())],
                dtype=xv.dtype,
            ).reshape(xv.shape)

        return jax.pure_callback(
            host, jax.ShapeDtypeStruct(x.shape, x.dtype), x, q2, vmap_method="sequential")
