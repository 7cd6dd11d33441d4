"""Parton distribution functions for the phase-space generator.

The reference calls the host-side LHAPDF C++ API per batch
(``pdf.xfxQ2(pdg, x, scale2)``, reference flat_phase_space_generator.py:120-137),
which would force a host round-trip inside every jitted training step.  Here
PDFs are jax-native so the whole latent->phase-space->matrix-element pipeline
fuses on device:

  * :class:`ToyPDF` — a CTEQ-like analytic parametrization, fully traceable;
    good for tests and benchmarks.
  * :class:`~nf_tpu.phasespace.lhapdf_reader.LHAPDFGrid` — THE canonical
    on-device tabulated PDF (log-bicubic, LHAPDF6's interpolation family):
    parse a real ``.dat`` member with ``LHAPDFGrid.from_dat`` or tabulate
    any host PDF with ``LHAPDFGrid.from_tabulated``.
  * :class:`GridPDF` — a thin constructor adapter over ``LHAPDFGrid`` kept
    for the old raw-array API (the separate bilinear interpolator it used
    to carry was strictly less accurate and was removed in r3; there is
    one interpolation path now).
  * :class:`CallbackPDF` — escape hatch wrapping a host PDF via
    ``jax.pure_callback`` (works under jit, breaks fusion; mirrors the
    reference's behavior).

Accuracy hierarchy (cross-tested in test_vegas_experiment.py /
test_lhapdf_reader.py): an analytic form (ToyPDF) is exact; LHAPDFGrid /
GridPDF carry the cubic truncation error of the tabulation (~1e-3 rel at
LHAPDF-like knot densities); CallbackPDF is exact w.r.t. the host PDF but
forces a host round-trip per batch.

All return x*f(x) from ``xfxQ2`` like LHAPDF, and the generator divides by x
(reference flat_phase_space_generator.py:137).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from nf_tpu.phasespace.lhapdf_reader import LHAPDFGrid  # noqa: F401


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


class GridPDF(LHAPDFGrid):
    """Tabulated on-device PDF from raw ``(xs, q2s, {pdg: [n_x, n_q2]})``
    arrays — a constructor adapter over the canonical
    :class:`~nf_tpu.phasespace.lhapdf_reader.LHAPDFGrid` log-bicubic
    interpolator (the redundant bilinear path was removed in r3; see the
    module docstring for the accuracy hierarchy).
    """

    def __init__(self, xs, q2s, grids: dict, extrapolation="continuation"):
        flavors = np.asarray(sorted(int(k) for k in grids), dtype=np.int64)
        values = np.stack(
            [np.asarray(grids[int(f)], dtype=np.float64) for f in flavors],
            axis=-1)
        qs = np.sqrt(np.asarray(q2s, dtype=np.float64))
        super().__init__(
            [(np.asarray(xs, dtype=np.float64), qs, flavors, values)],
            extrapolation=extrapolation)

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
