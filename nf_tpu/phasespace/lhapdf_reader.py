"""LHAPDF6 member-file (`.dat`, lhagrid1) reader + jax-native interpolation.

The reference lazily imports the LHAPDF C++ bindings and calls
``pdf.xfxQ2(pdg, x, Q2)`` per event on the host (reference
flat_phase_space_generator.py:37-39,120-137).  nf_tpu keeps the PDF on
device: this module parses the standard LHAPDF6 grid format with pure
numpy (no lhapdf wheel required) and evaluates it with log-bicubic
interpolation in jax — the same interpolation family as LHAPDF6's default
``LogBicubic`` interpolator — so the full latent -> phase-space -> PDF ->
matrix-element pipeline stays fused under jit.

File format (lhagrid1): a YAML-ish header terminated by ``---``, then one
block per subgrid, each terminated by ``---``:

    line 1: x knots (ascending)
    line 2: Q knots in GeV (ascending; subgrids partition the Q range)
    line 3: flavor PDG ids
    then len(x)*len(Q) rows of len(flavors) values of x*f(x, Q),
    row-major with the x index outermost.

Real-grid semantics honored here (each covered by tests on the adversarial
fixture, tools/make_pdf_fixture.py):

  * **values may be negative** (NLO gluon at small x): interpolation is
    cubic in the VALUE with log coordinates — never log-of-value — so
    negative regions interpolate exactly like positive ones;
  * **subgrid boundaries are hard**: stencils never cross a subgrid edge
    (LHAPDF interpolates each subgrid independently), so a kink in dln f/
    dln Q2 at the boundary — e.g. an alpha_s matching point — is preserved,
    not smoothed over;
  * **flavor thresholds**: grids carry forced Q knots at quark masses where
    a flavor PDF switches on; the reader needs no special casing beyond not
    smoothing across knots (cubic Hermite is local), which the threshold
    tests pin down.

Out-of-range queries follow the ``extrapolation`` policy:

  * ``"continuation"`` (default — the structure of LHAPDF6's default
    ContinuationExtrapolator): below ``x_min``, extrapolate from the
    anchor pair (x_min, 1.01*x_min) linearly in log x of log(xf) when both
    anchor values exceed 1e-3, else linearly in log x of the value itself
    (handles negative/small values); above ``q2_max``, the same recipe in
    log Q2 from (0.99*q2_max, q2_max); below ``q2_min``, from
    (q2_min, 1.01*q2_min) extrapolating downward.  Corner queries (x and
    Q2 both out of range) extrapolate in x at the two Q2 anchors first,
    then in Q2.
  * ``"nearest"``: clamp to the grid edge (the pre-r3 behavior; cheapest —
    the interior path evaluates one stencil instead of nine).
"""

from __future__ import annotations

import math

import numpy as np

import jax.numpy as jnp


def read_lhapdf_dat(path):
    """Parse an LHAPDF6 member file.

    Returns ``(meta, subgrids)`` where ``meta`` is the header dict and
    ``subgrids`` is a list of ``(xs, qs, flavors, values)`` with ``values``
    shaped ``[n_x, n_q, n_flavors]`` (x*f at the knots).
    """
    with open(path) as fh:
        lines = [ln.strip() for ln in fh]

    i = 0
    meta = {}
    while i < len(lines) and lines[i] != "---":
        if ":" in lines[i]:
            k, v = lines[i].split(":", 1)
            meta[k.strip()] = v.strip()
        i += 1
    if i >= len(lines):
        raise ValueError(f"{path}: missing '---' header terminator")
    i += 1

    subgrids = []
    while i < len(lines):
        while i < len(lines) and not lines[i]:
            i += 1
        if i >= len(lines) or lines[i] == "---":
            break
        xs = np.asarray(lines[i].split(), dtype=np.float64)
        qs = np.asarray(lines[i + 1].split(), dtype=np.float64)
        flavors = np.asarray(lines[i + 2].split(), dtype=np.int64)
        i += 3
        n_rows = len(xs) * len(qs)
        vals = np.empty((n_rows, len(flavors)), dtype=np.float64)
        for r in range(n_rows):
            row = np.asarray(lines[i + r].split(), dtype=np.float64)
            if row.shape[0] != len(flavors):
                raise ValueError(
                    f"{path}: subgrid {len(subgrids)} row {r} has "
                    f"{row.shape[0]} values, expected {len(flavors)}")
            vals[r] = row
        i += n_rows
        while i < len(lines) and lines[i] != "---":
            if lines[i]:
                raise ValueError(
                    f"{path}: unexpected content after subgrid "
                    f"{len(subgrids)}: {lines[i]!r}")
            i += 1
        i += 1
        subgrids.append((xs, qs, flavors,
                         vals.reshape(len(xs), len(qs), len(flavors))))
    if not subgrids:
        raise ValueError(f"{path}: no subgrids found")
    return meta, subgrids


def _pad_ghost(knots, vals, axis):
    """Add linearly-extrapolated ghost knots/values at both ends of ``axis``
    so every interior cell has a full 4-point Hermite stencil."""
    k = np.concatenate([[2 * knots[0] - knots[1]], knots,
                        [2 * knots[-1] - knots[-2]]])
    lo = 2 * np.take(vals, 0, axis) - np.take(vals, 1, axis)
    hi = 2 * np.take(vals, -1, axis) - np.take(vals, -2, axis)
    v = np.concatenate([np.expand_dims(lo, axis), vals,
                        np.expand_dims(hi, axis)], axis=axis)
    return k, v


def _hermite(k4, v4, t):
    """Nonuniform cubic Hermite on the middle cell of a 4-point stencil.

    ``k4``: [..., 4] knots; ``v4``: [..., 4] values; ``t``: [...] query in
    [k4[1], k4[2]].  Tangents are the centered finite differences LHAPDF's
    LogBicubic uses.
    """
    h0 = k4[..., 1] - k4[..., 0]
    h1 = k4[..., 2] - k4[..., 1]
    h2 = k4[..., 3] - k4[..., 2]
    d0 = (v4[..., 1] - v4[..., 0]) / h0
    d1 = (v4[..., 2] - v4[..., 1]) / h1
    d2 = (v4[..., 3] - v4[..., 2]) / h2
    m1 = 0.5 * (d0 + d1)
    m2 = 0.5 * (d1 + d2)
    u = (t - k4[..., 1]) / h1
    u2 = u * u
    u3 = u2 * u
    return ((2 * u3 - 3 * u2 + 1) * v4[..., 1]
            + (u3 - 2 * u2 + u) * h1 * m1
            + (-2 * u3 + 3 * u2) * v4[..., 2]
            + (u3 - u2) * h1 * m2)


class _Subgrid:
    def __init__(self, xs, qs, flavors, values):
        self.q2_min = float(qs[0] ** 2)
        self.q2_max = float(qs[-1] ** 2)
        lx, v = _pad_ghost(np.log(xs), values, 0)
        lq, v = _pad_ghost(np.log(qs ** 2), v, 1)
        self.log_xs = jnp.asarray(lx)
        self.log_q2s = jnp.asarray(lq)
        self.flavor_index = {int(f): i for i, f in enumerate(flavors)}
        self.values = jnp.asarray(v)  # [n_x+2, n_q+2, n_f]

    def eval(self, fidx, lx, lq):
        """Bicubic at (lx, lq) batches for flavor column ``fidx``."""
        grid = self.values[:, :, fidx]
        nx = self.log_xs.shape[0]
        nq = self.log_q2s.shape[0]
        lx = jnp.clip(lx, self.log_xs[1], self.log_xs[nx - 2])
        lq = jnp.clip(lq, self.log_q2s[1], self.log_q2s[nq - 2])
        ix = jnp.clip(jnp.searchsorted(self.log_xs, lx, side="right") - 1,
                      1, nx - 3)
        iq = jnp.clip(jnp.searchsorted(self.log_q2s, lq, side="right") - 1,
                      1, nq - 3)
        d = jnp.arange(-1, 3)
        # 4x4 stencils: [B, 4(x), 4(q)]
        gx = ix[:, None, None] + d[None, :, None]
        gq = iq[:, None, None] + d[None, None, :]
        v44 = grid[gx, gq]
        kq4 = self.log_q2s[iq[:, None] + d[None, :]]        # [B, 4]
        kx4 = self.log_xs[ix[:, None] + d[None, :]]         # [B, 4]
        # interpolate along q for each of the 4 x-rows, then along x
        vq = _hermite(kq4[:, None, :], v44, lq[:, None])    # [B, 4]
        return _hermite(kx4, vq, lx)                        # [B]


def _extrapolate_linear(u, ua, ub, ya, yb):
    """LHAPDF6 ContinuationExtrapolator's anchor rule: linear in ``u``
    (a log coordinate) of log y when both anchors exceed 1e-3, else linear
    in ``u`` of y itself (covers negative/vanishing PDFs)."""
    frac = (u - ua) / (ub - ua)
    log_ok = jnp.logical_and(ya > 1e-3, yb > 1e-3)
    safe_a = jnp.maximum(ya, 1e-300)
    safe_b = jnp.maximum(yb, 1e-300)
    y_log = jnp.exp(jnp.log(safe_a) + frac * (jnp.log(safe_b) - jnp.log(safe_a)))
    y_lin = ya + frac * (yb - ya)
    return jnp.where(log_ok, y_log, y_lin)


class LHAPDFGrid:
    """A parsed LHAPDF6 member, evaluated jax-natively.

    ``xfxQ2(pdg, x, q2)`` returns x*f(x, Q2) with log-bicubic interpolation
    per subgrid (subgrids partition the Q range; selection is a static mask
    over the few subgrids, so everything stays jittable).  Out-of-range
    queries follow the ``extrapolation`` policy — ``"continuation"``
    (LHAPDF6's default recipe) or ``"nearest"`` (edge clamp); see the
    module docstring for the exact rules.
    """

    def __init__(self, subgrids, meta=None, extrapolation="continuation"):
        self.meta = dict(meta or {})
        self._subgrids = [_Subgrid(*sg) for sg in subgrids]
        if extrapolation not in ("continuation", "nearest"):
            raise ValueError(f"unknown extrapolation policy {extrapolation!r}")
        self.extrapolation = extrapolation
        sg0 = self._subgrids[0]
        self.x_min = float(np.exp(sg0.log_xs[1]))
        self.q2_min = sg0.q2_min
        self.q2_max = self._subgrids[-1].q2_max

    @classmethod
    def from_dat(cls, path, extrapolation="continuation"):
        meta, subgrids = read_lhapdf_dat(path)
        return cls(subgrids, meta, extrapolation)

    @classmethod
    def from_tabulated(cls, xs, q2s, grids, extrapolation="continuation"):
        """Build a single-subgrid member from tabulated arrays.

        ``grids`` maps pdg -> ``[len(xs), len(q2s)]`` arrays of x*f values.
        This is the canonical way to put ANY host PDF on device (tabulate
        once outside jit, evaluate log-bicubically under jit).
        """
        flavors = np.asarray(sorted(grids), dtype=np.int64)
        values = np.stack([np.asarray(grids[int(f)], dtype=np.float64)
                           for f in flavors], axis=-1)
        xs = np.asarray(xs, dtype=np.float64)
        qs = np.sqrt(np.asarray(q2s, dtype=np.float64))
        if len(xs) < 2 or len(qs) < 2:
            raise ValueError("from_tabulated needs >= 2 knots per axis")
        return cls([(xs, qs, flavors, values)], extrapolation=extrapolation)

    @property
    def flavors(self):
        return sorted(self._subgrids[0].flavor_index)

    def _interp(self, pdg, x, q2):
        """Interior log-bicubic evaluation; out-of-range clamps to edge."""
        lx = jnp.log(jnp.clip(x, 1e-300, None))
        lq = jnp.log(jnp.clip(q2, 1e-300, None))
        out = jnp.zeros_like(x)
        chosen = jnp.zeros(x.shape, bool)
        for si, sg in enumerate(self._subgrids):
            fidx = sg.flavor_index.get(pdg)
            if fidx is None:
                raise KeyError(f"flavor {pdg} not in grid")
            last = si == len(self._subgrids) - 1
            inside = (q2 < sg.q2_max) | jnp.asarray(last)
            take = inside & ~chosen
            out = jnp.where(take, sg.eval(fidx, lx, lq).astype(x.dtype), out)
            chosen = chosen | take
        return out

    def xfxQ2(self, pdg, x, q2, extrapolation=None):
        pdg = int(pdg)
        x = jnp.atleast_1d(x)
        q2 = jnp.broadcast_to(jnp.asarray(q2, x.dtype), x.shape)
        mode = extrapolation or self.extrapolation
        if mode == "nearest":
            return self._interp(pdg, x, q2)
        if mode != "continuation":
            raise ValueError(f"unknown extrapolation policy {mode!r}")

        x_min, q2_min, q2_max = self.x_min, self.q2_min, self.q2_max
        x_lo = x < x_min
        q_lo = q2 < q2_min
        q_hi = q2 > q2_max
        lx = jnp.log(jnp.clip(x, 1e-300, None))
        lx_a = math.log(x_min)
        lx_b = math.log(1.01 * x_min)

        def with_x_continuation(q2v):
            fi = self._interp(pdg, x, q2v)
            fa = self._interp(pdg, jnp.full_like(x, x_min), q2v)
            fb = self._interp(pdg, jnp.full_like(x, 1.01 * x_min), q2v)
            fe = _extrapolate_linear(lx, lx_a, lx_b, fa, fb)
            return jnp.where(x_lo, fe, fi)

        f_mid = with_x_continuation(jnp.clip(q2, q2_min, q2_max))
        # Q2 anchors: below-range extrapolates down from (q2_min,
        # 1.01*q2_min); above-range up from (0.99*q2_max, q2_max)
        q2a = jnp.where(q_lo, q2_min, 0.99 * q2_max)
        q2b = jnp.where(q_lo, 1.01 * q2_min, q2_max)
        ga = with_x_continuation(q2a)
        gb = with_x_continuation(q2b)
        lq = jnp.log(jnp.clip(q2, 1e-300, None))
        f_ext_q = _extrapolate_linear(lq, jnp.log(q2a), jnp.log(q2b), ga, gb)
        return jnp.where(q_lo | q_hi, f_ext_q, f_mid)
