"""Tree-topology resonance decay channels + multi-channel combination.

The flat RAMBO chain (generator.py) parametrizes n-body phase space by a
FIXED sequential decay chain M_0 -> p_0 + M_1 -> ... — only the invariant
mass of the *last* final-state pair appears as a chain variable, so a
narrow resonance in any other pairing (e.g. the first Z in
qqbar -> ZZ -> 4l, reference-shape BASELINE configs[3]) cannot be
importance-mapped through it and the flow plateaus (tools/run_2to4.py:
flow-alone ESS 0.0042% of uniform).  This module provides what
MadGraph-class generators use and the reference lacks entirely:

  * :class:`ResonanceDecayPhasespace` — an exact phase-space
    parametrization over an ARBITRARY binary decay tree of the final
    state, with each internal node's invariant mass drawn through a
    pluggable analytic map (:class:`UniformSMap` flat,
    :class:`BreitWignerSMap` resonance, :class:`PowerSMap` propagator
    tail).  The recursive decomposition

        dPhi_n(P) = dPhi_2(P; Q_A, Q_B) (ds_A/2pi) (ds_B/2pi)
                    dPhi(Q_A) dPhi(Q_B)

    gives a CLOSED-FORM weight — no bisection, no data-dependent control
    flow, fixed shapes throughout: ideal XLA.  The phase-space volume
    convention matches the reference's ``get_flatWeights``
    (reference flat_phase_space_generator.py:81-97; integral of dPhi_2 is
    1/(8 pi) for massless pairs), so weights from this generator and the
    flat one are interchangeable, and the PDF convolution / cut / flux
    machinery is shared through the common base class.

  * :func:`multichannel_integrand` — the standard alpha-weighted
    multi-channel combination: with channels T_i and densities
    g_i = 1/w_i^PS, each sample drawn from channel i (selected by the
    first latent dimension) carries weight

        f(x) * C(x) / sum_j alpha_j / w_j^PS(x)

    where C is the channel-independent factor (PDF * cuts / (2 s_hat))
    and w_j^PS(x) is evaluated at the *generated point* via
    :meth:`ResonanceDecayPhasespace.channel_weight_ps` (closed-form from
    the momenta's invariant masses).  The estimator is exactly unbiased
    for any fixed alpha (tests/test_topology.py pins it against a
    scipy.dblquad analytic reduction and against the flat generator).

Composed with the flow (the wrapper is an ordinary jax-traceable
integrand), the flow trains on the smooth multi-channel remainder — the
double-resonance 2->4 target becomes learnable (VERDICT r3 next-steps #1).
"""

from __future__ import annotations

import math

import numpy as np

import jax.numpy as jnp

from nf_tpu.phasespace import lorentz
from nf_tpu.phasespace.generator import (
    FlatInvertiblePhasespace,
    PhaseSpaceGeneratorError,
    VirtualPhaseSpaceGenerator,
)

_TWO_PI = 2.0 * math.pi


# ---------------------------------------------------------------------------
# Invariant-mass-squared maps: u in [0,1] -> s in [s_min, s_max]
# ---------------------------------------------------------------------------

class UniformSMap:
    """Flat in s: s = s_min + u (s_max - s_min)."""

    def sample(self, u, s_min, s_max):
        span = s_max - s_min
        return s_min + u * span, span

    def ds_du_at(self, s, s_min, s_max):
        del s
        return s_max - s_min

    def invert(self, s, s_min, s_max):
        return jnp.clip((s - s_min) / jnp.maximum(s_max - s_min, 1e-300),
                        0.0, 1.0)


class BreitWignerSMap:
    """Breit-Wigner importance map: s = m^2 + m*Gamma*tan(t), t uniform
    between the endpoint angles — the standard resonance flattener.  The
    density ds/du = (t_max - t_min) ((s - m^2)^2 + m^2 Gamma^2)/(m Gamma)
    is closed-form in s, which is what makes multi-channel weights cheap.
    """

    def __init__(self, mass, width):
        self.mass = float(mass)
        self.width = float(width)

    def _angles(self, s_min, s_max):
        m2 = self.mass * self.mass
        mg = self.mass * self.width
        return jnp.arctan((s_min - m2) / mg), jnp.arctan((s_max - m2) / mg)

    def sample(self, u, s_min, s_max):
        m2 = self.mass * self.mass
        mg = self.mass * self.width
        t_min, t_max = self._angles(s_min, s_max)
        t = t_min + u * (t_max - t_min)
        s = m2 + mg * jnp.tan(t)
        # clamp: tan at the endpoint angles can overshoot by a rounding ulp
        s = jnp.clip(s, s_min, s_max)
        ds_du = (t_max - t_min) * mg / jnp.cos(t) ** 2
        return s, ds_du

    def ds_du_at(self, s, s_min, s_max):
        m2 = self.mass * self.mass
        mg = self.mass * self.width
        t_min, t_max = self._angles(s_min, s_max)
        return (t_max - t_min) * ((s - m2) ** 2 + mg * mg) / mg

    def invert(self, s, s_min, s_max):
        m2 = self.mass * self.mass
        mg = self.mass * self.width
        t_min, t_max = self._angles(s_min, s_max)
        t = jnp.arctan((s - m2) / mg)
        return jnp.clip((t - t_min) / jnp.maximum(t_max - t_min, 1e-300),
                        0.0, 1.0)


class PowerSMap:
    """Power-law importance map ~ s^exponent (exponent != -1): flattens
    propagator tails / steeply-falling spectra.  ``s_floor`` keeps the
    endpoint finite for negative exponents when s_min can reach 0."""

    def __init__(self, exponent, s_floor=0.0):
        if exponent == -1.0:
            raise ValueError("exponent -1 needs a log map; use -0.999...")
        self.exponent = float(exponent)
        self.s_floor = float(s_floor)

    def sample(self, u, s_min, s_max):
        a = self.exponent + 1.0
        lo = jnp.maximum(s_min, self.s_floor)
        sa_min = lo ** a
        sa_max = s_max ** a
        s = (sa_min + u * (sa_max - sa_min)) ** (1.0 / a)
        ds_du = (sa_max - sa_min) / (a * s ** (a - 1.0))
        return s, ds_du

    def ds_du_at(self, s, s_min, s_max):
        a = self.exponent + 1.0
        lo = jnp.maximum(s_min, self.s_floor)
        # the floor truncates the support: points below it are unreachable
        # by this map, so the channel density there is exactly zero (the
        # multi-channel denominator then correctly drops this channel)
        return jnp.where(s >= lo,
                         (s_max ** a - lo ** a)
                         / (a * jnp.maximum(s, 1e-300) ** (a - 1.0)),
                         0.0)

    def invert(self, s, s_min, s_max):
        a = self.exponent + 1.0
        lo = jnp.maximum(s_min, self.s_floor)
        sa_min = lo ** a
        sa_max = s_max ** a
        return jnp.clip((s ** a - sa_min)
                        / jnp.where(sa_max != sa_min, sa_max - sa_min, 1.0),
                        0.0, 1.0)


# ---------------------------------------------------------------------------
# Decay-tree structure
# ---------------------------------------------------------------------------

class _Node:
    __slots__ = ("index", "left", "right", "leaves", "s_map")

    def __init__(self, index=None, left=None, right=None):
        self.index = index
        self.left = left
        self.right = right
        if index is not None:
            self.leaves = (index,)
        else:
            self.leaves = tuple(sorted(left.leaves + right.leaves))
        self.s_map = None

    @property
    def is_leaf(self):
        return self.index is not None


def _build_tree(spec):
    if isinstance(spec, (int, np.integer)):
        return _Node(index=int(spec))
    if isinstance(spec, (tuple, list)) and len(spec) == 2:
        return _Node(left=_build_tree(spec[0]), right=_build_tree(spec[1]))
    raise PhaseSpaceGeneratorError(
        f"topology spec must be nested 2-tuples of final-state indices, "
        f"got {spec!r}")


class ResonanceDecayPhasespace(VirtualPhaseSpaceGenerator):
    """Exact 2 -> n phase-space channel over a binary decay tree.

    ``topology``: nested 2-tuples of final-state indices covering
    0..n_final-1 exactly once, e.g. ``((0, 1), (2, 3))`` (pair topology) or
    ``(0, (1, (2, 3)))`` (sequential chain).  ``mass_maps``: dict mapping a
    tuple of the leaf indices under an internal node (sorted) to an s-map
    instance; unmapped nodes default to :class:`UniformSMap`.

    Latent layout (``nDimPhaseSpace()`` = 3 n_final - 4 columns, + 2
    trailing PDF columns when ``pdf_active`` — the same contract as
    :class:`FlatInvertiblePhasespace`):

      * columns ``[0, n_final-2)``: invariant masses of the non-root
        internal nodes, in preorder (parent before children, left before
        right);
      * then 2 columns (cos-theta, phi) per internal node incl. the root,
        preorder;
      * then the PDF convolution columns (tau/ycm or x1/x2).

    ``generateKinematics_batch`` has the exact signature and return
    convention of the flat generator, so every trainer / integrator /
    unweighter consumes this channel unchanged.
    """

    def __init__(self, initial_masses, final_masses, topology,
                 mass_maps=None, pdf=None, pdf_active=False, tau=True):
        super().__init__(initial_masses, final_masses, pdf=pdf,
                         pdf_active=pdf_active, tau=tau)
        if self.n_initial != 2:
            raise PhaseSpaceGeneratorError(
                "ResonanceDecayPhasespace supports exactly 2 initial "
                "particles (decay topologies: use a root node directly).")
        self.root = _build_tree(topology)
        if self.root.leaves != tuple(range(self.n_final)):
            raise PhaseSpaceGeneratorError(
                f"topology leaves {self.root.leaves} must cover "
                f"0..{self.n_final - 1} exactly once")
        # preorder traversals (static: fixes the latent layout)
        self._internal = []

        def visit(node):
            if node.is_leaf:
                return
            self._internal.append(node)
            visit(node.left)
            visit(node.right)

        visit(self.root)
        self._nonroot = [n for n in self._internal if n is not self.root]
        mass_maps = dict(mass_maps or {})
        for node in self._nonroot:
            node.s_map = mass_maps.pop(tuple(node.leaves), None) \
                or UniformSMap()
        if mass_maps:
            raise PhaseSpaceGeneratorError(
                f"mass_maps keys {sorted(mass_maps)} do not match any "
                f"internal node of the topology "
                f"(valid: {[tuple(n.leaves) for n in self._nonroot]})")
        self._mass_col = {id(n): i for i, n in enumerate(self._nonroot)}
        self._ang_col = {id(n): self.n_final - 2 + 2 * i
                         for i, n in enumerate(self._internal)}

    # -- helpers -------------------------------------------------------------

    def _min_mass(self, node, dtype):
        return jnp.asarray(sum(self.final_masses[i] for i in node.leaves),
                           dtype)

    def _child_masses(self, node, M_node, mass_rv, weight):
        """Draw (or fix) the two children's masses of ``node``; returns
        (M_A, M_B, s_A, s_B, weight) with the (ds/du)/(2 pi) factors
        folded into ``weight``.  Draw order: left first in
        [min_A, M - min_B], then right in [min_B, M - M_A]."""
        dtype = M_node.dtype
        A, Bn = node.left, node.right
        min_a = self._min_mass(A, dtype)
        min_b = self._min_mass(Bn, dtype)
        if not A.is_leaf:
            u = mass_rv[:, self._mass_col[id(A)]]
            s_lo = min_a ** 2
            s_hi = jnp.maximum((M_node - min_b) ** 2, s_lo)
            s_a, ds_du = A.s_map.sample(u, s_lo, s_hi)
            weight = weight * ds_du / _TWO_PI
            M_A = jnp.sqrt(jnp.maximum(s_a, 0.0))
        else:
            M_A = jnp.broadcast_to(
                jnp.asarray(self.final_masses[A.index], dtype), M_node.shape)
            s_a = M_A ** 2
        if not Bn.is_leaf:
            u = mass_rv[:, self._mass_col[id(Bn)]]
            s_lo = min_b ** 2
            s_hi = jnp.maximum((M_node - M_A) ** 2, s_lo)
            s_b, ds_du = Bn.s_map.sample(u, s_lo, s_hi)
            weight = weight * ds_du / _TWO_PI
            M_B = jnp.sqrt(jnp.maximum(s_b, 0.0))
        else:
            M_B = jnp.broadcast_to(
                jnp.asarray(self.final_masses[Bn.index], dtype), M_node.shape)
            s_b = M_B ** 2
        return M_A, M_B, s_a, s_b, weight

    # -- generation ----------------------------------------------------------

    def generateKinematics_batch(self, E_cm, random_variables_full,
                                 pT_mincut=-1, delR_mincut=-1, rap_maxcut=-1,
                                 pdgs=(0, 0)):
        """Map latents to 2 -> n_final kinematics through the decay tree.

        Same contract as the flat generator: returns ``(momenta
        [B, n_initial+n_final, 4] in the COM frame, weight [B])`` with
        weight = dPhi/dlatent * PDF * cuts / (2 s_hat)."""
        rv_full = random_variables_full
        dtype = rv_full.dtype
        B = rv_full.shape[0]
        collider_energy = E_cm

        rv, E_cm_eff, xb_1, xb_2, wgt_jac = \
            self._convolve_pdf(E_cm, rv_full, pdgs)
        assert rv.shape[1] == self.nDimPhaseSpace()

        mass_rv = rv[:, : self.n_final - 2]
        ang_rv = rv

        M_root = jnp.broadcast_to(jnp.asarray(E_cm_eff, dtype), (B,)) \
            if not self.pdf_active else E_cm_eff
        Q_root = jnp.stack(
            [M_root, jnp.zeros((B,), dtype), jnp.zeros((B,), dtype),
             jnp.zeros((B,), dtype)], axis=-1)

        weight = wgt_jac
        finals = [None] * self.n_final

        def decay(node, M_node, Q_node, weight):
            if node.is_leaf:
                finals[node.index] = Q_node
                return weight
            M_A, M_B, _, _, weight = self._child_masses(
                node, M_node, mass_rv, weight)
            # two-body decay weight: dPhi_2 per unit latent square
            # = (1/8pi) 2|q|/M = rho/pi  (|q| = 4 M rho; reference rho,
            # flat_phase_space_generator.py:107-113)
            rho = FlatInvertiblePhasespace.rho(M_node, M_A, M_B)
            weight = weight * rho / math.pi
            q = 4.0 * M_node * rho
            c0 = self._ang_col[id(node)]
            cos_t = 2.0 * ang_rv[:, c0] - 1.0
            sin_t = jnp.sqrt(jnp.maximum(1.0 - cos_t ** 2, 0.0))
            phi = _TWO_PI * ang_rv[:, c0 + 1]
            E_A = (M_node ** 2 + M_A ** 2 - M_B ** 2) \
                / (2.0 * jnp.maximum(M_node, 1e-300))
            qvec = jnp.stack([q * sin_t * jnp.cos(phi),
                              q * sin_t * jnp.sin(phi),
                              q * cos_t], axis=-1)
            p_a = jnp.concatenate([E_A[:, None], qvec], axis=-1)
            p_b = jnp.concatenate([(M_node - E_A)[:, None], -qvec], axis=-1)
            beta = lorentz.boost_vector(Q_node)
            p_a = lorentz.set_square(lorentz.boost(p_a, beta), M_A ** 2)
            p_b = lorentz.set_square(lorentz.boost(p_b, beta), M_B ** 2)
            weight = decay(node.left, M_A, p_a, weight)
            weight = decay(node.right, M_B, p_b, weight)
            return weight

        weight = decay(self.root, M_root, Q_root, weight)

        initial = self.setInitialStateMomenta_batch(E_cm_eff, B, dtype)
        momenta_com = jnp.concatenate(
            [initial, jnp.stack(finals, axis=1)], axis=1)

        weight = weight * self._cut_factor(momenta_com, xb_1, xb_2,
                                           pT_mincut, delR_mincut, rap_maxcut)
        shat = xb_1 * xb_2 * collider_energy ** 2
        weight = weight / (2.0 * shat)
        return self._sanitize(momenta_com, weight)

    # -- channel density at a point (for multi-channel combination) ----------

    def channel_weight_ps(self, momenta):
        """The PURE phase-space channel weight dPhi/du evaluated at given
        COM-frame momenta ``[B, n_initial+n_final, 4]`` — the product of
        two-body rho/pi factors and mass-map densities (ds/du)/(2 pi) at
        the momenta's own invariant masses.  Excludes the
        channel-independent PDF/cut/flux factor, so the multi-channel
        denominator sum_j alpha_j / w_j^PS uses exactly this.

        Closed-form: every factor is a function of the node invariant
        masses, which come straight from the momenta — no inversion of the
        latent map is required (the point of tree channels)."""
        fin = momenta[:, self.n_initial:, :]
        dtype = momenta.dtype

        def node_P(node):
            return sum(fin[:, i, :] for i in node.leaves)

        def node_mass(node):
            if node.is_leaf:
                return jnp.broadcast_to(
                    jnp.asarray(self.final_masses[node.index], dtype),
                    fin.shape[:1])
            return jnp.sqrt(jnp.maximum(lorentz.square(node_P(node)), 0.0))

        weight = jnp.ones(fin.shape[:1], dtype)
        for node in self._internal:
            M_node = node_mass(node)
            M_A = node_mass(node.left)
            M_B = node_mass(node.right)
            rho = FlatInvertiblePhasespace.rho(M_node, M_A, M_B)
            weight = weight * rho / math.pi
            # mass-map densities, bounds re-derived in draw order
            min_a = self._min_mass(node.left, dtype)
            min_b = self._min_mass(node.right, dtype)
            if not node.left.is_leaf:
                s_lo = min_a ** 2
                s_hi = jnp.maximum((M_node - min_b) ** 2, s_lo)
                weight = weight * node.left.s_map.ds_du_at(
                    M_A ** 2, s_lo, s_hi) / _TWO_PI
            if not node.right.is_leaf:
                s_lo = min_b ** 2
                s_hi = jnp.maximum((M_node - M_A) ** 2, s_lo)
                weight = weight * node.right.s_map.ds_du_at(
                    M_B ** 2, s_lo, s_hi) / _TWO_PI
        return weight

    # -- inversion (latents from kinematics) ----------------------------------

    def invertKinematics_batch(self, E_cm, momenta, xb_1=None, xb_2=None):
        """Recover the latent random variables from COM-frame kinematics.

        Inverse of :meth:`generateKinematics_batch` — the tree-channel
        analogue of the flat generator's inverse (the reference lists
        phase-space inversion as an unimplemented TODO, reference
        README.md:69).  Every column is closed-form: node invariant masses
        come straight from the momenta and invert through each node's
        ``s_map.invert``; decay angles come from pure-boosting each left
        child into its parent's rest frame (generation applies the pure
        boost with global axes, so no rotation bookkeeping is needed).
        With ``pdf_active`` the Bjorken fractions must be supplied.

        This is what makes LEARNED multi-channel combinations possible:
        evaluating channel m's flow-warped density at a point generated by
        channel k needs u_m(x) for every m (training/multichannel.py).
        """
        fin = momenta[:, self.n_initial:, :]
        dtype = momenta.dtype

        def node_P(node):
            if node.is_leaf:
                return fin[:, node.index, :]
            return node_P(node.left) + node_P(node.right)

        def node_mass(node):
            if node.is_leaf:
                return jnp.broadcast_to(
                    jnp.asarray(self.final_masses[node.index], dtype),
                    fin.shape[:1])
            return jnp.sqrt(jnp.maximum(lorentz.square(node_P(node)), 0.0))

        rv = [None] * self.nDimPhaseSpace()
        for node in self._internal:
            M_node = node_mass(node)
            M_A = node_mass(node.left)
            M_B = node_mass(node.right)
            min_a = self._min_mass(node.left, dtype)
            min_b = self._min_mass(node.right, dtype)
            # mass columns: same draw-order bounds as generation
            if not node.left.is_leaf:
                s_lo = min_a ** 2
                s_hi = jnp.maximum((M_node - min_b) ** 2, s_lo)
                rv[self._mass_col[id(node.left)]] = \
                    node.left.s_map.invert(M_A ** 2, s_lo, s_hi)
            if not node.right.is_leaf:
                s_lo = min_b ** 2
                s_hi = jnp.maximum((M_node - M_A) ** 2, s_lo)
                rv[self._mass_col[id(node.right)]] = \
                    node.right.s_map.invert(M_B ** 2, s_lo, s_hi)
            # angle columns: left child in the node's rest frame
            beta = lorentz.boost_vector(node_P(node))
            p_star = lorentz.boost(node_P(node.left), -beta)
            p_mag = jnp.sqrt(jnp.maximum(
                jnp.sum(p_star[:, 1:] ** 2, axis=-1), 1e-300))
            cos_t = jnp.clip(p_star[:, 3] / p_mag, -1.0, 1.0)
            phia = jnp.arctan2(p_star[:, 2], p_star[:, 1])
            phia = jnp.where(phia < 0, phia + _TWO_PI, phia)
            c0 = self._ang_col[id(node)]
            rv[c0] = (cos_t + 1.0) / 2.0
            rv[c0 + 1] = phia / _TWO_PI
        rv = jnp.stack(rv, axis=1)

        if not self.pdf_active:
            return rv
        if xb_1 is None or xb_2 is None:
            raise PhaseSpaceGeneratorError(
                "invertKinematics_batch with pdf_active requires xb_1 and xb_2")
        extra = self._invert_pdf_columns(E_cm, xb_1, xb_2)
        return jnp.concatenate([rv, extra], axis=1)


# ---------------------------------------------------------------------------
# Multi-channel combination
# ---------------------------------------------------------------------------

def multichannel_integrand(matrix_element, channels, alphas, E_cm,
                           pT_mincut=-1, delR_mincut=-1, rap_maxcut=-1,
                           pdgs=(0, 0), aux=False):
    """Build the alpha-weighted multi-channel integrand over the unit cube.

    ``matrix_element(momenta [B, n_i+n_f, 4]) -> [B]``; ``channels``: list
    of :class:`ResonanceDecayPhasespace` sharing final state and PDF
    config; ``alphas``: channel weights (normalized internally; fixed —
    make them trainable by rebuilding, VERDICT's "alpha fixed first").

    The returned ``g(w) -> [B]`` consumes ``w`` of width
    ``1 + nDimPhaseSpace() [+ 2 if pdf]``: column 0 selects the channel by
    the alpha partition of [0,1] (a flow can warp this column and thereby
    LEARN the channel weights); the remaining columns are the selected
    channel's latent layout.  Each sample carries the standard
    multi-channel weight f(x) C(x) / sum_j alpha_j / w_j^PS(x), which is
    exactly unbiased for any fixed alpha.

    Under jit every channel's kinematics are computed for the whole batch
    and per-sample selected (fixed shapes; n_channels is small).
    """
    alphas = np.asarray(alphas, dtype=np.float64)
    if alphas.ndim != 1 or len(alphas) != len(channels) or np.any(alphas <= 0):
        raise ValueError("alphas must be positive, one per channel")
    alphas = alphas / alphas.sum()
    cum = np.cumsum(alphas)[:-1]  # selector bin edges

    n0 = channels[0].nDimPhaseSpace() + (2 if channels[0].pdf_active else 0)
    for c in channels[1:]:
        nc = c.nDimPhaseSpace() + (2 if c.pdf_active else 0)
        if nc != n0:
            raise ValueError("all channels must share the latent width")

    def g(w):
        dtype = w.dtype
        u_sel = w[:, 0]
        rest = w[:, 1:]
        sel = jnp.zeros(w.shape[:1], jnp.int32)
        for edge in cum:
            sel = sel + (u_sel >= edge).astype(jnp.int32)

        moms, wgts = [], []
        for ch in channels:
            m, wt = ch.generateKinematics_batch(
                E_cm, rest, pT_mincut=pT_mincut, delR_mincut=delR_mincut,
                rap_maxcut=rap_maxcut, pdgs=pdgs)
            moms.append(m)
            wgts.append(wt)
        mom_stack = jnp.stack(moms, axis=0)      # [C, B, P, 4]
        wgt_stack = jnp.stack(wgts, axis=0)      # [C, B]
        onehot = (jnp.arange(len(channels))[:, None] == sel[None, :])
        momenta = jnp.sum(jnp.where(onehot[:, :, None, None],
                                    mom_stack, 0.0), axis=0)
        w_full = jnp.sum(jnp.where(onehot, wgt_stack, 0.0), axis=0)

        # channel densities at the selected point (closed-form)
        ps = jnp.stack([ch.channel_weight_ps(momenta) for ch in channels],
                       axis=0)                   # [C, B]
        ps_sel = jnp.sum(jnp.where(onehot, ps, 0.0), axis=0)
        # common factor C(x) = w_full / ps_sel  (PDF * cuts / flux); the
        # multi-channel weight is f * C / sum_j alpha_j / ps_j
        inv = jnp.where(ps > 0, 1.0 / jnp.where(ps > 0, ps, 1.0), 0.0)
        denom = jnp.sum(jnp.asarray(alphas, dtype)[:, None] * inv, axis=0)
        ok = (ps_sel > 0) & (denom > 0) & (w_full != 0)
        mc_w = jnp.where(
            ok,
            w_full / jnp.where(ok, ps_sel * denom, 1.0),
            0.0)
        val = matrix_element(momenta) * mc_w
        if aux:
            # per-channel PS densities relative to the mixture density:
            # r_j = p_j / q = (1/ps_j) / sum_m alpha_m / ps_m — what the
            # Kleiss-Pittau alpha update consumes (optimize_alphas)
            r = jnp.where((ps > 0) & ok[None, :],
                          inv / jnp.where(denom > 0, denom, 1.0), 0.0)
            return val, {"r": r, "sel": sel}
        return val

    return g


def optimize_alphas(matrix_element, channels, alphas, E_cm, key,
                    n_iter=5, n_samples=1 << 16, damping=1.0,
                    alpha_floor=1e-3, pT_mincut=-1, delR_mincut=-1,
                    rap_maxcut=-1, pdgs=(0, 0)):
    """Kleiss-Pittau multi-channel weight optimization.

    Iterates the classic update (Kleiss & Pittau 1994): sampling the
    alpha-mixture, estimate per-channel second moments
    ``W_i = E_q[(f/q)^2 p_i]`` (per sample: ``val^2 * r_i`` with ``r_i``
    from the aux output above) and set ``alpha_i' ~ alpha_i *
    W_i^(damping/2)``, which converges toward the variance-minimizing
    mixture (all W_i equal at the optimum).  ``alpha_floor`` keeps every
    channel alive (a dead channel can never recover, and the estimator
    stays unbiased for ANY positive alphas — optimization only moves
    variance).

    Returns ``(alphas, history)``: the optimized weights and a list of
    per-iteration dicts (alphas, variance, integral estimate) so callers
    can verify the variance actually fell.  The sampled integral at each
    iteration is unbiased, so the history doubles as a cross-check.
    """
    import jax

    alphas = np.asarray(alphas, dtype=np.float64)
    alphas = alphas / alphas.sum()
    n0 = 1 + channels[0].nDimPhaseSpace() \
        + (2 if channels[0].pdf_active else 0)
    history = []
    for it in range(int(n_iter)):
        g = multichannel_integrand(
            matrix_element, channels, alphas, E_cm, pT_mincut=pT_mincut,
            delR_mincut=delR_mincut, rap_maxcut=rap_maxcut, pdgs=pdgs,
            aux=True)
        key, sub = jax.random.split(key)
        w = jax.random.uniform(sub, (int(n_samples), n0))
        val, ax = jax.jit(g)(w)
        val = np.asarray(val, np.float64)
        r = np.asarray(ax["r"], np.float64)
        W_i = np.mean(val[None, :] ** 2 * r, axis=1)
        history.append({"alphas": alphas.copy(),
                        "variance": float(val.var(ddof=1)),
                        "integral": float(val.mean()),
                        "W_i": W_i.copy()})
        if np.all(W_i <= 0):
            break
        new = alphas * np.power(np.maximum(W_i, 1e-300), damping / 2.0)
        if new.sum() <= 0:
            break
        new = new / new.sum()
        new = np.maximum(new, alpha_floor)
        alphas = new / new.sum()
    return alphas, history
