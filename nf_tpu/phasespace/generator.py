"""RAMBO-on-diet flat phase-space generator (S. Platzer, arXiv:1308.2922).

TPU-native rewrite of the reference FlatInvertiblePhasespace
(reference PhaseSpace/flat_phase_space_generator.py:57-441).  Differences by
design, same math:

  * the data-dependent bisection ``while`` loop (reference :313-359) becomes a
    fixed-count ``lax.fori_loop`` (62 iterations halve the bracket below
    2^-62 — strictly tighter than the reference's escalation scheme and
    compilable to a single fused XLA loop);
  * the O(n^2) Python deltaR double loop (reference :290-296) becomes a
    broadcast pairwise matrix;
  * per-event tensors replace in-place column writes; everything is jittable
    and batch-sharded along the leading axis;
  * cuts are evaluated in the LAB frame while the returned momenta are the
    COM-frame copy — an intentional reference behavior we reproduce
    (reference :282-308).
"""

from __future__ import annotations

import math

import numpy as np

import jax
import jax.numpy as jnp

from nf_tpu.phasespace import lorentz


class PhaseSpaceGeneratorError(Exception):
    pass


class VirtualPhaseSpaceGenerator:
    """Config holder (reference flat_phase_space_generator.py:23-54)."""

    def __init__(self, initial_masses, final_masses, pdf=None, pdf_active=False, tau=True):
        self.initial_masses = list(initial_masses)
        self.final_masses = list(final_masses)
        self.masses = jnp.asarray(final_masses, dtype=jnp.result_type(float))
        self.n_initial = len(initial_masses)
        self.n_final = len(final_masses)
        self.pdf = pdf
        self.pdf_active = pdf_active
        self.tau = tau

    def generateKinematics(self, E_cm, random_variables):
        raise NotImplementedError

    def nDimPhaseSpace(self):
        """Random numbers needed for the final-state multiplicity
        (reference :48-54); +2 when PDF convolution is active."""
        if self.n_final == 1:
            return 0
        return 3 * self.n_final - 4

    # -- shared PDF-convolution / cuts machinery (used by the flat RAMBO
    #    generator below and the tree-topology channels in topology.py) ----

    absolute_Ecm_min = 1.0      # GeV floor for the partonic E_cm

    def get_pdfQ2(self, pdf, pdg, x, scale2):
        """PDF density f(x) = xfx/x; non-partonic pdgs give 1 (reference :120-137)."""
        if pdf is None:
            return jnp.ones_like(x)
        if pdg not in [21] and abs(pdg) not in range(1, 7):
            return jnp.ones_like(x)
        return pdf.xfxQ2(pdg, x, scale2) / x

    def _convolve_pdf(self, E_cm, rv_full, pdgs):
        """Strip the trailing PDF latents and return
        ``(random_variables, E_cm_eff, xb_1, xb_2, wgt_jac)``
        (reference :161-187; tau and direct-x modes, x<1e-4 zeroing,
        frozen M_Z^2 scale, sub-threshold guard)."""
        dtype = rv_full.dtype
        B = rv_full.shape[0]
        if not self.pdf_active:
            return rv_full, E_cm, jnp.ones((B,), dtype), jnp.ones((B,), dtype), \
                jnp.ones((B,), dtype)

        wgt_jac = jnp.ones((B,), dtype)
        random_variables = rv_full[:, :-2]
        if self.tau:
            # tau = x1*x2, ycm mapping (reference :161-176)
            tot_mass = float(np.sum(np.asarray(self.final_masses)))
            tau_min = (max(tot_mass, self.absolute_Ecm_min) / E_cm) ** 2
            tau, j1 = lorentz.uniform_distr(
                rv_full[:, -2], jnp.full((B,), tau_min, dtype),
                jnp.ones((B,), dtype))
            ycm_min = 0.5 * jnp.log(tau)
            ycm, j2 = lorentz.uniform_distr(rv_full[:, -1], ycm_min, -ycm_min)
            sqrt_tau = jnp.sqrt(tau)
            xb_1 = sqrt_tau * jnp.exp(ycm)
            xb_2 = sqrt_tau * jnp.exp(-ycm)
            E_cm_eff = sqrt_tau * E_cm
            wgt_jac = wgt_jac * j1 * j2
        else:
            # direct Bjorken x sampling (reference :177-182)
            xb_1 = rv_full[:, -1]
            xb_2 = rv_full[:, -2]
            E_cm_eff = jnp.sqrt(xb_1 * xb_2) * E_cm
        # Sub-threshold guard (improvement over the reference, which
        # produces NaN weights when the partonic E_cm falls below the
        # final-state mass sum in direct-x mode): zero the weight and
        # clamp the kinematics so momenta stay finite.
        tot_mass_f = float(np.sum(np.asarray(self.final_masses)))
        thresh = max(tot_mass_f, self.absolute_Ecm_min)
        ok = (E_cm_eff >= thresh).astype(dtype)
        E_cm_eff = jnp.maximum(E_cm_eff, jnp.asarray(thresh, dtype))
        wgt_jac = wgt_jac * ok
        scale2 = jnp.full((B,), 91.188 ** 2, dtype)  # frozen M_Z^2 (reference :184)
        x_cut = jnp.where((xb_1 < 1e-4) | (xb_2 < 1e-4), 0.0, 1.0).astype(dtype)
        wgt_jac = wgt_jac * self.get_pdfQ2(self.pdf, pdgs[0], xb_1, scale2) \
            * self.get_pdfQ2(self.pdf, pdgs[1], xb_2, scale2) * x_cut
        return random_variables, E_cm_eff, xb_1, xb_2, wgt_jac

    def _invert_pdf_columns(self, E_cm, xb_1, xb_2):
        """Reconstruct the trailing two PDF latent columns from Bjorken x's
        — the inverse of :meth:`_convolve_pdf`'s stripping (tau/ycm or
        direct-x layout).  Shared by the ``invertKinematics_batch``
        implementations of the flat and tree generators."""
        if self.tau:
            tot_mass = float(np.sum(np.asarray(self.final_masses)))
            tau_min = (max(tot_mass, self.absolute_Ecm_min) / E_cm) ** 2
            tau = xb_1 * xb_2
            r_tau = (tau - tau_min) / (1.0 - tau_min)
            ycm = 0.5 * jnp.log(xb_1 / xb_2)
            ycm_min = 0.5 * jnp.log(tau)
            r_ycm = (ycm - ycm_min) / (-2.0 * ycm_min)
            return jnp.stack([r_tau, r_ycm], axis=1)
        return jnp.stack([xb_2, xb_1], axis=1)

    def _cut_factor(self, momenta_com, xb_1, xb_2, pT_mincut, delR_mincut,
                    rap_maxcut):
        """0/1 per-event cut factor, evaluated in the LAB frame
        (reference :282-301; the returned momenta stay COM)."""
        B = momenta_com.shape[0]
        dtype = momenta_com.dtype
        momenta_lab = lorentz.boost_to_lab_frame(momenta_com, xb_1, xb_2)
        fin = momenta_lab[:, self.n_initial:, :]

        factor = jnp.ones((B,), dtype)
        pt_min = jnp.min(jnp.sqrt(fin[:, :, 1] ** 2 + fin[:, :, 2] ** 2), axis=1)
        factor = jnp.where(pt_min < pT_mincut, 0.0, factor)

        if self.n_final > 1 and delR_mincut > 0:
            dr = lorentz.delta_r(fin[:, :, None, :], fin[:, None, :, :])
            ii, jj = np.tril_indices(self.n_final, k=-1)
            bad = jnp.any(jnp.abs(dr[:, ii, jj]) < delR_mincut, axis=1)
            factor = jnp.where(bad, 0.0, factor)

        if rap_maxcut > 0:
            max_rap = jnp.abs(jnp.max(lorentz.pseudo_rapidity(fin), axis=1))
            factor = jnp.where(rap_maxcut < max_rap, 0.0, factor)
        return factor

    @staticmethod
    def _sanitize(momenta_com, weight):
        """Zero numerically-unresolvable events instead of letting NaN/inf
        poison the batch (see generateKinematics_batch's final sanitation
        note)."""
        bad = jnp.any(~jnp.isfinite(momenta_com), axis=(1, 2)) \
            | ~jnp.isfinite(weight)
        weight = jnp.where(bad, 0.0, weight)
        momenta_com = jnp.where(bad[:, None, None], 0.0,
                                jnp.nan_to_num(momenta_com, posinf=0.0,
                                               neginf=0.0))
        return momenta_com, weight

    def setInitialStateMomenta_batch(self, E_cm, batch, dtype):
        """Beam momenta [B, 2, 4] along z (reference :408-441)."""
        if self.n_initial != 2:
            raise PhaseSpaceGeneratorError(
                "This PS generator only supports 2 initial states")
        E = jnp.broadcast_to(jnp.asarray(E_cm, dtype), (batch,))
        zeros = jnp.zeros_like(E)
        m1, m2 = self.initial_masses
        if m1 == 0.0 or m2 == 0.0:
            p1 = jnp.stack([E / 2, zeros, zeros, E / 2], axis=-1)
            p2 = jnp.stack([E / 2, zeros, zeros, -E / 2], axis=-1)
        else:
            M1sq, M2sq = m1 ** 2, m2 ** 2
            E1 = (E ** 2 + M1sq - M2sq) / E
            E2 = (E ** 2 - M1sq + M2sq) / E
            Z = jnp.sqrt(E ** 4 - 2 * E ** 2 * M1sq - 2 * E ** 2 * M2sq
                         + M1sq ** 2 - 2 * M1sq * M2sq + M2sq ** 2) / E
            p1 = jnp.stack([E1 / 2, zeros, zeros, Z / 2], axis=-1)
            p2 = jnp.stack([E2 / 2, zeros, zeros, -Z / 2], axis=-1)
        return jnp.stack([p1, p2], axis=1)


class FlatInvertiblePhasespace(VirtualPhaseSpaceGenerator):
    """Flat (uniform-weight) invertible 2->N phase-space map."""

    epsilon_border = 1e-10      # kept for API parity (unused in reference too)

    def __init__(self, *args, **opts):
        super().__init__(*args, **opts)
        if self.n_initial == 1:
            raise PhaseSpaceGeneratorError(
                "This basic generator does not support decay topologies.")
        if self.n_initial > 2:
            raise PhaseSpaceGeneratorError(
                "This basic generator does not support more than 2 incoming particles.")

    # -- closed forms -------------------------------------------------------

    @staticmethod
    def get_flatWeights(E_cm, n):
        """Massless n-body phase-space volume
        Vol(E_cm, n) = (2pi)^(4-3n) (pi/2)^(n-1) (E_cm^2)^(n-2) / ((n-1)!(n-2)!)
        (reference :81-97)."""
        if n == 1:
            return 1.0
        norm = math.pow(2 * math.pi, 4 - 3 * n) * math.pow(math.pi / 2.0, n - 1) \
            / (math.factorial(n - 1) * math.factorial(n - 2))
        return norm * (E_cm ** 2) ** (n - 2)

    @staticmethod
    def massless_map(x, exp):
        """v(u) = u^exp ((exp+1) - exp u) — the flat intermediate-mass CDF
        (reference :101-103)."""
        return (x ** exp) * ((exp + 1) - exp * x)

    @staticmethod
    def rho(M, N, m):
        """sqrt((M^2-(N+m)^2)(M^2-(N-m)^2)) / (8 M^2) (reference :107-113).

        The product is clamped at zero: rounding can push it fractionally
        negative when N+m approaches M (reference NaNs there).
        """
        Msqr = M ** 2
        prod = (Msqr - (N + m) ** 2) * (Msqr - (N - m) ** 2)
        return jnp.maximum(prod, 0.0) ** 0.5 / (8.0 * Msqr)

    # -- intermediate masses -------------------------------------------------

    def bisect_vec_batch(self, v, n_iter: int = 62):
        """Solve v = u^exp((exp+1) - exp u) for u in [0,1], exp descending
        from n_final-2 (reference :313-359).  Fixed-count bisection: the
        bracket halves every iteration, so 62 iterations reach full f64
        precision — no data-dependent exit needed under jit."""
        if v.shape[1] == 0:
            return v
        exp = jnp.arange(self.n_final - 2, 0, -1, dtype=v.dtype)[None, :]

        def body(_, bounds):
            left, right = bounds
            mid = 0.5 * (left + right)
            go_right = self.massless_map(mid, exp) < v
            return jnp.where(go_right, mid, left), jnp.where(go_right, right, mid)

        left, right = jax.lax.fori_loop(
            0, n_iter, body, (jnp.zeros_like(v), jnp.ones_like(v)))
        return 0.5 * (left + right)

    def generateIntermediatesMassless_batch(self, M0, random_variables):
        """Intermediate masses for massless finals (reference :363-375).

        ``M0``: [B] total available mass.  Returns M [B, n_final-1].
        """
        u = self.bisect_vec_batch(random_variables[:, : self.n_final - 2])
        cols = [M0]
        for i in range(2, self.n_final):
            cols.append(jnp.sqrt(u[:, i - 2] * cols[i - 2] ** 2))
        return jnp.stack(cols, axis=1)

    def generateIntermediatesMassive_batch(self, E_cm, random_variables):
        """Intermediate masses + weight for massive finals (reference :379-406).

        Returns (M [B, n_final-1] with final masses re-added, weight [B]).
        """
        masses = self.masses.astype(random_variables.dtype)
        B = random_variables.shape[0]
        M0 = jnp.broadcast_to(jnp.asarray(E_cm, random_variables.dtype), (B,)) \
            - jnp.sum(masses)
        K = self.generateIntermediatesMassless_batch(M0, random_variables)
        weight = jnp.broadcast_to(
            jnp.asarray(self.get_flatWeights(E_cm, self.n_final),
                        random_variables.dtype), (B,))

        # suffix sums of final masses: masses_sum[i] = m_i + ... + m_{n-1}
        masses_sum = jnp.cumsum(masses[::-1])[::-1]
        M = K + masses_sum[: self.n_final - 1][None, :]

        nf = self.n_final
        weight = weight * 8.0 * self.rho(M[:, nf - 2], masses[nf - 1], masses[nf - 2])
        if nf > 2:
            # rho_K == 0 marks a degenerate (measure-zero) intermediate-mass
            # point; the reference produces 0/0 = NaN there — weight it zero
            rho_m = self.rho(M[:, : nf - 2], M[:, 1:], masses[: nf - 2][None, :])
            rho_k = self.rho(K[:, : nf - 2], K[:, 1:], 0.0)
            ratio = jnp.where(rho_k > 0,
                              rho_m / jnp.where(rho_k > 0, rho_k, 1.0), 0.0)
            weight = weight * jnp.prod(
                ratio * (M[:, 1: nf - 1] / K[:, 1: nf - 1]), axis=-1)
        weight = weight * (K[:, 0] / M[:, 0]) ** (2 * nf - 4)
        return M, weight

    # -- the main map --------------------------------------------------------

    def generateKinematics_batch(self, E_cm, random_variables_full,
                                 pT_mincut=-1, delR_mincut=-1, rap_maxcut=-1,
                                 pdgs=(0, 0)):
        """Map latent points to 2 -> n_final kinematics with cuts and PDFs.

        Returns ``(momenta [B, n_initial+n_final, 4] in the COM frame,
        weight [B])`` where weight = PS-weight * PDF * cuts / (2 s_hat)
        (reference :139-308).  Fully jittable; ``pT_mincut``/``delR_mincut``/
        ``rap_maxcut``/``pdgs`` are static configuration.
        """
        rv_full = random_variables_full
        dtype = rv_full.dtype
        B = rv_full.shape[0]
        masses = self.masses.astype(dtype)
        collider_energy = E_cm

        random_variables, E_cm_eff, xb_1, xb_2, wgt_jac = \
            self._convolve_pdf(E_cm, rv_full, pdgs)

        assert random_variables.shape[1] == self.nDimPhaseSpace()

        # intermediate masses and flat weight
        M, weight = self.generateIntermediatesMassive_batch(E_cm_eff, random_variables)
        weight = weight * wgt_jac

        # append the last final mass: M_full = (M_0..M_{n-2}, m_{n-1})
        M_full = jnp.concatenate(
            [M, jnp.broadcast_to(masses[-1], (B, 1))], axis=-1)

        # two-body decay chain (reference :223-278)
        q = 4.0 * M_full[:, :-1] * self.rho(M_full[:, :-1], M_full[:, 1:], masses[:-1][None, :])
        rnd = random_variables[:, self.n_final - 2: 3 * self.n_final - 4]
        cos_theta = 2.0 * rnd[:, 0::2] - 1.0
        # clamped sqrt args: hardware cos approximations can return values
        # fractionally outside [-1, 1] in f32 (reference would emit NaN)
        sin_theta = jnp.sqrt(jnp.maximum(1.0 - cos_theta ** 2, 0.0))
        phia = 2.0 * math.pi * rnd[:, 1::2]
        cos_phi = jnp.cos(phia)
        sin_phi = jnp.where(phia > math.pi, -1.0, 1.0) \
            * jnp.sqrt(jnp.maximum(1.0 - cos_phi ** 2, 0.0))

        a = q * sin_theta * cos_phi
        b = q * sin_theta * sin_phi
        c = q * cos_theta

        Q = jnp.concatenate(
            [M_full[:, 0:1], jnp.zeros((B, 3), dtype)], axis=-1)
        finals = []
        for i in range(self.n_final - 1):
            p2 = jnp.stack([jnp.zeros((B,), dtype), a[:, i], b[:, i], c[:, i]], axis=-1)
            p2 = lorentz.set_square(p2, masses[i] ** 2)
            p2 = lorentz.boost(p2, lorentz.boost_vector(Q))
            p2 = lorentz.set_square(p2, masses[i] ** 2)
            finals.append(p2)
            Q = lorentz.set_square(Q - p2, M_full[:, i + 1] ** 2)
        finals.append(Q)  # last particle takes the remaining momentum

        initial = self.setInitialStateMomenta_batch(E_cm_eff, B, dtype)
        momenta_com = jnp.concatenate(
            [initial, jnp.stack(finals, axis=1)], axis=1)

        # cuts are applied in the LAB frame (reference :282-301)
        weight = weight * self._cut_factor(momenta_com, xb_1, xb_2,
                                           pT_mincut, delR_mincut, rap_maxcut)
        shat = xb_1 * xb_2 * collider_energy ** 2
        weight = weight / (2.0 * shat)

        # Final sanitation: ~1e-6 of f32 events hit numerically unresolvable
        # kinematics (intermediate masses below float precision make the
        # decay-chain boosts beta -> 1 and overflow).  The reference lets the
        # resulting NaN/inf poison the whole batch — fatal for training,
        # where one NaN gradient destroys the optimizer state.  Zero those
        # events instead (measure-zero bias, orders of magnitude below MC
        # error); f64 is effectively unaffected.
        return self._sanitize(momenta_com, weight)

    # -- the inverse map ------------------------------------------------------

    def invertKinematics_batch(self, E_cm, momenta, xb_1=None, xb_2=None):
        """Recover the latent random variables from COM-frame kinematics.

        Inverse of :meth:`generateKinematics_batch` (the reference lists
        phase-space inversion as an unimplemented TODO, reference
        README.md:69).  ``momenta`` is ``[B, n_initial+n_final, 4]`` in the
        COM frame (what the forward map returns).  When ``pdf_active`` the
        Bjorken fractions must be supplied (they are not recoverable from
        COM-frame momenta alone) and the trailing two latent columns are
        reconstructed from them.  Returns ``rv_full`` with the same layout
        the forward map consumes.
        """
        fin = momenta[:, self.n_initial:, :]
        dtype = momenta.dtype
        B = momenta.shape[0]
        masses = self.masses.astype(dtype)
        nf = self.n_final

        # intermediate masses from the decay-chain remainders
        Qs = [jnp.sum(fin[:, i:, :], axis=1) for i in range(nf - 1)]
        M = jnp.stack([jnp.sqrt(jnp.maximum(lorentz.square(Q), 0.0))
                       for Q in Qs], axis=1)          # [B, nf-1]

        # mass variables: invert K_i = sqrt(u_{i-1}) K_{i-1}
        masses_sum = jnp.cumsum(masses[::-1])[::-1]
        K = M - masses_sum[: nf - 1][None, :]
        rv_mass = []
        for i in range(nf - 2):
            u = (K[:, i + 1] / K[:, i]) ** 2
            exp = float(nf - 2 - i)
            rv_mass.append(self.massless_map(u, exp))

        # angles: boost each final into its parent's rest frame
        rv_ang = []
        for i in range(nf - 1):
            beta = lorentz.boost_vector(Qs[i])
            p_star = lorentz.boost(fin[:, i, :], -beta)
            p_mag = jnp.sqrt(jnp.sum(p_star[:, 1:] ** 2, axis=-1))
            cos_t = jnp.clip(p_star[:, 3] / p_mag, -1.0, 1.0)
            phia = jnp.arctan2(p_star[:, 2], p_star[:, 1])
            phia = jnp.where(phia < 0, phia + 2.0 * math.pi, phia)
            rv_ang.append((cos_t + 1.0) / 2.0)
            rv_ang.append(phia / (2.0 * math.pi))

        rv = jnp.stack(rv_mass + rv_ang, axis=1) if (rv_mass or rv_ang) \
            else jnp.zeros((B, 0), dtype)

        if not self.pdf_active:
            return rv

        if xb_1 is None or xb_2 is None:
            raise PhaseSpaceGeneratorError(
                "invertKinematics_batch with pdf_active requires xb_1 and xb_2")
        extra = self._invert_pdf_columns(E_cm, xb_1, xb_2)
        return jnp.concatenate([rv, extra], axis=1)
