"""End-to-end collider pipeline: flow -> phase space -> matrix element.

The reference's headline use case (reference README.md:48-58): the flow
samples the unit hypercube, ``generateKinematics_batch`` maps the points
onto collider kinematics with PDF convolution and cuts, and a
MadGraph-style matrix element is evaluated on the momenta.

The process here is Drell-Yan-like (q qbar -> Z -> l+ l-, physical Z width):
a resonance ~1e-4 of the latent range wide.  Narrow peaks are statistically
invisible in small batches (~1 hit per 1e4 points), which is what limits the
CPU-bound reference; the TPU-native answer is million-point batches, which
make the peak a first-class feature of every gradient step.  Swap
``matrix_element`` for a real |M|^2 (e.g. via jax.pure_callback into
MadGraph) to reproduce the reference workflow.

A harder 2->4 double-resonance variant (reference BASELINE configs[3]) is
sketched at the bottom; on that target this framework and the torch
reference plateau identically (measured ESS ratio 0.3x both) when trained
flow-alone — a limitation of the forward-variance training scheme itself,
not the port.  The nf_tpu answer is the decay-tree channel machinery
(phasespace/topology.py): Breit-Wigner-mapped channels lift the 2->4
double-resonance to 11.4% uniform / 39.8% flow ESS (tools/run_2to4.py), and
competing pairings combine via Kleiss-Pittau alphas
(examples/zz_multichannel.py).

Run:  python examples/collider_2to4.py
"""

import os as _os
_os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_tpu")
import sys as _sys
_sys.path.insert(0, _os.path.join(_os.path.dirname(_os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp

from nf_tpu import PWQuadManager, FlatInvertiblePhasespace
from nf_tpu.phasespace import lorentz
from nf_tpu.phasespace.pdf import ToyPDF
from nf_tpu.training import optimizers
from nf_tpu.training.unweight import generate_unweighted

E_COLLIDER = 2000.0
GEV2_TO_PB = 2.56819e-9   # reference experiment_mg.py:62


def matrix_element(momenta):
    """Toy Drell-Yan |M|^2: s-channel Z propagator (physical width)."""
    shat = lorentz.square(momenta[:, 0, :] + momenta[:, 1, :])
    mz2, gz = 91.188 ** 2, 2.4952
    return 1e4 / ((shat - mz2) ** 2 + mz2 * gz ** 2)


def main():
    gen = FlatInvertiblePhasespace(
        [0.0, 0.0], [0.0, 0.0], pdf=ToyPDF(), pdf_active=True, tau=True)
    n_flow = gen.nDimPhaseSpace() + 2
    print(f"n_flow = {n_flow} (3*2-4 phase-space + 2 PDF)")

    def integrand(w):
        momenta, wgt = gen.generateKinematics_batch(
            E_COLLIDER, w, pT_mincut=10.0, rap_maxcut=2.4, pdgs=(2, -2))
        return matrix_element(momenta) * wgt

    NF = PWQuadManager(n_flow=n_flow, seed=0)
    NF.create_model(4, 32, [32] * 2)
    opt = optimizers.adamax(2e-3, 1e-4)
    print("training with 1M-point batches (TPU-sized; the Z peak gets ~100 "
          "hits per batch instead of ~1) ...")
    # loss_mode="kl" (reweighted forward KL, an nf_tpu extension) is far
    # better than the reference's variance loss on narrow resonances:
    # measured 59x-uniform ESS here vs 4x for loss_mode="var"
    sig, sig_err = NF._train_variance_forward_seq(
        integrand, opt, log=False, batch_size=1 << 20, epochs=300,
        mini_batch_size=1 << 20, pretty_progressbar=True, integrate=True,
        preburn_time=40, kill_counter=50, loss_mode="kl")
    print(f"training-loop estimate: sigma = {sig / GEV2_TO_PB:.4e} "
          f"+/- {sig_err / GEV2_TO_PB:.2e} pb")
    print(f"best epoch {NF.best_epoch}")
    sig2, err2 = NF.integrate(integrand, 10, 500_000, combine="mean")
    print(f"post-training integrate: sigma = {sig2 / GEV2_TO_PB:.4f} "
          f"+/- {err2 / GEV2_TO_PB:.4f} pb "
          "(analytic 3.6568 pb, tests/test_physics_validation.py; "
          "67M-point MC self-measurement 3.639 +/- 0.032)")

    # effective-sample-size fraction ESS/N = E[w]^2 / E[w^2] (1 = perfect)
    x_s, jac_s = NF.sample(500_000)
    wf = integrand(x_s) * jac_s
    ess_flow = float(jnp.mean(wf) ** 2 / jnp.mean(wf ** 2))
    wu = integrand(jax.random.uniform(jax.random.PRNGKey(2),
                                      (500_000, n_flow)))
    ess_u = float(jnp.mean(wu) ** 2 / jnp.mean(wu ** 2))
    print(f"effective-sample fraction: flow {ess_flow:.3%} vs uniform "
          f"{ess_u:.3%}  ({ess_flow / max(ess_u, 1e-12):.0f}x better)")

    print("generating unweighted events ...")
    params, bn_state = NF.best_params
    events, eff, n_over = generate_unweighted(
        NF._flow, params, bn_state, integrand, jax.random.PRNGKey(1),
        n_events=2000, wmax_quantile=0.9999, max_batches=60)
    print(f"{events.shape[0]} events, acceptance {eff:.3%}, "
          f"{n_over} over-weight")


# --- harder variant: 2->4 with two resonances and deltaR cuts -------------
# gen = FlatInvertiblePhasespace([0.]*2, [0.]*4, pdf=ToyPDF(),
#                                pdf_active=True, tau=True)   # n_flow = 10
# with matrix_element on s34/s56 (measured r3, tools/run_2to4.py, 300
# epochs x 1M batches on v5e): uniform ESS 0.0042%; the reference's
# variance scheme reaches 0.2x uniform and loss_mode="kl" 0.7x — the
# honest record of the from-scratch method's limit on double resonances.
# The generator-class fix is an analytic channel map
# (nf_tpu.phasespace.mappings): importance-map the resonant latent
# through the known Breit-Wigner BEFORE the phase-space map and train the
# flow on the flattened remainder.  For THIS 2->2 example the one-liner
#   integrand = remap_integrand(integrand, gen.nDimPhaseSpace(),
#                               drell_yan_tau_map(91.188, 2.4952, E_COLLIDER))
# flattens the Z peak so completely that even UNIFORM sampling resolves
# sigma to ~2% at 262k points (tests/test_mappings.py) — compose it with
# the flow for the smooth remainder.

if __name__ == "__main__":
    main()
