"""2->4 double-resonance training experiment (BASELINE configs[3] target).

The collider example's footnote records that under the reference's
forward-variance scheme both frameworks plateau at ~0.3x-uniform ESS on
this target.  This script measures what the nf_tpu extensions (reweighted
forward-KL loss + million-point batches + ESS best-model selection) do on
the same target: qqbar -> Z Z -> 4 leptons with physical Z width, ToyPDF
convolution in tau mode, and pT / Delta-R / rapidity cuts.

Run from the repo root:  python - < tools/run_2to4.py
"""

import time

import jax
import jax.numpy as jnp

from nf_tpu import PWQuadManager, FlatInvertiblePhasespace
from nf_tpu.phasespace import lorentz
from nf_tpu.phasespace.pdf import ToyPDF
from nf_tpu.training import optimizers

E_COLLIDER = 2000.0
MZ2, GZ = 91.188 ** 2, 2.4952
GAM2 = MZ2 * GZ ** 2
GEV2_TO_PB = 2.56819e-9


def main():
    gen = FlatInvertiblePhasespace(
        [0.0, 0.0], [0.0, 0.0, 0.0, 0.0], pdf=ToyPDF(), pdf_active=True,
        tau=True)
    n_flow = gen.nDimPhaseSpace() + 2
    print(f"n_flow = {n_flow} (3*4-4 phase-space + 2 PDF)")

    def matrix_element(momenta):
        fin = momenta[:, 2:, :]
        s34 = lorentz.square(fin[:, 0] + fin[:, 1])
        s56 = lorentz.square(fin[:, 2] + fin[:, 3])
        bw34 = 1e4 / ((s34 - MZ2) ** 2 + GAM2)
        bw56 = 1e4 / ((s56 - MZ2) ** 2 + GAM2)
        return bw34 * bw56

    def integrand(w):
        momenta, wgt = gen.generateKinematics_batch(
            E_COLLIDER, w, pT_mincut=20.0, delR_mincut=0.4, rap_maxcut=2.4,
            pdgs=(2, -2))
        return matrix_element(momenta) * wgt

    # uniform baseline ESS
    n_eval = 1 << 20
    wu = integrand(jax.random.uniform(jax.random.PRNGKey(2),
                                      (n_eval, n_flow)))
    ess_u = float(jnp.mean(wu) ** 2 / jnp.mean(wu ** 2))
    print(f"uniform ESS fraction: {ess_u:.5%}")

    for tag, loss_mode, sel in (("kl+ess", "kl", "ess"),
                                ("var (reference scheme)", "var", "loss")):
        NF = PWQuadManager(n_flow=n_flow, seed=0)
        NF.create_model(4, 32, [32] * 2)
        t0 = time.time()
        # mini_batch 2^18 bounds the backward-pass activations (batch-1M
        # single-minibatch OOMs at 24.7G HBO temps for this 10-D 32-bin
        # flow); 4 minibatches average grads, same batch semantics
        NF._train_variance_forward_seq(
            integrand, optimizers.adamax(2e-3, 1e-4), log=False,
            batch_size=1 << 20, epochs=300, mini_batch_size=1 << 18,
            pretty_progressbar=False, integrate=False, preburn_time=40,
            kill_counter=50, loss_mode=loss_mode, select_best_by=sel)
        dt = time.time() - t0
        x_s, jac_s = NF.sample(n_eval, key=jax.random.PRNGKey(5))
        wf = integrand(x_s) * jac_s
        ess = float(jnp.mean(wf) ** 2 / jnp.mean(wf ** 2))
        sig, err = NF.integrate(integrand, 8, 1 << 20, seed=11,
                                combine="mean")
        print(f"[{tag}] train {dt:.0f}s  best_epoch {NF.best_epoch}  "
              f"ESS {ess:.4%} ({ess / max(ess_u, 1e-12):.1f}x uniform)  "
              f"sigma = {sig / GEV2_TO_PB:.4f} +/- {err / GEV2_TO_PB:.4f} pb",
              flush=True)


if __name__ == "__main__":  # `python - < file` also sets __name__ to __main__
    main()
