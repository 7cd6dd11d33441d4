"""Channel-map + flow composition demo (measured r3 on TPU v5e).

Drell-Yan 2->2 with physical Z width, kl loss, 200 epochs x 262k batches:

    uniform, plain integrand:   ESS 0.0143%
    uniform, BW-mapped tau:     ESS 1.08%    (76x from the map alone)
    flow, plain integrand:      ESS 0.574%   sigma 3.6611 +/- 0.0235 pb
    flow + BW-mapped tau:       ESS 29.5%    sigma 3.6572 +/- 0.0028 pb

The composition is the point: the analytic map flattens the resonance
exactly, the flow learns the smooth PDF/angular remainder, and the final
sigma lands 0.01% from the independent scipy value (3.6568 pb,
tests/test_physics_validation.py) with 8x smaller error than the
flow-alone run.  Run from the repo root:  python - < tools/mapped_dy_demo.py
"""

import time
import jax, jax.numpy as jnp
from nf_tpu import PWQuadManager, FlatInvertiblePhasespace
from nf_tpu.phasespace import lorentz
from nf_tpu.phasespace.pdf import ToyPDF
from nf_tpu.phasespace.mappings import remap_integrand, drell_yan_tau_map
from nf_tpu.training import optimizers

E_COLLIDER = 2000.0
GEV2_TO_PB = 2.56819e-9
MZ2, GZ = 91.188 ** 2, 2.4952

gen = FlatInvertiblePhasespace([0.,0.], [0.,0.], pdf=ToyPDF(), pdf_active=True, tau=True)
n_flow = gen.nDimPhaseSpace() + 2

def integrand(w):
    momenta, wgt = gen.generateKinematics_batch(
        E_COLLIDER, w, pT_mincut=10.0, rap_maxcut=2.4, pdgs=(2, -2))
    shat = lorentz.square(momenta[:, 0, :] + momenta[:, 1, :])
    return 1e4 / ((shat - MZ2) ** 2 + MZ2 * GZ ** 2) * wgt

mapped = remap_integrand(integrand, gen.nDimPhaseSpace(),
                         drell_yan_tau_map(91.188, GZ, E_COLLIDER))

n_eval = 1 << 19
key = jax.random.PRNGKey(2)
for tag, f in (("plain", integrand), ("mapped", mapped)):
    wu = f(jax.random.uniform(key, (n_eval, n_flow)))
    ess = float(jnp.mean(wu) ** 2 / jnp.mean(wu ** 2))
    print(f"uniform ESS [{tag}]: {ess:.4%}", flush=True)

for tag, f in (("plain+kl flow", integrand), ("mapped+kl flow", mapped)):
    NF = PWQuadManager(n_flow=n_flow, seed=0)
    NF.create_model(4, 32, [32] * 2)
    t0 = time.time()
    NF._train_variance_forward_seq(
        f, optimizers.adamax(2e-3, 1e-4), log=False, batch_size=1 << 18,
        epochs=200, mini_batch_size=1 << 18, pretty_progressbar=False,
        integrate=False, preburn_time=30, kill_counter=50, loss_mode="kl",
        select_best_by="ess")
    dt = time.time() - t0
    x_s, jac_s = NF.sample(n_eval, key=jax.random.PRNGKey(5))
    wf = f(x_s) * jac_s
    ess = float(jnp.mean(wf) ** 2 / jnp.mean(wf ** 2))
    sig, err = NF.integrate(f, 8, 1 << 19, seed=11, combine="mean")
    print(f"[{tag}] train {dt:.0f}s  ESS {ess:.3%}  "
          f"sigma = {sig / GEV2_TO_PB:.4f} +/- {err / GEV2_TO_PB:.4f} pb",
          flush=True)
