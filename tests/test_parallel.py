"""Data-parallel training tests on a fake 8-device CPU mesh.

Validates the sharding story of SURVEY.md section 2 ("TPU-native equivalents
to build"): batch sharded over the 'dp' axis, replicated params, collective
reductions inserted by the SPMD partitioner.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nf_tpu import PWQuadManager
from nf_tpu.parallel import make_mesh, data_parallel_sharding
from nf_tpu.training import optimizers
from nf_tpu.flows import model as fmodel


def camel(x):
    return (jnp.exp(-((x[:, 0] - 0.75) ** 2 + (x[:, 1] - 0.75) ** 2) / 0.04)
            + jnp.exp(-((x[:, 0] - 0.25) ** 2 + (x[:, 1] - 0.25) ** 2) / 0.04))


def test_eight_fake_devices_present():
    assert len(jax.devices()) == 8


def test_dp_training_runs_and_matches_single_device():
    mesh = make_mesh()

    NF_dp = PWQuadManager(n_flow=2, seed=0)
    NF_dp.create_model(2, 4, [4] * 2)
    opt = optimizers.adamax(2e-3)
    sig_dp, err_dp = NF_dp._train_variance_forward_seq(
        camel, opt, log=False, batch_size=1024, epochs=5,
        pretty_progressbar=False, mini_batch_size=512, integrate=True,
        preburn_time=0, mesh=mesh, seed=7)

    NF_1 = PWQuadManager(n_flow=2, seed=0)
    NF_1.create_model(2, 4, [4] * 2)
    opt = optimizers.adamax(2e-3)
    sig_1, err_1 = NF_1._train_variance_forward_seq(
        camel, opt, log=False, batch_size=1024, epochs=5,
        pretty_progressbar=False, mini_batch_size=512, integrate=True,
        preburn_time=0, mesh=None, seed=7)

    # same seed, same math — sharding must not change results beyond roundoff
    np.testing.assert_allclose(sig_dp, sig_1, rtol=1e-8)
    np.testing.assert_allclose(err_dp, err_1, rtol=1e-8)


def test_sharded_forward_output_sharding():
    mesh = make_mesh()
    sh = data_parallel_sharding(mesh)

    NF = PWQuadManager(n_flow=2, seed=1)
    NF.create_model(2, 4, [4] * 2)
    params, state = NF._params, NF._bn_state
    flow = NF._flow

    @jax.jit
    def fwd(w):
        w = jax.lax.with_sharding_constraint(w, sh)
        x, jac, _ = fmodel.forward(flow, params, state, w, False)
        return x, jac

    w = jax.device_put(
        jax.random.uniform(jax.random.PRNGKey(0), (1024, 2), dtype=jnp.float64), sh)
    x, jac = fwd(w)
    assert x.shape == (1024, 2)
    # output stays batch-sharded: no unexpected gather to one device
    assert len(x.sharding.device_set) == 8


@pytest.mark.slow
def test_graft_dryrun_multichip():
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "__graft_entry__", "/root/repo/__graft_entry__.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.dryrun_multichip(8)
