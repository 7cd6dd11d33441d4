"""Tests for the jax-native VEGAS baseline, the experiment harness workers,
and the PDF classes."""

import math
import queue

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nf_tpu.training.vegas import VegasIntegrator
from nf_tpu.phasespace.pdf import ToyPDF, GridPDF, CallbackPDF


def gauss2(x):
    return jnp.exp(-jnp.sum((x - 0.5) ** 2, axis=-1) / 0.02)


def gauss2_exact():
    # integral of exp(-(x-0.5)^2/a) over [0,1] = sqrt(a*pi)*erf(0.5/sqrt(a))
    a = 0.02
    per_dim = math.sqrt(a * math.pi) * math.erf(0.5 / math.sqrt(a))
    return per_dim ** 2


def test_vegas_converges_on_gaussian():
    integ = VegasIntegrator(2, n_bins=40, seed=0)
    mean, sdev = integ.run(gauss2, nitn=12, neval=8000)
    exact = gauss2_exact()
    assert abs(mean - exact) < max(5 * sdev, 0.02 * exact)
    # the adapted map concentrates samples: importance-weighted variance
    # must beat uniform sampling variance
    x, jac = integ.sample(20000)
    fw = np.asarray(gauss2(x) * jac)
    key = jax.random.PRNGKey(1)
    u = jax.random.uniform(key, (20000, 2), dtype=x.dtype)
    fu = np.asarray(gauss2(u))
    assert fw.var() < fu.var()


def test_vegas_map_jacobian_is_unit_mean():
    integ = VegasIntegrator(3, n_bins=20, seed=1)
    integ.run(lambda x: jnp.ones(x.shape[0]), nitn=3, neval=2000)
    x, jac = integ.sample(50000)
    assert np.all((np.asarray(x) >= 0) & (np.asarray(x) <= 1))
    np.testing.assert_allclose(float(np.mean(np.asarray(jac))), 1.0, rtol=0.05)


def test_pro_worker_end_to_end(tmp_path):
    from nf_tpu.utils.experiment import pro

    q = queue.Queue()
    para = {
        "n_flow": 2, "n_bins": 4, "NN_width": 4, "NN_length": 2,
        "dev": 0, "lr": 2e-3, "weight_decay": 1e-4, "var_n": 2000,
        "batch_size": 500, "pt": 0, "q": q, "id": 7, "f": gauss2,
        "logdir": str(tmp_path), "log": False, "seed": 0,
    }
    import nf_tpu.utils.experiment as exp
    old = exp.EPOCH_LENGTH
    exp.EPOCH_LENGTH = 10  # keep the test fast
    try:
        pro(para)
    finally:
        exp.EPOCH_LENGTH = old
    result = q.get_nowait()
    assert result[8] == "NIS"
    assert result[10] == 7          # internal id
    assert np.isfinite(result[11])  # sigma (in "pb")
    assert (tmp_path / "7" / "log.txt").exists()


def test_prov_worker_end_to_end(tmp_path):
    from nf_tpu.utils import experiment as exp

    q = queue.Queue()
    para = {
        "n_flow": 2, "n_bins": 4, "NN_width": 4, "NN_length": 2,
        "dev": 0, "lr": 2e-3, "weight_decay": 1e-4, "var_n": 2000,
        "batch_size": 500, "pt": 0, "q": q, "id": 3, "f": gauss2,
        "logdir": str(tmp_path), "log": False, "seed": 0,
    }
    exp.prov(para)
    result = q.get_nowait()
    assert result[8] == "VEGAS"
    sig_pb = result[11]
    exact_pb = gauss2_exact() / exp.GEV2_TO_PB
    assert abs(sig_pb - exact_pb) < 0.05 * exact_pb


def test_grid_pdf_matches_tabulated_function():
    toy = ToyPDF()
    xs = np.geomspace(1e-5, 1 - 1e-6, 200)
    q2s = np.geomspace(1.0, 1e6, 16)
    grids = {}
    for pdg in (21, 2):
        g = np.empty((200, 16))
        for i, x in enumerate(xs):
            g[i, :] = float(toy.xfxQ2(pdg, jnp.asarray(x), 1.0))
        grids[pdg] = g
    gpdf = GridPDF(xs, q2s, grids)
    x_test = jnp.asarray(np.geomspace(1e-4, 0.9, 64))
    q2_test = jnp.full((64,), 8315.0)
    got = np.asarray(gpdf.xfxQ2(21, x_test, q2_test))
    want = np.asarray(toy.xfxQ2(21, x_test, q2_test))
    np.testing.assert_allclose(got, want, rtol=0.02, atol=1e-3)


def test_callback_pdf_works_under_jit():
    class HostPDF:
        def xfxQ2(self, pdg, x, q2):
            return 2.0 * x
    cpdf = CallbackPDF(HostPDF())

    @jax.jit
    def run(x):
        return cpdf.xfxQ2(2, x, jnp.full(x.shape, 100.0))

    x = jnp.asarray([0.1, 0.2, 0.5])
    np.testing.assert_allclose(np.asarray(run(x)), [0.2, 0.4, 1.0], rtol=1e-6)


def test_run_sweep_collects_results(tmp_path):
    import nf_tpu.utils.experiment as exp
    from nf_tpu.utils.sweep import run_sweep
    from nf_tpu.utils.experiment import prov

    base = {
        "n_flow": 2, "n_bins": 4, "NN_width": 4, "NN_length": 2,
        "dev": 0, "lr": 2e-3, "weight_decay": 1e-4, "var_n": 1000,
        "batch_size": 400, "pt": 0, "f": gauss2,
        "logdir": str(tmp_path), "log": False, "seed": 0,
    }
    old = exp.EPOCH_LENGTH
    exp.EPOCH_LENGTH = 5
    try:
        results = run_sweep([
            dict(base, id=1),
            dict(base, id=2, worker=prov),
        ])
    finally:
        exp.EPOCH_LENGTH = old
    methods = sorted(r["method"] for r in results)
    assert methods == ["NIS", "VEGAS"]
    for r in results:
        assert r["id"] in (1, 2)
        assert "sigma_pb" in r


def test_grid_pdf_from_lhapdf_interface():
    """GridPDF.from_lhapdf works with any object exposing xfxQ2 (here the
    ToyPDF standing in for a real LHAPDF member)."""
    from nf_tpu.phasespace.pdf import GridPDF

    class HostToy:
        def xfxQ2(self, pdg, x, q2):
            return 2.0 * x * (1.0 - x)

    # geomspace x-grid is coarse near x~1 at low n_x; use enough points
    gpdf = GridPDF.from_lhapdf(HostToy(), pdgs=[21], n_x=512, n_q2=4)
    x = jnp.asarray([0.01, 0.1, 0.5, 0.9])
    got = np.asarray(gpdf.xfxQ2(21, x, jnp.full(4, 100.0)))
    want = 2.0 * np.asarray(x) * (1 - np.asarray(x))
    np.testing.assert_allclose(got, want, rtol=0.05, atol=1e-3)


def test_profiling_benchmark_and_timer():
    from nf_tpu.utils.profiling import Timer, benchmark

    f = jax.jit(lambda x: (x * 2).sum())
    x = jnp.ones(1000)
    dt = benchmark(f, x, reps=3, warmup=1)
    assert dt > 0
    with Timer() as t:
        t.block_on(f(x))
    assert t.seconds > 0


def test_run_sweep_thread_pool(tmp_path):
    """mode='thread' fans CPU-bound VEGAS baseline workers out over a pool
    (the reference's multiprocessing fan-out, experiment_mg.py:85-87) and
    collects the same queue tuples."""
    from nf_tpu.utils.sweep import run_sweep
    from nf_tpu.utils.experiment import prov

    base = {
        "n_flow": 2, "n_bins": 4, "NN_width": 4, "NN_length": 2,
        "dev": 0, "lr": 2e-3, "weight_decay": 1e-4, "var_n": 1000,
        "batch_size": 400, "pt": 0, "f": gauss2,
        "logdir": str(tmp_path), "log": False, "seed": 0,
    }
    results = run_sweep(
        [dict(base, id=i, worker=prov) for i in range(3)],
        mode="thread", max_workers=3)
    assert len(results) == 3
    assert sorted(r["id"] for r in results) == [0, 1, 2]
    exact = gauss2_exact()
    for r in results:
        assert r["method"] == "VEGAS"
        assert abs(r["sigma_pb"] * 2.56819e-9 - exact) < 0.1 * exact


def test_run_sweep_rejects_unknown_mode():
    from nf_tpu.utils.sweep import run_sweep
    import pytest as _pytest
    with _pytest.raises(ValueError):
        run_sweep([], mode="fork")


def test_pro_worker_optional_knobs(tmp_path):
    """Optional para keys (epochs/loss_mode/select_best_by) reach the
    trainer; absent keys keep the reference schema."""
    import queue
    import nf_tpu.utils.experiment as exp

    q = queue.Queue()
    para = {
        "n_flow": 2, "n_bins": 4, "NN_width": 4, "NN_length": 2,
        "dev": 0, "lr": 2e-3, "weight_decay": 1e-4, "var_n": 500,
        "batch_size": 400, "pt": 0, "f": gauss2, "q": q, "id": 9,
        "logdir": str(tmp_path), "log": False, "seed": 0,
        "epochs": 6, "loss_mode": "kl", "select_best_by": "ess",
        "kill_counter": 1000,
    }
    exp.pro(para)
    tup = q.get_nowait()
    assert tup[8] == "NIS"
    assert np.isfinite(tup[11])  # sigma
    # epochs override honored: func_count = 2*batch*n_flow + epochs*batch
    assert tup[3] == 2 * 400 * 2 + 6 * 400


@pytest.mark.slow
def test_run_sweep_process_mode(tmp_path, monkeypatch):
    """mode='process' reproduces the reference's actual fan-out mechanism
    (OS processes + a multiprocessing queue, experiment_mg.py:85-87).
    The integrand lives in a real module so it pickles across spawn."""
    import os
    import sys
    from nf_tpu.utils.sweep import run_sweep
    from nf_tpu.utils.experiment import prov

    mod = tmp_path / "sweep_integrand_mod.py"
    mod.write_text(
        "import jax.numpy as jnp\n"
        "def gauss2(x):\n"
        "    return jnp.exp(-((x[:, 0] - 0.5) ** 2"
        " + (x[:, 1] - 0.5) ** 2) / 0.02)\n")
    monkeypatch.syspath_prepend(str(tmp_path))
    monkeypatch.setenv(
        "PYTHONPATH",
        os.pathsep.join([str(tmp_path),
                         os.path.dirname(os.path.dirname(
                             os.path.abspath(__file__))),
                         os.environ.get("PYTHONPATH", "")]))
    import importlib
    sim = importlib.import_module("sweep_integrand_mod")

    base = {
        "n_flow": 2, "n_bins": 4, "NN_width": 4, "NN_length": 2,
        "dev": 0, "lr": 2e-3, "weight_decay": 1e-4, "var_n": 1000,
        "batch_size": 400, "pt": 0, "f": sim.gauss2,
        "logdir": str(tmp_path), "log": False, "seed": 0,
        "worker": prov,
    }
    results = run_sweep([dict(base, id=1), dict(base, id=2)],
                        mode="process", max_workers=1)
    assert len(results) == 2
    assert sorted(r["id"] for r in results) == [1, 2]
    for r in results:
        assert r["method"] == "VEGAS"
        assert "sigma_pb" in r
