"""2-process ``jax.distributed`` tests (VERDICT r2 item 10 + r4 item 2).

``nf_tpu.parallel.mesh.initialize_distributed`` is the multi-host entry
point.  These tests spawn two real OS processes on localhost (CPU backend,
one device each), bring up the coordinator, build the global mesh, and run

  * a psum across the process boundary (bring-up smoke test), and
  * the ACTUAL production DP machinery — ``make_dp_train_step``,
    ``dp_sample``, ``dp_integrate`` — asserting the cross-process results
    equal the single-process fake-mesh results on an identical 2-device
    mesh (same keys, same shards), so the multi-host path is pinned to the
    extensively-tested single-process semantics.

DCN here is localhost TCP; the collective inventory is exactly the
all-reduce SURVEY.md §2/§5 calls for.
"""

import os
import socket
import subprocess
import sys
import textwrap

import pytest

WORKER = textwrap.dedent("""
    import sys
    import jax
    jax.config.update("jax_platforms", "cpu")

    coord = sys.argv[1]
    pid = int(sys.argv[2])

    from nf_tpu.parallel.mesh import initialize_distributed

    mesh = initialize_distributed(coordinator_address=coord,
                                  num_processes=2, process_id=pid)
    assert jax.process_count() == 2, jax.process_count()
    assert jax.device_count() == 2, jax.device_count()
    assert len(jax.local_devices()) == 1
    assert mesh.devices.size == 2

    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P
    from jax.experimental.shard_map import shard_map

    @jax.jit
    def allsum(x):
        def f(v):
            return jax.lax.psum(v, "dp")
        return shard_map(f, mesh=mesh, in_specs=P("dp"), out_specs=P())(x)

    # each process contributes its local shard of the global [2] array
    local = jnp.asarray([float(pid + 1)])
    garr = jax.make_array_from_single_device_arrays(
        (2,), NamedSharding(mesh, P("dp")),
        [jax.device_put(local, jax.local_devices()[0])])
    total = allsum(garr)
    # psum over both processes: 1 + 2 = 3
    assert float(jax.device_get(total)[0]) == 3.0, total
    print(f"WORKER_{pid}_OK", flush=True)
""")


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_distributed_bringup(tmp_path):
    if os.environ.get("NF_TPU_SKIP_SUBPROCESS"):
        pytest.skip("subprocess tests disabled")
    script = tmp_path / "worker.py"
    script.write_text(WORKER)
    coord = f"127.0.0.1:{_free_port()}"
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("XLA_FLAGS", None)  # 1 local device per process
    env["PYTHONPATH"] = os.path.dirname(os.path.dirname(__file__))
    procs = [subprocess.Popen(
        [sys.executable, str(script), coord, str(pid)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        env=env) for pid in (0, 1)]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=240)
            outs.append(out)
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.fail(f"distributed bring-up timed out; partial output: {outs}")
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out}"
        assert f"WORKER_{pid}_OK" in out, out


DP_WORKER = textwrap.dedent("""
    import sys

    import numpy as np
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

    coord, pid, outdir = sys.argv[1], int(sys.argv[2]), sys.argv[3]

    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from nf_tpu.flows import factory
    from nf_tpu.parallel import (dp_sample, dp_integrate, make_dp_train_step,
                                 initialize_distributed)
    from nf_tpu.training import optimizers

    mesh = initialize_distributed(coordinator_address=coord,
                                  num_processes=2, process_id=pid)
    assert jax.process_count() == 2

    def camel(x):
        return (jnp.exp(-((x[:, 0] - 0.75) ** 2
                          + (x[:, 1] - 0.75) ** 2) / 0.04)
                + jnp.exp(-((x[:, 0] - 0.25) ** 2
                            + (x[:, 1] - 0.25) ** 2) / 0.04))

    flow, params, state = factory.build_pwquad_flow(
        jax.random.PRNGKey(0), 2, 2, 2, (3,), jnp.float64)
    loc = lambda a: np.asarray(jax.device_get(a.addressable_data(0)))

    # which global shard does this process's single device hold?
    mesh_ids = [d.id for d in mesh.devices.flat]
    shard_index = mesh_ids.index(jax.local_devices()[0].id)

    # --- the real DP train step across the process boundary ---
    B = 256
    w_global = jax.random.uniform(jax.random.PRNGKey(1), (B, 2),
                                  dtype=jnp.float64)
    w_local = w_global[shard_index * (B // 2):(shard_index + 1) * (B // 2)]
    w_arr = jax.make_array_from_single_device_arrays(
        (B, 2), NamedSharding(mesh, P("dp")),
        [jax.device_put(w_local, jax.local_devices()[0])])
    opt = optimizers.adamax(1e-3)
    step = make_dp_train_step(flow, camel, mesh, jnp.asarray(2.0), opt)
    p2, bn2, _, loss, integ, err = step(params, state, opt.init(params),
                                        w_arr)

    # --- production sampling + integration endpoints ---
    x, jac = dp_sample(flow, params, state, mesh, 256, seed=7,
                       method="folded", dtype=jnp.float64)
    sig, sig_err = dp_integrate(flow, params, state, camel, mesh,
                                nitn=3, neval=256, seed=5,
                                method="folded", dtype=jnp.float64)

    out = {"loss": loc(loss), "integ": loc(integ), "err": loc(err),
           "x_shard": loc(x), "jac_shard": loc(jac),
           "shard_index": np.int64(shard_index),
           "sig": np.float64(sig), "sig_err": np.float64(sig_err)}
    for i, leaf in enumerate(jax.tree.leaves(p2)):
        out[f"p{i}"] = loc(leaf)
    np.savez(f"{outdir}/worker{pid}.npz", **out)
    print(f"DPWORKER_{pid}_OK", flush=True)
""")


@pytest.mark.slow
def test_two_process_dp_matches_single_process(tmp_path):
    """make_dp_train_step / dp_sample / dp_integrate across a REAL process
    boundary produce the same numbers as the single-process 2-device mesh
    (VERDICT r4 item 2: the distributed path beyond a bare psum)."""
    if os.environ.get("NF_TPU_SKIP_SUBPROCESS"):
        pytest.skip("subprocess tests disabled")
    import numpy as np

    script = tmp_path / "dp_worker.py"
    script.write_text(DP_WORKER)
    coord = f"127.0.0.1:{_free_port()}"
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("XLA_FLAGS", None)  # 1 local device per process
    env["PYTHONPATH"] = os.path.dirname(os.path.dirname(__file__))
    procs = [subprocess.Popen(
        [sys.executable, str(script), coord, str(pid), str(tmp_path)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        env=env) for pid in (0, 1)]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=420)
            outs.append(out)
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.fail(f"2-process DP run timed out; partial output: {outs}")
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out}"
        assert f"DPWORKER_{pid}_OK" in out, out

    # ---- single-process reference on an identical 2-device mesh ----
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh

    from nf_tpu.flows import factory
    from nf_tpu.parallel import dp_sample, dp_integrate, make_dp_train_step
    from nf_tpu.training import optimizers

    def camel(x):
        return (jnp.exp(-((x[:, 0] - 0.75) ** 2
                          + (x[:, 1] - 0.75) ** 2) / 0.04)
                + jnp.exp(-((x[:, 0] - 0.25) ** 2
                            + (x[:, 1] - 0.25) ** 2) / 0.04))

    mesh = Mesh(np.asarray(jax.devices()[:2]), ("dp",))
    flow, params, state = factory.build_pwquad_flow(
        jax.random.PRNGKey(0), 2, 2, 2, (3,), jnp.float64)

    w_global = jax.random.uniform(jax.random.PRNGKey(1), (256, 2),
                                  dtype=jnp.float64)
    opt = optimizers.adamax(1e-3)
    step = make_dp_train_step(flow, camel, mesh, jnp.asarray(2.0), opt)
    p2, bn2, _, loss, integ, err = step(params, state, opt.init(params),
                                        w_global)
    x_ref, jac_ref = dp_sample(flow, params, state, mesh, 256, seed=7,
                               method="folded", dtype=jnp.float64)
    sig_ref, sig_err_ref = dp_integrate(flow, params, state, camel, mesh,
                                        nitn=3, neval=256, seed=5,
                                        method="folded", dtype=jnp.float64)
    x_ref, jac_ref = np.asarray(x_ref), np.asarray(jac_ref)
    p2_leaves = [np.asarray(l) for l in jax.tree.leaves(p2)]

    for pid in (0, 1):
        d = np.load(tmp_path / f"worker{pid}.npz")
        # trained params: gradient all-reduce crossed the process boundary
        for i, ref_leaf in enumerate(p2_leaves):
            np.testing.assert_allclose(d[f"p{i}"], ref_leaf,
                                       rtol=1e-12, atol=1e-15)
        np.testing.assert_allclose(d["loss"], float(loss), rtol=1e-12)
        np.testing.assert_allclose(d["integ"], float(integ), rtol=1e-12)
        np.testing.assert_allclose(d["err"], float(err), rtol=1e-12)
        # sampler: each process's shard equals the single-process slice
        k = int(d["shard_index"])
        np.testing.assert_array_equal(d["x_shard"], x_ref[k * 128:(k + 1) * 128])
        np.testing.assert_array_equal(d["jac_shard"],
                                      jac_ref[k * 128:(k + 1) * 128])
        # integrator: psum'd per-iteration stats + host combination
        np.testing.assert_allclose(d["sig"], sig_ref, rtol=1e-12)
        np.testing.assert_allclose(d["sig_err"], sig_err_ref, rtol=1e-12)
