"""2-process ``jax.distributed`` bring-up smoke test (VERDICT r2 item 10).

``nf_tpu.parallel.mesh.initialize_distributed`` is the multi-host entry
point; nothing in-repo exercised it before r3.  This test spawns two real
OS processes on localhost (CPU backend, one device each), brings up the
coordinator, builds the global mesh, and runs a psum across the process
boundary — the actual collective path a multi-host pod slice would use
(DCN here is localhost TCP).
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
