"""Bisect the vmapped-ensemble fault ceiling on the attached TPU runtime.

VERDICT r3 weak #4: `MAX_SAMPLE_ROWS_PER_CALL = 320_000` was calibrated to
one observed remote-runtime fault (64 runs x batch 10000) whose root cause
is not host-visible.  This tool separates the candidate limit variables by
probing programs where each is varied with the others held fixed:

  A. total sample rows  = runs x mini_batch   (the current guard variable)
  B. runs               (vmap width alone; rows fixed by shrinking batch)
  C. mini_batch         (row length alone; rows fixed by shrinking runs)
  D. epochs             (scan length; rows fixed)

Each probe is ONE short train_ensemble call in a fresh subprocess, so a
runtime kill cannot take down the caller, and the verdict (ok / fault /
timeout) is read from the exit status.  Results print as a table plus the
inferred binding variable.

WARNING: this intentionally drives the runtime to its failure point —
run it manually, never from the test suite, and expect the TPU tunnel to
need a few seconds to recover after a kill.

Usage (from /root/repo):  python tools/probe_ensemble_ceiling.py [--fast]
"""

import argparse
import json
import subprocess
import sys

WORKER = r"""
import json, sys
import os
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_tpu")
import jax, jax.numpy as jnp
cfg = json.loads(sys.argv[1])
from nf_tpu.flows import factory
from nf_tpu.training import ensemble, optimizers

def camel(x):
    return (jnp.exp(-((x[:, 0] - 0.75) ** 2 + (x[:, 1] - 0.75) ** 2) / 0.04)
            + jnp.exp(-((x[:, 0] - 0.25) ** 2 + (x[:, 1] - 0.25) ** 2) / 0.04))

flow, p0, s0 = None, None, None
def init(k):
    return factory.build_pwquad_flow(k, 2, 2, 4, (3, 3, 3), jnp.float32)
flow, ps, ss = ensemble.stack_ensemble(init, jax.random.PRNGKey(0),
                                       cfg["runs"])
out = ensemble.train_ensemble(
    flow, ps, ss, camel, optimizers.adamax(2e-3), jax.random.PRNGKey(1),
    batch_size=cfg["mini_batch"], epochs=cfg["epochs"],
    mini_batch_size=cfg["mini_batch"], preburn_time=0, kill_counter=1000,
    runs_per_call=None, dtype=jnp.float32)
print("OK", float(jnp.sum(out["best_loss"])))
"""


def probe(runs, mini_batch, epochs, timeout):
    cfg = json.dumps({"runs": runs, "mini_batch": mini_batch,
                      "epochs": epochs})
    try:
        r = subprocess.run([sys.executable, "-c", WORKER, cfg],
                           capture_output=True, text=True, timeout=timeout,
                           cwd="/root/repo")
    except subprocess.TimeoutExpired:
        return "timeout"
    if r.returncode == 0 and "OK" in r.stdout:
        return "ok"
    tail = (r.stderr or r.stdout).strip().splitlines()
    return "fault: " + (tail[-1][:100] if tail else f"rc={r.returncode}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--fast", action="store_true",
                    help="fewer probe points")
    ap.add_argument("--timeout", type=int, default=900,
                    help="per-probe wall clock (remote compiles are slow)")
    args = ap.parse_args()

    # (label, runs, mini_batch, epochs); rows = runs*mini_batch
    probes = [
        ("A rows 160k (known good)", 16, 10_000, 4),
        ("A rows 320k (guard)",      32, 10_000, 4),
        ("A rows 640k (r2 fault)",   64, 10_000, 4),
        ("B runs 256, rows 640k",    256, 2_500, 4),
        ("B runs 4, rows 640k",      4, 160_000, 4),
        ("C batch 640k, 1 run",      1, 640_000, 4),
        ("D rows 320k, epochs 32",   32, 10_000, 32),
    ]
    if not args.fast:
        probes += [
            ("A rows 1.28M", 128, 10_000, 4),
            ("C batch 1.28M, 1 run", 1, 1_280_000, 4),
            ("B runs 128, rows 320k", 128, 2_500, 4),
        ]

    results = {}
    for label, r, mb, ep in probes:
        v = probe(r, mb, ep, args.timeout)
        results[label] = v
        print(f"{label:32s} runs={r:4d} mb={mb:8d} ep={ep:3d} -> {v}",
              flush=True)

    print(json.dumps(results, indent=1))
    faults = {k for k, v in results.items() if v != "ok"}
    if not faults:
        print("# no fault reproduced: ceiling not present on this runtime; "
              "MAX_SAMPLE_ROWS_PER_CALL is conservative only")
    else:
        print("# faulting probes:", sorted(faults))
        print("# compare A/B/C/D rows above to identify the binding "
              "variable (rows vs vmap width vs batch length vs scan depth)")


if __name__ == "__main__":
    main()
