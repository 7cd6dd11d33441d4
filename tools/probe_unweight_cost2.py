"""Isolate why the compacted multichannel_unweight step is slow on TPU.

probe_unweight_cost.py predicted ~60 ms/batch for a compacted grouped
step; the real sweep measured 2.4 s/batch.  Time each ingredient of the
real step — accept threshold, permutation, nonzero, row gather, lax.map
wrapping — separately, device-only (block_until_ready, no host pulls
except the final tuple).
"""

import os
import pickle
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_tpu")
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import jax
import jax.numpy as jnp
import numpy as np

from examples.zz_multichannel import CUTS, E_COLLIDER, matrix_element
from nf_tpu.training import multichannel as mcl
from tools.probe_unweight_cost import build_channels

B = 1 << 15
CAP = 2048


def main():
    channels = build_channels()
    flows, ps, ss = mcl.build_channel_flows(
        jax.random.PRNGKey(0), channels, 4, 16, [32] * 2, final_rank=4)
    with open("/tmp/zz_mc_params_200_65536.pkl", "rb") as fh:
        out = pickle.load(fh)
    params, alphas = out["best_params"], jnp.asarray(out["best_alphas"])
    C = len(channels)
    CB = C * B
    w_max = 2.0e-9  # representative scale; exact value irrelevant to cost

    def batch_fn(k):
        k_w, k_u = jax.random.split(k)
        w, aux = mcl.mixture_weights(channels, flows, params, ss,
                                     matrix_element, E_COLLIDER, k_w,
                                     B, alphas, with_kinematics=True,
                                     **CUTS)
        v = C * alphas[:, None] * w
        u = jax.random.uniform(k_u, v.shape, dtype=v.dtype)
        return v, u, aux["momenta"], aux["xb"]

    def timeit(fn, arg, reps=5):
        jax.block_until_ready(fn(arg))
        ts = []
        for i in range(reps):
            t0 = time.perf_counter()
            jax.block_until_ready(fn(arg))
            ts.append(time.perf_counter() - t0)
        return min(ts)

    key = jax.random.PRNGKey(3)

    # A. raw batch, device only
    tA = timeit(jax.jit(batch_fn), key)
    print(f"A raw batch          {tA*1e3:9.1f} ms")

    # B. + accept + stats (no gather)
    def with_stats(k):
        v, u, mom, xb = batch_fn(k)
        vf, uf = v.reshape(-1), u.reshape(-1)
        acc = uf * w_max < vf
        return (jnp.sum(acc), jnp.sum(vf > w_max), jnp.sum(vf),
                mom[0, 0, 0, 0], xb[0, 0, 0])
    tB = timeit(jax.jit(with_stats), key)
    print(f"B + accept/stats     {tB*1e3:9.1f} ms")

    # C. + permutation + nonzero (no payload gather)
    def with_nonzero(k):
        v, u, mom, xb = batch_fn(k)
        vf, uf = v.reshape(-1), u.reshape(-1)
        acc = uf * w_max < vf
        perm = jax.random.permutation(jax.random.fold_in(k, 1), CB)
        idx = perm[jnp.nonzero(acc[perm], size=CAP, fill_value=0)[0]]
        return idx, jnp.sum(acc), mom[0, 0, 0, 0], xb[0, 0, 0]
    tC = timeit(jax.jit(with_nonzero), key)
    print(f"C + perm/nonzero     {tC*1e3:9.1f} ms")

    # D. + row gather into packed payload (= _compact_rows)
    def with_gather(k):
        v, u, mom, xb = batch_fn(k)
        vf, uf = v.reshape(-1), u.reshape(-1)
        acc = uf * w_max < vf
        payload, kept = mcl._compact_rows(
            mom.reshape(CB, -1, 4), xb.reshape(CB, -1), vf, acc, CAP,
            jax.random.fold_in(k, 1))
        return payload, kept
    tD = timeit(jax.jit(with_gather), key)
    print(f"D + row gather       {tD*1e3:9.1f} ms")

    # E. lax.map of 8 copies of D (one dispatch)
    def one(sub):
        return with_gather(sub)
    mapped = jax.jit(lambda subs: jax.lax.map(one, subs))
    subs = jax.random.split(key, 8)
    tE = timeit(mapped, subs)
    print(f"E lax.map x8 of D    {tE*1e3:9.1f} ms   ({tE/8*1e3:.1f} ms/batch)")

    # F. scan-free: vmap of 8 (parallel batches, one dispatch)
    vmapped = jax.jit(jax.vmap(one))
    tF = timeit(vmapped, subs)
    print(f"F vmap x8 of D       {tF*1e3:9.1f} ms   ({tF/8*1e3:.1f} ms/batch)")


if __name__ == "__main__":
    main()
