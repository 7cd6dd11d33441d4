"""Break down the per-batch cost of multichannel_unweight on the TPU.

The r5 partial-unweighting sweep measured ~1.1 s per 65k-proposal batch
end-to-end (~1000 events/s) — far above any plausible device time.  This
probe times, separately:

  1. the jitted mixture_weights batch (device only, block_until_ready),
  2. the same + full-payload device->host transfer (the current loop),
  3. the same + a device-side compacted transfer (capacity << batch),

to decide whether compaction is worth implementing in
multichannel_unweight (it was worth 1/a in generate_unweighted).
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
from tools.measure_partial_unweight import build_channels

B = 1 << 15


def main():
    channels = build_channels()
    flows, ps, ss = mcl.build_channel_flows(
        jax.random.PRNGKey(0), channels, 4, 16, [32] * 2, final_rank=4)
    cache = "/tmp/zz_mc_params_200_65536.pkl"
    if os.path.exists(cache):
        with open(cache, "rb") as fh:
            out = pickle.load(fh)
        params, alphas = out["best_params"], out["best_alphas"]
        print(f"# cached params best_ess {out['best_ess']:.4%}")
    else:
        params, alphas = ps, jnp.asarray([0.7, 0.3])
        print("# fresh params (timing only)")
    alphas = jnp.asarray(alphas)
    C = len(channels)

    def batch_fn(k):
        k_w, k_u = jax.random.split(k)
        w, aux = mcl.mixture_weights(channels, flows, params, ss,
                                     matrix_element, E_COLLIDER, k_w,
                                     B, alphas, with_kinematics=True,
                                     **CUTS)
        v = C * alphas[:, None] * w
        u = jax.random.uniform(k_u, v.shape, dtype=v.dtype)
        return v, u, aux["momenta"], aux["xb"]

    batch_jit = jax.jit(batch_fn)

    def timeit(fn, reps=8):
        fn(jax.random.PRNGKey(0))
        ts = []
        for i in range(reps):
            t0 = time.perf_counter()
            fn(jax.random.PRNGKey(i + 1))
            ts.append(time.perf_counter() - t0)
        return min(ts), float(np.median(ts))

    # 1. device only
    def dev_only(k):
        jax.block_until_ready(batch_jit(k))
    t_dev = timeit(dev_only)
    print(f"device_only  min {t_dev[0]*1e3:8.1f} ms  med {t_dev[1]*1e3:8.1f} ms")

    # 2. full-payload host transfer (what the loop does today)
    def full_pull(k):
        v, u, mom, xb = batch_jit(k)
        acc = np.asarray(u * 1e30 < v)  # never accepts; payload still pulled
        _ = np.asarray(mom), np.asarray(xb), np.asarray(v)
        return acc
    t_full = timeit(full_pull)
    nbytes = (B * C * (6 * 4 + 2 + 2) * 4)
    print(f"full_pull    min {t_full[0]*1e3:8.1f} ms  med {t_full[1]*1e3:8.1f} ms"
          f"  (payload ~{nbytes/1e6:.1f} MB)")

    # 3. compacted transfer at capacity 4096
    cap = 4096

    def cstep(k):
        k1, k2 = jax.random.split(k)
        v, u, mom, xb = batch_fn(k1)
        vf, uf = v.reshape(-1), u.reshape(-1)
        acc = uf * 1.0 < vf  # accept-ish; rate irrelevant for timing
        perm = jax.random.permutation(k2, vf.shape[0])
        idxp = jnp.nonzero(acc[perm], size=cap, fill_value=0)[0]
        idx = perm[idxp]
        momf = mom.reshape(-1, mom.shape[2], 4)
        return (momf[idx], xb.reshape(-1, xb.shape[-1])[idx],
                vf[idx], jnp.minimum(jnp.sum(acc), cap), jnp.sum(acc),
                jnp.sum(vf > 1e30), jnp.sum(vf))
    cjit = jax.jit(cstep)

    def compact_pull(k):
        momc, xbc, vc, kk, nt, nov, vs = cjit(k)
        kk = int(kk)
        _ = np.asarray(momc)[:kk], np.asarray(xbc)[:kk], np.asarray(vc)[:kk]
        _ = int(nt), int(nov), float(vs)
    t_c = timeit(compact_pull)
    print(f"compact_pull min {t_c[0]*1e3:8.1f} ms  med {t_c[1]*1e3:8.1f} ms"
          f"  (capacity {cap})")

    print(f"speedup full->compact: {t_full[1]/t_c[1]:.2f}x  "
          f"(device floor {t_dev[1]*1e3:.0f} ms)")


if __name__ == "__main__":
    main()
