"""Measure partial unweighting end-to-end on TPU (VERDICT r4 item 3).

The r4 record: 35.5% mixture ESS on the ZZ/Z' competing-pairings target
but only 2.9-4.4% plain unweighting efficiency — the tail-weight gap.
Partial unweighting (accept min(1, w/w_max), carry max(1, w/w_max)) is
exact at ANY bound, so lowering the wmax quantile trades carried-weight
spread for effective events: the Kish effective efficiency interpolates
from the plain efficiency (q=1) up toward the ESS fraction (q -> 0).

This tool sweeps the quantile over the trained learned-multi-channel
mixture (reusing tools/measure_unweight_pc.py's cached params when
present) and reports, per point:

  * effective efficiency  (sum w)^2 / sum w^2 / n_proposals,
  * accept rate, overweight fraction, max carried weight,
  * raw accepted events/s and Kish-EFFECTIVE events/s (wall-clock over
    the generation loop, warm),

for both the global-max and per-channel-max schemes.  Target: >= 10%
effective efficiency (VERDICT r4 item 3).

Usage: python tools/measure_partial_unweight.py [--epochs 200]
       [--batch 65536] [--n-events 50000]
"""

import argparse
import json
import os
import pickle
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_tpu")
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import jax
import numpy as np

from examples.zz_multichannel import (CUTS, E_COLLIDER, MZ, GZ, MZP, GZP,
                                      matrix_element)
from nf_tpu.phasespace.pdf import ToyPDF
from nf_tpu.phasespace.topology import (BreitWignerSMap,
                                        ResonanceDecayPhasespace)
from nf_tpu.training import multichannel as mcl
from nf_tpu.training import optimizers


def build_channels():
    common = dict(pdf=ToyPDF(), pdf_active=True, tau=True)
    ch_z = ResonanceDecayPhasespace(
        [0.0, 0.0], [0.0] * 4, ((0, 1), (2, 3)),
        mass_maps={(0, 1): BreitWignerSMap(MZ, GZ),
                   (2, 3): BreitWignerSMap(MZ, GZ)}, **common)
    ch_zp = ResonanceDecayPhasespace(
        [0.0, 0.0], [0.0] * 4, ((0, 3), (1, 2)),
        mass_maps={(0, 3): BreitWignerSMap(MZP, GZP),
                   (1, 2): BreitWignerSMap(MZP, GZP)}, **common)
    return [ch_z, ch_zp]


def get_trained(channels, epochs, batch):
    flows, ps, ss = mcl.build_channel_flows(
        jax.random.PRNGKey(0), channels, 4, 16, [32] * 2, final_rank=4)
    cache = f"/tmp/zz_mc_params_{epochs}_{batch}.pkl"
    if os.path.exists(cache):
        with open(cache, "rb") as fh:
            out = pickle.load(fh)
        print(f"# loaded cached params ({cache}): best_ess "
              f"{out['best_ess']:.4%}", flush=True)
    else:
        t0 = time.time()
        out = mcl.train_multichannel(
            channels, flows, ps, ss, matrix_element, E_COLLIDER,
            optimizers.adamax(5e-3, 1e-4), jax.random.PRNGKey(3),
            alphas=[0.7, 0.3], batch_per_channel=batch, epochs=epochs,
            loss_mode="kl", mini_batch_per_channel=min(batch, 1 << 16),
            epochs_per_call=epochs // 10 if epochs % 10 == 0 else None,
            **CUTS)
        print(f"# train {time.time() - t0:.0f}s  best_ess "
              f"{out['best_ess']:.4%}", flush=True)
        out_h = dict(out)
        out_h["best_params"] = jax.device_get(out["best_params"])
        with open(cache, "wb") as fh:
            pickle.dump(out_h, fh)
    return flows, ss, out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=200)
    ap.add_argument("--batch", type=int, default=1 << 16)
    ap.add_argument("--n-events", type=int, default=50_000)
    ap.add_argument("--batch-per-channel", type=int, default=1 << 15)
    args = ap.parse_args()

    channels = build_channels()
    flows, ss, out = get_trained(channels, args.epochs, args.batch)
    params, alphas = out["best_params"], out["best_alphas"]
    print(f"# best_ess {out['best_ess']:.4%}  alphas "
          f"{np.asarray(alphas).round(3)}", flush=True)

    results = []
    quantiles = [1.0, 0.9999, 0.999, 0.99, 0.9, 0.5]
    for pc in (False, True):
        for q in quantiles:
            # warm pass compiles the batch fn + pilot; the timed pass
            # reuses the jitted executables (fresh key: fresh events)
            for rep, key in (("warm", 7), ("timed", 8)):
                t0 = time.time()
                events, xbs, wts, info = mcl.multichannel_unweight(
                    channels, flows, params, ss, matrix_element,
                    E_COLLIDER, jax.random.PRNGKey(key), alphas,
                    n_events=args.n_events,
                    batch_per_channel=args.batch_per_channel,
                    wmax_quantile=q, per_channel_max=pc,
                    partial_unweight=True, **CUTS)
                dt = time.time() - t0
            kish = float(wts.sum()) ** 2 / float((wts ** 2).sum())
            n_prop = len(events) / max(info["accept_rate"], 1e-300)
            rec = {
                "scheme": "per-channel" if pc else "global",
                "quantile": q,
                "eff": info["eff"],
                "accept_rate": info["accept_rate"],
                "overweight_frac": info["n_overweight"] / n_prop,
                "w_carried_max": float(wts.max()),
                "n_events": len(events),
                "kish_effective_events": kish,
                "events_per_sec": len(events) / dt,
                "effective_events_per_sec": kish / dt,
                "seconds": dt,
            }
            results.append(rec)
            print(json.dumps(rec), flush=True)

    # plain-mode baselines at the r4 measurement points
    for pc, q in ((False, 0.9999), (True, 1.0)):
        events, _, eff, n_over = mcl.multichannel_unweight(
            channels, flows, params, ss, matrix_element, E_COLLIDER,
            jax.random.PRNGKey(9), alphas, n_events=args.n_events,
            batch_per_channel=args.batch_per_channel, wmax_quantile=q,
            per_channel_max=pc, **CUTS)
        print(json.dumps({"scheme": ("per-channel" if pc else "global")
                          + "-plain", "quantile": q, "eff": eff,
                          "n_events": len(events),
                          "n_overweight": n_over}), flush=True)

    best = max(results, key=lambda r: r["eff"])
    print(json.dumps({"summary_best": best,
                      "target_10pct_met": best["eff"] >= 0.10,
                      "best_ess": out["best_ess"]}), flush=True)


if __name__ == "__main__":
    main()
