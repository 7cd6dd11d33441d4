"""Hyper-parameter sweep driver.

The reference runs its workers by hand-spawning ``multiprocessing``
processes that push result tuples to a shared queue (reference
experiment_mg.py:85-87).  On a TPU host, separate processes cannot share
the accelerator, so the idiomatic equivalent keeps the same
para-dict/queue-tuple contract with two execution modes:

  * sequential (default) — safe for TPU-bound NIS workers, which must not
    contend for the chip;
  * ``mode="thread"`` — a thread pool for CPU-bound workers (e.g. the
    VEGAS baseline ``prov``, whose hot loops are numpy and release the
    GIL), recovering the reference's fan-out for the baseline half of a
    comparison sweep;
  * ``mode="process"`` — the reference's actual mechanism: OS processes +
    a multiprocessing queue (spawn context).  Workers and their para
    values must be picklable (module-level functions).  Each child pins
    jax to the CPU backend before running so sweeps never contend for the
    accelerator — use for CPU-bound baselines or fully host-side workers.
"""

from __future__ import annotations

import queue


RESULT_FIELDS = (
    "best_loss", "unused", "best_loss_rel", "func_count", "varJ",
    "DKL", "best_var", "best_epoch", "method", "duration_s",
    "id", "sigma_pb", "sigma_err_pb", "final_variance",
)


def _process_entry(w, para, mp_queue):
    """Child entry point for mode="process": pin jax to CPU (the sweep
    must never contend for the accelerator), then run the worker with the
    multiprocessing queue injected — the reference's exact contract
    (experiment_mg.py:85-87)."""
    import jax
    try:
        jax.config.update("jax_platforms", "cpu")
    except Exception:
        pass
    para = dict(para)
    para["q"] = mp_queue
    w(para)


def run_sweep(paras, worker=None, workers=None, mode="sequential",
              max_workers=None):
    """Run workers over a list of para dicts; returns a list of result dicts.

    ``paras``: list of parameter dicts (reference experiment_mg.py:15-30
    schema, minus ``q`` which is injected).  ``worker``: callable taking the
    para dict (default: the NIS worker ``pro``); per-para override via
    ``para['worker']``.  ``mode``: "sequential", "thread" or "process"
    (``max_workers`` bounds the pool; default = number of paras).  Results
    are decoded from the queue tuples into dicts keyed by RESULT_FIELDS, in
    completion order.
    """
    from nf_tpu.utils.experiment import pro

    if mode == "process":
        import multiprocessing as mp
        ctx = mp.get_context("spawn")
        mq = ctx.Queue()
        jobs = [(dict(p).pop("worker", None) or worker or pro,
                 {k: v for k, v in p.items() if k != "worker"})
                for p in paras]
        limit = max_workers or len(jobs)
        results = []

        def drain():
            while True:
                try:
                    tup = mq.get_nowait()
                except queue.Empty:
                    return
                results.append(dict(zip(RESULT_FIELDS, tup)))

        pending = list(jobs)
        running = []
        try:
            while pending or running:
                while pending and len(running) < limit:
                    w, p = pending.pop(0)
                    proc = ctx.Process(target=_process_entry, args=(w, p, mq))
                    proc.start()
                    running.append(proc)
                drain()
                still = []
                for proc in running:
                    proc.join(timeout=0.2)
                    if proc.exitcode is None:
                        still.append(proc)
                    elif proc.exitcode != 0:
                        raise RuntimeError(
                            f"sweep worker exited with code {proc.exitcode}")
                running = still
            drain()
        finally:
            # On failure, don't leak children or lose queued results: stop
            # survivors, then drain what completed before the error.
            for proc in running:
                if proc.is_alive():
                    proc.terminate()
                proc.join()
            drain()
        return results

    q: queue.Queue = queue.Queue()
    jobs = []
    for para in paras:
        p = dict(para)
        p["q"] = q
        w = p.pop("worker", worker) or pro
        jobs.append((w, p))

    if mode == "thread":
        from concurrent.futures import ThreadPoolExecutor
        with ThreadPoolExecutor(max_workers=max_workers or len(jobs)) as ex:
            futures = [ex.submit(w, p) for w, p in jobs]
            for fut in futures:
                fut.result()  # propagate worker exceptions
    elif mode == "sequential":
        for w, p in jobs:
            w(p)
    else:
        raise ValueError(f"unknown sweep mode {mode!r}")

    results = []
    while not q.empty():
        tup = q.get_nowait()
        results.append(dict(zip(RESULT_FIELDS, tup)))
    return results
