"""Hyper-parameter sweep driver.

The reference runs its workers by hand-spawning ``multiprocessing``
processes that push result tuples to a shared queue (reference
experiment_mg.py:85-87).  On a TPU host, separate processes cannot share
the accelerator, so the idiomatic equivalent is sequential (or
thread-pooled CPU) execution of the same workers with the same queue
protocol — this driver provides that while keeping the reference's
para-dict/queue-tuple contract.
"""

from __future__ import annotations

import queue


RESULT_FIELDS = (
    "best_loss", "unused", "best_loss_rel", "func_count", "varJ",
    "DKL", "best_var", "best_epoch", "method", "duration_s",
    "id", "sigma_pb", "sigma_err_pb", "final_variance",
)


def run_sweep(paras, worker=None, workers=None):
    """Run workers over a list of para dicts; returns a list of result dicts.

    ``paras``: list of parameter dicts (reference experiment_mg.py:15-30
    schema, minus ``q`` which is injected).  ``worker``: callable taking the
    para dict (default: the NIS worker ``pro``); per-para override via
    ``para['worker']``.  Results are decoded from the queue tuples into
    dicts keyed by RESULT_FIELDS.
    """
    from nf_tpu.utils.experiment import pro

    q: queue.Queue = queue.Queue()
    for para in paras:
        p = dict(para)
        p["q"] = q
        w = p.pop("worker", worker) or pro
        w(p)

    results = []
    while not q.empty():
        tup = q.get_nowait()
        results.append(dict(zip(RESULT_FIELDS, tup)))
    return results
