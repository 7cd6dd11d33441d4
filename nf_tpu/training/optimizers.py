"""Optimizers matching the torch configurations used by the reference harness.

The reference trains with ``torch.optim.Adamax(params, lr, weight_decay)``
(reference experiment_mg.py:50, README.md:41).  Torch's ``weight_decay`` is
L2-coupled: ``grad += wd * param`` *before* the Adamax moments — reproduced
here by chaining ``optax.add_decayed_weights`` in front of ``optax.adamax``
(whose infinity-moment update matches torch's).
"""

from __future__ import annotations

import optax


def adamax(learning_rate: float, weight_decay: float = 0.0,
           b1: float = 0.9, b2: float = 0.999, eps: float = 1e-8):
    if weight_decay:
        return optax.chain(
            optax.add_decayed_weights(weight_decay),
            optax.adamax(learning_rate, b1=b1, b2=b2, eps=eps),
        )
    return optax.adamax(learning_rate, b1=b1, b2=b2, eps=eps)


def adam(learning_rate: float, weight_decay: float = 0.0):
    if weight_decay:
        return optax.chain(
            optax.add_decayed_weights(weight_decay),
            optax.adam(learning_rate),
        )
    return optax.adam(learning_rate)
