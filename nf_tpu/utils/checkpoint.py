"""Checkpoint save/restore for param/state pytrees.

The reference only ever *saves* (``torch.save`` of a state_dict,
manager.py:358-369) — no load path exists.  Here both directions work, via
flax's msgpack serialization of pytrees.
"""

from __future__ import annotations

from flax import serialization


def save(path, tree):
    data = serialization.to_bytes(tree)
    with open(path, "wb") as fh:
        fh.write(data)


def load(path, template):
    """Restore a pytree saved by :func:`save`.

    ``template`` must have the same structure (e.g. freshly-initialized
    params); leaf values are replaced by the stored ones.
    """
    with open(path, "rb") as fh:
        data = fh.read()
    return serialization.from_bytes(template, data)
