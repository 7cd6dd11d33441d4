from nf_tpu.training import manager, metrics, optimizers
from nf_tpu.training.manager import (
    BasicManager,
    AffineManager,
    PWLinManager,
    PWQuadManager,
)

__all__ = [
    "manager",
    "metrics",
    "optimizers",
    "BasicManager",
    "AffineManager",
    "PWLinManager",
    "PWQuadManager",
]
