from nf_tpu.training import (manager, metrics, multichannel, optimizers,
                             ensemble)
from nf_tpu.training.manager import (
    BasicManager,
    AffineManager,
    PWLinManager,
    PWQuadManager,
)

__all__ = [
    "manager",
    "metrics",
    "multichannel",
    "optimizers",
    "ensemble",
    "BasicManager",
    "AffineManager",
    "PWLinManager",
    "PWQuadManager",
]
