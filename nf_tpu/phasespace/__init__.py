from nf_tpu.phasespace import lorentz, pdf
from nf_tpu.phasespace.generator import (
    FlatInvertiblePhasespace,
    VirtualPhaseSpaceGenerator,
    PhaseSpaceGeneratorError,
)

__all__ = [
    "lorentz",
    "pdf",
    "FlatInvertiblePhasespace",
    "VirtualPhaseSpaceGenerator",
    "PhaseSpaceGeneratorError",
]
