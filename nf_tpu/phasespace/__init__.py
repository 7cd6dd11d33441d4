from nf_tpu.phasespace import lorentz, mappings, pdf
from nf_tpu.phasespace.generator import (
    FlatInvertiblePhasespace,
    VirtualPhaseSpaceGenerator,
    PhaseSpaceGeneratorError,
)

__all__ = [
    "lorentz",
    "mappings",
    "pdf",
    "FlatInvertiblePhasespace",
    "VirtualPhaseSpaceGenerator",
    "PhaseSpaceGeneratorError",
]
