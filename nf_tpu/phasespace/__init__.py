from nf_tpu.phasespace import lorentz, mappings, pdf, topology
from nf_tpu.phasespace.generator import (
    FlatInvertiblePhasespace,
    VirtualPhaseSpaceGenerator,
    PhaseSpaceGeneratorError,
)
from nf_tpu.phasespace.topology import (
    BreitWignerSMap,
    PowerSMap,
    ResonanceDecayPhasespace,
    UniformSMap,
    multichannel_integrand,
    optimize_alphas,
)

__all__ = [
    "lorentz",
    "mappings",
    "pdf",
    "topology",
    "FlatInvertiblePhasespace",
    "VirtualPhaseSpaceGenerator",
    "PhaseSpaceGeneratorError",
    "ResonanceDecayPhasespace",
    "BreitWignerSMap",
    "PowerSMap",
    "UniformSMap",
    "multichannel_integrand",
    "optimize_alphas",
]
