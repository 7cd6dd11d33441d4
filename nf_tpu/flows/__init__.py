from nf_tpu.flows.model import Flow, CellCfg, forward, make_cell_cfg
from nf_tpu.flows.factory import (
    build_affine_flow,
    build_pwlin_flow,
    build_pwquad_flow,
    adjust_pwquad_cells,
)

__all__ = [
    "Flow",
    "CellCfg",
    "forward",
    "make_cell_cfg",
    "build_affine_flow",
    "build_pwlin_flow",
    "build_pwquad_flow",
    "adjust_pwquad_cells",
]
