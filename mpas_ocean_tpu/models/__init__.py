from .shallow_water import (
    DiagnosticVars,
    PrognosticVars,
    TendencyVars,
    compute_diagnostics,
    compute_layer_thickness_tendency,
    compute_normal_velocity_tendency,
)
from .stratification import (
    Stratification,
    baroclinic_wave_speeds,
    make_stratification,
    montgomery_potential,
)
from .tracers import (
    apply_tracer_update,
    make_tracers,
    total_tracer_content,
    tracer_edge_value,
    tracer_tendency,
)

__all__ = [
    "DiagnosticVars",
    "PrognosticVars",
    "TendencyVars",
    "compute_diagnostics",
    "compute_layer_thickness_tendency",
    "compute_normal_velocity_tendency",
    "Stratification",
    "baroclinic_wave_speeds",
    "make_stratification",
    "montgomery_potential",
    "apply_tracer_update",
    "make_tracers",
    "total_tracer_content",
    "tracer_edge_value",
    "tracer_tendency",
]
