from .shallow_water import (
    DiagnosticVars,
    PrognosticVars,
    TendencyVars,
    compute_diagnostics,
    compute_layer_thickness_tendency,
    compute_normal_velocity_tendency,
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
    "apply_tracer_update",
    "make_tracers",
    "total_tracer_content",
    "tracer_edge_value",
    "tracer_tendency",
]
