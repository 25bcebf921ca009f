from .shallow_water import (
    DiagnosticVars,
    PrognosticVars,
    TendencyVars,
    compute_diagnostics,
    compute_layer_thickness_tendency,
    compute_normal_velocity_tendency,
)

__all__ = [
    "DiagnosticVars",
    "PrognosticVars",
    "TendencyVars",
    "compute_diagnostics",
    "compute_layer_thickness_tendency",
    "compute_normal_velocity_tendency",
]
