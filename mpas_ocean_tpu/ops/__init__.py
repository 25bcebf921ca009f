from .operators import (
    curl_on_vertex,
    divergence_on_cell,
    gradient_on_edge,
    interpolate_cell_to_edge,
    interpolate_cell_to_vertex,
    interpolate_vertex_to_edge,
    tangential_reconstruction,
)

__all__ = [
    "curl_on_vertex",
    "divergence_on_cell",
    "gradient_on_edge",
    "interpolate_cell_to_edge",
    "interpolate_cell_to_vertex",
    "interpolate_vertex_to_edge",
    "tangential_reconstruction",
]
