"""Model-state NetCDF output, including adjoint shadow fields.

(reference: src/infra/OutPut.jl — same variable set: time + coordinates +
metrics + connectivity + ssh/layerThickness/normalVelocity, with the 4-arg
variant adding the adjoint shadows d_ssh/d_layerThickness/d_normalVelocity,
OutPut.jl:76-112, and the timestep stored as a global attribute,
OutPut.jl:40-42. Unlike the reference — which fills only some of the
connectivity variables it defines, OutPut.jl:100-104 — everything defined
here is written.)
"""

from __future__ import annotations

import numpy as np

from ..mesh.sphere import latlon_from_xyz
from .netcdf import write_netcdf

__all__ = ["write_output"]


def _latlon_vars(horz) -> dict:
    out = {}
    for name, elem in (
        ("Cell", horz.cells),
        ("Edge", horz.edges),
        ("Vertex", horz.duals),
    ):
        dim = f"n{name}s" if name != "Vertex" else "nVertices"
        if horz.on_sphere:
            lat, lon = latlon_from_xyz(elem.x, elem.y, elem.z)
        else:
            lat = lon = np.zeros(np.asarray(elem.x).shape)
        out[f"lat{name}"] = ((dim,), lat.astype(np.float64))
        out[f"lon{name}"] = ((dim,), lon.astype(np.float64))
    return out


def write_output(
    path,
    mesh,
    prog,
    dt: float,
    elapsed_seconds: float,
    d_prog=None,
    tracer_names=(),
) -> None:
    """Write the model state (and optional adjoint shadow state) to NetCDF.

    Args:
      mesh: a Mesh (host or device pytree).
      prog: PrognosticVars with ssh (nCells,), layer_thickness (nCells, K),
        normal_velocity (nEdges, K) and optionally tracers (nCells, nT, K).
      dt: timestep in seconds (stored as a global attribute).
      elapsed_seconds: simulation time since start, stored in `time`.
      d_prog: optional adjoint shadows, same shapes as `prog`.
      tracer_names: variable name per tracer slot (temperature, salinity,
        ...) — each written as (time, nCells, nVertLevels), with `d_`
        shadows when d_prog carries tracers.
    """
    c, d, e = mesh.cells, mesh.duals, mesh.edges
    K = mesh.vert.n_vert_levels
    np_ = lambda a: np.asarray(a)

    dims = {
        "time": 1,
        "nCells": mesh.n_cells,
        "nEdges": mesh.n_edges,
        "nVertices": mesh.n_vertices,
        "nVertLevels": K,
        "maxEdges": c.max_edges,
        "TWO": 2,
    }

    f64 = np.float64
    variables = {
        "time": (("time",), np.array([elapsed_seconds], dtype=f64)),
        "xCell": (("nCells",), np_(c.x).astype(f64)),
        "yCell": (("nCells",), np_(c.y).astype(f64)),
        "xEdge": (("nEdges",), np_(e.x).astype(f64)),
        "yEdge": (("nEdges",), np_(e.y).astype(f64)),
        "xVertex": (("nVertices",), np_(d.x).astype(f64)),
        "yVertex": (("nVertices",), np_(d.y).astype(f64)),
        # lat/lon derived from Cartesian coordinates (zeros on planar
        # meshes, matching MPAS planar-file convention)
        **_latlon_vars(mesh.horz),
        "dcEdge": (("nEdges",), np_(e.dc_edge).astype(f64)),
        "areaCell": (("nCells",), np_(c.area_cell).astype(f64)),
        "angleEdge": (("nEdges",), np_(e.angle_edge).astype(f64)),
        "areaTriangle": (("nVertices",), np_(d.area_triangle).astype(f64)),
        "edgeSignOnCell": (
            ("nCells", "maxEdges"),
            np_(c.edge_sign_on_cell).astype(np.int32),
        ),
        "nEdgesOnCell": (("nCells",), np_(c.n_edges_on_cell).astype(np.int32)),
        "nEdgesOnEdge": (("nEdges",), np_(e.n_edges_on_edge).astype(np.int32)),
        "cellsOnEdge": (
            ("nEdges", "TWO"),
            np_(e.cells_on_edge).astype(np.int32) + 1,
        ),
        "verticesOnCell": (
            ("nCells", "maxEdges"),
            np.where(
                np_(c.edge_mask_on_cell) > 0,
                np_(c.vertices_on_cell).astype(np.int32) + 1,
                0,
            ),
        ),
        "verticesOnEdge": (
            ("nEdges", "TWO"),
            np_(e.vertices_on_edge).astype(np.int32) + 1,
        ),
        "ssh": (("time", "nCells"), np_(prog.ssh).astype(f64)[None]),
        "layerThickness": (
            ("time", "nCells", "nVertLevels"),
            np_(prog.layer_thickness).astype(f64)[None],
        ),
        "normalVelocity": (
            ("time", "nEdges", "nVertLevels"),
            np_(prog.normal_velocity).astype(f64)[None],
        ),
    }
    if getattr(prog, "tracers", None) is not None:
        tr = np_(prog.tracers)
        if len(tracer_names) != tr.shape[1]:
            raise ValueError(
                f"{tr.shape[1]} tracer slots but {len(tracer_names)} names"
            )
        for i, name in enumerate(tracer_names):
            variables[name] = (
                ("time", "nCells", "nVertLevels"),
                tr[:, i].astype(f64)[None],
            )
        if d_prog is not None and getattr(d_prog, "tracers", None) is not None:
            dtr = np_(d_prog.tracers)
            for i, name in enumerate(tracer_names):
                variables[f"d_{name}"] = (
                    ("time", "nCells", "nVertLevels"),
                    dtr[:, i].astype(f64)[None],
                )
    if d_prog is not None:
        variables.update(
            {
                "d_ssh": (("time", "nCells"), np_(d_prog.ssh).astype(f64)[None]),
                "d_layerThickness": (
                    ("time", "nCells", "nVertLevels"),
                    np_(d_prog.layer_thickness).astype(f64)[None],
                ),
                "d_normalVelocity": (
                    ("time", "nEdges", "nVertLevels"),
                    np_(d_prog.normal_velocity).astype(f64)[None],
                ),
            }
        )

    write_netcdf(path, dims, variables, attrs={"dt": float(dt)})
