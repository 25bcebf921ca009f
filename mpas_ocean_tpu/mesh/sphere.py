"""Spherical quasi-uniform icosahedral Voronoi mesh generator.

Builds the global TRiSK mesh (hexagonal cells + 12 pentagons) the reference
roadmap targets (BASELINE configs: "Spherical quasi-uniform Voronoi mesh
shallow water"): subdivided-icosahedron generator points, geodesic Delaunay
triangulation via the convex hull, spherical circumcenters as dual
vertices, true spherical (great-circle / spherical-excess) metrics, and the
shared Thuburn reconstruction weights. Coriolis f = 2 Omega sin(lat).

The dynamics need no changes on the sphere: the TRiSK operators consume
only lengths/areas/connectivity. angleEdge is the angle of the edge normal
vs local east, so the planar IC-projection convention carries over.
"""

from __future__ import annotations

import numpy as np
from scipy.spatial import ConvexHull

from .horz_mesh import DualCells, Edges, HorzMesh, PrimaryCells
from .voronoi import _group_by_first
from .weights import trisk_weights

__all__ = [
    "icosphere_points",
    "spherical_mesh",
    "latlon_from_xyz",
    "EARTH_RADIUS",
    "EARTH_OMEGA",
]

EARTH_RADIUS = 6.371e6  # m
EARTH_OMEGA = 7.292e-5  # 1/s


def latlon_from_xyz(x, y, z):
    """(lat, lon) in radians from Cartesian coordinates (MPAS convention:
    lon in [0, 2*pi); the reference's legacy mesh carries latCell/lonCell
    from file, src/infra/Mesh.jl:24-40 — here they are derived)."""
    x, y, z = np.asarray(x), np.asarray(y), np.asarray(z)
    r = np.sqrt(x * x + y * y + z * z)
    lat = np.arcsin(np.divide(z, r, out=np.zeros_like(r), where=r > 0))
    lon = np.mod(np.arctan2(y, x), 2.0 * np.pi)
    return lat, lon


def icosphere_points(n: int) -> np.ndarray:
    """Unit-sphere generator points: icosahedron subdivided n times per
    edge -> 10*n^2 + 2 points."""
    phi = (1.0 + np.sqrt(5.0)) / 2.0
    verts = np.array(
        [
            [-1, phi, 0], [1, phi, 0], [-1, -phi, 0], [1, -phi, 0],
            [0, -1, phi], [0, 1, phi], [0, -1, -phi], [0, 1, -phi],
            [phi, 0, -1], [phi, 0, 1], [-phi, 0, -1], [-phi, 0, 1],
        ],
        dtype=np.float64,
    )
    verts /= np.linalg.norm(verts, axis=1, keepdims=True)
    faces = np.array(
        [
            [0, 11, 5], [0, 5, 1], [0, 1, 7], [0, 7, 10], [0, 10, 11],
            [1, 5, 9], [5, 11, 4], [11, 10, 2], [10, 7, 6], [7, 1, 8],
            [3, 9, 4], [3, 4, 2], [3, 2, 6], [3, 6, 8], [3, 8, 9],
            [4, 9, 5], [2, 4, 11], [6, 2, 10], [8, 6, 7], [9, 8, 1],
        ]
    )
    pts = [verts]
    seen = {}

    def key(p):
        return tuple(np.round(p * 1e12).astype(np.int64))

    for v in verts:
        seen[key(v)] = len(seen)
    points = list(verts)
    for f in faces:
        a, b, c = verts[f]
        for i in range(n + 1):
            for j in range(n + 1 - i):
                if (i, j) in ((0, 0), (n, 0), (0, n)):
                    continue
                p = (a * (n - i - j) + b * i + c * j) / n
                p = p / np.linalg.norm(p)
                k = key(p)
                if k not in seen:
                    seen[k] = len(points)
                    points.append(p)
    return np.asarray(points)


def _gc_dist(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Great-circle distance between unit vectors (unit sphere)."""
    cross = np.linalg.norm(np.cross(a, b), axis=-1)
    dot = (a * b).sum(-1)
    return np.arctan2(cross, dot)


def _sph_tri_area(a, b, c) -> np.ndarray:
    """Spherical triangle area on the unit sphere (Van Oosterom-Strackee)."""
    num = np.abs((a * np.cross(b, c)).sum(-1))
    den = 1.0 + (a * b).sum(-1) + (b * c).sum(-1) + (c * a).sum(-1)
    return 2.0 * np.arctan2(num, den)


def _east_north(p: np.ndarray):
    """Local unit east/north at unit-sphere points (undefined at poles)."""
    z = np.array([0.0, 0.0, 1.0])
    east = np.cross(z, p)
    nrm = np.linalg.norm(east, axis=-1, keepdims=True)
    east = east / np.where(nrm < 1e-12, 1.0, nrm)
    north = np.cross(p, east)
    return east, north


def _tangent_basis(p: np.ndarray):
    """Right-handed tangent basis defined everywhere (pole-safe): used for
    CCW sorting only, where any consistent per-point basis works."""
    z = np.array([0.0, 0.0, 1.0])
    x = np.array([1.0, 0.0, 0.0])
    use_x = (np.abs(p[..., 2]) > 0.9)[..., None]
    ref = np.where(use_x, x, z)
    t1 = np.cross(ref, p)
    t1 /= np.linalg.norm(t1, axis=-1, keepdims=True)
    t2 = np.cross(p, t1)
    return t1, t2


def spherical_mesh(
    n_subdiv: int,
    radius: float = EARTH_RADIUS,
    omega: float = EARTH_OMEGA,
    dtype=np.float64,
) -> HorzMesh:
    """Build a global icosahedral TRiSK mesh of 10*n^2+2 cells."""
    pts = icosphere_points(n_subdiv)  # (nCells, 3) unit
    n_cells = len(pts)

    hull = ConvexHull(pts)
    tris = hull.simplices  # (nTris, 3)
    # orient outward (CCW seen from outside)
    det = np.einsum("ij,ij->i", pts[tris[:, 0]], np.cross(pts[tris[:, 1]], pts[tris[:, 2]]))
    flip = det < 0
    tris[flip] = tris[flip][:, [0, 2, 1]]
    n_vertices = len(tris)

    # dual vertices: spherical circumcenters
    cc = np.cross(pts[tris[:, 1]] - pts[tris[:, 0]], pts[tris[:, 2]] - pts[tris[:, 0]])
    cc /= np.linalg.norm(cc, axis=1, keepdims=True)
    centroid = pts[tris].mean(1)
    sign = np.sign(np.einsum("ij,ij->i", cc, centroid))
    vert_p = cc * sign[:, None]

    area_triangle = _sph_tri_area(pts[tris[:, 0]], pts[tris[:, 1]], pts[tris[:, 2]])

    # cells_on_vertex ordered CCW in the local tangent plane at the vertex
    east, north = _tangent_basis(vert_p)
    d = pts[tris] - vert_p[:, None, :]
    ang = np.arctan2(
        np.einsum("tjk,tk->tj", d, north), np.einsum("tjk,tk->tj", d, east)
    )
    order = np.argsort(ang, axis=1)
    cells_on_vertex = np.take_along_axis(tris, order, axis=1)

    # --- edges: dedupe triangle sides -------------------------------
    pair_i = np.array([[0, 1], [1, 2], [0, 2]])
    ec = tris[:, pair_i].reshape(-1, 2)  # (3T, 2)
    ev = np.repeat(np.arange(n_vertices), 3)
    ec_sorted = np.sort(ec, axis=1)
    uniq, edge_id, counts = np.unique(
        ec_sorted, axis=0, return_inverse=True, return_counts=True
    )
    assert (counts == 2).all()
    n_edges = len(uniq)
    cells_on_edge = uniq.astype(np.int64)  # normal points c0 -> c1

    p1 = pts[cells_on_edge[:, 0]]
    p2 = pts[cells_on_edge[:, 1]]
    dc_edge = _gc_dist(p1, p2) * radius
    chord_mid = p1 + p2
    chord_mid /= np.linalg.norm(chord_mid, axis=1, keepdims=True)

    # adjacent triangles -> vertices_on_edge (preliminary order)
    order2 = np.argsort(edge_id, kind="stable")
    inst_v = ev[order2].reshape(n_edges, 2)

    # edge location = intersection of the Delaunay arc (c1-c2) with the
    # Voronoi arc (v0-v1); using the chord midpoint instead leaves O(dx^2)
    # gaps in the kite tiling of the sphere
    g1 = np.cross(p1, p2)
    g2 = np.cross(vert_p[inst_v[:, 0]], vert_p[inst_v[:, 1]])
    mid = np.cross(g1, g2)
    nrm = np.linalg.norm(mid, axis=1, keepdims=True)
    mid = mid / np.where(nrm < 1e-14, 1.0, nrm)
    flip_m = np.einsum("ij,ij->i", mid, chord_mid) < 0
    mid[flip_m] = -mid[flip_m]

    # edge normal in the tangent plane at the edge point, pointing to c1
    nvec = p2 - np.einsum("ij,ij->i", p2, mid)[:, None] * mid
    nvec /= np.linalg.norm(nvec, axis=1, keepdims=True)
    e_east, e_north = _east_north(mid)
    angle_edge = np.arctan2(
        np.einsum("ij,ij->i", nvec, e_north), np.einsum("ij,ij->i", nvec, e_east)
    )
    # tangent = up x normal
    tvec = np.cross(mid, nvec)

    # order vertices along tvec
    dvv = vert_p[inst_v[:, 1]] - vert_p[inst_v[:, 0]]
    swap = np.einsum("ij,ij->i", dvv, tvec) < 0
    inst_v[swap] = inst_v[swap][:, ::-1]
    vertices_on_edge = inst_v
    dv_edge = _gc_dist(vert_p[inst_v[:, 0]], vert_p[inst_v[:, 1]]) * radius

    # --- per-cell CCW cycles ----------------------------------------
    c_east, c_north = _tangent_basis(pts)
    inc_cell = np.concatenate([cells_on_edge[:, 0], cells_on_edge[:, 1]])
    inc_edge = np.concatenate([np.arange(n_edges)] * 2)
    inc_disp = mid[inc_edge] - pts[inc_cell]
    inc_ang = np.arctan2(
        np.einsum("ij,ij->i", inc_disp, c_north[inc_cell]),
        np.einsum("ij,ij->i", inc_disp, c_east[inc_cell]),
    )
    ne_counts, inc_rows = _group_by_first(inc_cell, inc_ang, n_cells, 8)
    max_edges = int(ne_counts.max())
    n_edges_on_cell = ne_counts.astype(np.int32)
    slot_valid = np.arange(max_edges)[None, :] < ne_counts[:, None]
    inc_rows = inc_rows[:, :max_edges]
    edges_on_cell = np.where(slot_valid, inc_edge[inc_rows], 0)

    on_first = cells_on_edge[edges_on_cell, 0] == np.arange(n_cells)[:, None]
    cells_on_cell = np.where(
        on_first, cells_on_edge[edges_on_cell, 1], cells_on_edge[edges_on_cell, 0]
    )
    cells_on_cell = np.where(slot_valid, cells_on_cell, 0)

    nxt = (np.arange(max_edges)[None, :] + 1) % np.maximum(n_edges_on_cell[:, None], 1)
    nxt = np.where(slot_valid, nxt, 0)
    va = vertices_on_edge[edges_on_cell]
    vb = vertices_on_edge[np.take_along_axis(edges_on_cell, nxt, axis=1)]
    m00 = va[..., 0] == vb[..., 0]
    m01 = va[..., 0] == vb[..., 1]
    shared = np.where(m00 | m01, va[..., 0], va[..., 1])
    vertices_on_cell = np.where(slot_valid, shared, 0)

    # --- kites & areas (true spherical) ------------------------------
    mid_i = mid[edges_on_cell]
    mid_n = mid[np.take_along_axis(edges_on_cell, nxt, axis=1)]
    v_i = vert_p[vertices_on_cell]
    cpts = np.broadcast_to(pts[:, None, :], mid_i.shape)
    kite = _sph_tri_area(cpts, mid_i, v_i) + _sph_tri_area(cpts, v_i, mid_n)
    kite_areas_on_cell = np.where(slot_valid, kite, 0.0) * radius**2
    area_cell = kite_areas_on_cell.sum(1)
    area_triangle = area_triangle * radius**2

    # kite_areas_on_vertex aligned with cells_on_vertex
    kite_areas_on_vertex = np.zeros((n_vertices, 3))
    flat_v = vertices_on_cell[slot_valid]
    flat_c = np.broadcast_to(np.arange(n_cells)[:, None], vertices_on_cell.shape)[
        slot_valid
    ]
    flat_k = kite_areas_on_cell[slot_valid]
    match = cells_on_vertex[flat_v] == flat_c[:, None]
    assert (match.sum(1) == 1).all()
    kite_areas_on_vertex[flat_v, match.argmax(1)] = flat_k

    # --- signs, vertex cycles, weights -------------------------------
    edge_sign_on_cell = np.where(slot_valid, np.where(on_first, -1.0, 1.0), 0.0)

    vinc_vert = np.concatenate([vertices_on_edge[:, 0], vertices_on_edge[:, 1]])
    vinc_edge = np.concatenate([np.arange(n_edges)] * 2)
    vdisp = mid[vinc_edge] - vert_p[vinc_vert]
    vang = np.arctan2(
        np.einsum("ij,ij->i", vdisp, north[vinc_vert]),
        np.einsum("ij,ij->i", vdisp, east[vinc_vert]),
    )
    vd_counts, vinc_rows = _group_by_first(vinc_vert, vang, n_vertices, 4)
    assert (vd_counts == 3).all()
    edges_on_vertex = vinc_edge[vinc_rows[:, :3]]
    edge_sign_on_vertex = np.where(
        vertices_on_edge[edges_on_vertex, 0] == np.arange(n_vertices)[:, None],
        -1.0,
        1.0,
    )

    n_edges_on_edge, edges_on_edge, weights_on_edge = trisk_weights(
        cells_on_edge,
        dv_edge,
        dc_edge,
        n_edges_on_cell,
        edges_on_cell,
        vertices_on_cell,
        kite_areas_on_cell,
        area_cell,
    )

    # --- Coriolis + assembly -----------------------------------------
    f_of = lambda p: 2.0 * omega * p[:, 2]  # 2 Omega sin(lat); |p| = 1
    fdt = dtype

    cells = PrimaryCells(
        n_cells=n_cells,
        max_edges=max_edges,
        x=(pts[:, 0] * radius).astype(fdt),
        y=(pts[:, 1] * radius).astype(fdt),
        z=(pts[:, 2] * radius).astype(fdt),
        f=f_of(pts).astype(fdt),
        area_cell=area_cell.astype(fdt),
        n_edges_on_cell=n_edges_on_cell,
        edges_on_cell=edges_on_cell.astype(np.int32),
        vertices_on_cell=vertices_on_cell.astype(np.int32),
        cells_on_cell=cells_on_cell.astype(np.int32),
        edge_sign_on_cell=edge_sign_on_cell.astype(fdt),
        edge_mask_on_cell=slot_valid.astype(fdt),
        kite_areas_on_cell=kite_areas_on_cell.astype(fdt),
    )
    duals = DualCells(
        n_vertices=n_vertices,
        vertex_degree=3,
        x=(vert_p[:, 0] * radius).astype(fdt),
        y=(vert_p[:, 1] * radius).astype(fdt),
        z=(vert_p[:, 2] * radius).astype(fdt),
        f=f_of(vert_p).astype(fdt),
        area_triangle=area_triangle.astype(fdt),
        edges_on_vertex=edges_on_vertex.astype(np.int32),
        cells_on_vertex=cells_on_vertex.astype(np.int32),
        edge_sign_on_vertex=edge_sign_on_vertex.astype(fdt),
        kite_areas_on_vertex=kite_areas_on_vertex.astype(fdt),
    )
    edges = Edges(
        n_edges=n_edges,
        max_edges2=2 * max_edges,
        x=(mid[:, 0] * radius).astype(fdt),
        y=(mid[:, 1] * radius).astype(fdt),
        z=(mid[:, 2] * radius).astype(fdt),
        f=f_of(mid).astype(fdt),
        cells_on_edge=cells_on_edge.astype(np.int32),
        vertices_on_edge=vertices_on_edge.astype(np.int32),
        n_edges_on_edge=n_edges_on_edge,
        edges_on_edge=edges_on_edge.astype(np.int32),
        weights_on_edge=weights_on_edge.astype(fdt),
        dv_edge=dv_edge.astype(fdt),
        dc_edge=dc_edge.astype(fdt),
        angle_edge=angle_edge.astype(fdt),
        edge_mask=np.ones(n_edges, dtype=fdt),
    )
    return HorzMesh(
        cells=cells,
        duals=duals,
        edges=edges,
        lx=0.0,
        ly=0.0,
        on_sphere=True,
        sphere_radius=float(radius),
    )
