"""Irregular (non-lattice) planar TRiSK mesh generation.

The reference's defining scope is "irregular, non-rectilinear, TRiSK-based
meshes" read from externally generated MPAS files (reference: README.MD:5,
src/infra/MPASMesh/HorzMesh.jl:334-355). In this zero-egress environment we
generate them instead: jittered generator points, optionally Lloyd-relaxed
(a few fixed-point iterations of "move each generator to its Voronoi cell's
centroid" — the standard CVT smoothing MPAS mesh tools apply), and
optionally GRADED in x (variable resolution via an inverse-CDF spacing
map). The result is a genuine Voronoi mesh with mixed 5/6/7-gon cells and
varying edge counts — the general-mesh regime where only the gather/BSR
paths apply and the lattice fast paths do not.

All host-side NumPy; builds through voronoi.build_planar_trisk_mesh, so the
full MPAS field inventory (connectivity, metrics, signs, TRiSK weights)
comes out identically derived.
"""

from __future__ import annotations

import numpy as np

from .voronoi import build_planar_trisk_mesh

__all__ = ["irregular_trisk_mesh", "jittered_points", "lloyd_relax"]


def _cell_centroids(horz) -> np.ndarray:
    """Voronoi-cell centroids of a built HorzMesh (periodic, unwrapped
    relative to each generator point)."""
    L = np.array([horz.lx, horz.ly])
    cxy = np.stack([np.asarray(horz.cells.x), np.asarray(horz.cells.y)], -1)
    voc = np.asarray(horz.cells.vertices_on_cell)
    nec = np.asarray(horz.cells.n_edges_on_cell)
    valid = np.arange(voc.shape[1])[None, :] < nec[:, None]
    vxy = np.stack([np.asarray(horz.duals.x), np.asarray(horz.duals.y)], -1)
    d = vxy[voc] - cxy[:, None, :]
    d -= L * np.round(d / L)
    nxt = (np.arange(voc.shape[1])[None, :] + 1) % np.maximum(
        nec[:, None], 1
    )
    dn = np.take_along_axis(d, nxt[..., None], axis=1)
    cross = d[..., 0] * dn[..., 1] - dn[..., 0] * d[..., 1]
    cross = np.where(valid, cross, 0.0)
    area = 0.5 * cross.sum(1)
    cen = ((d + dn) * cross[..., None]).sum(1) / (6.0 * area[:, None])
    return cxy + cen


def lloyd_relax(points: np.ndarray, lx: float, ly: float,
                iters: int = 2) -> np.ndarray:
    """A few Lloyd (centroidal-Voronoi) iterations in the periodic box.
    Each iteration builds the full periodic Voronoi diagram and moves every
    generator to its cell centroid — smooths jittered point sets into
    well-shaped (but still irregular) polygonal meshes."""
    L = np.array([lx, ly])
    pts = np.asarray(points, dtype=np.float64)
    for _ in range(iters):
        horz = build_planar_trisk_mesh(pts, lx, ly)
        cen = _cell_centroids(horz)
        pts = cen - L * np.floor(cen / L)
    return pts


def jittered_points(nx: int, ny: int, lx: float, ly: float, *,
                    jitter: float = 0.25, grade: float = 0.0,
                    seed: int = 0) -> np.ndarray:
    """nx*ny generator points: a uniform grid displaced by gaussian jitter
    (fraction of the grid spacing). ``grade`` > 0 makes the x-spacing
    variable-resolution: column positions follow the inverse CDF of the
    density rho(x) = 1 + grade * sin^2(pi x / lx), so cells on one side of
    the box are up to (1 + grade)x denser — the variable-resolution regime
    production MPAS meshes use."""
    rng = np.random.default_rng(seed)
    if grade:
        # inverse-CDF column placement for rho(x) ~ 1 + grade sin^2(pi x/lx)
        xs = np.linspace(0.0, lx, 4096, endpoint=False)
        rho = 1.0 + grade * np.sin(np.pi * xs / lx) ** 2
        cdf = np.cumsum(rho)
        cdf = cdf / cdf[-1]
        u = (np.arange(nx) + 0.5) / nx
        cols = np.interp(u, cdf, xs)
    else:
        cols = (np.arange(nx) + 0.5) * (lx / nx)
    rows = (np.arange(ny) + 0.5) * (ly / ny)
    gx, gy = np.meshgrid(cols, rows, indexing="ij")
    pts = np.stack([gx.ravel(), gy.ravel()], axis=1)
    pts = pts + jitter * np.array([lx / nx, ly / ny]) * rng.standard_normal(
        pts.shape
    )
    L = np.array([lx, ly])
    return pts - L * np.floor(pts / L)


def irregular_trisk_mesh(nx: int, ny: int, lx: float, ly: float, *,
                         jitter: float = 0.25, lloyd: int = 2,
                         grade: float = 0.0, seed: int = 0, f0: float = 0.0,
                         beta: float = 0.0, dtype=np.float64):
    """A genuinely irregular periodic TRiSK mesh: jittered (optionally
    graded) generators, Lloyd-relaxed ``lloyd`` times, built through the
    full Voronoi/TRiSK pipeline. Cells are mixed 5/6/7-gons; there is no
    lattice structure, so only the general-mesh (gather / BSR-matrix)
    execution paths apply — exactly the regime the reference's
    arbitrary-NetCDF meshes occupy (reference: README.MD:5)."""
    pts = jittered_points(nx, ny, lx, ly, jitter=jitter, grade=grade,
                          seed=seed)
    if lloyd:
        pts = lloyd_relax(pts, lx, ly, iters=lloyd)
    return build_planar_trisk_mesh(pts, lx, ly, f0=f0, beta=beta,
                                   dtype=dtype)
