"""Halo-exchange / compute overlap for the unstructured sharded step.

The serial sharded step (shard_step.py) computes the full local state, then
exchanges halos — the collective sits on the critical path. Here each step
is split so the exchange overlaps the bulk of the compute (SURVEY section 8
plan, the BASELINE "halo-exchange overlap" north star):

  1. a tiny *boundary mini mesh* — the send elements plus their 1-ring
     stencil closure, built host-side once — steps ONLY the elements other
     parts need, reproducing the full step's arithmetic at those rows
     bit-for-bit (same ops, same connectivity rows, same padding zeros);
  2. the halo collectives are issued against the mini result;
  3. the full local step runs while the collectives are in flight (XLA's
     latency-hiding scheduler splits each ppermute/all_gather into
     start/done around the independent full-step work);
  4. received halo values overwrite the full step's halo slots.

The redundant work is one extra pass over O(boundary) elements — vanishing
relative to O(interior) as the mesh grows. (The reference has no
distributed execution at all; its intended-MPI ancestor serialized halo
exchange against compute, reference: README.MD:55-66.)
"""

from __future__ import annotations

import numpy as np
import jax

from ..constants import GRAVITY
from ..mesh.horz_mesh import DualCells, Edges, HorzMesh, PrimaryCells
from ..mesh.mesh import Mesh
from ..mesh.vert_mesh import VerticalMesh
from ..models.shallow_water import PrognosticVars, update_ssh
from ..ops.operators import (
    divergence_on_cell,
    gradient_on_edge,
    interpolate_cell_to_edge,
    tangential_reconstruction,
)
from ..utils.pytree import pytree_dataclass, static_field

__all__ = ["BoundaryMini", "build_boundary_mini", "mini_forward_euler_step"]


@pytree_dataclass
class BoundaryMini:
    """Stacked (leading (P,) axis) boundary mini meshes + slot maps."""

    mesh: Mesh  # mini-sized local mesh (dummy 1-vertex duals)
    cell_from_local: jax.Array  # (P, Cm) local slot of each mini cell
    edge_from_local: jax.Array  # (P, Em)


def _pad_rows(rows, width, fill):
    out = np.full((len(rows), width), fill, dtype=np.int32)
    for i, r in enumerate(rows):
        out[i, : len(r)] = r
    return out


def build_boundary_mini(part):
    """Host-side: extract each part's boundary mini mesh from the stacked
    local meshes of a PartitionedMesh.

    Returns (BoundaryMini, cell_of_local, edge_of_local) — the lookups map
    a local slot to its mini position (mini dump when absent) so callers
    can remap any exchange schedule's send columns into the mini axes.

    Mini element sets (all local slots, guaranteed local by the partition
    invariants, parallel/partition.py module docstring):
      edges: edges of send cells (flux needed) + send edges + their
             edgesOnEdge taps (u gathers for the Coriolis reconstruction)
      cells: send cells + cellsOnEdge of every mini edge that computes a
             flux or a gradient
    Connectivity of non-send mini rows may reach outside the mini sets;
    those slots are remapped to the mini dump slot with zeroed
    sign/weight/mask — their outputs are discarded, only send rows are read.
    """
    lm = part.local_mesh
    P = part.n_parts
    Cpad = part.cell_gids.shape[1]
    Epad = part.edge_gids.shape[1]
    c_dump_l, e_dump_l = Cpad - 1, Epad - 1

    eoc = np.asarray(lm.cells.edges_on_cell)
    coe = np.asarray(lm.edges.cells_on_edge)
    eoe = np.asarray(lm.edges.edges_on_edge)
    emask_slot = np.asarray(lm.cells.edge_mask_on_cell) > 0

    cell_rows, edge_rows = [], []
    for p in range(P):
        send_c = np.unique(part.cell_send[p])
        send_c = send_c[send_c != c_dump_l]
        send_e = np.unique(part.edge_send[p])
        send_e = send_e[send_e != e_dump_l]

        flux_e = np.unique(eoc[p][send_c][emask_slot[p][send_c]])
        taps_e = np.unique(eoe[p][send_e])
        need_e = np.unique(np.concatenate([flux_e, send_e, taps_e]))
        need_e = need_e[need_e != e_dump_l]

        grad_or_flux_e = np.unique(np.concatenate([flux_e, send_e]))
        grad_or_flux_e = grad_or_flux_e[grad_or_flux_e != e_dump_l]
        need_c = np.unique(
            np.concatenate([send_c, coe[p][grad_or_flux_e].ravel()])
        )
        need_c = need_c[need_c != c_dump_l]

        cell_rows.append(need_c)
        edge_rows.append(need_e)

    Cm = max(1, max(len(r) for r in cell_rows)) + 1  # + mini dump slot
    Em = max(1, max(len(r) for r in edge_rows)) + 1
    cm_dump, em_dump = Cm - 1, Em - 1

    # local slot -> mini position lookups (default: mini dump)
    cell_of_local = np.full((P, Cpad), cm_dump, dtype=np.int64)
    edge_of_local = np.full((P, Epad), em_dump, dtype=np.int64)
    for p in range(P):
        cell_of_local[p, cell_rows[p]] = np.arange(len(cell_rows[p]))
        edge_of_local[p, edge_rows[p]] = np.arange(len(edge_rows[p]))

    cell_from_local = _pad_rows(cell_rows, Cm, c_dump_l)
    edge_from_local = _pad_rows(edge_rows, Em, e_dump_l)

    def gather_rows(field, from_local):
        field = np.asarray(field)  # (P, pad, ...)
        return np.stack(
            [field[p][from_local[p]] for p in range(P)]
        )

    def remap_conn(conn_local, table):
        """(P, pad, w) local connectivity -> mini ids via per-part table."""
        out = np.empty((P,) + (conn_local.shape[1],) + conn_local.shape[2:],
                       dtype=np.int32)
        for p in range(P):
            out[p] = table[p][conn_local[p]]
        return out

    eoc_m = remap_conn(gather_rows(eoc, cell_from_local), edge_of_local)
    coe_m = remap_conn(gather_rows(coe, edge_from_local), cell_of_local)
    eoe_m = remap_conn(gather_rows(eoe, edge_from_local), edge_of_local)

    sign_c = gather_rows(lm.cells.edge_sign_on_cell, cell_from_local)
    mask_c = gather_rows(lm.cells.edge_mask_on_cell, cell_from_local)
    sign_c = np.where(eoc_m == em_dump, 0.0, sign_c)
    mask_c = np.where(eoc_m == em_dump, 0.0, mask_c)
    w_e = gather_rows(lm.edges.weights_on_edge, edge_from_local)
    w_e = np.where(eoe_m == em_dump, 0.0, w_e)

    fdt = np.asarray(lm.cells.area_cell).dtype
    zc = np.zeros((P, Cm), dtype=fdt)
    ze = np.zeros((P, Em), dtype=fdt)

    cells = PrimaryCells(
        n_cells=Cm,
        max_edges=lm.cells.max_edges,
        x=zc, y=zc, z=zc,
        f=gather_rows(lm.cells.f, cell_from_local),
        area_cell=gather_rows(lm.cells.area_cell, cell_from_local),
        n_edges_on_cell=gather_rows(lm.cells.n_edges_on_cell, cell_from_local),
        edges_on_cell=eoc_m,
        vertices_on_cell=np.zeros_like(eoc_m),
        cells_on_cell=np.zeros_like(eoc_m),
        edge_sign_on_cell=sign_c,
        edge_mask_on_cell=mask_c,
        kite_areas_on_cell=np.zeros_like(sign_c),
    )
    edges = Edges(
        n_edges=Em,
        max_edges2=lm.edges.max_edges2,
        x=ze, y=ze, z=ze,
        f=gather_rows(lm.edges.f, edge_from_local),
        cells_on_edge=coe_m,
        vertices_on_edge=np.zeros(coe_m.shape, dtype=np.int32),
        n_edges_on_edge=gather_rows(lm.edges.n_edges_on_edge, edge_from_local),
        edges_on_edge=eoe_m,
        weights_on_edge=w_e,
        dv_edge=gather_rows(lm.edges.dv_edge, edge_from_local),
        dc_edge=gather_rows(lm.edges.dc_edge, edge_from_local),
        angle_edge=ze,
        edge_mask=gather_rows(lm.edges.edge_mask, edge_from_local),
    )
    # dummy single-vertex duals: the mini step never touches vertices
    duals = DualCells(
        n_vertices=1,
        vertex_degree=lm.duals.vertex_degree,
        x=zc[:, :1], y=zc[:, :1], z=zc[:, :1], f=zc[:, :1],
        area_triangle=np.ones((P, 1), dtype=fdt),
        edges_on_vertex=np.zeros((P, 1, lm.duals.vertex_degree), np.int32),
        cells_on_vertex=np.zeros((P, 1, lm.duals.vertex_degree), np.int32),
        edge_sign_on_vertex=np.zeros((P, 1, lm.duals.vertex_degree), fdt),
        kite_areas_on_vertex=np.zeros((P, 1, lm.duals.vertex_degree), fdt),
    )
    horz = HorzMesh(
        cells=cells, duals=duals, edges=edges,
        lx=lm.horz.lx, ly=lm.horz.ly,
        on_sphere=lm.horz.on_sphere, sphere_radius=lm.horz.sphere_radius,
    )
    K = lm.vert.n_vert_levels
    vert = VerticalMesh(
        n_vert_levels=K,
        min_level_cell=gather_rows(lm.vert.min_level_cell, cell_from_local),
        max_level_cell=gather_rows(lm.vert.max_level_cell, cell_from_local),
        max_level_edge_top=gather_rows(lm.vert.max_level_edge_top, edge_from_local),
        max_level_edge_bot=gather_rows(lm.vert.max_level_edge_bot, edge_from_local),
        max_level_vertex_top=np.zeros((P, 1), np.int32),
        max_level_vertex_bot=np.zeros((P, 1), np.int32),
        resting_thickness=gather_rows(lm.vert.resting_thickness, cell_from_local),
        resting_thickness_sum=gather_rows(
            lm.vert.resting_thickness_sum, cell_from_local
        ),
        cell_level_mask=gather_rows(lm.vert.cell_level_mask, cell_from_local),
        edge_level_mask=gather_rows(lm.vert.edge_level_mask, edge_from_local),
        vertex_level_mask=np.zeros((P, 1, K), fdt),
        bottom_depth=gather_rows(lm.vert.bottom_depth, cell_from_local),
        vert_coord_movement_weights=np.asarray(
            lm.vert.vert_coord_movement_weights
        ).copy(),
    )
    import jax.numpy as jnp

    asj = lambda a: jnp.asarray(a)
    mini = BoundaryMini(
        mesh=jax.tree.map(asj, Mesh(horz=horz, vert=vert)),
        cell_from_local=asj(cell_from_local),
        edge_from_local=asj(edge_from_local),
    )
    return mini, cell_of_local, edge_of_local


def mini_forward_euler_step(prog: PrognosticVars, mini: BoundaryMini, dt):
    """Forward-Euler update of the mini elements only.

    Per-row arithmetic is IDENTICAL to forward/time_integration.
    forward_euler_step (same operators, same gather widths, same masked
    zeros), so send rows match the full step bit-for-bit. Returns mini-sized
    (ssh, h, u); mini is the per-device (unstacked) BoundaryMini view.
    """
    mesh = mini.mesh
    sub = PrognosticVars(
        ssh=prog.ssh[mini.cell_from_local],
        layer_thickness=prog.layer_thickness[mini.cell_from_local],
        normal_velocity=prog.normal_velocity[mini.edge_from_local],
    )
    h_edge = interpolate_cell_to_edge(sub.layer_thickness, mesh)
    flux = sub.normal_velocity * h_edge
    tend_h = -divergence_on_cell(flux, mesh) * mesh.vert.cell_level_mask

    grad_ssh = gradient_on_edge(sub.ssh, mesh)
    tend_u = -GRAVITY * grad_ssh[:, None] * mesh.vert.edge_level_mask
    uf = sub.normal_velocity * mesh.edges.f[:, None]
    tend_u = tend_u + tangential_reconstruction(uf, mesh) * mesh.vert.edge_level_mask
    tend_u = tend_u * mesh.edges.edge_mask[:, None]

    h = sub.layer_thickness + dt * tend_h
    u = sub.normal_velocity + dt * tend_u
    return update_ssh(h, mesh), h, u
