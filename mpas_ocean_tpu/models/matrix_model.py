"""Matrix (BSR/MXU) formulation of the shallow-water step for GENERAL
unstructured meshes.

Same math as forward/time_integration.forward_euler_step (which mirrors the
reference's live ForwardEuler path, reference:
src/forward/time_integration.jl:150-193), with every stencil operator
applied as a block-sparse matmul on the MXU instead of a row-gather on the
VPU (see ops/bsr.py for why). Works on any mesh the gather path works on —
periodic planes, culled coastal channels, spheres — because the mesh
connectivity is baked into the matrices at build time.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..constants import GRAVITY
from ..ops.bsr import Bsr, bsr_matvec, trisk_matrices
from ..utils.pytree import pytree_dataclass
from .shallow_water import PrognosticVars

__all__ = ["MatrixModel", "matrix_step", "matrix_run_loop"]


@pytree_dataclass
class MatrixModel:
    """Precompiled linear operators + masks for the matrix step."""

    grad: Bsr  # (nEdges x nCells)
    c2e: Bsr  # (nEdges x nCells)
    div: Bsr  # (nCells x nEdges)
    corf: Bsr  # (nEdges x nEdges), w * f folded in

    edge_mask_lv: jax.Array  # (nEdges, K) = edge_level_mask * edge_mask
    cell_level_mask: jax.Array  # (nCells, K)
    resting_thickness_sum: jax.Array  # (nCells,)

    @classmethod
    def from_mesh(cls, mesh, bs: int = 128, dtype=np.float32) -> "MatrixModel":
        mats = trisk_matrices(mesh, bs=bs, dtype=dtype)
        elm = jnp.asarray(mesh.vert.edge_level_mask, dtype)
        emask = jnp.asarray(mesh.horz.edges.edge_mask, dtype)
        return cls(
            grad=mats["grad"],
            c2e=mats["c2e"],
            div=mats["div"],
            corf=mats["corf"],
            edge_mask_lv=elm * emask[:, None],
            cell_level_mask=jnp.asarray(mesh.vert.cell_level_mask, dtype),
            resting_thickness_sum=jnp.asarray(
                mesh.vert.resting_thickness_sum, dtype
            ),
        )


def matrix_step(prog: PrognosticVars, mm: MatrixModel, dt) -> PrognosticVars:
    """One forward-Euler step, all stencils as MXU matmuls."""
    h, u = prog.layer_thickness, prog.normal_velocity

    h_edge = bsr_matvec(mm.c2e, h)
    flux = u * h_edge
    tend_h = -bsr_matvec(mm.div, flux) * mm.cell_level_mask

    grad_ssh = bsr_matvec(mm.grad, prog.ssh)  # (nEdges,)
    tend_u = (
        -GRAVITY * grad_ssh[:, None] + bsr_matvec(mm.corf, u)
    ) * mm.edge_mask_lv

    h_new = h + dt * tend_h
    u_new = u + dt * tend_u
    ssh = (h_new * mm.cell_level_mask).sum(axis=1) - mm.resting_thickness_sum
    return PrognosticVars(ssh=ssh, layer_thickness=h_new, normal_velocity=u_new)


@partial(jax.jit, static_argnames=("n_steps",))
def matrix_run_loop(
    prog: PrognosticVars, mm: MatrixModel, dt, n_steps: int
) -> PrognosticVars:
    def body(p, _):
        return matrix_step(p, mm, dt), None

    out, _ = jax.lax.scan(body, prog, length=n_steps)
    return out
