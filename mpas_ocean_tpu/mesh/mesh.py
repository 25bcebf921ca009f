"""Mesh wrapper: horizontal + vertical (reference:
src/infra/MPASMesh/MPASMesh.jl:19-24)."""

from __future__ import annotations

import jax
import numpy as np

from ..utils.pytree import pytree_dataclass
from .horz_mesh import HorzMesh
from .vert_mesh import VerticalMesh


@pytree_dataclass
class Mesh:
    horz: HorzMesh
    vert: VerticalMesh

    # convenience accessors
    @property
    def cells(self):
        return self.horz.cells

    @property
    def duals(self):
        return self.horz.duals

    @property
    def edges(self):
        return self.horz.edges

    @property
    def n_cells(self) -> int:
        return self.horz.n_cells

    @property
    def n_edges(self) -> int:
        return self.horz.n_edges

    @property
    def n_vertices(self) -> int:
        return self.horz.n_vertices

    @property
    def n_vert_levels(self) -> int:
        return self.vert.n_vert_levels

    def astype(self, dtype) -> "Mesh":
        def cast(leaf):
            if np.issubdtype(np.asarray(leaf).dtype, np.floating):
                return np.asarray(leaf).astype(dtype)
            return leaf

        return jax.tree.map(cast, self)

    def to_device(self, sharding=None) -> "Mesh":
        if sharding is None:
            return jax.tree.map(jax.numpy.asarray, self)
        return jax.device_put(self, sharding)
