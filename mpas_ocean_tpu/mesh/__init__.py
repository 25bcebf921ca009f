from .horz_mesh import Edges, PrimaryCells, DualCells, HorzMesh
from .vert_mesh import VerticalMesh
from .mesh import Mesh
from .planar_hex import planar_hex_mesh
from .voronoi import build_planar_trisk_mesh

__all__ = [
    "Edges",
    "PrimaryCells",
    "DualCells",
    "HorzMesh",
    "VerticalMesh",
    "Mesh",
    "planar_hex_mesh",
    "build_planar_trisk_mesh",
]
