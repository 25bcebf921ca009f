"""Manufactured sin/cos fields with exact derivatives for operator tests.

(reference: test/utilities.jl:93-190 — the PlanarTest case: a scalar
h = sin(2 pi x / Lx) sin(2 pi y / Ly) at cells and a vector field
F = (sin x' cos y', cos x' sin y') at edges, with analytic gradient,
divergence and curl.)
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np


@dataclass(frozen=True)
class PlanarTestFields:
    lx: float
    ly: float

    @classmethod
    def from_mesh(cls, horz) -> "PlanarTestFields":
        # The reference derives Lx = round(max(xCell)), Ly = sqrt(3)/2 Lx
        # (test/utilities.jl:71-72); we know the true periodic extents.
        return cls(lx=horz.lx, ly=horz.ly)

    def _phases(self, x, y):
        return 2.0 * np.pi * np.asarray(x) / self.lx, 2.0 * np.pi * np.asarray(y) / self.ly

    def h(self, x, y):
        px, py = self._phases(x, y)
        return np.sin(px) * np.sin(py)

    def fx(self, x, y):
        px, py = self._phases(x, y)
        return np.sin(px) * np.cos(py)

    def fy(self, x, y):
        px, py = self._phases(x, y)
        return np.cos(px) * np.sin(py)

    def dhdx(self, x, y):
        px, py = self._phases(x, y)
        return 2.0 * np.pi / self.lx * np.cos(px) * np.sin(py)

    def dhdy(self, x, y):
        px, py = self._phases(x, y)
        return 2.0 * np.pi / self.ly * np.sin(px) * np.cos(py)

    def div_f(self, x, y):
        px, py = self._phases(x, y)
        return (
            2.0 * np.pi * (1.0 / self.lx + 1.0 / self.ly) * np.cos(px) * np.cos(py)
        )

    def curl_f(self, x, y):
        px, py = self._phases(x, y)
        return (
            2.0 * np.pi * (-1.0 / self.lx + 1.0 / self.ly) * np.sin(px) * np.sin(py)
        )

    def normal_component(self, horz, vx, vy):
        """Project a Cartesian edge vector field onto edge normals."""
        ang = np.asarray(horz.edges.angle_edge)
        return vx * np.cos(ang) + vy * np.sin(ang)

    def f_edge_normal(self, horz):
        xe, ye = np.asarray(horz.edges.x), np.asarray(horz.edges.y)
        return self.normal_component(horz, self.fx(xe, ye), self.fy(xe, ye))

    def grad_h_edge_normal(self, horz):
        xe, ye = np.asarray(horz.edges.x), np.asarray(horz.edges.y)
        return self.normal_component(horz, self.dhdx(xe, ye), self.dhdy(xe, ye))
