"""Analytic linear Rossby wave on the beta plane.

Fifth analytic verification case (after the inertial gravity wave, coastal
Kelvin wave, geostrophic sphere flow, and two-layer internal wave): a
planetary wave whose restoring force is the beta effect. For a
single-layer fluid with mean depth H on an f = f0 + beta*y plane, the
quasi-geostrophic dispersion relation is

    omega = -beta * k / (k^2 + l^2 + 1/LR^2),      LR = sqrt(g H) / f0

— westward phase propagation, with speed set by beta and the deformation
radius. The initial state is a geostrophically balanced sinusoidal
streamfunction (so the fast gravity-wave transient is O(Rossby number)),
and the test measures the phase drift of the ssh field against omega.

The reference's f is a per-element field (HorzMesh.jl fEdge/fVertex/fCell),
so beta-plane configs are representable there too, but it ships no Rossby
verification; this case pins the framework's beta-plane dynamics to the
analytic dispersion relation.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from ..constants import GRAVITY

__all__ = ["RossbyWave"]


@dataclass(frozen=True)
class RossbyWave:
    """Single westward-propagating Rossby mode on a doubly periodic
    [0, lx) x [0, ly) beta plane.

    Args: lx/ly in km, mean depth H [m], f0 [1/s], beta [1/(m s)],
    ssh amplitude [m], integer mode numbers (m_x, m_y). On a planar hex
    mesh of nx x ny cells with spacing dc the periodic box is
    lx = nx*dc by ly = ny*dc*sqrt(3)/2 (hex row spacing) — ly defaults to
    the hex aspect sqrt(3)/2 * lx, the same convention the IGW case uses
    (reference: inertialGravityWave.jl:13-14).
    """

    lx: float = 2000.0
    ly: float = None
    bottom_depth: float = 1000.0
    f0: float = 1e-4
    beta: float = 2e-11
    amplitude: float = 0.1
    m_x: int = 1
    m_y: int = 1
    g: float = GRAVITY

    @property
    def ly_km(self) -> float:
        return self.ly if self.ly is not None else np.sqrt(3.0) / 2.0 * self.lx

    @property
    def k(self) -> float:
        return 2.0 * np.pi * self.m_x / (self.lx * 1e3)

    @property
    def l(self) -> float:
        return 2.0 * np.pi * self.m_y / (self.ly_km * 1e3)

    @property
    def deformation_radius(self) -> float:
        return np.sqrt(self.g * self.bottom_depth) / self.f0

    @property
    def omega(self) -> float:
        """QG dispersion: negative = westward phase propagation."""
        kd2 = 1.0 / self.deformation_radius ** 2
        return -self.beta * self.k / (self.k ** 2 + self.l ** 2 + kd2)

    @property
    def period(self) -> float:
        return abs(2.0 * np.pi / self.omega)

    def exact_ssh(self, x, y, t: float) -> np.ndarray:
        x = np.asarray(x, dtype=np.float64)
        y = np.asarray(y, dtype=np.float64)
        return self.amplitude * np.cos(
            self.k * x + self.l * y - self.omega * t
        )

    def initial_state(self, mesh, n_vert_levels: int = 1):
        """(ssh, layer_thickness, normal_velocity) at t = 0: ssh plus the
        geostrophically balanced velocity u = (g/f0) z_hat x grad(ssh),
        projected onto edge normals."""
        horz = mesh.horz if hasattr(mesh, "horz") else mesh
        xc = np.asarray(horz.cells.x, dtype=np.float64)
        yc = np.asarray(horz.cells.y, dtype=np.float64)
        ssh = self.exact_ssh(xc, yc, 0.0)
        h = np.repeat(
            (self.bottom_depth / n_vert_levels + ssh[:, None] / n_vert_levels),
            n_vert_levels, axis=1,
        )
        xe = np.asarray(horz.edges.x, dtype=np.float64)
        ye = np.asarray(horz.edges.y, dtype=np.float64)
        phase = self.k * xe + self.l * ye
        # grad(ssh) = -A (k, l) sin(phase); u = (g/f0)(-d ssh/dy, d ssh/dx)
        dsdx = -self.amplitude * self.k * np.sin(phase)
        dsdy = -self.amplitude * self.l * np.sin(phase)
        u_zonal = -(self.g / self.f0) * dsdy
        v_merid = (self.g / self.f0) * dsdx
        ang = np.asarray(horz.edges.angle_edge, dtype=np.float64)
        u_n = u_zonal * np.cos(ang) + v_merid * np.sin(ang)
        u = np.repeat(u_n[:, None], n_vert_levels, axis=1)
        return ssh, h, u

    def measured_phase(self, x, y, ssh) -> float:
        """Accumulated phase drift omega*t of the (m_x, m_y) Fourier mode
        of a cell ssh field (negative for the westward wave): with
        ssh(t) = A cos(phase - omega t), the cos/sin projections are
        proportional to cos(omega t) and sin(omega t)."""
        x = np.asarray(x, dtype=np.float64)
        y = np.asarray(y, dtype=np.float64)
        s = np.asarray(ssh, dtype=np.float64)
        phase = self.k * x + self.l * y
        c = np.vdot(np.cos(phase), s)
        d = np.vdot(np.sin(phase), s)
        return float(np.arctan2(d, c))
