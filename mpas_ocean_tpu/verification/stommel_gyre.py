"""Stommel wind-driven gyre: analytic steady state with western
intensification.

The classic Stommel (1948) problem — a closed rectangular basin on a beta
plane, driven by a zonal wind stress tau_x(y) = -tau0 cos(pi y / ly) and
damped by linear (Rayleigh) friction — has an exact steady solution whose
single free-surface-layer form our linear core solves directly:

    du/dt - f v = -g d(eta)/dx + tau_x/(rho0 h) - r u
    dv/dt + f u = -g d(eta)/dy            - r v
    d(eta)/dt + D (u_x + v_y) = 0

At steady state the flow is non-divergent, u = -psi_y, v = psi_x, and the
curl of the momentum equations gives the Stommel balance

    r grad^2 psi + beta psi_x = curl(tau) / (rho0 D) = -F k sin(k y)

with k = pi/ly and F = tau0/(rho0 D). Separating psi = sin(k y) X(x):

    r (X'' - k^2 X) + beta X' = -F k,   X(0) = X(lx) = 0,

whose solution is X = Xp + A e^{lp x} + B e^{lm x} with Xp = F/(r k) and
lp/lm the roots of r L^2 + beta L - r k^2 = 0 — the root pair whose scale
separation IS the western boundary current: the interior follows the
Sverdrup balance while a boundary layer of width ~r/beta closes the
circulation on the WESTERN wall only.

This case exercises, together, four subsystems the other verification
cases cover separately: wall-masked (culled) basins, per-cell wind-stress
forcing, Rayleigh damping, and the beta plane. The reference has no
forcing subsystem at all (its ForcingVars.jl is an empty file, reference:
src/ocn/ForcingVars.jl), so there is no reference behavior to match —
the gate is the analytic solution itself.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

__all__ = ["StommelGyre"]


@dataclass(frozen=True)
class StommelGyre:
    """Analytic Stommel gyre in a basin [0, lx] x [0, ly] (meters).

    ``r`` is the Rayleigh coefficient of the MOMENTUM equation [1/s]
    (models/forcing.py ``rayleigh=``); ``tau0`` the wind-stress amplitude
    [Pa]; ``depth`` the resting layer depth D [m]. The western boundary
    layer width is delta_S = r / beta — resolve it with >= 3-4 cells and
    keep delta_S << lx for a cleanly intensified gyre.
    """

    lx: float
    ly: float
    tau0: float = 0.05
    r: float = 1.25e-6
    beta: float = 1.0e-11
    f0: float = 1.0e-4
    depth: float = 1000.0
    rho0: float = 1000.0

    # -- wind field (what the model is forced with) --------------------

    def wind_stress_zonal(self, y: np.ndarray) -> np.ndarray:
        """tau_x(y) = -tau0 cos(pi y / ly)  [Pa] (Stommel's profile)."""
        return -self.tau0 * np.cos(np.pi * np.asarray(y) / self.ly)

    # -- exact steady state ---------------------------------------------

    def _profile(self):
        """(Xp, A, B, lp, lm) of X(x) = Xp + A e^{lp x} + B e^{lm x}."""
        k = np.pi / self.ly
        F = self.tau0 / (self.rho0 * self.depth)
        disc = np.sqrt(self.beta**2 + 4.0 * self.r**2 * k**2)
        lp = (-self.beta + disc) / (2.0 * self.r)
        lm = (-self.beta - disc) / (2.0 * self.r)
        xp = F / (self.r * k)
        # X(0) = X(lx) = 0
        mat = np.array(
            [[1.0, 1.0], [np.exp(lp * self.lx), np.exp(lm * self.lx)]]
        )
        a, b = np.linalg.solve(mat, [-xp, -xp])
        return xp, a, b, lp, lm

    def psi(self, x, y) -> np.ndarray:
        """Streamfunction [m^2/s] (velocity form: u = -psi_y, v = psi_x)."""
        x, y = np.asarray(x), np.asarray(y)
        xp, a, b, lp, lm = self._profile()
        k = np.pi / self.ly
        return np.sin(k * y) * (xp + a * np.exp(lp * x) + b * np.exp(lm * x))

    def velocity(self, x, y):
        """Exact steady (u, v) [m/s] at (x, y)."""
        x, y = np.asarray(x), np.asarray(y)
        xp, a, b, lp, lm = self._profile()
        k = np.pi / self.ly
        ex_p, ex_m = np.exp(lp * x), np.exp(lm * x)
        u = -k * np.cos(k * y) * (xp + a * ex_p + b * ex_m)
        v = np.sin(k * y) * (a * lp * ex_p + b * lm * ex_m)
        return u, v

    def normal_velocity(self, x_edge, y_edge, angle_edge) -> np.ndarray:
        """Exact steady velocity projected onto the edge normal (the same
        convention as the IGW case, reference: src/inertialGravityWave.jl:
        47-64)."""
        u, v = self.velocity(x_edge, y_edge)
        return u * np.cos(angle_edge) + v * np.sin(angle_edge)

    def western_intensification(self) -> float:
        """Ratio max|v|(western wall) / max|v|(eastern wall) at mid-basin
        latitude — the signature asymmetry (≈ lx/delta_S for small r)."""
        ymid = 0.5 * self.ly
        xs = np.linspace(0.0, self.lx, 2049)
        _, v = self.velocity(xs, ymid)
        half = len(xs) // 2
        return float(np.abs(v[:half]).max() / np.abs(v[half:]).max())

    def spinup_time(self) -> float:
        """~3 Rayleigh e-folding times: the transient inertia-gravity and
        Rossby-wave field decays as e^{-r t}, so this reaches within ~5%
        of steady state."""
        return 3.0 / self.r
