"""Time steppers: forward Euler and a working RK4.

(reference: src/forward/time_integration.jl. Its live path is the
ForwardEuler stepper, time_integration.jl:150-193; its RK4 is dead code —
3-D indexing of Vector-of-arrays and a nonexistent field,
time_integration.jl:93-136, SURVEY quirk 7.3 — reimplemented here as a
standard, correct RK4 over the (u, h) state.)

Each stepper is a pure function `state -> state` designed to be the body of
one `lax.scan`: no time-level copies (the reference's advanceTimeLevels!
kernel pair, time_integration.jl:10-59, is subsumed by the scan carry), no
host synchronization, no allocation.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..models.shallow_water import (
    PrognosticVars,
    compute_diagnostics,
    compute_tendencies,
    update_ssh,
)


class ForwardEuler:
    """Tag type selecting the forward-Euler stepper (reference exports the
    same tag, src/forward/time_integration.jl:4)."""


class RungeKutta4:
    """Tag type selecting the RK4 stepper."""


def _apply(prog: PrognosticVars, tend, dt, mesh) -> PrognosticVars:
    """u += dt*du, h += dt*dh, ssh rederived from h."""
    u = prog.normal_velocity + dt * tend.tend_normal_velocity
    h = prog.layer_thickness + dt * tend.tend_layer_thickness
    return PrognosticVars(
        ssh=update_ssh(h, mesh), layer_thickness=h, normal_velocity=u
    )


def forward_euler_step(
    prog: PrognosticVars, mesh, dt, del2_coeff=0.0, nonlinear: bool = False,
    forcing=None,
) -> PrognosticVars:
    """One forward-Euler step (reference: time_integration.jl:150-193)."""
    diag = compute_diagnostics(prog, mesh)
    tend = compute_tendencies(prog, diag, mesh, del2_coeff, nonlinear, forcing)
    return _apply(prog, tend, dt, mesh)


def rk4_step(
    prog: PrognosticVars, mesh, dt, del2_coeff=0.0, nonlinear: bool = False,
    forcing=None,
) -> PrognosticVars:
    """Classical RK4 on the (normal_velocity, layer_thickness) state, with
    ssh rederived at every stage (what the reference's dead RK4 intended)."""

    def rates(p: PrognosticVars):
        diag = compute_diagnostics(p, mesh)
        t = compute_tendencies(p, diag, mesh, del2_coeff, nonlinear, forcing)
        return t.tend_normal_velocity, t.tend_layer_thickness

    u0, h0 = prog.normal_velocity, prog.layer_thickness

    def stage(du, dh, a):
        h = h0 + a * dh
        return PrognosticVars(
            ssh=update_ssh(h, mesh),
            layer_thickness=h,
            normal_velocity=u0 + a * du,
        )

    k1u, k1h = rates(prog)
    k2u, k2h = rates(stage(k1u, k1h, dt / 2.0))
    k3u, k3h = rates(stage(k2u, k2h, dt / 2.0))
    k4u, k4h = rates(stage(k3u, k3h, dt))

    u = u0 + (dt / 6.0) * (k1u + 2.0 * k2u + 2.0 * k3u + k4u)
    h = h0 + (dt / 6.0) * (k1h + 2.0 * k2h + 2.0 * k3h + k4h)
    return PrognosticVars(ssh=update_ssh(h, mesh), layer_thickness=h, normal_velocity=u)


_STEPPERS = {ForwardEuler: forward_euler_step, RungeKutta4: rk4_step}


def ocn_timestep(
    prog: PrognosticVars, mesh, dt, method=ForwardEuler, del2_coeff=0.0,
    nonlinear: bool = False, forcing=None,
) -> PrognosticVars:
    """Advance one step with the selected stepper (reference dispatches the
    same way on a stepper tag type, time_integration.jl:2-5)."""
    try:
        step = _STEPPERS[method]
    except (KeyError, TypeError):
        raise ValueError(f"unknown time stepper {method!r}") from None
    return step(prog, mesh, dt, del2_coeff, nonlinear, forcing)
