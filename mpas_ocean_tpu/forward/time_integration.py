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
    compute_layer_thickness_tendency,
    compute_normal_velocity_tendency,
    compute_tendencies,
    update_ssh,
)
from ..models.tracers import apply_tracer_update, tracer_concentration


class ForwardEuler:
    """Tag type selecting the forward-Euler stepper (reference exports the
    same tag, src/forward/time_integration.jl:4)."""


class RungeKutta4:
    """Tag type selecting the RK4 stepper."""


class ForwardBackward:
    """Tag type selecting the forward-backward stepper: thickness first with
    the old velocity, then velocity against the NEW pressure gradient — the
    standard neutrally-stable shallow-water gravity-wave scheme (CFL ~ 2 vs
    forward Euler's unconditional weak instability). BEYOND the reference,
    whose only live stepper is plain FE (time_integration.jl:150-193)."""


def _apply(prog: PrognosticVars, tend, dt, mesh) -> PrognosticVars:
    """u += dt*du, h += dt*dh, ssh rederived from h; tracers advance in
    content form hT += dt*d(hT) then re-derive T (models/tracers.py)."""
    u = prog.normal_velocity + dt * tend.tend_normal_velocity
    h = prog.layer_thickness + dt * tend.tend_layer_thickness
    tracers = None
    if prog.tracers is not None:
        tracers = apply_tracer_update(
            prog.tracers, prog.layer_thickness, h, tend.tend_tracer, dt,
            mesh.vert.cell_level_mask,
        )
    return PrognosticVars(
        ssh=update_ssh(h, mesh), layer_thickness=h, normal_velocity=u,
        tracers=tracers,
    )


def forward_euler_step(
    prog: PrognosticVars, mesh, dt, del2_coeff=0.0, nonlinear: bool = False,
    forcing=None, tracer_kappa: float = 0.0, tracer_upwind: float = 1.0,
    strat=None,
) -> PrognosticVars:
    """One forward-Euler step (reference: time_integration.jl:150-193)."""
    diag = compute_diagnostics(prog, mesh)
    tend = compute_tendencies(prog, diag, mesh, del2_coeff, nonlinear, forcing,
                              tracer_kappa, tracer_upwind, strat)
    return _apply(prog, tend, dt, mesh)


def forward_backward_step(
    prog: PrognosticVars, mesh, dt, del2_coeff=0.0, nonlinear: bool = False,
    forcing=None, tracer_kappa: float = 0.0, tracer_upwind: float = 1.0,
    strat=None,
) -> PrognosticVars:
    """One forward-backward step: h (and tracers) advance with the old
    flux, then u advances with the pressure gradient of the NEW thickness
    field (all non-pressure momentum terms stay at the old state)."""
    diag = compute_diagnostics(prog, mesh)
    tend_h = compute_layer_thickness_tendency(prog, diag, mesh)
    h = prog.layer_thickness + dt * tend_h
    half = PrognosticVars(
        ssh=update_ssh(h, mesh), layer_thickness=h,
        normal_velocity=prog.normal_velocity,
    )
    tend_u = compute_normal_velocity_tendency(
        prog, diag, mesh, del2_coeff, nonlinear, forcing, strat,
        pressure_prog=half,
    )
    u = prog.normal_velocity + dt * tend_u
    tracers = None
    if prog.tracers is not None:
        from ..models.tracers import tracer_tendency

        tend_t = tracer_tendency(
            prog.tracers, diag.thickness_flux, mesh, kappa=tracer_kappa,
            upwind=tracer_upwind, h_edge=diag.layer_thickness_edge,
        )
        tracers = apply_tracer_update(
            prog.tracers, prog.layer_thickness, h, tend_t, dt,
            mesh.vert.cell_level_mask,
        )
    return PrognosticVars(ssh=half.ssh, layer_thickness=h,
                          normal_velocity=u, tracers=tracers)


def rk4_step(
    prog: PrognosticVars, mesh, dt, del2_coeff=0.0, nonlinear: bool = False,
    forcing=None, tracer_kappa: float = 0.0, tracer_upwind: float = 1.0,
    strat=None,
) -> PrognosticVars:
    """Classical RK4 on the (normal_velocity, layer_thickness[, h*tracer])
    state, with ssh (and tracer concentration) rederived at every stage
    (what the reference's dead RK4 intended)."""
    with_tracers = prog.tracers is not None
    clm = mesh.vert.cell_level_mask

    def rates(p: PrognosticVars):
        diag = compute_diagnostics(p, mesh)
        t = compute_tendencies(p, diag, mesh, del2_coeff, nonlinear, forcing,
                               tracer_kappa, tracer_upwind, strat)
        return t.tend_normal_velocity, t.tend_layer_thickness, t.tend_tracer

    u0, h0 = prog.normal_velocity, prog.layer_thickness
    ht0 = h0[:, None, :] * prog.tracers if with_tracers else None

    def stage(du, dh, dht, a):
        h = h0 + a * dh
        tracers = None
        if with_tracers:
            tracers = tracer_concentration(ht0 + a * dht, h, clm)
        return PrognosticVars(
            ssh=update_ssh(h, mesh),
            layer_thickness=h,
            normal_velocity=u0 + a * du,
            tracers=tracers,
        )

    k1u, k1h, k1t = rates(prog)
    k2u, k2h, k2t = rates(stage(k1u, k1h, k1t, dt / 2.0))
    k3u, k3h, k3t = rates(stage(k2u, k2h, k2t, dt / 2.0))
    k4u, k4h, k4t = rates(stage(k3u, k3h, k3t, dt))

    u = u0 + (dt / 6.0) * (k1u + 2.0 * k2u + 2.0 * k3u + k4u)
    h = h0 + (dt / 6.0) * (k1h + 2.0 * k2h + 2.0 * k3h + k4h)
    tracers = None
    if with_tracers:
        ht = ht0 + (dt / 6.0) * (k1t + 2.0 * k2t + 2.0 * k3t + k4t)
        tracers = tracer_concentration(ht, h, clm)
    return PrognosticVars(ssh=update_ssh(h, mesh), layer_thickness=h,
                          normal_velocity=u, tracers=tracers)


_STEPPERS = {
    ForwardEuler: forward_euler_step,
    RungeKutta4: rk4_step,
    ForwardBackward: forward_backward_step,
}


def ocn_timestep(
    prog: PrognosticVars, mesh, dt, method=ForwardEuler, del2_coeff=0.0,
    nonlinear: bool = False, forcing=None,
    tracer_kappa: float = 0.0, tracer_upwind: float = 1.0, strat=None,
) -> PrognosticVars:
    """Advance one step with the selected stepper (reference dispatches the
    same way on a stepper tag type, time_integration.jl:2-5)."""
    try:
        step = _STEPPERS[method]
    except (KeyError, TypeError):
        raise ValueError(f"unknown time stepper {method!r}") from None
    return step(prog, mesh, dt, del2_coeff, nonlinear, forcing,
                tracer_kappa, tracer_upwind, strat)
