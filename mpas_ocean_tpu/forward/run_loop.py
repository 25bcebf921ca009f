"""Jitted run loops: the whole rollout is one `lax.scan`.

The reference drives a host-side while-loop over the clock, paying kernel
launch + synchronize latency every step (reference: src/forward/run_loop.jl:8-22,
SURVEY section 3.1). Here the clock is compiled down to a static step count
before entering jit, and the entire rollout — including the optional
sum(ssh^2) objective the reference computes with a serial one-thread device
kernel (run_loop.jl:47-51) — is traced once and fused by XLA.

Adjoints: `jax.grad` of `ocn_run_loop_objective` replaces the reference's
Enzyme reverse pass over the loop (test/enzyme/test_Enzyme_end2end.jl;
ext/MPASEnzymeExt.jl). The per-step `jax.checkpoint` keeps reverse-mode
memory at O(sqrt? no — O(n_steps) checkpoints of O(state)) instead of
storing every intermediate of every step.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..models.shallow_water import PrognosticVars
from .time_integration import ForwardEuler, ocn_timestep


@partial(jax.jit, static_argnames=("n_steps", "method", "checkpoint", "del2_coeff", "nonlinear", "tracer_kappa", "tracer_upwind"))
def ocn_run_loop(
    prog: PrognosticVars,
    mesh,
    dt,
    n_steps: int,
    method=ForwardEuler,
    checkpoint: bool = False,
    del2_coeff: float = 0.0,
    nonlinear: bool = False,
    forcing=None,
    tracer_kappa: float = 0.0,
    tracer_upwind: float = 1.0,
    strat=None,
) -> PrognosticVars:
    """Advance ``n_steps`` timesteps under one jit/scan."""

    def body(p, _):
        return ocn_timestep(p, mesh, dt, method, del2_coeff, nonlinear,
                            forcing, tracer_kappa, tracer_upwind, strat), None

    if checkpoint:
        body = jax.checkpoint(body)
    final, _ = jax.lax.scan(body, prog, length=n_steps)
    return final


@partial(jax.jit, static_argnames=("n_steps", "method", "nonlinear", "tracer_kappa", "tracer_upwind"))
def ocn_run_loop_objective(
    prog: PrognosticVars, mesh, dt, n_steps: int, method=ForwardEuler,
    nonlinear: bool = False, forcing=None,
    tracer_kappa: float = 0.0, tracer_upwind: float = 1.0, strat=None,
) -> jnp.ndarray:
    """Rollout followed by the reference's test objective sum(ssh^2)
    (reference: run_loop.jl:26-45). Differentiable end to end."""
    final = ocn_run_loop(
        prog, mesh, dt, n_steps, method, checkpoint=True, nonlinear=nonlinear,
        forcing=forcing, tracer_kappa=tracer_kappa, tracer_upwind=tracer_upwind,
        strat=strat,
    )
    return jnp.sum(final.ssh * final.ssh)


@partial(jax.jit, static_argnames=("n_steps", "n_outputs", "method", "nonlinear", "tracer_kappa", "tracer_upwind"))
def ocn_run_loop_with_outputs(
    prog: PrognosticVars,
    mesh,
    dt,
    n_steps: int,
    n_outputs: int,
    method=ForwardEuler,
    nonlinear: bool = False,
    forcing=None,
    tracer_kappa: float = 0.0,
    tracer_upwind: float = 1.0,
    strat=None,
):
    """Rollout that also returns the state every n_steps/n_outputs steps
    (the in-loop periodic output the reference's output alarm only stubs,
    run_loop.jl:15-18). n_outputs must divide n_steps."""
    assert n_steps % n_outputs == 0
    chunk = n_steps // n_outputs

    def outer(p, _):
        def body(q, _):
            return ocn_timestep(
                q, mesh, dt, method, nonlinear=nonlinear, forcing=forcing,
                tracer_kappa=tracer_kappa, tracer_upwind=tracer_upwind,
                strat=strat,
            ), None

        p, _ = jax.lax.scan(body, p, length=chunk)
        return p, p

    final, outputs = jax.lax.scan(outer, prog, length=n_outputs)
    return final, outputs


@partial(jax.jit, static_argnames=("n_steps", "every", "method", "snapshots", "nonlinear", "tracer_kappa", "tracer_upwind"))
def ocn_run_loop_with_monitor(
    prog: PrognosticVars,
    mesh,
    dt,
    n_steps: int,
    every: int,
    method=ForwardEuler,
    snapshots: bool = False,
    nonlinear: bool = False,
    forcing=None,
    tracer_kappa: float = 0.0,
    tracer_upwind: float = 1.0,
    strat=None,
):
    """Rollout that also samples physics health metrics every ``every``
    steps, ON DEVICE inside the scan (total volume, total kinetic energy,
    max |u|, ssh RMS) — the in-run observability tier the reference lacks
    entirely (SURVEY section 5: 'metrics/logging: stdlib Logging + final
    NetCDF only'). Returns (final_state, dict of (n_samples,) arrays), plus
    the stacked state at each sample point when ``snapshots=True`` (so
    monitoring composes with periodic NetCDF output in one rollout).

    Conservation drift and blow-up are visible from the series without
    writing a single output file; infra/monitor.py renders/logs it.
    """
    assert n_steps % every == 0
    from ..constants import GRAVITY
    from ..models.shallow_water import (
        kinetic_energy_on_cell,
        potential_vorticity_on_vertex,
    )
    from ..ops.operators import interpolate_cell_to_vertex

    area = mesh.cells.area_cell

    def outer(p, _):
        def body(q, _):
            return ocn_timestep(
                q, mesh, dt, method, nonlinear=nonlinear, forcing=forcing,
                tracer_kappa=tracer_kappa, tracer_upwind=tracer_upwind,
                strat=strat,
            ), None

        p, _ = jax.lax.scan(body, p, length=every)
        h_act = p.layer_thickness * mesh.vert.cell_level_mask
        ke_col = kinetic_energy_on_cell(p.normal_velocity, mesh)  # (nC, K)
        ke_total = jnp.sum((ke_col * h_act).sum(axis=1) * area)
        pe_total = 0.5 * GRAVITY * jnp.sum(p.ssh * p.ssh * area)
        # potential enstrophy sum_v A_v h_v q^2 / 2 — conserved (up to
        # time-discretization) by the TRiSK PV flux; its drift is the
        # canary for a broken nonlinear scheme. For linear runs the metric
        # carries no conservation meaning, so skip the curl + two vertex
        # interpolations and report NaN (schema stays stable).
        if nonlinear:
            q_v = potential_vorticity_on_vertex(p, mesh)
            h_v = interpolate_cell_to_vertex(p.layer_thickness, mesh)
            a_tri = mesh.duals.area_triangle
            enstrophy = 0.5 * jnp.sum(
                (h_v * q_v * q_v * mesh.vert.vertex_level_mask).sum(axis=1)
                * a_tri
            )
        else:
            enstrophy = jnp.asarray(jnp.nan, dtype=p.ssh.dtype)
        stats = {
            "volume": jnp.sum(h_act.sum(axis=1) * area),
            # KE weighted by layer thickness and cell area (J / rho0)
            "kinetic_energy": ke_total,
            # spatially conserved by the nonlinear scheme (tests pin it);
            # in LINEAR runs only meaningful as a blow-up canary
            "total_energy": ke_total + pe_total,
            "pot_enstrophy": enstrophy,
            "max_abs_u": jnp.max(jnp.abs(p.normal_velocity)),
            "ssh_rms": jnp.sqrt(jnp.mean(p.ssh * p.ssh)),
        }
        if p.tracers is not None:
            # conserved per-tracer integral sum A h T (models/tracers.py);
            # drift beyond roundoff = a broken tracer flux
            from ..models.tracers import total_tracer_content

            stats["tracer_content"] = total_tracer_content(
                p.tracers, p.layer_thickness, mesh
            )
        return p, (stats, p) if snapshots else stats

    final, out = jax.lax.scan(outer, prog, length=n_steps // every)
    if snapshots:
        series, snaps = out
        return final, series, snaps
    return final, out
