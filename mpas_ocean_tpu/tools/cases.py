"""Self-contained test-case generation.

The reference pulls its run-ready cases (mesh + initial_state.nc +
config.yml per resolution) from a lazy artifact tarball (reference:
Artifacts.toml:1-6, used at test/enzyme/test_Enzyme_end2end.jl:8-19). In a
zero-egress environment we generate equivalent cases locally: a periodic hex
mesh, the polaris-style inertial-gravity-wave initial state, and a YAML
config in the reference's schema.
"""

from __future__ import annotations

import os
from datetime import timedelta

import numpy as np

from ..mesh.io import save_mpas_mesh
from ..mesh.mesh import Mesh
from ..mesh.planar_hex import planar_hex_mesh
from ..mesh.vert_mesh import make_vertical_mesh
from ..verification.inertial_gravity_wave import InertialGravityWave

__all__ = ["make_igw_case", "mpas_interval"]


def mpas_interval(seconds: float) -> str:
    """Render seconds as an MPAS interval timestamp 0000-00-DD_hh:mm:ss."""
    td = timedelta(seconds=float(seconds))
    days = td.days
    s = td.seconds
    return f"0000-00-{days:02d}_{s // 3600:02d}:{(s % 3600) // 60:02d}:{s % 60:02d}"


CONFIG_TEMPLATE = """omega:
  time_management:
    config_do_restart: false
    config_start_time: 0001-01-01_00:00:00
    config_stop_time: none
    config_run_duration: {run_duration}
    config_restart_timestamp_name: restart_timestamp
  time_integration:
    config_dt: {dt}
    config_number_of_time_levels: 2
    config_time_integrator: {integrator}
    config_nonlinear_dynamics: {nonlinear}
{forcing_section}  streams:
    mesh:
      filename_template: {case_dir}/initial_state.nc
    input:
      filename_template: {case_dir}/initial_state.nc
    restart:
      filename_template: {case_dir}/restart.nc
    output:
      filename_template: {case_dir}/output.nc
      output_interval: {output_interval}
      reference_time: 0001-01-01_00:00:00
"""


def make_igw_case(
    case_dir,
    nx: int = 50,
    resolution_km: float = 200.0,
    n_vert_levels: int = 1,
    duration_seconds: float | None = None,
    output_interval_seconds: float | None = None,
    integrator: str = "ForwardEuler",
    f0: float = 1e-4,
    nonlinear: bool = False,
    forcing: dict | None = None,
    tracers: bool = False,
    tracer_del2: float = 0.0,
    tracer_upwind: float = 1.0,
    layer_densities=None,
) -> str:
    """Generate an inertial-gravity-wave case directory; returns the config
    path. Box size follows the polaris case the reference artifacts encode:
    lx = nx * resolution, ly = sqrt(3)/2 * lx (inertialGravityWave.jl:13-14).
    """
    case_dir = os.fspath(case_dir)
    os.makedirs(case_dir, exist_ok=True)
    dc = resolution_km * 1e3

    horz = planar_hex_mesh(nx, nx, dc, f0=f0)
    igw = InertialGravityWave(lx=nx * resolution_km, f0=f0)
    vert = make_vertical_mesh(
        horz,
        n_vert_levels=n_vert_levels,
        resting_thickness=np.full(
            (horz.n_cells, n_vert_levels), igw.bottom_depth / n_vert_levels
        ),
    )
    mesh = Mesh(horz=horz, vert=vert)
    state = igw.initial_state(horz, n_vert_levels)
    cell_fields = None
    if tracers:
        # idealized T/S: zonally varying temperature, uniform salinity —
        # enough structure to exercise advection/diffusion and enough
        # symmetry that the uniform-salinity invariant is checkable
        x = np.asarray(horz.cells.x)
        cell_fields = {
            "temperature": 10.0 + 2.0 * np.sin(2 * np.pi * x / (nx * dc)),
            "salinity": np.full(horz.n_cells, 35.0),
        }
    save_mpas_mesh(os.path.join(case_dir, "initial_state.nc"), mesh, state,
                   cell_fields=cell_fields)

    # the dt the reference's heuristic will choose (init.jl:117-119)
    dt = float(np.floor(2.0 * (dc / 1e3) * dc / 200e3))
    if duration_seconds is None:
        duration_seconds = 10 * dt
    if output_interval_seconds is None:
        output_interval_seconds = duration_seconds

    forcing_section = ""
    if forcing:
        # optional namelist `forcing` section (forward/init.py
        # _forcing_from_config keys, e.g. config_wind_stress_zonal)
        lines = ["  forcing:"]
        for key, value in forcing.items():
            lines.append(f"    {key}: {value}")
        forcing_section = "\n".join(lines) + "\n"
    if tracers:
        # optional namelist `tracer_transport` section (forward/init.py
        # _tracer_opts_from_config)
        forcing_section += (
            "  tracer_transport:\n"
            "    config_tracer_names: [temperature, salinity]\n"
            f"    config_tracer_del2: {tracer_del2}\n"
            f"    config_tracer_upwind: {tracer_upwind}\n"
        )
    if layer_densities is not None:
        # optional namelist `stratification` section (layered baroclinic
        # dynamics, forward/init.py _strat_from_config)
        dens = ", ".join(str(float(r)) for r in layer_densities)
        forcing_section += (
            "  stratification:\n"
            f"    config_layer_densities: [{dens}]\n"
        )
    config = CONFIG_TEMPLATE.format(
        forcing_section=forcing_section,
        run_duration=mpas_interval(duration_seconds),
        dt=mpas_interval(dt),
        output_interval=mpas_interval(output_interval_seconds),
        integrator=integrator,
        case_dir=case_dir,
        nonlinear="true" if nonlinear else "false",
    )
    config_fp = os.path.join(case_dir, "config.yml")
    with open(config_fp, "w") as f:
        f.write(config)
    return config_fp
