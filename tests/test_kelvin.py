"""Coastal Kelvin wave channel: boundary conditions + analytic propagation
(the reference's perf-benchmark configuration, README.MD:45-50, exercised
for correctness: masked boundary edges, wall velocities, wave speed)."""

import jax.numpy as jnp
import numpy as np
import pytest

from mpas_ocean_tpu.forward.run_loop import ocn_run_loop
from mpas_ocean_tpu.mesh import planar_hex_mesh
from mpas_ocean_tpu.mesh.cull import cull_cells
from mpas_ocean_tpu.mesh.mesh import Mesh
from mpas_ocean_tpu.mesh.vert_mesh import make_vertical_mesh
from mpas_ocean_tpu.models.shallow_water import PrognosticVars
from mpas_ocean_tpu.verification.kelvin_wave import KelvinWave


@pytest.fixture(scope="module")
def channel():
    """Channel: periodic in x, walls north and south (rows culled)."""
    nx, ny = 32, 32
    dc = 10000.0e3 / nx
    horz = planar_hex_mesh(nx, ny, dc, f0=1e-4)
    y = np.asarray(horz.cells.y)
    keep = (y > 0.5 * dc) & (y < y.max() - 0.5 * dc)  # cull first/last row
    chan = cull_cells(horz, keep)
    vert = make_vertical_mesh(
        chan, n_vert_levels=1, resting_thickness=np.full((chan.n_cells, 1), 1000.0)
    )
    return Mesh(horz=chan, vert=vert).to_device(), dc


def test_cull_structure(channel):
    mesh, dc = channel
    em = np.asarray(mesh.edges.edge_mask)
    assert (em == 0).sum() > 0  # boundary edges exist
    # boundary edges have both cell slots equal (wall degeneracy)
    coe = np.asarray(mesh.edges.cells_on_edge)
    b = em == 0
    assert (coe[b, 0] == coe[b, 1]).all()
    # interior connectivity still refers to live elements
    assert np.asarray(mesh.cells.edges_on_cell).max() < mesh.n_edges


def test_wall_stays_closed(channel):
    mesh, dc = channel
    kw = KelvinWave(f0=1e-4, lx=10000.0)
    ssh, h, u = kw.initial_state(mesh.horz)
    prog = PrognosticVars(
        ssh=jnp.asarray(ssh),
        layer_thickness=jnp.asarray(h),
        normal_velocity=jnp.asarray(u),
    )
    fin = ocn_run_loop(prog, mesh, 200.0, 20)
    em = np.asarray(mesh.edges.edge_mask)
    wall_u = np.asarray(fin.normal_velocity)[em == 0]
    np.testing.assert_allclose(wall_u, 0.0, atol=0.0)
    assert np.isfinite(np.asarray(fin.ssh)).all()


def test_volume_conserved_with_walls(channel):
    mesh, dc = channel
    kw = KelvinWave()
    ssh, h, u = kw.initial_state(mesh.horz)
    prog = PrognosticVars(
        ssh=jnp.asarray(ssh),
        layer_thickness=jnp.asarray(h),
        normal_velocity=jnp.asarray(u),
    )
    area = np.asarray(mesh.cells.area_cell)
    v0 = float((np.asarray(prog.layer_thickness)[:, 0] * area).sum())
    fin = ocn_run_loop(prog, mesh, 200.0, 20)
    v1 = float((np.asarray(fin.layer_thickness)[:, 0] * area).sum())
    assert abs(v1 - v0) < 1e-9 * abs(v0)


def test_kelvin_wave_propagation(channel):
    """The wave must track the analytic translating solution."""
    mesh, dc = channel
    kw = KelvinWave(f0=1e-4, lx=10000.0)
    ssh, h, u = kw.initial_state(mesh.horz)
    prog = PrognosticVars(
        ssh=jnp.asarray(ssh),
        layer_thickness=jnp.asarray(h),
        normal_velocity=jnp.asarray(u),
    )
    dt, n = 200.0, 25  # 5000 s: wave moves ~495 km (~1.6 cells)
    fin = ocn_run_loop(prog, mesh, dt, n)
    x = np.asarray(mesh.cells.x)
    y = np.asarray(mesh.cells.y)
    t = dt * n
    exact = kw.exact_ssh(x, y, t)
    # weight toward the wall where the wave lives
    rmse = np.sqrt(np.mean((np.asarray(fin.ssh) - exact) ** 2))
    rms_sig = np.sqrt(np.mean(exact**2))
    assert rmse < 0.15 * rms_sig
    # and it must clearly beat the "wave did not move" hypothesis
    rmse_static = np.sqrt(np.mean((np.asarray(fin.ssh) - kw.exact_ssh(x, y, 0.0)) ** 2))
    assert rmse < 0.5 * rmse_static
