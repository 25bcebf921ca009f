"""NetCDF round-trip, config-driven init, driver end-to-end, restart."""

import os

import numpy as np
import pytest

from mpas_ocean_tpu.forward.driver import ocn_run
from mpas_ocean_tpu.forward.init import ocn_init, plan_steps
from mpas_ocean_tpu.infra.netcdf import read_netcdf
from mpas_ocean_tpu.mesh.io import read_mpas_mesh, save_mpas_mesh
from mpas_ocean_tpu.ops import tangential_reconstruction
from mpas_ocean_tpu.tools import make_igw_case
from mpas_ocean_tpu.verification.inertial_gravity_wave import InertialGravityWave


@pytest.fixture(scope="module")
def igw_case(tmp_path_factory):
    d = tmp_path_factory.mktemp("igw_case")
    cfg = make_igw_case(
        d, nx=16, resolution_km=200.0, duration_seconds=4000,
        output_interval_seconds=2000,
    )
    return str(d), cfg


def test_mesh_roundtrip(hex16, tmp_path):
    path = tmp_path / "mesh.nc"
    save_mpas_mesh(path, hex16)
    m2 = read_mpas_mesh(path)
    assert m2.n_cells == hex16.n_cells
    np.testing.assert_allclose(
        np.asarray(m2.edges.dc_edge), np.asarray(hex16.edges.dc_edge)
    )
    np.testing.assert_array_equal(
        np.asarray(m2.cells.edges_on_cell), np.asarray(hex16.cells.edges_on_cell)
    )
    np.testing.assert_allclose(
        np.asarray(m2.cells.edge_sign_on_cell),
        np.asarray(hex16.cells.edge_sign_on_cell),
    )
    # weights survive and still reconstruct uniform flow exactly
    ang = np.asarray(m2.edges.angle_edge)
    u = 2.0 * np.cos(ang) - 1.0 * np.sin(ang)
    t_exact = -2.0 * np.sin(ang) - 1.0 * np.cos(ang)
    t_num = np.asarray(tangential_reconstruction(u[:, None], m2))[:, 0]
    np.testing.assert_allclose(t_num, t_exact, atol=1e-12)


def test_ocn_init(igw_case):
    d, cfg = igw_case
    setup, prog = ocn_init(cfg)
    assert setup.mesh.n_cells == 16 * 16
    assert prog.layer_thickness.shape == (16 * 16, 1)
    # dt from config (400s for 200km, mpas heuristic), 10 steps
    n_steps, every = plan_steps(setup.time_manager)
    assert n_steps == 10
    assert every == 5


def test_driver_end_to_end(igw_case):
    d, cfg = igw_case
    setup, prog = ocn_run(cfg)
    out_fp = os.path.join(d, "output.nc")
    assert os.path.exists(out_fp)
    out = read_netcdf(out_fp)
    assert out.attrs["dt"] == 400.0
    assert out["time"][0] == 4000.0
    np.testing.assert_allclose(out["ssh"][0], np.asarray(prog.ssh))

    igw = InertialGravityWave(lx=16 * 200.0)
    xc = np.asarray(setup.mesh.cells.x)
    yc = np.asarray(setup.mesh.cells.y)
    rmse = np.sqrt(np.mean((out["ssh"][0] - igw.exact_ssh(xc, yc, 4000.0)) ** 2))
    assert rmse < 0.4  # very coarse 16x16 sanity gate

    # periodic snapshot written at the mid-run output alarm
    assert os.path.exists(os.path.join(d, "output.0000.nc"))


def test_restart(igw_case, tmp_path):
    """Improvement over the reference (restart raises 'not yet supported',
    PrognosticVars.jl:62-65): a run restarted from a prior output matches a
    straight-through run."""
    d, _ = igw_case
    case = tmp_path / "restart_case"
    import shutil

    cfg1 = make_igw_case(case, nx=16, resolution_km=200.0, duration_seconds=2000)
    _, prog_half = ocn_run(cfg1)
    # keep the half-run state as the restart file before it gets overwritten
    shutil.copy(case / "output.nc", case / "restart.nc")

    # full run: 4000s in one go
    cfg2 = make_igw_case(case, nx=16, resolution_km=200.0, duration_seconds=4000)
    _, prog_full = ocn_run(cfg2)
    cfg3 = make_igw_case(case, nx=16, resolution_km=200.0, duration_seconds=2000)
    text = open(cfg3).read().replace(
        "config_do_restart: false", "config_do_restart: true"
    )
    open(cfg3, "w").write(text)
    _, prog_restart = ocn_run(cfg3)

    np.testing.assert_allclose(
        np.asarray(prog_restart.ssh), np.asarray(prog_full.ssh), atol=1e-12
    )
    np.testing.assert_allclose(
        np.asarray(prog_restart.normal_velocity),
        np.asarray(prog_full.normal_velocity),
        atol=1e-12,
    )


def test_driver_ad_run(igw_case):
    """--ad driver: full rollout + adjoint of sum(ssh^2), shadows persisted
    (reference: test_Enzyme_end2end.jl writes d_Prog via write_netcdf)."""
    from mpas_ocean_tpu.forward.driver import ocn_run_with_ad

    d, cfg = igw_case
    setup, final, d_prog, obj = ocn_run_with_ad(cfg, use_config_dt=True)
    assert obj == pytest.approx(float(np.sum(np.asarray(final.ssh) ** 2)), rel=1e-12)

    out = read_netcdf(os.path.join(d, "output.nc"))
    for name, ref in (
        ("d_ssh", d_prog.ssh),
        ("d_layerThickness", d_prog.layer_thickness),
        ("d_normalVelocity", d_prog.normal_velocity),
    ):
        np.testing.assert_allclose(
            np.asarray(out[name][0]).reshape(np.asarray(ref).shape),
            np.asarray(ref),
            atol=1e-12,
        )
    assert np.abs(np.asarray(d_prog.layer_thickness)).max() > 0
