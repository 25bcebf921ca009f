"""Layered baroclinic (multi-layer) dynamics tests
(models/stratification.py).

The reference has no interacting levels at all — each of its K levels is an
independent barotropic copy (reference: pressure_gradient.jl:45-65) — so
the contract here is: (a) equal densities reduce EXACTLY to that behavior,
(b) the stratified dynamics reproduce the analytic baroclinic wave speeds,
(c) every execution path agrees to f64 roundoff.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mpas_ocean_tpu.forward.run_loop import ocn_run_loop
from mpas_ocean_tpu.forward.time_integration import RungeKutta4
from mpas_ocean_tpu.mesh import planar_hex_mesh
from mpas_ocean_tpu.mesh.mesh import Mesh
from mpas_ocean_tpu.mesh.vert_mesh import make_vertical_mesh
from mpas_ocean_tpu.models.shallow_water import PrognosticVars, update_ssh
from mpas_ocean_tpu.models.stratification import (
    baroclinic_wave_speeds,
    make_stratification,
)

K = 3
DT = 10.0
RHO = [1024.0, 1025.5, 1026.0]


@pytest.fixture(scope="module")
def strat_setup(hex16):
    vert = make_vertical_mesh(hex16, n_vert_levels=K)
    mesh = Mesh(horz=hex16, vert=vert).to_device()
    rng = np.random.default_rng(11)
    nc, ne = hex16.n_cells, hex16.n_edges
    h0 = np.asarray(vert.resting_thickness) + 0.05 * rng.standard_normal((nc, K))
    u0 = 0.05 * rng.standard_normal((ne, K))
    prog = PrognosticVars(
        ssh=update_ssh(jnp.asarray(h0), mesh),
        layer_thickness=jnp.asarray(h0),
        normal_velocity=jnp.asarray(u0),
    )
    return mesh, prog, make_stratification(RHO)


def test_equal_densities_reduce_to_barotropic(strat_setup):
    """With rho_k all equal every reduced gravity vanishes and the
    stratified model IS the reference's barotropic stack."""
    mesh, prog, _ = strat_setup
    s_eq = make_stratification([1026.0] * K)
    a = ocn_run_loop(prog, mesh, DT, 10)
    b = ocn_run_loop(prog, mesh, DT, 10, strat=s_eq)
    np.testing.assert_allclose(
        np.asarray(a.normal_velocity), np.asarray(b.normal_velocity),
        atol=1e-15,
    )


def test_unstable_column_rejected():
    with pytest.raises(ValueError):
        make_stratification([1026.0, 1025.0])


def test_matrix_path_parity(strat_setup):
    from mpas_ocean_tpu.models.matrix_model import MatrixModel, matrix_run_loop

    mesh, prog, strat = strat_setup
    mm = MatrixModel.from_mesh(mesh, dtype=np.float64)
    a = ocn_run_loop(prog, mesh, DT, 10, strat=strat)
    b = matrix_run_loop(prog, mm, DT, 10, strat=strat)
    np.testing.assert_allclose(
        np.asarray(a.normal_velocity), np.asarray(b.normal_velocity),
        atol=1e-13,
    )


def test_roll_and_fused_path_parity(strat_setup):
    from mpas_ocean_tpu.structured.model import StructuredModel
    from mpas_ocean_tpu.structured.pallas_model import pallas_run_loop

    mesh, prog, strat = strat_setup
    sm = StructuredModel(mesh, 16, 16)
    st = sm.to_struct(prog)
    a = ocn_run_loop(prog, mesh, DT, 10, strat=strat)
    b = sm.from_struct(sm.run(st, DT, 10, strat=strat))
    np.testing.assert_allclose(
        np.asarray(a.normal_velocity), np.asarray(b.normal_velocity),
        atol=1e-13,
    )
    c = sm.from_struct(
        pallas_run_loop(st, sm.struct_mesh, DT, 10, interpret=True,
                        strat=strat)
    )
    np.testing.assert_allclose(
        np.asarray(a.normal_velocity), np.asarray(c.normal_velocity),
        atol=1e-13,
    )
    # RK4 on gather and roll
    a4 = ocn_run_loop(prog, mesh, DT, 5, method=RungeKutta4, strat=strat)
    b4 = sm.from_struct(sm.run(st, DT, 5, strat=strat, rk4=True))
    np.testing.assert_allclose(
        np.asarray(a4.normal_velocity), np.asarray(b4.normal_velocity),
        atol=1e-13,
    )


def test_pallas_tiled_strat_parity(strat_setup):
    from mpas_ocean_tpu.structured.model import StructuredModel
    from mpas_ocean_tpu.structured.pallas_model import pallas_tiled_run_loop

    mesh, prog, strat = strat_setup
    sm = StructuredModel(mesh, 16, 16)
    st = sm.to_struct(prog)
    ref = sm.run(st, DT, 8, strat=strat)
    out = pallas_tiled_run_loop(
        st, sm.struct_mesh, DT, 8, row_tile=4, interpret=True, q=2,
        strat=strat,
    )
    np.testing.assert_allclose(
        np.asarray(ref.normal_velocity), np.asarray(out.normal_velocity),
        atol=1e-13,
    )


def test_sharded_parity(strat_setup):
    from mpas_ocean_tpu.parallel.shard_step import ShardedModel

    mesh, prog, strat = strat_setup
    sm = ShardedModel(mesh, devices=jax.devices())
    for kwargs in (dict(), dict(method=RungeKutta4), dict(nonlinear=True)):
        a = ocn_run_loop(prog, mesh, DT, 6, strat=strat, **kwargs)
        b = sm.gather(sm.run(sm.scatter(prog), DT, 6, strat=strat, **kwargs))
        np.testing.assert_allclose(
            np.asarray(a.normal_velocity), np.asarray(b.normal_velocity),
            atol=1e-13,
        )


def test_structured_sharded_parity(strat_setup):
    from mpas_ocean_tpu.structured.model import StructuredModel
    from mpas_ocean_tpu.structured.sharded import ShardedStructuredModel

    mesh, prog, strat = strat_setup
    sm = StructuredModel(mesh, 16, 16)
    st = sm.to_struct(prog)
    ref = sm.run(st, DT, 6, strat=strat)
    for overlap in (False, True):
        ssm = ShardedStructuredModel(
            sm.struct_mesh, devices=jax.devices(), overlap=overlap
        )
        out = ssm.gather(ssm.run(ssm.scatter(st), DT, 6, strat=strat))
        np.testing.assert_allclose(
            np.asarray(ref.normal_velocity), np.asarray(out.normal_velocity),
            atol=1e-13,
        )


def test_fused_adjoint_with_strat(strat_setup):
    from mpas_ocean_tpu.structured.model import StructuredModel
    from mpas_ocean_tpu.structured.pallas_model import (
        _checkpointed_roll_rollout,
        pallas_adjoint_rollout,
    )

    mesh, prog, strat = strat_setup
    sm = StructuredModel(mesh, 16, 16)
    st = sm.to_struct(prog)
    n = 6

    def roll_obj(s):
        out = _checkpointed_roll_rollout(s, sm.struct_mesh, DT, n, strat=strat)
        return jnp.sum(out.ssh ** 2)

    g_ref = jax.grad(roll_obj)(st)
    out = _checkpointed_roll_rollout(st, sm.struct_mesh, DT, n, strat=strat)
    g_out = out.replace(
        ssh=2 * out.ssh,
        layer_thickness=jnp.zeros_like(out.layer_thickness),
        normal_velocity=jnp.zeros_like(out.normal_velocity),
    )
    d_state, _ = pallas_adjoint_rollout(
        st, sm.struct_mesh, DT, n, g_out, plan=(2, 3), interpret=True,
        strat=strat,
    )
    for name in ("ssh", "layer_thickness", "normal_velocity"):
        a = np.asarray(getattr(g_ref, name))
        b = np.asarray(getattr(d_state, name))
        np.testing.assert_allclose(b, a, atol=1e-11 * max(1.0, np.abs(a).max()))


def test_strat_gradient_flows_and_matches(strat_setup):
    """d(objective)/d(phi_weights) is nonzero and identical whether it flows
    through pallas_rollout_diff's custom VJP or plain AD of the roll model
    (the review found the custom VJP silently returning zeros)."""
    from mpas_ocean_tpu.structured.model import StructuredModel
    from mpas_ocean_tpu.structured.pallas_model import (
        _checkpointed_roll_rollout,
        pallas_rollout_diff,
    )

    mesh, prog, strat = strat_setup
    sm = StructuredModel(mesh, 16, 16)
    st = sm.to_struct(prog)
    n = 5

    def f_diff(w):
        out = pallas_rollout_diff(st, sm.struct_mesh, DT, n, False, 0.0,
                                  1.0, w)
        return jnp.sum(out.ssh ** 2)

    def f_roll(w):
        out = _checkpointed_roll_rollout(st, sm.struct_mesh, DT, n, strat=w)
        return jnp.sum(out.ssh ** 2)

    g1 = jax.grad(f_diff)(strat)
    g2 = jax.grad(f_roll)(strat)
    assert float(jnp.abs(g2.phi_weights).max()) > 0
    np.testing.assert_allclose(
        np.asarray(g1.phi_weights), np.asarray(g2.phi_weights), rtol=1e-10
    )


def test_fused_segment_strat_weight_cotangent(strat_setup):
    """The fused adjoint-segment kernels accumulate d(phi_weights) too
    (interpret mode): matches the roll-model gradient."""
    from mpas_ocean_tpu.structured.model import StructuredModel
    from mpas_ocean_tpu.structured.pallas_model import (
        _adjoint_aux,
        _checkpointed_roll_rollout,
        _nl_setup,
        _pallas_adjoint_from_ckpts,
        _pallas_forward_ckpts,
        _strat_w,
    )

    mesh, prog, strat = strat_setup
    sm = StructuredModel(mesh, 16, 16)
    smesh = sm.struct_mesh
    st = sm.to_struct(prog)
    n, b, m = 6, 2, 3
    dtype = st.layer_thickness.dtype
    f_edge, rts, scal, mask = _adjoint_aux(smesh, DT, dtype)
    sw = _strat_w(strat, dtype)
    ny2, nx = smesh.ny2, smesh.nx
    k = st.layer_thickness.shape[-1]
    _, ckpts = _pallas_forward_ckpts(
        st.ssh[..., None], st.layer_thickness,
        st.normal_velocity.reshape(6, ny2, nx, k),
        f_edge, rts, scal, mask, None, None, None, sw,
        terms=smesh.coriolis_terms, n_steps=n, big=b * m, interpret=True,
    )
    out = _checkpointed_roll_rollout(st, smesh, DT, n, strat=strat)
    cot0 = (
        (2 * out.ssh)[..., None].astype(dtype),
        jnp.zeros_like(out.layer_thickness),
        jnp.zeros((6, ny2, nx, k), dtype),
    )
    _, _, dsw, _, _ = _pallas_adjoint_from_ckpts(
        ckpts, f_edge, rts, scal, cot0, mask, None, None, sw,
        terms=smesh.coriolis_terms, b=b, m=m, interpret=True,
    )

    def f_roll(w):
        o = _checkpointed_roll_rollout(st, smesh, DT, n, strat=w)
        return jnp.sum(o.ssh ** 2)

    g_ref = jax.grad(f_roll)(strat).phi_weights
    np.testing.assert_allclose(
        np.asarray(dsw), np.asarray(g_ref),
        atol=1e-10 * max(1.0, float(jnp.abs(g_ref).max())),
    )


def test_two_layer_internal_wave_speed():
    """A standing baroclinic mode (interface tilted, surface flat) must
    oscillate at omega = c1*k with c1^2 = g' H1 H2/(H1+H2): run half a
    period with RK4 and check the mode amplitude has inverted. This is the
    physics the reference cannot represent at all."""
    from mpas_ocean_tpu.verification import InternalWave

    nx, dc = 32, 10000.0
    iw = InternalWave(lx=nx * dc / 1e3, amplitude=1.0)
    horz = planar_hex_mesh(nx, nx, dc, f0=0.0)
    vert = make_vertical_mesh(
        horz, n_vert_levels=2,
        resting_thickness=np.tile(np.array([iw.h1, iw.h2]), (horz.n_cells, 1)),
    )
    mesh = Mesh(horz=horz, vert=vert).to_device()
    strat = make_stratification(iw.densities())
    cs = baroclinic_wave_speeds(iw.densities(), [iw.h1, iw.h2])
    # mode speeds themselves: barotropic ~ sqrt(gH), baroclinic ~ the
    # reduced-gravity two-layer formula
    np.testing.assert_allclose(
        cs[0], np.sqrt(iw.g * (iw.h1 + iw.h2)), rtol=1e-3
    )
    np.testing.assert_allclose(
        cs[1], np.sqrt(iw.g_prime * iw.h1 * iw.h2 / (iw.h1 + iw.h2)),
        rtol=1e-3,
    )

    ssh, h, u = iw.initial_state(horz)
    prog = PrognosticVars(
        ssh=jnp.asarray(ssh),
        layer_thickness=jnp.asarray(h),
        normal_velocity=jnp.asarray(u),
    )
    dt = 100.0
    n_half = int(round(iw.period / 2 / dt))
    out = ocn_run_loop(prog, mesh, dt, n_half, method=RungeKutta4, strat=strat)
    # after half a period the standing mode must match the exact solution
    # with inverted amplitude
    x = np.asarray(horz.cells.x)
    basis = np.sin(iw.k * x)
    proj = lambda f: float(np.vdot(basis, f - iw.h1) / np.vdot(basis, basis))
    a0 = proj(h[:, 0])
    a1 = proj(np.asarray(out.layer_thickness[:, 0]))
    np.testing.assert_allclose(a1, -a0, rtol=0.05)
    exact = iw.exact_thickness(x, n_half * dt)
    rmse = float(np.sqrt(np.mean((np.asarray(out.layer_thickness) - exact) ** 2)))
    assert rmse < 0.05 * iw.amplitude


def test_driver_stratified_config(tmp_path):
    from mpas_ocean_tpu.forward.driver import ocn_run
    from mpas_ocean_tpu.tools import make_igw_case

    case = tmp_path / "strat_case"
    cfg = make_igw_case(case, nx=16, resolution_km=200.0, n_vert_levels=2,
                        duration_seconds=2000,
                        layer_densities=[1025.0, 1026.0])
    setup, prog = ocn_run(cfg)
    assert setup.strat is not None
    assert np.all(np.isfinite(np.asarray(prog.normal_velocity)))
    # levels must now DIFFER (the barotropic stack would keep them equal,
    # since the IGW initial state is level-replicated)
    du = np.abs(
        np.asarray(prog.normal_velocity[:, 0])
        - np.asarray(prog.normal_velocity[:, 1])
    ).max()
    assert du > 0


def test_density_count_mismatch_rejected(tmp_path):
    from mpas_ocean_tpu.forward.init import ocn_init
    from mpas_ocean_tpu.tools import make_igw_case

    case = tmp_path / "bad_strat_case"
    cfg = make_igw_case(case, nx=16, resolution_km=200.0, n_vert_levels=1,
                        duration_seconds=2000,
                        layer_densities=[1025.0, 1026.0])
    with pytest.raises(ValueError):
        ocn_init(cfg)
