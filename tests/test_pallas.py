"""Fused Pallas rollout kernel must agree with the roll-formulation model
to roundoff, forward and backward (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mpas_ocean_tpu.mesh import planar_hex_mesh
from mpas_ocean_tpu.mesh.mesh import Mesh
from mpas_ocean_tpu.mesh.vert_mesh import make_vertical_mesh
from mpas_ocean_tpu.models.shallow_water import PrognosticVars
from mpas_ocean_tpu.structured import StructuredModel, pallas_run_loop, pallas_step
from mpas_ocean_tpu.structured.model import structured_run_loop, structured_step

NX = NY = 8
K = 4


@pytest.fixture(scope="module")
def setup():
    horz = planar_hex_mesh(NX, NY, 1000.0, f0=1e-4, beta=1e-11)
    vert = make_vertical_mesh(
        horz, n_vert_levels=K, resting_thickness=np.full((horz.n_cells, K), 10.0)
    )
    mesh = Mesh(horz=horz, vert=vert).to_device()
    sm = StructuredModel(mesh, NX, NY)

    rng = np.random.default_rng(7)
    h = np.full((horz.n_cells, K), 10.0) + 0.01 * rng.normal(size=(horz.n_cells, K))
    u = 0.01 * rng.normal(size=(horz.n_edges, K))
    ssh = h.sum(1) - np.asarray(vert.resting_thickness_sum)
    prog = PrognosticVars(
        ssh=jnp.asarray(ssh),
        layer_thickness=jnp.asarray(h),
        normal_velocity=jnp.asarray(u),
    )
    return sm, sm.to_struct(prog)


def test_pallas_rollout_matches_roll_model(setup):
    sm, st = setup
    n = 5
    ref = structured_run_loop(st, sm.struct_mesh, 10.0, n)
    out = pallas_run_loop(st, sm.struct_mesh, 10.0, n, interpret=True)
    np.testing.assert_allclose(
        np.asarray(out.ssh), np.asarray(ref.ssh), rtol=0, atol=1e-11
    )
    np.testing.assert_allclose(
        np.asarray(out.layer_thickness),
        np.asarray(ref.layer_thickness),
        rtol=0,
        atol=1e-11,
    )
    np.testing.assert_allclose(
        np.asarray(out.normal_velocity),
        np.asarray(ref.normal_velocity),
        rtol=0,
        atol=1e-13,
    )


def test_pallas_step_grad_matches_roll_grad(setup):
    sm, st = setup
    mesh = sm.struct_mesh

    def obj_pallas(s):
        out = pallas_step(s, mesh, 10.0)
        return jnp.sum(out.ssh**2) + jnp.sum(out.normal_velocity**2)

    def obj_roll(s):
        out = structured_step(s, mesh, 10.0)
        return jnp.sum(out.ssh**2) + jnp.sum(out.normal_velocity**2)

    g_p = jax.grad(obj_pallas)(st)
    g_r = jax.grad(obj_roll)(st)
    for a, b in zip(jax.tree.leaves(g_p), jax.tree.leaves(g_r)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-10)


@pytest.mark.parametrize("row_tile", [1, 2, 4])
def test_pallas_tiled_matches_roll_model(setup, row_tile):
    """Tiled single-step kernel (any-size path) == roll model, for several
    tile heights including the degenerate 1-row tile."""
    from mpas_ocean_tpu.structured import pallas_tiled_run_loop

    sm, st = setup
    n = 4
    ref = structured_run_loop(st, sm.struct_mesh, 10.0, n)
    out = pallas_tiled_run_loop(
        st, sm.struct_mesh, 10.0, n, row_tile=row_tile, interpret=True
    )
    np.testing.assert_allclose(
        np.asarray(out.ssh), np.asarray(ref.ssh), rtol=0, atol=1e-11
    )
    np.testing.assert_allclose(
        np.asarray(out.layer_thickness),
        np.asarray(ref.layer_thickness),
        rtol=0,
        atol=1e-11,
    )
    np.testing.assert_allclose(
        np.asarray(out.normal_velocity),
        np.asarray(ref.normal_velocity),
        rtol=0,
        atol=1e-13,
    )


def test_pallas_rollout_diff_grad_matches_roll_grad(setup):
    """n-step fused-rollout VJP == direct grad through the roll scan
    (VERDICT round-1 item 4: the fastest path must be differentiable for
    whole rollouts, mirroring the reference's Enzyme end-to-end reverse,
    test_Enzyme_end2end.jl:78-92)."""
    from mpas_ocean_tpu.structured import pallas_rollout_diff

    sm, st = setup
    mesh = sm.struct_mesh
    n = 7  # exercises the sqrt-chunking (b=2, a=3, rem=1)

    def obj_fused(s, dt):
        out = pallas_rollout_diff(s, mesh, dt, n)
        return jnp.sum(out.ssh**2) + jnp.sum(out.normal_velocity**2)

    def obj_roll(s, dt):
        out = structured_run_loop(s, mesh, dt, n)
        return jnp.sum(out.ssh**2) + jnp.sum(out.normal_velocity**2)

    dt = jnp.float64(10.0)
    (g_s, g_dt) = jax.grad(obj_fused, argnums=(0, 1))(st, dt)
    (r_s, r_dt) = jax.grad(obj_roll, argnums=(0, 1))(st, dt)
    for a, b in zip(jax.tree.leaves(g_s), jax.tree.leaves(r_s)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-9, atol=1e-13)
    np.testing.assert_allclose(float(g_dt), float(r_dt), rtol=1e-9)
    # primal values agree too
    np.testing.assert_allclose(
        float(obj_fused(st, dt)), float(obj_roll(st, dt)), rtol=1e-12
    )


def test_pallas_rollout_diff_grad_masked_channel():
    """Differentiable fused rollout also works on a masked channel lattice;
    adjoint of wall-edge velocity is exactly zero."""
    from mpas_ocean_tpu.mesh.cull import cull_cells
    from mpas_ocean_tpu.structured import StructuredModel, pallas_rollout_diff

    nx = ny = 16
    dc = 1000.0
    horz = planar_hex_mesh(nx, ny, dc, f0=1e-4)
    y = np.asarray(horz.cells.y)
    keep = (y > 0.5 * dc) & (y < y.max() - 0.5 * dc)
    chan = cull_cells(horz, keep)
    vert = make_vertical_mesh(
        chan, n_vert_levels=2,
        resting_thickness=np.full((chan.n_cells, 2), 500.0),
    )
    mesh = Mesh(horz=chan, vert=vert).to_device()
    sm = StructuredModel(mesh, nx, ny, parent_horz=horz, keep_cells=keep)
    rng = np.random.default_rng(5)
    h = np.full((chan.n_cells, 2), 500.0) + 0.1 * rng.normal(size=(chan.n_cells, 2))
    u = 0.01 * rng.normal(size=(chan.n_edges, 2))
    u *= np.asarray(chan.edges.edge_mask)[:, None]
    prog = PrognosticVars(
        ssh=jnp.asarray(h.sum(1) - np.asarray(vert.resting_thickness_sum)),
        layer_thickness=jnp.asarray(h),
        normal_velocity=jnp.asarray(u),
    )
    st = sm.to_struct(prog)
    smesh = sm.struct_mesh

    def obj_fused(s):
        return jnp.sum(pallas_rollout_diff(s, smesh, 10.0, 6).ssh ** 2)

    def obj_roll(s):
        return jnp.sum(structured_run_loop(s, smesh, 10.0, 6).ssh ** 2)

    g = jax.grad(obj_fused)(st)
    r = jax.grad(obj_roll)(st)
    for a, b in zip(jax.tree.leaves(g), jax.tree.leaves(r)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-9, atol=1e-13)


def test_pallas_adjoint_segments_match_roll_vjp(setup):
    """The fused Pallas reverse sweep (pallas_adjoint_rollout: in-kernel
    b-step recompute + jax.vjp adjoint steps, two-level checkpointing) must
    reproduce the roll-model VJP exactly — cotangents AND d(dt) — in f64
    interpret mode. This is the path the TPU backward of
    pallas_rollout_diff takes."""
    from mpas_ocean_tpu.structured.pallas_model import pallas_adjoint_rollout

    sm, st = setup
    mesh = sm.struct_mesh
    n, dt = 6, 10.0
    out, vjp = jax.vjp(
        lambda s, t: structured_run_loop(s, mesh, t, n), st, dt
    )
    g = jax.tree.map(lambda a: a + 0.5, out)  # dense arbitrary cotangent
    d_ref, ddt_ref = vjp(g)
    d_st, ddt = pallas_adjoint_rollout(
        st, mesh, dt, n, g, plan=(2, 3), interpret=True
    )
    for a, b in zip(jax.tree.leaves(d_st), jax.tree.leaves(d_ref)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-12, atol=1e-14
        )
    np.testing.assert_allclose(float(ddt), float(ddt_ref), rtol=1e-12)


def test_pallas_adjoint_segments_masked_channel():
    """Fused reverse sweep on a masked (wall) lattice agrees with the roll
    VJP; wall-edge cotangents are exactly zero."""
    from mpas_ocean_tpu.mesh.cull import cull_cells
    from mpas_ocean_tpu.structured.pallas_model import pallas_adjoint_rollout

    nx = ny = 8
    dc = 1000.0
    horz = planar_hex_mesh(nx, ny, dc, f0=1e-4)
    y = np.asarray(horz.cells.y)
    keep = (y > 0.5 * dc) & (y < y.max() - 0.5 * dc)
    chan = cull_cells(horz, keep)
    vert = make_vertical_mesh(
        chan, n_vert_levels=2,
        resting_thickness=np.full((chan.n_cells, 2), 500.0),
    )
    mesh = Mesh(horz=chan, vert=vert).to_device()
    sm = StructuredModel(mesh, nx, ny, parent_horz=horz, keep_cells=keep)
    rng = np.random.default_rng(5)
    h = np.full((chan.n_cells, 2), 500.0) + 0.1 * rng.normal(size=(chan.n_cells, 2))
    u = 0.01 * rng.normal(size=(chan.n_edges, 2))
    u *= np.asarray(chan.edges.edge_mask)[:, None]
    prog = PrognosticVars(
        ssh=jnp.asarray(h.sum(1) - np.asarray(vert.resting_thickness_sum)),
        layer_thickness=jnp.asarray(h),
        normal_velocity=jnp.asarray(u),
    )
    st = sm.to_struct(prog)
    smesh = sm.struct_mesh
    n, dt = 4, 10.0
    out, vjp = jax.vjp(
        lambda s, t: structured_run_loop(s, smesh, t, n), st, dt
    )
    g = jax.tree.map(jnp.ones_like, out)
    d_ref, ddt_ref = vjp(g)
    d_st, ddt = pallas_adjoint_rollout(
        st, smesh, dt, n, g, plan=(2, 2), interpret=True
    )
    for a, b in zip(jax.tree.leaves(d_st), jax.tree.leaves(d_ref)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-12, atol=1e-14
        )
    np.testing.assert_allclose(float(ddt), float(ddt_ref), rtol=1e-12)


def test_adjoint_plan_divisibility():
    """_adjoint_plan must return (b, m) with b | n and m | (n//b)."""
    from mpas_ocean_tpu.structured.pallas_model import _adjoint_plan

    for n in (1, 7, 12, 97, 8000, 9998):
        plan = _adjoint_plan(n, 32, 64, 100, 4)
        assert plan is not None
        b, m = plan
        assert n % b == 0 and (n // b) % m == 0


@pytest.mark.parametrize("q", [2, 3])
def test_pallas_tiled_temporal_blocking_matches_roll(setup, q):
    """q-step temporal blocking (q halo rows, q steps per kernel call) must
    reproduce the roll model exactly."""
    from mpas_ocean_tpu.structured import pallas_tiled_run_loop

    sm, st = setup
    n = 6
    ref = structured_run_loop(st, sm.struct_mesh, 10.0, n)
    out = pallas_tiled_run_loop(
        st, sm.struct_mesh, 10.0, n, row_tile=2, interpret=True, q=q
    )
    np.testing.assert_allclose(
        np.asarray(out.ssh), np.asarray(ref.ssh), rtol=0, atol=1e-11
    )
    np.testing.assert_allclose(
        np.asarray(out.normal_velocity),
        np.asarray(ref.normal_velocity),
        rtol=0,
        atol=1e-13,
    )


def test_pallas_tiled_temporal_blocking_masked_channel():
    """Temporal blocking together with the wall mask (Kelvin channel)."""
    from mpas_ocean_tpu.mesh.cull import cull_cells
    from mpas_ocean_tpu.structured import StructuredModel, pallas_tiled_run_loop
    from mpas_ocean_tpu.structured.model import structured_run_loop

    nx = ny = 16
    dc = 1000.0
    horz = planar_hex_mesh(nx, ny, dc, f0=1e-4)
    y = np.asarray(horz.cells.y)
    keep = (y > 0.5 * dc) & (y < y.max() - 0.5 * dc)
    chan = cull_cells(horz, keep)
    vert = make_vertical_mesh(
        chan, n_vert_levels=2,
        resting_thickness=np.full((chan.n_cells, 2), 500.0),
    )
    mesh = Mesh(horz=chan, vert=vert).to_device()
    sm = StructuredModel(mesh, nx, ny, parent_horz=horz, keep_cells=keep)
    rng = np.random.default_rng(9)
    h = np.full((chan.n_cells, 2), 500.0) + 0.1 * rng.normal(size=(chan.n_cells, 2))
    u = 0.01 * rng.normal(size=(chan.n_edges, 2))
    u *= np.asarray(chan.edges.edge_mask)[:, None]
    prog = PrognosticVars(
        ssh=jnp.asarray(h.sum(1) - np.asarray(vert.resting_thickness_sum)),
        layer_thickness=jnp.asarray(h),
        normal_velocity=jnp.asarray(u),
    )
    st = sm.to_struct(prog)
    ref = structured_run_loop(st, sm.struct_mesh, 10.0, 6)
    out = pallas_tiled_run_loop(
        st, sm.struct_mesh, 10.0, 6, row_tile=4, interpret=True, q=2
    )
    np.testing.assert_allclose(np.asarray(out.ssh), np.asarray(ref.ssh), atol=1e-11)
    np.testing.assert_allclose(
        np.asarray(out.normal_velocity),
        np.asarray(ref.normal_velocity),
        atol=1e-13,
    )


def _nl_setup_state(setup):
    sm, st = setup
    # deeper water for a stable nonlinear perturbation
    h = st.layer_thickness + 90.0
    ssh = h.sum(-1) - sm.struct_mesh.resting_thickness_sum
    # consistent rts: reuse mesh rts (10*K) -> ssh is large but constant-ish;
    # simpler: recompute ssh by model convention so paths agree exactly
    from mpas_ocean_tpu.structured.model import StructState

    return sm, StructState(
        ssh=ssh, layer_thickness=h, normal_velocity=st.normal_velocity
    )


def test_pallas_nonlinear_rollout_matches_roll_model(setup):
    sm, st = _nl_setup_state(setup)
    n = 5
    ref = structured_run_loop(st, sm.struct_mesh, 5.0, n, nonlinear=True)
    out = pallas_run_loop(st, sm.struct_mesh, 5.0, n, interpret=True,
                          nonlinear=True)
    np.testing.assert_allclose(
        np.asarray(out.normal_velocity),
        np.asarray(ref.normal_velocity),
        rtol=0, atol=1e-13,
    )
    np.testing.assert_allclose(
        np.asarray(out.layer_thickness),
        np.asarray(ref.layer_thickness),
        rtol=0, atol=1e-11,
    )


def test_pallas_nonlinear_adjoint_segments_match_roll_vjp(setup):
    from mpas_ocean_tpu.structured.pallas_model import pallas_adjoint_rollout

    sm, st = _nl_setup_state(setup)
    mesh = sm.struct_mesh
    n, dt = 6, 5.0
    out, vjp = jax.vjp(
        lambda s, t: structured_run_loop(s, mesh, t, n, True), st, dt
    )
    g = jax.tree.map(lambda a: a + 0.5, out)
    d_ref, ddt_ref = vjp(g)
    d_st, ddt = pallas_adjoint_rollout(
        st, mesh, dt, n, g, plan=(2, 3), interpret=True, nonlinear=True
    )
    for a, b in zip(jax.tree.leaves(d_st), jax.tree.leaves(d_ref)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-9, atol=1e-12
        )
    np.testing.assert_allclose(float(ddt), float(ddt_ref), rtol=1e-9)


def test_pallas_nonlinear_masked_lattice_runs():
    """Wall-masked nonlinear now runs in the fused kernel (the masked
    vertex constants ride the f_vertex plane group) — and matches the roll
    model; a StructMesh stripped of those constants still refuses."""
    from mpas_ocean_tpu.mesh.cull import cull_cells

    parent = planar_hex_mesh(8, 8, 1000.0, f0=1e-4)
    y = np.asarray(parent.cells.y)
    keep = (y > y.min()) & (y < y.max())
    culled = cull_cells(parent, keep)
    vert = make_vertical_mesh(
        culled, n_vert_levels=1,
        resting_thickness=np.full((culled.n_cells, 1), 100.0),
    )
    mesh = Mesh(horz=culled, vert=vert).to_device()
    sm = StructuredModel(mesh, 8, 8, parent_horz=parent, keep_cells=keep)
    st = sm.to_struct(
        PrognosticVars(
            ssh=jnp.zeros(culled.n_cells),
            layer_thickness=jnp.full((culled.n_cells, 1), 100.0),
            normal_velocity=jnp.zeros((culled.n_edges, 1)),
        )
    )
    ref = structured_run_loop(st, sm.struct_mesh, 1.0, 2, nonlinear=True)
    out = pallas_run_loop(st, sm.struct_mesh, 1.0, 2, interpret=True,
                          nonlinear=True)
    np.testing.assert_allclose(
        np.asarray(out.normal_velocity), np.asarray(ref.normal_velocity),
        rtol=0, atol=1e-13,
    )
    stripped = sm.struct_mesh.replace(vertex_kite_planes=None,
                                      vertex_mask=None)
    with pytest.raises(NotImplementedError, match="masked vertex"):
        pallas_run_loop(st, stripped, 1.0, 2, interpret=True,
                        nonlinear=True)


@pytest.mark.parametrize("q", [1, 2, 3])
def test_pallas_tiled_nonlinear_matches_roll(setup, q):
    """Tiled kernel with the NONLINEAR vector-invariant step: the window
    carries 2q halo rows (the chained PV-flux stencil reaches 2 rows per
    step, recomputed locally by _step_slab_nl) and must reproduce the roll
    model exactly."""
    from mpas_ocean_tpu.structured import pallas_tiled_run_loop

    sm, st = _nl_setup_state(setup)
    n = 6
    ref = structured_run_loop(st, sm.struct_mesh, 5.0, n, nonlinear=True)
    out = pallas_tiled_run_loop(
        st, sm.struct_mesh, 5.0, n, row_tile=2, interpret=True, q=q,
        nonlinear=True,
    )
    np.testing.assert_allclose(
        np.asarray(out.ssh), np.asarray(ref.ssh), rtol=0, atol=1e-11
    )
    np.testing.assert_allclose(
        np.asarray(out.normal_velocity),
        np.asarray(ref.normal_velocity),
        rtol=0,
        atol=1e-13,
    )


@pytest.mark.parametrize("q", [1, 2])
def test_pallas_tiled_forward_backward_matches_roll(setup, q):
    """Tiled kernel with the forward-backward stepper: the pressure stage
    reads the fresh thickness one ring out (reach 2), so the window carries
    2q halo rows — must match structured_fb_step's rollout exactly."""
    from mpas_ocean_tpu.structured import pallas_tiled_run_loop

    sm, st = setup
    n = 6
    ref = structured_run_loop(st, sm.struct_mesh, 10.0, n, fb=True)
    out = pallas_tiled_run_loop(
        st, sm.struct_mesh, 10.0, n, row_tile=2, interpret=True, q=q,
        fb=True,
    )
    np.testing.assert_allclose(
        np.asarray(out.ssh), np.asarray(ref.ssh), rtol=0, atol=1e-11
    )
    np.testing.assert_allclose(
        np.asarray(out.normal_velocity),
        np.asarray(ref.normal_velocity),
        rtol=0,
        atol=1e-13,
    )


def test_pallas_tiled_fb_masked_forced_channel():
    """Forward-backward tiled kernel on a wall-masked channel with
    momentum forcing — the stable-stepper deployment config (beyond-VMEM
    FB used to fall back to the roll model)."""
    from mpas_ocean_tpu.mesh.cull import cull_cells
    from mpas_ocean_tpu.models.forcing import make_forcing
    from mpas_ocean_tpu.structured import StructuredModel, pallas_tiled_run_loop
    from mpas_ocean_tpu.structured.model import structured_run_loop

    nx = ny = 16
    dc = 1000.0
    horz = planar_hex_mesh(nx, ny, dc, f0=1e-4)
    y = np.asarray(horz.cells.y)
    keep = (y > 0.5 * dc) & (y < y.max() - 0.5 * dc)
    chan = cull_cells(horz, keep)
    vert = make_vertical_mesh(
        chan, n_vert_levels=2,
        resting_thickness=np.full((chan.n_cells, 2), 500.0),
    )
    mesh = Mesh(horz=chan, vert=vert).to_device()
    sm = StructuredModel(mesh, nx, ny, parent_horz=horz, keep_cells=keep)
    forcing = make_forcing(
        mesh, wind_stress_zonal=0.1, bottom_drag_linear=1e-4, rayleigh=1e-5
    )
    sf = sm.to_struct_forcing(forcing)
    rng = np.random.default_rng(11)
    h = np.full((chan.n_cells, 2), 500.0) + 0.1 * rng.normal(size=(chan.n_cells, 2))
    u = 0.01 * rng.normal(size=(chan.n_edges, 2))
    u *= np.asarray(chan.edges.edge_mask)[:, None]
    prog = PrognosticVars(
        ssh=jnp.asarray(h.sum(1) - np.asarray(vert.resting_thickness_sum)),
        layer_thickness=jnp.asarray(h),
        normal_velocity=jnp.asarray(u),
    )
    st = sm.to_struct(prog)
    ref = structured_run_loop(st, sm.struct_mesh, 10.0, 6, fb=True,
                              forcing=sf)
    out = pallas_tiled_run_loop(
        st, sm.struct_mesh, 10.0, 6, row_tile=4, interpret=True, q=2,
        fb=True, forcing=sf,
    )
    np.testing.assert_allclose(np.asarray(out.ssh), np.asarray(ref.ssh),
                               atol=1e-11)
    np.testing.assert_allclose(
        np.asarray(out.normal_velocity),
        np.asarray(ref.normal_velocity),
        atol=1e-13,
    )


def test_pallas_tiled_nonlinear_masked_channel():
    """NONLINEAR tiled kernel on a wall-masked channel (routes through
    _step_slab_nl's masked-vertex unpack, >4 f_vertex planes) — pinned
    against the roll model like the fb variant above."""
    from mpas_ocean_tpu.mesh.cull import cull_cells
    from mpas_ocean_tpu.structured import StructuredModel, pallas_tiled_run_loop
    from mpas_ocean_tpu.structured.model import structured_run_loop

    nx = ny = 16
    dc = 1000.0
    horz = planar_hex_mesh(nx, ny, dc, f0=1e-4)
    y = np.asarray(horz.cells.y)
    keep = (y > 0.5 * dc) & (y < y.max() - 0.5 * dc)
    chan = cull_cells(horz, keep)
    vert = make_vertical_mesh(
        chan, n_vert_levels=2,
        resting_thickness=np.full((chan.n_cells, 2), 500.0),
    )
    mesh = Mesh(horz=chan, vert=vert).to_device()
    sm = StructuredModel(mesh, nx, ny, parent_horz=horz, keep_cells=keep)
    rng = np.random.default_rng(12)
    h = np.full((chan.n_cells, 2), 500.0) + 0.1 * rng.normal(
        size=(chan.n_cells, 2)
    )
    u = 0.01 * rng.normal(size=(chan.n_edges, 2))
    u *= np.asarray(chan.edges.edge_mask)[:, None]
    prog = PrognosticVars(
        ssh=jnp.asarray(h.sum(1) - np.asarray(vert.resting_thickness_sum)),
        layer_thickness=jnp.asarray(h),
        normal_velocity=jnp.asarray(u),
    )
    st = sm.to_struct(prog)
    ref = structured_run_loop(st, sm.struct_mesh, 10.0, 6, nonlinear=True)
    out = pallas_tiled_run_loop(
        st, sm.struct_mesh, 10.0, 6, row_tile=4, interpret=True, q=1,
        nonlinear=True,
    )
    np.testing.assert_allclose(np.asarray(out.ssh), np.asarray(ref.ssh),
                               atol=1e-11)
    np.testing.assert_allclose(
        np.asarray(out.normal_velocity),
        np.asarray(ref.normal_velocity),
        atol=1e-13,
    )


def test_pallas_tiled_nonlinear_fb_matches_roll():
    """NONLINEAR + FORWARD-BACKWARD tiled kernel (reach-3 windows) — the
    last stepper x physics combination, previously fenced to the roll
    model. Pinned against structured_fb_step(nonlinear=True), fused-VMEM
    kernel included."""
    from mpas_ocean_tpu.structured import StructuredModel, pallas_tiled_run_loop
    from mpas_ocean_tpu.structured.model import structured_run_loop
    from mpas_ocean_tpu.structured.pallas_model import pallas_run_loop as prl

    nx = ny = 12
    horz = planar_hex_mesh(nx, ny, 1000.0, f0=1e-4, beta=1e-11)
    vert = make_vertical_mesh(
        horz, n_vert_levels=2,
        resting_thickness=np.full((horz.n_cells, 2), 500.0),
    )
    mesh = Mesh(horz=horz, vert=vert).to_device()
    sm = StructuredModel(mesh, nx, ny)
    rng = np.random.default_rng(13)
    h = np.full((horz.n_cells, 2), 500.0) + 0.1 * rng.normal(
        size=(horz.n_cells, 2)
    )
    u = 0.01 * rng.normal(size=(horz.n_edges, 2))
    prog = PrognosticVars(
        ssh=jnp.asarray(h.sum(1) - np.asarray(vert.resting_thickness_sum)),
        layer_thickness=jnp.asarray(h),
        normal_velocity=jnp.asarray(u),
    )
    st = sm.to_struct(prog)
    ref = structured_run_loop(st, sm.struct_mesh, 10.0, 6, nonlinear=True,
                              fb=True)
    out = pallas_tiled_run_loop(
        st, sm.struct_mesh, 10.0, 6, row_tile=3, interpret=True, q=1,
        nonlinear=True, fb=True,
    )
    np.testing.assert_allclose(np.asarray(out.ssh), np.asarray(ref.ssh),
                               atol=1e-11)
    np.testing.assert_allclose(
        np.asarray(out.normal_velocity), np.asarray(ref.normal_velocity),
        atol=1e-13,
    )
    fused = prl(st, sm.struct_mesh, 10.0, 6, interpret=True, nonlinear=True,
                fb=True)
    np.testing.assert_allclose(np.asarray(fused.ssh), np.asarray(ref.ssh),
                               atol=1e-11)


def test_pallas_forced_adjoint_segments_match_roll_vjp():
    """Fused adjoint segments for FORCED rollouts (wind + both drags +
    Rayleigh): d_state, d_dt and the Forcing cotangent (exact wind plane +
    scalar coefficients) must match the checkpointed-roll vjp — the
    wind-stress-sensitivity reverse the Stommel/gyre family needs, now at
    fused-segment speed instead of the HBM-bound fallback."""
    from mpas_ocean_tpu.models.forcing import make_forcing
    from mpas_ocean_tpu.structured.pallas_model import pallas_adjoint_rollout

    horz = planar_hex_mesh(NX, NY, 1000.0, f0=1e-4, beta=1e-11)
    vert = make_vertical_mesh(
        horz, n_vert_levels=K,
        resting_thickness=np.full((horz.n_cells, K), 10.0),
    )
    mesh = Mesh(horz=horz, vert=vert).to_device()
    sm = StructuredModel(mesh, NX, NY)
    forcing = make_forcing(
        mesh, wind_stress_zonal=0.1, bottom_drag_linear=1e-4,
        bottom_drag_quadratic=2e-3, rayleigh=1e-5,
    )
    sf = sm.to_struct_forcing(forcing)
    rng = np.random.default_rng(7)
    h = np.full((horz.n_cells, K), 10.0) + 0.01 * rng.normal(
        size=(horz.n_cells, K)
    )
    u = 0.01 * rng.normal(size=(horz.n_edges, K))
    prog = PrognosticVars(
        ssh=jnp.asarray(h.sum(1) - np.asarray(vert.resting_thickness_sum)),
        layer_thickness=jnp.asarray(h),
        normal_velocity=jnp.asarray(u),
    )
    st = sm.to_struct(prog)
    smesh = sm.struct_mesh
    n, dt = 6, 5.0
    out, vjp = jax.vjp(
        lambda s, t, f: structured_run_loop(s, smesh, t, n, forcing=f),
        st, dt, sf,
    )
    g = jax.tree.map(lambda a: a + 0.5, out)
    d_ref, ddt_ref, df_ref = vjp(g)
    d_st, ddt, df = pallas_adjoint_rollout(
        st, smesh, dt, n, g, plan=(2, 3), interpret=True, forcing=sf
    )
    for a, b in zip(jax.tree.leaves(d_st), jax.tree.leaves(d_ref)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-9, atol=1e-12
        )
    np.testing.assert_allclose(float(ddt), float(ddt_ref), rtol=1e-9)
    np.testing.assert_allclose(
        np.asarray(df.wind_edge), np.asarray(df_ref.wind_edge),
        rtol=1e-10, atol=1e-13,
    )
    for nm in ("drag_linear", "drag_quadratic", "rayleigh"):
        np.testing.assert_allclose(
            float(getattr(df, nm)), float(getattr(df_ref, nm)), rtol=1e-9
        )
    # level-mask cotangents are deliberately zero on the fused path
    assert float(jnp.abs(df.top_mask).max()) == 0.0


@pytest.mark.parametrize("rt,q,b", [(2, 1, 3), (4, 1, 6), (2, 2, 3)])
def test_tiled_pallas_adjoint_matches_roll_vjp(setup, rt, q, b):
    """Tiled Pallas adjoint (per-tile window vjp kernel + halo overlap-add
    + two-level checkpointing — the beyond-VMEM reverse) must match the
    roll-model vjp at f64 roundoff across tile sizes and superstep
    depths."""
    from mpas_ocean_tpu.structured.pallas_model import (
        _cot_from_planes, _pallas_tiled_adjoint, _tiled_scal,
    )

    sm, st = setup
    smesh = sm.struct_mesh
    n, dt = 6, 10.0
    out, vjp = jax.vjp(
        lambda s, t: structured_run_loop(s, smesh, t, n), st, dt
    )
    g = jax.tree.map(lambda a: a + 0.5, out)
    d_ref, ddt_ref = vjp(g)
    ny2, nx = smesh.ny2, smesh.nx
    k = st.layer_thickness.shape[-1]
    dtype = st.layer_thickness.dtype
    cot0 = (g.ssh[..., None], g.layer_thickness,
            g.normal_velocity.reshape(6, ny2, nx, k))
    f_edge = smesh.f_edge.reshape(6, ny2, nx, 1).astype(dtype)
    rts = smesh.resting_thickness_sum[..., None].astype(dtype)
    cot, dscal, _, _ = _pallas_tiled_adjoint(
        _tiled_scal(smesh, dt, dtype),
        st.ssh[..., None], st.layer_thickness,
        st.normal_velocity.reshape(6, ny2, nx, k),
        f_edge, rts, cot0, None,
        terms=smesh.coriolis_terms, row_tile=rt, n_steps=n, b=b,
        interpret=True, q=q,
    )
    d_st = _cot_from_planes(cot, ny2, nx, k)
    for a, bb in zip(jax.tree.leaves(d_st), jax.tree.leaves(d_ref)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(bb), rtol=0, atol=1e-12
        )
    np.testing.assert_allclose(float(dscal[0]), float(ddt_ref), rtol=1e-10)


def test_tiled_pallas_adjoint_masked_channel():
    """Tiled Pallas adjoint on a wall-masked channel."""
    from mpas_ocean_tpu.mesh.cull import cull_cells
    from mpas_ocean_tpu.structured.pallas_model import (
        _cot_from_planes, _pallas_tiled_adjoint, _tiled_scal,
    )

    nx = 8
    dc = 1000.0
    parent = planar_hex_mesh(nx, nx, dc, f0=1e-4)
    y = np.asarray(parent.cells.y)
    keep = (y > 0.5 * dc) & (y < y.max() - 0.5 * dc)
    chan = cull_cells(parent, keep)
    vert = make_vertical_mesh(
        chan, n_vert_levels=2,
        resting_thickness=np.full((chan.n_cells, 2), 50.0),
    )
    mesh = Mesh(horz=chan, vert=vert).to_device()
    sm = StructuredModel(mesh, nx, nx, parent_horz=parent, keep_cells=keep)
    rng = np.random.default_rng(3)
    h = np.full((chan.n_cells, 2), 50.0) + 0.1 * rng.normal(
        size=(chan.n_cells, 2)
    )
    u = 0.01 * rng.normal(size=(chan.n_edges, 2))
    u *= np.asarray(chan.edges.edge_mask)[:, None]
    prog = PrognosticVars(
        ssh=jnp.asarray(h.sum(1) - np.asarray(vert.resting_thickness_sum)),
        layer_thickness=jnp.asarray(h),
        normal_velocity=jnp.asarray(u),
    )
    st = sm.to_struct(prog)
    smesh = sm.struct_mesh
    n, dt = 6, 5.0
    out, vjp = jax.vjp(
        lambda s, t: structured_run_loop(s, smesh, t, n), st, dt
    )
    g = jax.tree.map(lambda a: a + 0.5, out)
    d_ref, ddt_ref = vjp(g)
    ny2, nxl = smesh.ny2, smesh.nx
    k = st.layer_thickness.shape[-1]
    dtype = st.layer_thickness.dtype
    cot0 = (g.ssh[..., None], g.layer_thickness,
            g.normal_velocity.reshape(6, ny2, nxl, k))
    f_edge = smesh.f_edge.reshape(6, ny2, nxl, 1).astype(dtype)
    rts = smesh.resting_thickness_sum[..., None].astype(dtype)
    mask = smesh.edge_mask.reshape(6, ny2, nxl, 1).astype(dtype)
    cot, dscal, _, _ = _pallas_tiled_adjoint(
        _tiled_scal(smesh, dt, dtype),
        st.ssh[..., None], st.layer_thickness,
        st.normal_velocity.reshape(6, ny2, nxl, k),
        f_edge, rts, cot0, mask,
        terms=smesh.coriolis_terms, row_tile=2, n_steps=n, b=3,
        interpret=True, q=1,
    )
    d_st = _cot_from_planes(cot, ny2, nxl, k)
    for a, bb in zip(jax.tree.leaves(d_st), jax.tree.leaves(d_ref)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(bb), rtol=0, atol=1e-12
        )
    np.testing.assert_allclose(float(dscal[0]), float(ddt_ref), rtol=1e-10)
