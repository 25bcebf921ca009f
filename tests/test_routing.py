"""Routing-level tests for the TPU-only fast-path arms, driven on CPU.

The custom-VJP routing in structured/pallas_model.py (_rollout_fwd /
_rollout_bwd) and structured_auto_run_loop picks between the fused-VMEM
kernel, the tiled kernel, and the roll model based on backend + VMEM fit.
Those TPU arms were previously unreachable from the CPU suite — commit
88c90f1's traced-dt crash lived in exactly such a branch. The
``_FORCE_TPU_ROUTING`` hook routes as if on TPU while every kernel runs in
interpret mode, so this module walks each arm end-to-end, including
gradients with a TRACED dt (the 88c90f1 failure class).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import mpas_ocean_tpu.structured.pallas_model as pm
from mpas_ocean_tpu.mesh import planar_hex_mesh
from mpas_ocean_tpu.mesh.mesh import Mesh
from mpas_ocean_tpu.mesh.vert_mesh import make_vertical_mesh
from mpas_ocean_tpu.models.shallow_water import PrognosticVars
from mpas_ocean_tpu.structured import StructuredModel
from mpas_ocean_tpu.structured.model import structured_run_loop

NX = NY = 8
K = 2


@pytest.fixture(scope="module")
def setup():
    horz = planar_hex_mesh(NX, NY, 1000.0, f0=1e-4, beta=1e-11)
    vert = make_vertical_mesh(
        horz, n_vert_levels=K,
        resting_thickness=np.full((horz.n_cells, K), 10.0),
    )
    mesh = Mesh(horz=horz, vert=vert).to_device()
    sm = StructuredModel(mesh, NX, NY)
    rng = np.random.default_rng(3)
    h = np.full((horz.n_cells, K), 10.0) + 0.01 * rng.normal(
        size=(horz.n_cells, K)
    )
    u = 0.01 * rng.normal(size=(horz.n_edges, K))
    ssh = h.sum(1) - np.asarray(vert.resting_thickness_sum)
    prog = PrognosticVars(
        ssh=jnp.asarray(ssh),
        layer_thickness=jnp.asarray(h),
        normal_velocity=jnp.asarray(u),
    )
    return sm, sm.to_struct(prog), mesh, prog


@pytest.fixture
def tpu_routing(monkeypatch):
    monkeypatch.setattr(pm, "_FORCE_TPU_ROUTING", True)
    yield


@pytest.fixture
def no_vmem(monkeypatch):
    """Pretend nothing fits in VMEM, forcing every beyond-VMEM arm."""
    monkeypatch.setattr(pm, "fits_in_vmem", lambda *a, **k: False)
    yield


def _roll_grads(st, mesh, dt, n, **kw):
    def obj(s, t):
        out = structured_run_loop(s, mesh, t, n, **kw)
        return jnp.sum(out.ssh**2) + jnp.sum(out.normal_velocity**2)

    return jax.grad(obj, argnums=(0, 1))(st, dt)


def _diff_grads(st, mesh, dt, n, **kw):
    def obj(s, t):
        out = pm.pallas_rollout_diff(s, mesh, t, n, **kw)
        return jnp.sum(out.ssh**2) + jnp.sum(out.normal_velocity**2)

    return jax.grad(obj, argnums=(0, 1))(st, dt)


def _assert_state_close(a, b, rtol=1e-9):
    for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(b)):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), rtol=rtol,
                                   atol=1e-12)


def test_routing_decision_table(setup, tpu_routing, monkeypatch):
    """_rollout_fwd picks: fused residuals when VMEM fits, tiled residuals
    for beyond-VMEM linear, roll fallback for beyond-VMEM nonlinear (until
    the tiled adjoint covers it)."""
    sm, st, _, _ = setup
    mesh = sm.struct_mesh

    out, res = pm._rollout_fwd(st, mesh, 10.0, 4)
    ckpts, ckpts_t = res[0], res[1]
    assert ckpts is not None and ckpts_t is None  # fused-VMEM arm

    monkeypatch.setattr(pm, "fits_in_vmem", lambda *a, **k: False)
    out, res = pm._rollout_fwd(st, mesh, 10.0, 4)
    ckpts, ckpts_t = res[0], res[1]
    assert ckpts is None and ckpts_t is not None  # tiled beyond-VMEM arm


def test_fused_arm_end_to_end_traced_dt(setup, tpu_routing):
    """Fused custom-VJP arm (interpret kernels) with dt a traced input."""
    sm, st, _, _ = setup
    mesh = sm.struct_mesh
    n = 4
    ref = structured_run_loop(st, mesh, 10.0, n)
    out = jax.jit(
        lambda s, t: pm.pallas_rollout_diff(s, mesh, t, n)
    )(st, jnp.asarray(10.0))
    _assert_state_close(out, ref)
    g = _diff_grads(st, mesh, jnp.asarray(10.0), n)
    gr = _roll_grads(st, mesh, jnp.asarray(10.0), n)
    _assert_state_close(g[0], gr[0], rtol=1e-8)
    np.testing.assert_allclose(float(g[1]), float(gr[1]), rtol=1e-8)


def test_tiled_arm_end_to_end_traced_dt(setup, tpu_routing, no_vmem):
    """Tiled beyond-VMEM custom-VJP arm (the 88c90f1 branch): forward
    checkpoints + tiled Pallas reverse, dt traced, all in interpret mode."""
    sm, st, _, _ = setup
    mesh = sm.struct_mesh
    n = 4
    plan = pm._tiled_adjoint_plan(st, mesh, n, False, None, None)
    assert plan is not None
    ref = structured_run_loop(st, mesh, 10.0, n)
    out = jax.jit(
        lambda s, t: pm.pallas_rollout_diff(s, mesh, t, n)
    )(st, jnp.asarray(10.0))
    _assert_state_close(out, ref)
    g = _diff_grads(st, mesh, jnp.asarray(10.0), n)
    gr = _roll_grads(st, mesh, jnp.asarray(10.0), n)
    _assert_state_close(g[0], gr[0], rtol=1e-8)
    np.testing.assert_allclose(float(g[1]), float(gr[1]), rtol=1e-8)


def _grad_pair(st, mesh, n, dt, diff_kwargs, roll_kwargs, extra=None):
    """(grads of diff path, grads of roll path) w.r.t. (state, dt[, extra])
    where extra is ('strat', obj) or ('forcing', obj)."""
    import mpas_ocean_tpu.structured.pallas_model as pmod

    kind, obj = extra if extra else (None, None)

    def mk(runner, kwargs):
        def f(s, t, *rest):
            kw = dict(kwargs)
            if kind:
                kw[kind] = rest[0]
            out = runner(s, mesh, t, **kw)
            return jnp.sum(out.ssh**2) + jnp.sum(out.normal_velocity**2)

        return f

    def diff_runner(s, mesh_, t, **kw):
        return pmod.pallas_rollout_diff(
            s, mesh_, t, n, kw.get("nonlinear", False),
            kw.get("tracer_kappa", 0.0), kw.get("tracer_upwind", 1.0),
            kw.get("strat"), kw.get("forcing"),
        )

    def roll_runner(s, mesh_, t, **kw):
        return structured_run_loop(s, mesh_, t, n, **kw)

    args = (st, dt) + ((obj,) if kind else ())
    nums = tuple(range(len(args)))
    gd = jax.grad(mk(diff_runner, diff_kwargs), argnums=nums)(*args)
    gr = jax.grad(mk(roll_runner, roll_kwargs), argnums=nums)(*args)
    return gd, gr


@pytest.mark.parametrize("config", ["nonlinear", "tracers", "strat",
                                    "forced", "forced_nonlinear"])
def test_tiled_adjoint_all_subsystems(setup, tpu_routing, no_vmem, config):
    """Generalized tiled Pallas adjoint: beyond-VMEM gradients for
    nonlinear, tracer-carrying, stratified and FORCED rollouts (the
    production wind-stress-sensitivity configuration) must match the
    roll-model vjp — end-to-end through pallas_rollout_diff's routing."""
    import mpas_ocean_tpu.structured.pallas_model as pmod
    from mpas_ocean_tpu.models.forcing import make_forcing
    from mpas_ocean_tpu.models.stratification import make_stratification
    from mpas_ocean_tpu.models.tracers import make_tracers

    sm, st, mesh, prog = setup
    smesh = sm.struct_mesh
    n, dt = 4, jnp.asarray(5.0)
    nonlinear = "nonlinear" in config
    if nonlinear:
        # deeper water for a stable nonlinear perturbation
        h = st.layer_thickness + 90.0
        st = st.replace(
            ssh=h.sum(-1) - smesh.resting_thickness_sum, layer_thickness=h
        )
    dkw, rkw, extra = {}, {}, None
    if nonlinear:
        dkw["nonlinear"] = rkw["nonlinear"] = True
    if config == "tracers":
        x = np.asarray(mesh.horz.cells.x)
        tr = make_tracers(
            mesh, [10.0 + np.sin(2 * np.pi * x / (x.max() + 1.0)),
                   np.full(mesh.n_cells, 35.0)],
        )
        st = sm.to_struct(prog.replace(tracers=tr))
        dkw["tracer_kappa"] = rkw["tracer_kappa"] = 5.0
    if config == "strat":
        strat = make_stratification(1025.0 + np.linspace(0.0, 1.0, K))
        extra = ("strat", strat)
    if "forced" in config:
        f = sm.to_struct_forcing(make_forcing(
            mesh, wind_stress_zonal=0.1, bottom_drag_linear=1e-4,
            bottom_drag_quadratic=1e-3, rayleigh=1e-5,
        ))
        extra = ("forcing", f)

    plan = pmod._tiled_adjoint_plan(
        st, smesh, n, nonlinear,
        extra[1] if config == "strat" else None,
        extra[1] if "forced" in config else None,
    )
    assert plan is not None, "routing must pick the tiled adjoint"

    gd, gr = _grad_pair(st, smesh, n, dt, dkw, rkw, extra)
    # state + dt cotangents
    _assert_state_close(gd[0], gr[0], rtol=1e-8)
    np.testing.assert_allclose(float(gd[1]), float(gr[1]), rtol=1e-8)
    if config == "strat":
        np.testing.assert_allclose(
            np.asarray(gd[2].phi_weights), np.asarray(gr[2].phi_weights),
            rtol=1e-8, atol=1e-12,
        )
    if "forced" in config:
        np.testing.assert_allclose(
            np.asarray(gd[2].wind_edge), np.asarray(gr[2].wind_edge),
            rtol=1e-8, atol=1e-12,
        )
        for nm in ("drag_linear", "drag_quadratic", "rayleigh"):
            np.testing.assert_allclose(
                float(getattr(gd[2], nm)), float(getattr(gr[2], nm)),
                rtol=1e-7,
            )
        # level-mask cotangents are deliberately zero on the tiled path
        assert float(jnp.abs(gd[2].top_mask).max()) == 0.0


@pytest.mark.parametrize("fits", [True, False])
def test_jitted_forced_gradient(setup, tpu_routing, monkeypatch, fits):
    """jit(grad(...)) w.r.t. state AND forcing — the production calling
    convention (an optimization loop jits its update step), which feeds
    TRACED forcing masks into the routing plans and operand builders.
    Unjitted jax.grad hides this class of bug: the custom-vjp forward
    then sees concrete primals. Covers the fused (fits=True) and tiled
    (fits=False) arms."""
    from mpas_ocean_tpu.models.forcing import make_forcing

    sm, st, mesh, _ = setup
    smesh = sm.struct_mesh
    if not fits:
        monkeypatch.setattr(pm, "fits_in_vmem", lambda *a, **k: False)
    f = sm.to_struct_forcing(make_forcing(
        mesh, wind_stress_zonal=0.1, bottom_drag_linear=1e-4, rayleigh=1e-5,
    ))
    n = 4

    def obj_diff(s, t, fo):
        out = pm.pallas_rollout_diff(s, smesh, t, n, False, 0.0, 1.0,
                                     None, fo)
        return jnp.sum(out.ssh**2)

    def obj_roll(s, t, fo):
        out = structured_run_loop(s, smesh, t, n, forcing=fo)
        return jnp.sum(out.ssh**2)

    gd = jax.jit(jax.grad(obj_diff, argnums=(0, 1, 2)))(
        st, jnp.asarray(10.0), f
    )
    gr = jax.grad(obj_roll, argnums=(0, 1, 2))(st, jnp.asarray(10.0), f)
    _assert_state_close(gd[0], gr[0], rtol=1e-8)
    np.testing.assert_allclose(float(gd[1]), float(gr[1]), rtol=1e-8)
    np.testing.assert_allclose(
        np.asarray(gd[2].wind_edge), np.asarray(gr[2].wind_edge),
        rtol=1e-8, atol=1e-12,
    )


def test_auto_run_loop_tpu_arms(setup, tpu_routing, monkeypatch):
    """structured_auto_run_loop's fused and tiled TPU arms, on CPU."""
    sm, st, _, _ = setup
    mesh = sm.struct_mesh
    n = 4
    ref = structured_run_loop(st, mesh, 10.0, n)
    out = pm.structured_auto_run_loop(st, mesh, 10.0, n)  # fused arm
    _assert_state_close(out, ref, rtol=1e-10)
    monkeypatch.setattr(pm, "fits_in_vmem", lambda *a, **k: False)
    out = pm.structured_auto_run_loop(st, mesh, 10.0, n)  # tiled arm
    _assert_state_close(out, ref, rtol=1e-10)
