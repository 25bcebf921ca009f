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
    return sm, sm.to_struct(prog), mesh


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
    sm, st, _ = setup
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
    sm, st, _ = setup
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
    sm, st, _ = setup
    mesh = sm.struct_mesh
    n = 4
    plan = pm._tiled_adjoint_plan(st, mesh, n, False, False, None, None)
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


def test_auto_run_loop_tpu_arms(setup, tpu_routing, monkeypatch):
    """structured_auto_run_loop's fused and tiled TPU arms, on CPU."""
    sm, st, _ = setup
    mesh = sm.struct_mesh
    n = 4
    ref = structured_run_loop(st, mesh, 10.0, n)
    out = pm.structured_auto_run_loop(st, mesh, 10.0, n)  # fused arm
    _assert_state_close(out, ref, rtol=1e-10)
    monkeypatch.setattr(pm, "fits_in_vmem", lambda *a, **k: False)
    out = pm.structured_auto_run_loop(st, mesh, 10.0, n)  # tiled arm
    _assert_state_close(out, ref, rtol=1e-10)
