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
