"""Row-sharded structured fast path must reproduce the global structured
rollout exactly (8 virtual devices; slab halos + ppermute rotations)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mpas_ocean_tpu.mesh import planar_hex_mesh
from mpas_ocean_tpu.mesh.mesh import Mesh
from mpas_ocean_tpu.mesh.vert_mesh import make_vertical_mesh
from mpas_ocean_tpu.models.shallow_water import PrognosticVars
from mpas_ocean_tpu.structured import StructuredModel
from mpas_ocean_tpu.structured.model import structured_run_loop
from mpas_ocean_tpu.structured.sharded import ShardedStructuredModel

NX = NY = 16
K = 3


@pytest.fixture(scope="module")
def setup():
    horz = planar_hex_mesh(NX, NY, 1000.0, f0=1e-4, beta=1e-11)
    vert = make_vertical_mesh(
        horz, n_vert_levels=K, resting_thickness=np.full((horz.n_cells, K), 10.0)
    )
    mesh = Mesh(horz=horz, vert=vert).to_device()
    sm = StructuredModel(mesh, NX, NY)
    rng = np.random.default_rng(5)
    h = np.full((horz.n_cells, K), 10.0) + 0.01 * rng.normal(size=(horz.n_cells, K))
    u = 0.01 * rng.normal(size=(horz.n_edges, K))
    ssh = h.sum(1) - np.asarray(vert.resting_thickness_sum)
    prog = PrognosticVars(
        ssh=jnp.asarray(ssh),
        layer_thickness=jnp.asarray(h),
        normal_velocity=jnp.asarray(u),
    )
    return sm, sm.to_struct(prog)


@pytest.mark.parametrize("n_devices", [2, 4, 8])
def test_sharded_structured_matches_global(setup, n_devices):
    sm, st = setup
    n = 7
    ref = structured_run_loop(st, sm.struct_mesh, 10.0, n)

    ssm = ShardedStructuredModel(sm.struct_mesh, devices=jax.devices()[:n_devices])
    local = ssm.run(ssm.scatter(st), 10.0, n)
    out = ssm.gather(local)

    np.testing.assert_allclose(
        np.asarray(out.ssh), np.asarray(ref.ssh), rtol=0, atol=1e-12
    )
    np.testing.assert_allclose(
        np.asarray(out.layer_thickness),
        np.asarray(ref.layer_thickness),
        rtol=0,
        atol=1e-12,
    )
    np.testing.assert_allclose(
        np.asarray(out.normal_velocity),
        np.asarray(ref.normal_velocity),
        rtol=0,
        atol=1e-13,
    )


def test_indivisible_rows_raise(setup):
    sm, _ = setup
    with pytest.raises(ValueError, match="divisible"):
        ShardedStructuredModel(sm.struct_mesh, devices=jax.devices()[:3])
