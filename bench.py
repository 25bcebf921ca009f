"""Benchmark harness: grid-point throughput of the shallow-water core.

Mirrors the reference's headline perf experiment (reference: README.MD:45-50
— coastal-wave config, 64x64 mesh, 100 vertical levels, GPU-vs-CPU speedup)
as a TPU-vs-host-CPU comparison on this machine. The north-star metric from
BASELINE.json is grid-points/s/chip = cells x layers x steps / wall-second.

Prints ONE JSON line:
  value        TPU (default-backend) grid-points/s/chip
  vs_baseline  speedup over the same jitted model on the host CPU — the
               reference's own headline metric shape (it reports ~500x GPU
               vs 1 CPU process; our CPU baseline is the multithreaded XLA
               host build of the SAME model, a much stronger baseline)
"""

from __future__ import annotations

import json
import os
import time

import jax
import numpy as np

NX = int(os.environ.get("BENCH_NX", 64))
LEVELS = int(os.environ.get("BENCH_LEVELS", 100))
# this machine's tunneled TPU has ~25 ms of fixed dispatch+readback latency
# per rollout call; 8000 steps amortizes it to <5% of the measurement
STEPS = int(os.environ.get("BENCH_STEPS", 8000))
REPS = int(os.environ.get("BENCH_REPS", 3))


def build(dtype=np.float32):
    import jax.numpy as jnp

    from mpas_ocean_tpu.mesh import planar_hex_mesh
    from mpas_ocean_tpu.mesh.mesh import Mesh
    from mpas_ocean_tpu.mesh.vert_mesh import make_vertical_mesh
    from mpas_ocean_tpu.models.shallow_water import PrognosticVars
    from mpas_ocean_tpu.verification.inertial_gravity_wave import InertialGravityWave

    dc = 10000.0e3 / NX
    horz = planar_hex_mesh(NX, NX, dc, f0=1e-4, dtype=dtype)
    igw = InertialGravityWave(lx=NX * dc / 1e3)
    vert = make_vertical_mesh(
        horz,
        n_vert_levels=LEVELS,
        resting_thickness=np.full(
            (horz.n_cells, LEVELS), igw.bottom_depth / LEVELS, dtype=dtype
        ),
        dtype=dtype,
    )
    mesh = Mesh(horz=horz, vert=vert)
    ssh, h, u = igw.initial_state(horz, LEVELS)
    prog = PrognosticVars(
        ssh=jnp.asarray(ssh.astype(dtype)),
        layer_thickness=jnp.asarray(h.astype(dtype)),
        normal_velocity=jnp.asarray(u.astype(dtype)),
    )
    # small, stable dt: forward Euler is weakly unstable for gravity waves
    # (reference behavior too); keeps the long benchmark rollout finite.
    # dt does not affect throughput.
    dt = dtype(30.0)
    return mesh, prog, dt


def _time_fn(run, reps) -> float:
    """Median wall time of run().

    NOTE: on this machine's tunneled TPU platform, block_until_ready does
    not actually wait for remote completion — a host readback of a value
    derived from the result is the only reliable synchronization, and
    run() must end with one.
    """
    s = run()  # compile + warm up
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        s = run()
        times.append(time.perf_counter() - t0)
    assert np.isfinite(s), "benchmark state went non-finite"
    return float(np.median(times))


def measure(device, mesh, prog, dt, steps, reps) -> float:
    """Unstructured (general-mesh gather) path."""
    from mpas_ocean_tpu.forward.run_loop import ocn_run_loop

    mesh = jax.device_put(mesh, device)
    prog = jax.device_put(prog, device)

    def run():
        out = ocn_run_loop(prog, mesh, dt, steps)
        return float(out.ssh.sum())

    return _time_fn(run, reps)


def measure_matrix(device, mesh, prog, dt, steps, reps) -> float:
    """General-mesh BSR/MXU path (stencils as block-sparse matmuls)."""
    from mpas_ocean_tpu.models.matrix_model import MatrixModel, matrix_run_loop

    mm = jax.device_put(MatrixModel.from_mesh(mesh), device)
    prog = jax.device_put(prog, device)

    def run():
        out = matrix_run_loop(prog, mm, dt, steps)
        return float(out.ssh.sum())

    return _time_fn(run, reps)


def measure_structured(device, sm, prog, dt, steps, reps) -> float:
    """Structured hex fast path (roll/shift stencils, zero gathers)."""
    from mpas_ocean_tpu.structured.model import structured_run_loop

    st = jax.device_put(sm.to_struct(prog), device)
    smesh = jax.device_put(sm.struct_mesh, device)

    def run():
        out = structured_run_loop(st, smesh, dt, steps)
        return float(out.ssh.sum())

    return _time_fn(run, reps)


def measure_pallas(device, sm, prog, dt, steps, reps,
                   nonlinear: bool = False) -> float:
    """Fused Pallas rollout: whole time loop in one on-chip kernel (state
    resident in VMEM, HBM touched twice per rollout). nonlinear=True runs
    the full vector-invariant dynamics (BEYOND the reference, README.MD:12)
    in the same kernel."""
    from mpas_ocean_tpu.structured.pallas_model import pallas_run_loop

    st = jax.device_put(sm.to_struct(prog), device)
    smesh = jax.device_put(sm.struct_mesh, device)

    def run():
        out = pallas_run_loop(
            st, smesh, dt, steps, interpret=False, nonlinear=nonlinear
        )
        return float(out.ssh.sum())

    return _time_fn(run, reps)


def measure_pallas_tracers(device, mesh, sm, prog, dt, steps, reps) -> float:
    """Fused rollout carrying two active tracers (temperature/salinity) as
    extra VMEM parity planes — the subsystem the reference stubs out
    (reference: src/ocn/PrognosticVars.jl:20-26). Donor-cell upwinding."""
    from mpas_ocean_tpu.models.tracers import make_tracers
    from mpas_ocean_tpu.structured.pallas_model import pallas_run_loop

    x = np.asarray(mesh.horz.cells.x)
    tr = make_tracers(
        mesh,
        [10.0 + 2.0 * np.sin(2 * np.pi * x / (x.max() + 1)),
         np.full(mesh.n_cells, 35.0)],
        dtype=prog.layer_thickness.dtype,
    )
    st = jax.device_put(sm.to_struct(prog.replace(tracers=tr)), device)
    smesh = jax.device_put(sm.struct_mesh, device)

    def run():
        out = pallas_run_loop(
            st, smesh, dt, steps, interpret=False, tracer_upwind=1.0
        )
        return float(out.ssh.sum()) + float(out.tracers[..., 0, :1].sum())

    return _time_fn(run, reps)


def measure_pallas_strat(device, mesh, sm, prog, dt, steps, reps) -> float:
    """Fused rollout with a FULL K-layer baroclinic stratification — the
    per-layer Montgomery-potential pressure (models/stratification.py, one
    K x K MXU matmul per step in-kernel). The reference's levels never
    interact at all (reference: pressure_gradient.jl:45-65)."""
    from mpas_ocean_tpu.models.stratification import make_stratification
    from mpas_ocean_tpu.structured.pallas_model import pallas_run_loop

    dtype = prog.layer_thickness.dtype
    strat = make_stratification(
        1025.0 + np.linspace(0.0, 1.0, LEVELS), dtype=dtype
    )
    st = jax.device_put(sm.to_struct(prog), device)
    smesh = jax.device_put(sm.struct_mesh, device)

    def run():
        out = pallas_run_loop(
            st, smesh, dt, steps, interpret=False, strat=strat
        )
        return float(out.ssh.sum())

    return _time_fn(run, reps)


def build_kelvin(dtype=np.float32):
    """The reference's literal perf configuration: coastal Kelvin wave
    channel, 64x64, 100 levels (reference: README.MD:45-50). Returns the
    culled mesh, state, dt AND the masked-lattice StructuredModel so the
    channel runs on the fused Pallas fast path."""
    import jax.numpy as jnp

    from mpas_ocean_tpu.mesh import planar_hex_mesh
    from mpas_ocean_tpu.mesh.cull import cull_cells
    from mpas_ocean_tpu.mesh.mesh import Mesh
    from mpas_ocean_tpu.mesh.vert_mesh import make_vertical_mesh
    from mpas_ocean_tpu.models.shallow_water import PrognosticVars
    from mpas_ocean_tpu.structured import StructuredModel
    from mpas_ocean_tpu.verification.kelvin_wave import KelvinWave

    dc = 10000.0e3 / NX
    horz = planar_hex_mesh(NX, NX, dc, f0=1e-4, dtype=dtype)
    y = np.asarray(horz.cells.y)
    keep = (y > 0.5 * dc) & (y < y.max() - 0.5 * dc)
    chan = cull_cells(horz, keep)
    vert = make_vertical_mesh(
        chan,
        n_vert_levels=LEVELS,
        resting_thickness=np.full((chan.n_cells, LEVELS), 1000.0 / LEVELS, dtype=dtype),
        dtype=dtype,
    )
    mesh = Mesh(horz=chan, vert=vert)
    kw = KelvinWave(lx=NX * dc / 1e3, f0=1e-4)
    ssh, h, u = kw.initial_state(chan, LEVELS)
    prog = PrognosticVars(
        ssh=jnp.asarray(ssh.astype(dtype)),
        layer_thickness=jnp.asarray(h.astype(dtype)),
        normal_velocity=jnp.asarray(u.astype(dtype)),
    )
    ksm = StructuredModel(mesh, NX, NX, parent_horz=horz, keep_cells=keep)
    return mesh, prog, dtype(30.0), ksm


def measure_structured_auto(device, sm, prog, dt, steps, reps) -> float:
    """Fastest applicable structured rollout (fused VMEM / tiled Pallas on
    TPU, roll model elsewhere) — works for masked channel lattices too."""
    from mpas_ocean_tpu.structured.pallas_model import structured_auto_run_loop

    st = jax.device_put(sm.to_struct(prog), device)
    smesh = jax.device_put(sm.struct_mesh, device)

    def run():
        out = structured_auto_run_loop(st, smesh, dt, steps)
        return float(out.ssh.sum())

    return _time_fn(run, reps)


def measure_vpu_peak(reps: int = 3) -> float:
    """Empirical VPU f32 speed-of-light on THIS chip: a VMEM-resident chain
    of dependent-free FMAs (two ops per element per iteration), the same
    shape of work the fused rollout kernel does. Returns FLOP/s."""
    import functools

    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    # Streaming FMA: read two planes, write one, per 2 flops — the same
    # VMEM-traffic-per-flop regime the rollout kernel's roll/multiply-add
    # stencils run in, so this is the relevant sustained ceiling (a deeper
    # in-register chain measures ALU latency instead and comes out LOWER).
    # T large enough that the ~25 ms tunnel dispatch latency is <5%.
    S, T = (8, 1024, 128), 300000

    def kernel(x_ref, o_ref):
        def body(_, token):
            o_ref[:] = o_ref[:] * 1.0000001 + x_ref[:]
            return token

        jax.lax.fori_loop(0, T, body, 0)

    @jax.jit
    def run_kernel(x):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(S, jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            input_output_aliases={0: 0},
        )(x)

    x = jnp.ones(S, jnp.float32)

    def run():
        return float(run_kernel(x).sum())

    t = _time_fn(run, reps)
    return 2.0 * np.prod(S) * T / t


def measure_hbm_bw(reps: int = 3) -> float:
    """Empirical HBM bandwidth: T sequential read+write passes over a
    256 MB array under one jit (amortizes the ~25 ms dispatch latency; the
    array is far larger than VMEM so every pass streams HBM)."""
    import jax.numpy as jnp

    n = 64 * 1024 * 1024  # f32 elements, 256 MB
    T = 128
    x = jnp.arange(n, dtype=jnp.float32)
    sweep = jax.jit(
        lambda a: jax.lax.fori_loop(0, T, lambda i, b: b + 1.0, a)
    )

    def run():
        return float(sweep(x)[-1])

    t = _time_fn(run, reps)
    return 2.0 * n * 4 * T / t


def step_flops(sm, k: int) -> int:
    """FLOPs of one structured step (matches the per-term accounting in
    structured/pallas_model.step_flop_count)."""
    from mpas_ocean_tpu.structured.pallas_model import step_flop_count

    smesh = sm.struct_mesh
    return step_flop_count(
        smesh.ny2, smesh.nx, k, len(smesh.coriolis_terms),
        masked=smesh.edge_mask is not None,
    )


def measure_adjoint(device, sm, prog, dt, steps, reps: int = 1) -> float:
    """Whole-rollout adjoint timing: grad of sum(ssh_final^2) through the
    differentiable fused rollout (pallas_rollout_diff — checkpoint-saving
    Pallas primal, fused Pallas reverse segments). The reference times
    nothing, but this is its Enzyme end-to-end reverse
    (test_Enzyme_end2end.jl) as a production path."""
    import jax.numpy as jnp

    from mpas_ocean_tpu.structured import pallas_rollout_diff

    st = jax.device_put(sm.to_struct(prog), device)
    smesh = jax.device_put(sm.struct_mesh, device)

    grad_fn = jax.jit(
        jax.grad(
            lambda s: jnp.sum(pallas_rollout_diff(s, smesh, dt, steps).ssh ** 2)
        )
    )

    def run():
        g = grad_fn(st)
        return float(g.ssh.sum())

    return _time_fn(run, reps)


def measure_superstep(device, sm, prog, dt, steps, reps: int = 1) -> float:
    """Communication-avoiding sharded path (structured.
    ShardedStructuredModel.run_pallas): one ppermute pair of q halo rows,
    then q fused Pallas steps per exchange. Only one chip is reachable
    here, so this times the P=1 degenerate ring (self-ppermute) — the full
    superstep machinery (collective + tile kernel + scan), but an
    OPTIMISTIC proxy for a real multi-chip run: a self-permute can only be
    cheaper than real neighbor ICI exchange, so read it as an upper bound
    on the per-device rate (the virtual-device scaling block measures the
    collective-count structure)."""
    from mpas_ocean_tpu.structured import ShardedStructuredModel

    ssm = ShardedStructuredModel(sm.struct_mesh, devices=[device])
    local = ssm.scatter(sm.to_struct(prog))

    def run():
        out = ssm.run_pallas(local, dt, steps, q=2)
        return float(out["ssh"].sum())

    return _time_fn(run, reps)


def build_large(nx=256, k=None, dtype=np.float32):
    import jax.numpy as jnp

    from mpas_ocean_tpu.mesh import planar_hex_mesh
    from mpas_ocean_tpu.mesh.mesh import Mesh
    from mpas_ocean_tpu.mesh.vert_mesh import make_vertical_mesh
    from mpas_ocean_tpu.models.shallow_water import PrognosticVars
    from mpas_ocean_tpu.structured import StructuredModel
    from mpas_ocean_tpu.verification.inertial_gravity_wave import (
        InertialGravityWave,
    )

    k = k or LEVELS
    dc = 10000.0e3 / nx
    horz = planar_hex_mesh(nx, nx, dc, f0=1e-4, dtype=dtype)
    igw = InertialGravityWave(lx=nx * dc / 1e3)
    vert = make_vertical_mesh(
        horz, n_vert_levels=k,
        resting_thickness=np.full((horz.n_cells, k), igw.bottom_depth / k, dtype=dtype),
        dtype=dtype,
    )
    mesh = Mesh(horz=horz, vert=vert)
    ssh, h, u = igw.initial_state(horz, k)
    prog = PrognosticVars(
        ssh=jnp.asarray(ssh.astype(dtype)),
        layer_thickness=jnp.asarray(h.astype(dtype)),
        normal_velocity=jnp.asarray(u.astype(dtype)),
    )
    return mesh, StructuredModel(mesh, nx, nx), prog


def measure_tiled_large(device, sm, prog, k, steps, reps: int = 1, *,
                        q: int | None = None, nonlinear: bool = False,
                        fb: bool = False, roll: bool = False):
    """Production-scale config (256x256 cells x 100 levels) on the tiled
    Pallas path — the HBM-streaming regime deployment meshes run in (the
    fused-VMEM path only covers meshes whose whole state fits on-chip).
    ``nonlinear``/``fb`` run the reach-2 variants (2q-row halos);
    ``roll=True`` times the HBM-bound roll model instead (the old
    beyond-VMEM fallback, kept as the comparison line). Returns
    (gp/s, s/step)."""
    from mpas_ocean_tpu.structured.model import structured_run_loop
    from mpas_ocean_tpu.structured.pallas_model import pallas_tiled_run_loop

    dtype = prog.layer_thickness.dtype.type
    st = jax.device_put(sm.to_struct(prog), device)
    smesh = jax.device_put(sm.struct_mesh, device)
    n_cells = sm.struct_mesh.ny2 * 2 * sm.struct_mesh.nx

    def run():
        if roll:
            out = structured_run_loop(st, smesh, dtype(30.0), steps,
                                      nonlinear, fb=fb)
        else:
            out = pallas_tiled_run_loop(
                st, smesh, dtype(30.0), steps, interpret=False, q=q,
                nonlinear=nonlinear, fb=fb,
            )
        return float(out.ssh.sum())

    t = _time_fn(run, reps)
    return n_cells * k * steps / t, t / steps


def measure_linearized(device, mesh, prog, dt, steps, reps: int = 1,
                       q: int | None = None):
    """LINEARIZED dynamics on the matrix path: step-by-step (q=None) or
    the A^q composed-operator superstep (models/linear_matrix.py — q-fold
    fewer batched-matmul dispatches, attacking the measured per-matmul
    overhead bound, ops/bsr.py). Returns (seconds, operator_bytes)."""
    from mpas_ocean_tpu.models.linear_matrix import (
        LinearizedMatrixModel, linearized_ref_loop, linearized_run_loop,
    )

    prog = jax.device_put(prog, device)
    if q is None:
        # build the operators ONCE outside the timed region (the first
        # measurement of this line accidentally timed the host-side
        # MatrixModel rebuild every rep, inflating it ~10x)
        from mpas_ocean_tpu.models.linear_matrix import _linearized_ref_loop
        from mpas_ocean_tpu.models.matrix_model import MatrixModel

        mm = jax.device_put(MatrixModel.from_mesh(mesh), device)
        rt = np.asarray(mesh.vert.resting_thickness, dtype=np.float64)
        coe = np.asarray(mesh.horz.edges.cells_on_edge)
        import jax.numpy as jnp

        he = jax.device_put(jnp.asarray(
            (0.5 * (rt[coe[:, 0]] + rt[coe[:, 1]]))[:, 0].astype(np.float32)
        ), device)

        def run():
            out = _linearized_ref_loop(prog, mm, he, np.float32(dt), steps)
            return float(out.ssh.sum())

        return _time_fn(run, reps), 0
    lmm = jax.device_put(
        LinearizedMatrixModel.from_mesh(mesh, float(dt), q=q), device
    )
    assert steps % q == 0

    def run():
        out = linearized_run_loop(prog, lmm, steps // q)
        return float(out.ssh.sum())

    return _time_fn(run, reps), int(lmm.nbytes)


def measure_stream_floor(device, arrays, reps: int = 1) -> float:
    """Seconds per PASS to stream the given arrays from HBM (a jitted
    T-pass reduce) — the hard lower bound any step reading those operands
    must pay. Used to reconcile the matrix-path roofline entry with its
    bf16 ablation instead of an impossible modeled fraction."""
    import jax.numpy as jnp

    arrays = [jax.device_put(a, device) for a in arrays]
    T = 64

    @jax.jit
    def sweep(xs):
        def body(i, acc):
            # i-dependent scale defeats loop-invariant hoisting of the read
            s = sum(
                ((x * (1.0 + 1e-9 * i)).sum()).astype(jnp.float32)
                for x in xs
            )
            return acc + s
        return jax.lax.fori_loop(0, T, body, jnp.zeros((), jnp.float32))

    def run():
        return float(sweep(arrays))

    t = _time_fn(run, reps)
    return t / T


def measure_tiled_halo_overhead(device, sm, prog, k, steps, reps: int = 1):
    """Seconds/step of ONLY the tiled path's XLA halo-block extraction
    (the strided-slice gather feeding the kernel) — the measured (not
    modeled) residual split the tiled roofline entries cite."""
    import jax.numpy as jnp

    from mpas_ocean_tpu.structured.pallas_model import (
        _tile_halo_fns, auto_tile_plan,
    )

    st = jax.device_put(sm.to_struct(prog), device)
    smesh = sm.struct_mesh
    ny2, nx = smesh.ny2, smesh.nx
    rt, q = auto_tile_plan(ny2, nx, k, 4)
    halos = _tile_halo_fns(rt, q, ny2 // rt)
    ssh = st.ssh[..., None]
    h = st.layer_thickness
    u = st.normal_velocity.reshape(6, ny2, nx, k)

    @jax.jit
    def extract(ssh, h, u):
        def body(c, _):
            ssh, h, u = c
            parts = []
            for x in (ssh, h, u):
                t, b = halos(x)
                parts.append(t.sum() + b.sum())
            # fold the reduction back so the loop carries a dependency
            return (ssh + parts[0] * 1e-30, h, u), None

        (ssh, h, u), _ = jax.lax.scan(body, (ssh, h, u), length=steps)
        return ssh.sum()

    def run():
        return float(extract(ssh, h, u))

    t = _time_fn(run, reps)
    # the extraction runs once per SUPERSTEP (q steps) on the real path
    return t / steps / q


def measure_adjoint_cfg(device, sm, prog, dt, steps, reps: int = 1, *,
                        nonlinear=False, forcing=None, force_roll=False):
    """Whole-rollout adjoint with optional physics: the generalized tiled
    Pallas reverse (default routing), or the old HBM-bound checkpointed
    ROLL replay (force_roll=True — kept as the comparison line the round-4
    verdict measured at ~2x slower)."""
    import jax.numpy as jnp

    from mpas_ocean_tpu.structured import pallas_rollout_diff
    from mpas_ocean_tpu.structured.pallas_model import (
        _checkpointed_roll_rollout,
    )

    st = jax.device_put(sm.to_struct(prog), device)
    smesh = jax.device_put(sm.struct_mesh, device)
    sf = None
    if forcing is not None:
        sf = jax.device_put(sm.to_struct_forcing(forcing), device)

    if force_roll:
        def obj(s):
            out = _checkpointed_roll_rollout(
                s, smesh, dt, steps, nonlinear, forcing=sf
            )
            return jnp.sum(out.ssh ** 2)
    else:
        def obj(s):
            out = pallas_rollout_diff(
                s, smesh, dt, steps, nonlinear, 0.0, 1.0, None, sf
            )
            return jnp.sum(out.ssh ** 2)

    grad_fn = jax.jit(jax.grad(obj))

    def run():
        g = grad_fn(st)
        return float(g.ssh.sum())

    return _time_fn(run, reps)


def build_irregular_matrix(n_points=4096, dtype=np.float32):
    """Irregular (jittered + Lloyd-relaxed) Voronoi mesh of ~the headline
    cell count, through the general-mesh matrix path — the regime the
    reference's arbitrary NetCDF meshes occupy (reference: README.MD:5),
    where no lattice fast path applies."""
    import jax.numpy as jnp

    from mpas_ocean_tpu.mesh.irregular import irregular_trisk_mesh
    from mpas_ocean_tpu.mesh.mesh import Mesh
    from mpas_ocean_tpu.mesh.reorder import rcm_reorder
    from mpas_ocean_tpu.mesh.vert_mesh import make_vertical_mesh
    from mpas_ocean_tpu.models.shallow_water import PrognosticVars

    nx = int(np.sqrt(n_points))
    dc = 10000.0e3 / nx
    horz = irregular_trisk_mesh(
        nx, nx, nx * dc, nx * dc, jitter=0.25, lloyd=2, seed=0, f0=1e-4,
        dtype=dtype,
    )
    horz, _ = rcm_reorder(horz)
    vert = make_vertical_mesh(
        horz, n_vert_levels=LEVELS,
        resting_thickness=np.full((horz.n_cells, LEVELS), 1000.0 / LEVELS,
                                  dtype=dtype),
        dtype=dtype,
    )
    mesh = Mesh(horz=horz, vert=vert)
    rng = np.random.default_rng(0)
    h = (1000.0 / LEVELS
         + 0.01 * rng.normal(size=(horz.n_cells, LEVELS))).astype(dtype)
    u = (0.01 * rng.normal(size=(horz.n_edges, LEVELS))).astype(dtype)
    prog = PrognosticVars(
        ssh=jnp.asarray(h.sum(1) - np.asarray(vert.resting_thickness_sum)),
        layer_thickness=jnp.asarray(h),
        normal_velocity=jnp.asarray(u),
    )
    return mesh, prog


def measure_sharded_adjoint(device, sm, prog, dt, steps, reps: int = 1):
    """Gradient through the sharded superstep objective (P=1 degenerate
    ring): custom-VJP Pallas primal + pure-jnp window-rollout reverse under
    sqrt checkpointing — the multi-chip differentiable fast path's
    per-device cost. Same optimistic-proxy caveat as measure_superstep."""
    from mpas_ocean_tpu.structured import ShardedStructuredModel

    ssm = ShardedStructuredModel(sm.struct_mesh, devices=[device])
    local = ssm.scatter(sm.to_struct(prog))
    grad_fn = jax.jit(
        jax.grad(lambda l: ssm.objective_pallas(l, dt, steps, q=2))
    )

    def run():
        g = grad_fn(local)
        return float(g["ssh"].sum())

    return _time_fn(run, reps)


def measure_scaling_virtual():
    """Devices->efficiency on an 8-virtual-device CPU mesh: slab `run` vs
    the superstep at several (q, rows/device) points. NOT chip truth — a
    collective-count/structure proxy (BASELINE's >=70% weak-scaling gate is
    judged on real multi-chip hardware). Each point is a MEDIAN-of-3
    timing with the spread recorded, plus the DETERMINISTIC structural
    profile (collectives/step, bytes/collective, redundant-compute
    fraction) that is the regression-diffable part. The summary also
    computes the measured crossover attribution: the per-collective
    latency at which the superstep's saved ppermutes would pay for its
    measured extra per-step cost — on the shared-memory CPU proxy a
    collective is nearly free, so the proxy structurally penalizes the
    communication-avoiding design; real ICI latency is what it saves.
    Runs in a subprocess because the virtual-device CPU platform must be
    configured before JAX initializes."""
    import subprocess
    import sys

    code = (
        "import os\n"
        "os.environ['XLA_FLAGS'] = (os.environ.get('XLA_FLAGS','') + "
        "' --xla_force_host_platform_device_count=8').strip()\n"
        "import jax\n"
        "jax.config.update('jax_platforms', 'cpu')\n"
        "import json\n"
        "from mpas_ocean_tpu.tools.scaling import measure_scaling\n"
        "out = {\n"
        " 'slab_run_r8': measure_scaling(rows_per_device=8, nx=32,"
        " levels=8, steps=48),\n"
        " 'superstep_q1_r8': measure_scaling(rows_per_device=8, nx=32,"
        " levels=8, steps=48, path='pallas', q=1),\n"
        " 'superstep_q2_r8': measure_scaling(rows_per_device=8, nx=32,"
        " levels=8, steps=48, path='pallas', q=2),\n"
        " 'superstep_q4_r8': measure_scaling(rows_per_device=8, nx=32,"
        " levels=8, steps=48, path='pallas', q=4),\n"
        " 'superstep_q4_r16': measure_scaling(rows_per_device=16, nx=32,"
        " levels=8, steps=48, path='pallas', q=4),\n"
        "}\n"
        "print('SCALING_JSON ' + json.dumps(out))\n"
    )
    try:
        r = subprocess.run(
            [sys.executable, "-c", code],
            capture_output=True, text=True, timeout=3000,
            cwd=os.path.dirname(os.path.abspath(__file__)),
        )
        for line in r.stdout.splitlines():
            if not line.startswith("SCALING_JSON "):
                continue
            full = json.loads(line[len("SCALING_JSON "):])
            out = {"note": (
                "8-VIRTUAL-device CPU mesh: collective-structure proxy, "
                "not chip truth (gate: >=0.70 weak efficiency on real "
                "multi-chip hardware, BASELINE.md). 'structural' entries "
                "are deterministic (regression-diff those); efficiencies "
                "are median-of-3 with the min-max spread recorded."
            )}
            for key, recs in full.items():
                out[key] = {
                    "points": [
                        {kk: r2[kk] for kk in
                         ("devices", "gridpoints_per_sec", "efficiency",
                          "seconds_per_step", "timing_spread_frac")}
                        for r2 in recs
                    ],
                    "structural": recs[-1]["structural"],
                }
            # measured crossover attribution at 8 devices: how expensive a
            # collective pair must be for the superstep's saved ppermutes
            # to pay for its measured extra per-step cost on this proxy
            try:
                slab8 = out["slab_run_r8"]["points"][-1]
                for key in ("superstep_q2_r8", "superstep_q4_r8"):
                    ss8 = out[key]["points"][-1]
                    saved = (
                        out["slab_run_r8"]["structural"][
                            "collective_pairs_per_step"]
                        - out[key]["structural"][
                            "collective_pairs_per_step"]
                    )
                    dtstep = (ss8["seconds_per_step"]
                              - slab8["seconds_per_step"])
                    out[key]["breakeven_collective_latency_s"] = (
                        dtstep / saved if saved > 0 else None
                    )
            except (KeyError, IndexError):
                pass
            return out
        return {"error": (r.stderr or "no output").strip()[-400:]}
    except Exception as e:  # pragma: no cover
        return {"error": repr(e)[:400]}


def _prog(msg):
    import sys

    print(f"[bench] {msg}", file=sys.stderr, flush=True)


def main():
    from mpas_ocean_tpu.structured import StructuredModel

    mesh, prog, dt = build()
    n_gridpoints = mesh.n_cells * LEVELS
    sm = StructuredModel(mesh, NX, NX)

    accel = jax.devices()[0]
    _prog("unstructured gather path")
    t_unstruct = measure(accel, mesh, prog, dt, max(10, STEPS // 20), 1)
    _prog("matrix/BSR path")
    t_matrix = measure_matrix(accel, mesh, prog, dt, max(10, STEPS // 4), 1)

    # the reference's literal perf config (coastal Kelvin wave channel):
    # masked-lattice fused path (fast) + general-mesh matrix path (fallback)
    _prog("kelvin channel builds")
    kmesh, kprog, kdt, ksm = build_kelvin()
    k_steps = max(10, STEPS // 4)
    t_kelvin_mat = measure_matrix(accel, kmesh, kprog, kdt, k_steps, 1)
    t_kelvin = measure_structured_auto(accel, ksm, kprog, kdt, STEPS, REPS)
    kelvin_gp = kmesh.n_cells * LEVELS  # live (non-culled) gridpoints only
    _prog("roll path")
    t_roll = measure_structured(accel, sm, prog, dt, STEPS, REPS)
    if accel.platform == "tpu":
        try:
            t_accel = measure_pallas(accel, sm, prog, dt, STEPS, REPS)
            path = "pallas-fused"
        except Exception:
            t_accel, path = t_roll, "structured-roll"
        if t_roll < t_accel:
            t_accel, path = t_roll, "structured-roll"
    else:
        t_accel, path = t_roll, "structured-roll"
    value = n_gridpoints * STEPS / t_accel

    # roofline: achieved FLOP/s and HBM GB/s against this chip's MEASURED
    # peaks (an FMA-chain VMEM kernel and a streaming add — empirical speed
    # of light, not datasheet guesses). Round-1 VERDICT item 6.
    if accel.platform == "tpu":
        _prog("measured peaks")
        vpu_peak = measure_vpu_peak()
        hbm_peak = measure_hbm_bw()
    else:
        vpu_peak = hbm_peak = float("nan")
    fl_step = step_flops(sm, LEVELS)
    fused_tflops = fl_step / t_accel * STEPS / 1e12
    roll_tflops = fl_step / t_roll * STEPS / 1e12
    # roll path streams the state through HBM ~8x per step (measured via
    # XLA buffer reuse; the fused path touches HBM twice per ROLLOUT)
    state_bytes = (
        sum(np.prod(x.shape) for x in jax.tree.leaves(sm.to_struct(prog)))
        * np.dtype(np.float32).itemsize
    )

    if accel.platform == "tpu":
        large_nx = 256
        lmesh, lsm, lprog = build_large(large_nx, LEVELS)
        large_steps = max(10, STEPS // 8)
        _prog("tiled large (linear)")
        large_gps, large_spstep = measure_tiled_large(
            accel, lsm, lprog, LEVELS, large_steps
        )
        _prog("tiled large (nonlinear)")
        large_nl_gps, large_nl_spstep = measure_tiled_large(
            accel, lsm, lprog, LEVELS, large_steps, nonlinear=True
        )
        _prog("tiled large (fb)")
        large_fb_gps, _ = measure_tiled_large(
            accel, lsm, lprog, LEVELS, large_steps, fb=True
        )
        roll_steps = max(10, STEPS // 32)
        _prog("roll large (nonlinear)")
        large_nl_roll_gps, _ = measure_tiled_large(
            accel, lsm, lprog, LEVELS, roll_steps, nonlinear=True, roll=True
        )
        # >= STEPS//2 so the ~25 ms fixed dispatch+readback latency of this
        # tunneled chip stays <2% of the measurement (at STEPS//16 it
        # inflated the per-step number ~1.5x)
        adj_steps = max(8, STEPS // 2)
        _prog("fused adjoint")
        t_adj = measure_adjoint(accel, sm, prog, dt, adj_steps)
        adj_spstep = t_adj / adj_steps
        _prog("large-mesh tiled adjoint")

        def _try(fn, label):
            try:
                return fn()
            except Exception as e:  # never sink the whole bench JSON
                _prog(f"{label} FAILED: {e!r:.200}")
                return float("nan")

        ladj_steps = max(10, STEPS // 80)
        ladj_spstep = _try(
            lambda: measure_adjoint(accel, lsm, lprog, dt, ladj_steps)
            / ladj_steps, "large-mesh adjoint")
        # the generalized tiled adjoint (round-5): FORCED and NONLINEAR
        # beyond-VMEM reverses, vs the old HBM-bound roll replay
        from mpas_ocean_tpu.models.forcing import make_forcing

        lforc = make_forcing(lmesh, wind_stress_zonal=0.1,
                             bottom_drag_linear=1e-4, rayleigh=1e-5)
        _prog("large-mesh FORCED tiled adjoint")
        ladj_forced_spstep = _try(
            lambda: measure_adjoint_cfg(accel, lsm, lprog, dt, ladj_steps,
                                        forcing=lforc) / ladj_steps,
            "forced tiled adjoint")
        _prog("large-mesh NONLINEAR tiled adjoint")
        ladj_nl_spstep = _try(
            lambda: measure_adjoint_cfg(accel, lsm, lprog, dt, ladj_steps,
                                        nonlinear=True) / ladj_steps,
            "nonlinear tiled adjoint")
        roll_adj_steps = max(10, STEPS // 160)
        _prog("roll-replay adjoint comparison lines")
        ladj_roll_spstep = _try(
            lambda: measure_adjoint_cfg(accel, lsm, lprog, dt,
                                        roll_adj_steps, force_roll=True)
            / roll_adj_steps, "roll-replay adjoint")
        ladj_forced_roll_spstep = _try(
            lambda: measure_adjoint_cfg(accel, lsm, lprog, dt,
                                        roll_adj_steps, forcing=lforc,
                                        force_roll=True) / roll_adj_steps,
            "forced roll-replay adjoint")
        ladj_nl_roll_spstep = _try(
            lambda: measure_adjoint_cfg(accel, lsm, lprog, dt,
                                        roll_adj_steps, nonlinear=True,
                                        force_roll=True) / roll_adj_steps,
            "nonlinear roll-replay adjoint")
        _prog("tiled halo-extraction overhead")
        halo_spstep = _try(
            lambda: measure_tiled_halo_overhead(accel, lsm, lprog, LEVELS,
                                                200),
            "halo overhead")
        sadj_steps = max(8, STEPS // 8)
        _prog("sharded adjoint")
        t_sadj = measure_sharded_adjoint(accel, sm, prog, dt, sadj_steps)
        sadj_spstep = t_sadj / sadj_steps
        _prog("fused nonlinear")
        t_nl = measure_pallas(accel, sm, prog, dt, STEPS, 1, nonlinear=True)
        nl_gps = n_gridpoints * STEPS / t_nl
        t_tr = measure_pallas_tracers(accel, mesh, sm, prog, dt, STEPS, 1)
        tr_gps = n_gridpoints * STEPS / t_tr
        t_st = measure_pallas_strat(accel, mesh, sm, prog, dt, STEPS, 1)
        st_gps = n_gridpoints * STEPS / t_st
        _prog("superstep")
        t_ss = measure_superstep(accel, sm, prog, dt, STEPS, 1)
        ss_gps = n_gridpoints * STEPS / t_ss
        _prog("linearized matrix path + A^q superstep")
        lin_steps = max(16, STEPS // 8) // 8 * 8  # divisible by 2/4/8
        res_lin = _try(
            lambda: measure_linearized(accel, mesh, prog, dt, lin_steps, 1),
            "linearized stepwise")
        t_lin = (res_lin[0] / lin_steps if isinstance(res_lin, tuple)
                 else float("nan"))
        aq = {}
        for qq in (2, 4, 8):
            res = _try(
                lambda qq=qq: measure_linearized(accel, mesh, prog, dt,
                                                 lin_steps, 1, q=qq),
                f"A^{qq}")
            if isinstance(res, tuple):
                aq[str(qq)] = {
                    "seconds_per_step": res[0] / lin_steps,
                    "operator_bytes": res[1],
                }
        _prog("irregular matrix path")
        irr_gps = float("nan")
        irr_detail = {}
        try:
            imesh, iprog = build_irregular_matrix(NX * NX)
            t_imat = measure_matrix(accel, imesh, iprog, dt, k_steps, 1)
            irr_gps = imesh.n_cells * LEVELS * k_steps / t_imat
            from mpas_ocean_tpu.models.matrix_model import MatrixModel as _MM

            imm = _MM.from_mesh(imesh)
            irr_detail = {
                "n_cells": int(imesh.n_cells),
                "operand_bytes": int(sum(
                    np.prod(x.shape) * x.dtype.itemsize
                    for x in jax.tree.leaves(imm) if hasattr(x, "shape")
                )),
                "note": (
                    "jittered+Lloyd Voronoi mesh, RCM-reordered; compare "
                    "operand_bytes vs matrix_path.operand_bytes for the "
                    "irregular-mesh BSR band growth"
                ),
            }
        except Exception as e:
            _prog(f"irregular matrix FAILED: {e!r:.200}")
    else:
        large_gps = large_spstep = adj_spstep = nl_gps = float("nan")
        tr_gps = st_gps = ss_gps = sadj_spstep = ladj_spstep = float("nan")
        large_nl_gps = large_fb_gps = large_nl_roll_gps = float("nan")
        large_nl_spstep = float("nan")
        ladj_forced_spstep = ladj_nl_spstep = float("nan")
        ladj_roll_spstep = ladj_forced_roll_spstep = float("nan")
        ladj_nl_roll_spstep = float("nan")
        halo_spstep = t_lin = irr_gps = float("nan")
        aq = {}
        irr_detail = {}

    # static halo-overlap profile of an 8-part decomposition of this mesh
    # (single real chip here; the sharded tests execute the same code on 8
    # virtual devices)
    from mpas_ocean_tpu.parallel import build_partition
    from mpas_ocean_tpu.parallel.stats import partition_stats

    pstats = partition_stats(
        build_partition(mesh, 8), itemsize=4, n_vert_levels=LEVELS
    )

    # ---- per-path roofline accounting (round-3 VERDICT item 4): measured
    # time vs the chip's measured VPU/HBM peaks, with explicit traffic
    # models so "X Gp/s" is attributable to a bound, not a mystery ----
    from mpas_ocean_tpu.structured.pallas_model import (
        _pick_row_tile, auto_tile_plan,
    )

    def tiled_model(ny2_, nx_, k_, t_step, q_=None, reach_=1,
                    nonlinear_=False, gathered_halos=False):
        """Traffic/compute model of the tiled path: per q-step superstep
        the kernel reads centers (1x state) + halo blocks (2*reach*q/rt x)
        and writes 1x. With DIRECT halo views (hq-aligned row tiles, the
        single-chip default — pallas_model._TILED_DIRECT_HALOS) that is
        the whole traffic; with gathered halos (sharded superstep, or
        misaligned tiles) the XLA halo-block extraction reads the state
        strided and writes the blocks (~2 more passes of the halo
        fraction). Constant singleton planes are O(1/K) and ignored."""
        if q_ is None:
            rt_, q_ = auto_tile_plan(ny2_, nx_, k_, 4, 0, reach_, nonlinear_)
        else:
            rt_ = _pick_row_tile(ny2_, nx_, k_, 4, q_, 0, reach_, nonlinear_)
        state_b = (2 * 1 + 2 * k_ + 6 * k_) * ny2_ * nx_ * 4
        halo_frac = 2.0 * reach_ * q_ / rt_
        direct_ = not gathered_halos and rt_ % (reach_ * q_) == 0
        bytes_step = state_b * (
            (2.0 + halo_frac) if direct_ else (2.0 + 3.0 * halo_frac)
        ) / q_
        fl = step_flop_count(
            ny2_, nx_, k_, len(sm.struct_mesh.coriolis_terms),
            nonlinear=nonlinear_,
        )
        # useful-FLOP rate vs compute INCLUDING the halo-window recompute:
        # each kernel window advances rt interior rows but computes
        # rt + 2*reach*(q-1-j)... rows per inner step; averaged, the
        # window does (1 + reach*(q-1)/rt) x the useful row-updates, and
        # the halo READS amplify by halo_frac — the attributable residual
        # between mfu and the HBM fraction
        redundant_compute = reach_ * max(q_ - 1, 0) / rt_
        return {
            "row_tile": rt_,
            "q": q_,
            "mfu": fl / t_step / vpu_peak,
            "hbm_gbps_modeled": bytes_step / t_step / 1e9,
            "hbm_frac_modeled": bytes_step / t_step / hbm_peak,
            "halo_read_amplification": 1.0 + halo_frac,
            "window_recompute_frac": redundant_compute,
            "halo_delivery": ("direct BlockSpec views (in-kernel DMA)"
                              if direct_ else
                              "gathered blocks (XLA strided extraction)"),
        }

    from mpas_ocean_tpu.structured.pallas_model import step_flop_count

    if accel.platform == "tpu":
        tiled_roof = tiled_model(128, 256, LEVELS, large_spstep)
        tiled_nl_roof = tiled_model(128, 256, LEVELS, large_nl_spstep,
                                    reach_=2, nonlinear_=True)
        ss_roof = tiled_model(NX // 2, NX, LEVELS, t_ss / STEPS, q_=2,
                              gathered_halos=True)
        # matrix/BSR path: operand bytes measured from the actual
        # MatrixModel arrays; ~4 state passes for state/tendency temps.
        # mfu_physics counts only the USEFUL physics flops (same fl_step
        # as every other path), so paths are comparable; the MXU does more
        # raw multiply-adds than that on the padded blocks.
        from mpas_ocean_tpu.models.matrix_model import MatrixModel

        mm = MatrixModel.from_mesh(mesh)
        mat_bytes = sum(
            np.prod(x.shape) * x.dtype.itemsize
            for x in jax.tree.leaves(mm)
            if hasattr(x, "shape")
        )
        t_mat_step = t_matrix / max(10, STEPS // 4)
        # MEASURED stream floor of the matrix operands (replaces the
        # previous modeled fraction, which exceeded 1.0 — i.e. charged
        # bytes the step evidently does not stream; the bf16 ablation in
        # ops/bsr.py already proved the path is not HBM-bound)
        _prog("matrix operand stream floor")
        mat_stream_sp = measure_stream_floor(
            accel, [x for x in jax.tree.leaves(mm) if hasattr(x, "shape")]
        )
        mat_roof = {
            "operand_bytes": int(mat_bytes),
            "mfu_physics": fl_step / t_mat_step / vpu_peak,
            "operand_readonly_sweep_seconds_per_pass": mat_stream_sp,
            "sweep_to_step_ratio": mat_stream_sp / t_mat_step,
            "bound": (
                "per-matmul dispatch overhead (bf16 ablation <1%, "
                "ops/bsr.py:27-47). The read-only operand sweep costs "
                "SEVERAL TIMES the measured step, so the step cannot be "
                "re-streaming the operands each iteration: the whole "
                "operand set (< the 128 MB VMEM) stays resident across "
                "the scan, which is also why halving operand bytes "
                "(bf16) moves the time <1%. This replaces the previous "
                "modeled HBM fraction, which charged per-step streaming "
                "that demonstrably does not happen."
            ),
        }
        # tiled ADJOINT roofline (round-4 weak item 3): measured reverse
        # vs a 9.5-state-passes/step traffic model (ckpt-saving forward
        # 2.5 + inner rebuild 3 + reverse kernel ~4 passes incl. halo
        # amplification at rt=4), with the measured halo-extraction share
        from mpas_ocean_tpu.structured.pallas_model import (
            _tiled_adjoint_plan,
        )

        lst_ = lsm.to_struct(lprog)
        tplan_ = _tiled_adjoint_plan(
            lst_, lsm.struct_mesh, max(10, STEPS // 80), False,
            None, None,
        )
        lny2, lnx = lsm.struct_mesh.ny2, lsm.struct_mesh.nx
        lstate_bytes = (2 + 8 * LEVELS) * lny2 * lnx * 4
        fl_step_large = step_flop_count(
            lny2, lnx, LEVELS, len(lsm.struct_mesh.coriolis_terms)
        )
        tiled_adj_roof = {}
        if tplan_ is not None and np.isfinite(ladj_spstep):
            rt_a, q_a, b_a = tplan_
            adj_bytes_step = 9.5 * lstate_bytes
            tiled_adj_roof = {
                "plan_rt_q_b": [int(rt_a), int(q_a), int(b_a)],
                "mfu": 3 * fl_step_large / ladj_spstep / vpu_peak,
                "hbm_gbps_modeled": adj_bytes_step / ladj_spstep / 1e9,
                "hbm_frac_modeled": adj_bytes_step / ladj_spstep / hbm_peak,
                "reverse_to_tiled_forward_ratio": ladj_spstep / large_spstep,
                "halo_extraction_frac_of_tiled_forward": (
                    halo_spstep / large_spstep
                ),
                "traffic_model": (
                    "9.5 state passes/step: ckpt fwd 2.5 + rebuild 3 + "
                    "reverse kernel ~4 (primal+cot in, cot out, halo "
                    "amplification 2q/rt)"
                ),
            }
    else:
        tiled_roof = tiled_nl_roof = ss_roof = mat_roof = {}
        tiled_adj_roof = {}

    # devices->efficiency on the virtual CPU mesh (round-3 VERDICT item 6)
    _prog("virtual-8 scaling sweep")
    scaling = measure_scaling_virtual()

    try:
        cpus = jax.devices("cpu")
    except RuntimeError:
        cpus = []
    if cpus and accel.platform != "cpu":
        cpu_steps = max(10, STEPS // 20)
        t_cpu = measure_structured(cpus[0], sm, prog, dt, cpu_steps, 1)
        cpu_value = n_gridpoints * cpu_steps / t_cpu
        vs = value / cpu_value
    else:
        cpu_value = value
        vs = 1.0

    print(
        json.dumps(
            {
                "metric": "gridpoints_per_sec_per_chip",
                "value": value,
                "unit": "cells*levels*steps/s",
                "vs_baseline": vs,
                "detail": {
                    "config": f"{NX}x{NX} hex, {LEVELS} levels, {STEPS} steps, f32",
                    "accel_platform": accel.platform,
                    "fastest_path": path,
                    "accel_seconds_per_step": t_accel / STEPS,
                    "roll_path_seconds_per_step": t_roll / STEPS,
                    "unstructured_gridpoints_per_sec": n_gridpoints
                    * max(10, STEPS // 20)
                    / t_unstruct,
                    "matrix_path_gridpoints_per_sec": n_gridpoints
                    * max(10, STEPS // 4)
                    / t_matrix,
                    "kelvin_channel_gridpoints_per_sec": kelvin_gp
                    * STEPS
                    / t_kelvin,
                    "kelvin_matrix_path_gridpoints_per_sec": kelvin_gp
                    * k_steps
                    / t_kelvin_mat,
                    "cpu_gridpoints_per_sec": cpu_value,
                    "large_mesh_tiled_gridpoints_per_sec": large_gps,
                    "large_mesh_tiled_seconds_per_step": large_spstep,
                    "large_mesh_nonlinear_tiled_gridpoints_per_sec": large_nl_gps,
                    "large_mesh_nonlinear_roll_gridpoints_per_sec": large_nl_roll_gps,
                    "large_mesh_fb_tiled_gridpoints_per_sec": large_fb_gps,
                    "large_mesh_config": "256x256 hex, 100 levels (HBM-streaming tiled path)",
                    "adjoint_rollout_seconds_per_step": adj_spstep,
                    "large_mesh_adjoint_seconds_per_step": ladj_spstep,
                    "large_mesh_forced_adjoint_seconds_per_step":
                        ladj_forced_spstep,
                    "large_mesh_nonlinear_adjoint_seconds_per_step":
                        ladj_nl_spstep,
                    "large_mesh_roll_replay_adjoint_seconds_per_step":
                        ladj_roll_spstep,
                    "large_mesh_forced_roll_replay_adjoint_seconds_per_step":
                        ladj_forced_roll_spstep,
                    "large_mesh_nonlinear_roll_replay_adjoint_seconds_per_step":
                        ladj_nl_roll_spstep,
                    # the XLA strided-slice halo gather the DIRECT-view
                    # tiled forward no longer performs (kept as the
                    # measured cost the BlockSpec halo views eliminate;
                    # the tiled ADJOINT's rebuild/reverse supersteps
                    # still pay it)
                    "tiled_halo_extraction_seconds_per_step": halo_spstep,
                    "linearized_matrix_seconds_per_step": t_lin,
                    "linearized_matrix_Aq": aq,
                    "irregular_matrix_gridpoints_per_sec": irr_gps,
                    "irregular_matrix_detail": irr_detail,
                    "sharded_adjoint_seconds_per_step": sadj_spstep,
                    "nonlinear_fused_gridpoints_per_sec": nl_gps,
                    "tracer2_fused_gridpoints_per_sec": tr_gps,
                    "baroclinic_fused_gridpoints_per_sec": st_gps,
                    "sharded_superstep_gridpoints_per_sec": ss_gps,
                    "roofline": {
                        "vpu_peak_tflops_measured": vpu_peak / 1e12,
                        "hbm_peak_gbps_measured": hbm_peak / 1e9,
                        "fused_achieved_tflops": fused_tflops,
                        "fused_mfu": fused_tflops * 1e12 / vpu_peak,
                        "roll_achieved_tflops": roll_tflops,
                        "roll_hbm_gbps_est": 8.0
                        * state_bytes
                        / (t_roll / STEPS)
                        / 1e9,
                        "roll_hbm_frac_est": 8.0
                        * state_bytes
                        / (t_roll / STEPS)
                        / hbm_peak,
                        "flops_per_step": fl_step,
                        "tiled_path": tiled_roof,
                        "tiled_nonlinear_path": tiled_nl_roof,
                        "superstep_path": ss_roof,
                        "tiled_adjoint_path": tiled_adj_roof,
                        "matrix_path": mat_roof,
                        "note": (
                            "peaks are MEASURED sustained rates on this "
                            "chip (streaming-FMA VMEM kernel; 128-pass HBM "
                            "sweep), not datasheet numbers; roll_hbm_* uses "
                            "a rough 8-state-passes/step traffic model; "
                            "*_path entries use the explicit traffic models "
                            "in bench.tiled_model"
                        ),
                    },
                    "scaling_virtual8": scaling,
                    "sharded_overlap": {
                        "overlappable_compute_frac": pstats[
                            "overlappable_compute_frac"
                        ],
                        "mini_redundancy_frac": pstats["mini_redundancy_frac"],
                        "exchange_bytes_per_device_per_step": pstats[
                            "exchange_bytes_per_device_per_step"
                        ],
                        "cell_levels_per_exchanged_byte": pstats[
                            "cell_levels_per_exchanged_byte"
                        ],
                    },
                    "baseline_note": (
                        "vs_baseline = speedup over the same XLA model on host "
                        "CPU (reference reports ~500x GPU vs 1 Julia CPU proc "
                        "on this config shape, README.MD:45-50)"
                    ),
                },
            }
        )
    )


if __name__ == "__main__":
    main()
