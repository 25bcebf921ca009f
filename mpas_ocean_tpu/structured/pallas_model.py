"""Fused Pallas TPU kernel for the structured hex shallow-water step.

The roll formulation (model.py) is correct but HBM-bound: XLA materializes
~75 shifted planes per step in HBM. This module fuses the ENTIRE forward
rollout into one Pallas kernel: the prognostic state (a few MB for the
reference's headline 64x64x100 config, reference: README.MD:45-50) is loaded
into VMEM once, every step's shifts/multiply-adds run on the VPU out of
VMEM, and HBM is touched exactly twice — once to read the initial state and
once to write the final state. This is the TPU equivalent of the
reference's KernelAbstractions device kernels (reference:
src/ocn/Operators.jl, src/forward/time_integration.jl:150-193), except the
whole time loop lives on-chip instead of one host-synchronized launch per
operator per step.

Math is identical to model.structured_step (tests assert agreement to
roundoff); terminology and stencils come from hex_layout.py's
machine-extracted tables.

Differentiability: `pallas_rollout_diff` is a custom-VJP rollout whose
forward saves coarse checkpoints while running the fused kernel and whose
backward runs FUSED PALLAS ADJOINT SEGMENTS (in-kernel recompute +
jax.vjp-derived transpose stencils, two-level checkpointing) — the whole-
loop reverse the reference needs Enzyme plus hand-written rules for
(reference: ext/MPASEnzymeExt.jl:13-36, test/enzyme/test_Enzyme_end2end.jl),
at ~5x the fused forward cost instead of the ~18x of an HBM-bound reverse.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..constants import GRAVITY
from .conv_model import _INCOMING, _NEIGHBOR
from .hex_layout import E, NE, NW
from .model import StructMesh, StructState, structured_step
from .sharded import (
    _apply_forcing,
    _level_onehot,
    _step_slab,
    _step_slab_nl,
)

__all__ = [
    "pallas_adjoint_rollout",
    "pallas_rollout_diff",
    "pallas_run_loop",
    "pallas_step",
    "pallas_tiled_run_loop",
    "structured_auto_run_loop",
]

# Test hook (monkeypatch): route as if the backend were a TPU while running
# every kernel in interpret mode. The TPU-only arms of
# structured_auto_run_loop / _rollout_fwd / _rollout_bwd are otherwise
# structurally unreachable from the CPU test suite — a routing-level bug
# there ships untested (this bit exists because one did: the traced-dt
# crash of commit 88c90f1 sat in a branch no CPU test could enter).
_FORCE_TPU_ROUTING = False


def _route_tpu() -> bool:
    """Whether to take the TPU fast-path routing decisions."""
    return _FORCE_TPU_ROUTING or jax.default_backend() == "tpu"


def _interp() -> bool:
    """interpret= flag for kernels launched by the TPU routing arms: real
    Mosaic on TPU, interpret mode when the routing is forced on CPU."""
    return jax.default_backend() != "tpu"


def _shift(x, dm: int, di: int):
    """out[m, i] = x[m + dm, i + di] (periodic), static shifts.

    Same semantics as model._shift (jnp.roll(x, -dm, 0) then roll(-di, 1)),
    written as static slices + concatenate, which Mosaic lowers natively.
    """
    if dm:
        x = jnp.concatenate([x[dm:], x[:dm]], axis=0)
    if di:
        x = jnp.concatenate([x[:, di:], x[:, :di]], axis=1)
    return x


def _step_planes(ssh, h, u, f_edge, rts, dt, inv_dc, s_div, terms, masks=None,
                 nl=None, tr=None, tropts=(0.0, 1.0), cmask=None,
                 strat_w=None, fb=False, forc=None):
    """One forward-Euler step on parity-plane lists.

    ssh[p]: (ny2, nx, 1); h[p]: (ny2, nx, K); u[fam*2+p]: (ny2, nx, K);
    f_edge[c] and rts[p] are (ny2, nx, 1). Returns (ssh', h', u', tr')
    tuples (tr' is None without tracers).

    ``tr`` holds tracer planes indexed [t*2 + p], each (ny2, nx, K) — one
    pair of parity planes per tracer, so every tracer rides the SAME lane
    layout as h and reuses the step's flux planes (models/tracers.py math,
    static ``tropts = (kappa, upwind)``). ``cmask`` (2-list of (ny2, nx, 1)
    live-cell masks) guards the content/h division on culled lattices.

    ``nl`` is None for the reference's linear core, or
    (f_vert, vc_terms, ev_terms, s_ke, s_curl, vmask, kitew) —
    vertex-Coriolis planes [kind*2+p], the machine-extracted kite and
    endpoint stencils (hex_layout.py), the KE / curl metric scalars, and
    (wall-masked lattices only, else None) the live-vertex mask planes +
    per-site live-renormalized kite weight planes — selecting the full
    vector-invariant momentum equation (model.structured_step nonlinear
    branch, incl. its masked-vertex boundary handling) fused into the same
    kernel.

    Layout note: ALL fields carry the level axis last (singleton for 2-D
    fields). In VMEM the last axis is the lane dimension, so a 2-D field
    stored as (ny2, nx) would put nx on lanes while 3-D fields put nx on
    sublanes — every 2D*3D broadcast would then be a relayout (transpose),
    which ablation showed dominates the step cost. With the trailing
    singleton, broadcasts are free lane-replications.

    Pure jnp — runs inside the Pallas kernel (and in interpret mode on CPU).
    """
    # thickness flux on edges: u * 0.5 (h_self + h_neighbor)
    flux, hep = [], []
    for fam in (E, NE, NW):
        for p in (0, 1):
            pin, dm, di = _NEIGHBOR[(fam, p)]
            he = 0.5 * (_shift(h[pin], dm, di) + h[p])
            hep.append(he)
            flux.append(u[fam * 2 + p] * he)

    # flux divergence -> thickness update -> ssh diagnostic
    h_new, ssh_new = [], []
    for p in (0, 1):
        total = flux[E * 2 + p] + flux[NE * 2 + p] + flux[NW * 2 + p]
        for ch, dm, di in _INCOMING[p]:
            total = total - _shift(flux[ch], dm, di)
        hp = h[p] - (dt * s_div) * total
        h_new.append(hp)
        ssh_new.append(jnp.sum(hp, axis=-1, keepdims=True) - rts[p])

    # pressure gradient on edges: 2-D ssh planes (barotropic, broadcast
    # over levels at the end), or per-layer Montgomery potentials when
    # stratified (models/stratification.py — the K x K lane matmul runs on
    # the MXU from VMEM; leading dims collapse is layout-preserving)
    # forward-backward (fb): the pressure terms read the freshly-updated
    # thickness/ssh planes (time_integration.ForwardBackward); the
    # divergence/h update above already produced them, so the fused step
    # gets the neutrally-stable scheme for free
    pg_ssh = ssh_new if fb else ssh
    pg_h = h_new if fb else h
    if strat_w is None:
        pg_field, pg_scale = pg_ssh, -GRAVITY * dt
    else:
        pg_field = []
        for p in (0, 1):
            hw = jnp.dot(
                pg_h[p].reshape(-1, pg_h[p].shape[-1]), strat_w,
                preferred_element_type=pg_h[p].dtype,
                precision=jax.lax.Precision.HIGHEST,
            ).reshape(pg_h[p].shape)
            pg_field.append(GRAVITY * pg_ssh[p] + hw)
        pg_scale = -dt
    grad2 = []
    for fam in (E, NE, NW):
        for p in (0, 1):
            pin, dm, di = _NEIGHBOR[(fam, p)]
            grad2.append((_shift(pg_field[pin], dm, di) - pg_field[p]) * inv_dc)

    if nl is None:
        # TRiSK Coriolis: 60 static roll-multiply-adds of u*f (Mosaic CSEs
        # the repeated shifted planes; hand-deduplicating measured slower)
        uf = [u[c] * f_edge[c] for c in range(6)]
        acc = [None] * 6
        for f_out, p_out, f_in, p_in, dm, di, w in terms:
            contrib = w * _shift(uf[f_in * 2 + p_in], dm, di)
            c = f_out * 2 + p_out
            acc[c] = contrib if acc[c] is None else acc[c] + contrib
    else:
        f_vert, vc_terms, ev_terms, s_ke, s_curl, vmask, kitew = nl
        # cell kinetic energy and its edge gradient
        sq = [u[c] * u[c] for c in range(6)]
        ke = []
        for p in (0, 1):
            tot = sq[E * 2 + p] + sq[NE * 2 + p] + sq[NW * 2 + p]
            for ch, dm, di in _INCOMING[p]:
                tot = tot + _shift(sq[ch], dm, di)
            ke.append(s_ke * tot)
        gke = []
        for fam in (E, NE, NW):
            for p in (0, 1):
                pin, dm, di = _NEIGHBOR[(fam, p)]
                gke.append((_shift(ke[pin], dm, di) - ke[p]) * inv_dc)
        # relative vorticity planes [kind*2+p] (model.curl_on_vertex)
        e_of_nw = (_shift(u[E * 2 + 1], 0, -1), _shift(u[E * 2 + 0], 1, 0))
        nw_of_e = (_shift(u[NW * 2 + 0], 0, 1), _shift(u[NW * 2 + 1], 0, 1))
        zeta = [None] * 4
        for p in (0, 1):
            zeta[0 * 2 + p] = (
                u[NE * 2 + p] - e_of_nw[p] - u[NW * 2 + p]
            ) * s_curl
            zeta[1 * 2 + p] = (
                u[E * 2 + p] + nw_of_e[p] - u[NE * 2 + p]
            ) * s_curl
        # kite thickness average -> layer PV -> edge PV (per-site live-
        # renormalized kite weights + guarded division on walled lattices,
        # mirroring model.pv_on_vertex_struct)
        hv = [None] * 4
        for t, (kind, p_out, p_in, dm, di, w) in enumerate(vc_terms):
            wgt = w if kitew is None else kitew[t]
            c = wgt * _shift(h[p_in], dm, di)
            i = kind * 2 + p_out
            hv[i] = c if hv[i] is None else hv[i] + c
        if vmask is None:
            qv = [(f_vert[i] + zeta[i]) / hv[i] for i in range(4)]
        else:
            qv = [
                (f_vert[i] + zeta[i])
                / jnp.where(vmask[i] > 0, hv[i], jnp.ones_like(hv[i]))
                * vmask[i]
                for i in range(4)
            ]
        qe = [None] * 6
        for f_out, p_out, kind, p_in, dm, di in ev_terms:
            c = _shift(qv[kind * 2 + p_in], dm, di)
            i = f_out * 2 + p_out
            qe[i] = c if qe[i] is None else qe[i] + c
        qe = [0.5 * x for x in qe]
        # symmetrized PV flux 0.5 (q_e T(F) + T(F q))
        fq = [flux[c] * qe[c] for c in range(6)]
        tf = [None] * 6
        tfq = [None] * 6
        for f_out, p_out, f_in, p_in, dm, di, w in terms:
            i = f_out * 2 + p_out
            jn = f_in * 2 + p_in
            c1 = w * _shift(flux[jn], dm, di)
            c2 = w * _shift(fq[jn], dm, di)
            tf[i] = c1 if tf[i] is None else tf[i] + c1
            tfq[i] = c2 if tfq[i] is None else tfq[i] + c2
        acc = [0.5 * (qe[c] * tf[c] + tfq[c]) - gke[c] for c in range(6)]

    u_new = [
        u[c] + dt * acc[c] + pg_scale * grad2[c] for c in range(6)
    ]
    if forc is not None:
        # momentum forcing (models/forcing.py), same term order as the
        # slab path (_step_slab): base update + dt * forcing(u_old, hep),
        # then the wall mask. The top/bot level masks arrive as compressed
        # int32 index planes and are expanded per step (_level_onehot) —
        # 12 compare/selects per site instead of 12 VMEM-resident K-planes.
        u_new = [
            u_new[c] + dt * _apply_forcing(u[c], hep[c], forc, c)
            for c in range(6)
        ]
    if masks is not None:
        # wall/dead edges stay at exactly zero velocity (channel configs)
        u_new = [u_new[c] * masks[c] for c in range(6)]

    tr_new = None
    if tr is not None:
        kappa, upwind = tropts
        tr_new = []
        for t in range(len(tr) // 2):
            # tracer edge flux per edge channel (models/tracers.py; the
            # dc/dc of the unstructured upwind correction cancels on the
            # uniform lattice, same as the slab path)
            gfl = []
            for fam in (E, NE, NW):
                for p in (0, 1):
                    pin, dm, di = _NEIGHBOR[(fam, p)]
                    c = fam * 2 + p
                    tn = _shift(tr[t * 2 + pin], dm, di)
                    tp = tr[t * 2 + p]
                    te = 0.5 * (tn + tp)
                    if upwind:
                        te = te - (0.5 * upwind) * jnp.sign(flux[c]) * (tn - tp)
                    g = flux[c] * te
                    if kappa:
                        diff = kappa * hep[c]
                        if masks is not None:
                            diff = diff * masks[c]
                        g = g - diff * ((tn - tp) * inv_dc)
                    gfl.append(g)
            for p in (0, 1):
                tot = gfl[E * 2 + p] + gfl[NE * 2 + p] + gfl[NW * 2 + p]
                for ch, dm, di in _INCOMING[p]:
                    tot = tot - _shift(gfl[ch], dm, di)
                content = h[p] * tr[t * 2 + p] - (dt * s_div) * tot
                if cmask is not None:
                    safe = jnp.where(
                        cmask[p] > 0, h_new[p], jnp.ones_like(h_new[p])
                    )
                    tr_new.append(content / safe * cmask[p])
                else:
                    tr_new.append(content / h_new[p])
        tr_new = tuple(tr_new)
    return tuple(ssh_new), tuple(h_new), tuple(u_new), tr_new


def _nl_pack(scal_ref, fvert_ref, nl_terms):
    """Assemble _step_planes' ``nl`` tuple from kernel refs + static
    stencils (None when the linear core is selected). The fvert operand
    carries 4 planes on periodic lattices, or 4 + 4 vertex-mask + 12 kite-
    weight planes on wall-masked ones (see _nl_setup) — the plane count
    selects the masked-vertex branch."""
    if nl_terms is None:
        return None
    vc_terms, ev_terms = nl_terms
    f_vert = tuple(fvert_ref[i] for i in range(4))
    vmask = kitew = None
    if fvert_ref.shape[0] > 4:
        vmask = tuple(fvert_ref[4 + i] for i in range(4))
        kitew = tuple(fvert_ref[8 + t] for t in range(len(vc_terms)))
    return (f_vert, vc_terms, ev_terms, scal_ref[0, 3], scal_ref[0, 4],
            vmask, kitew)


def _rollout_kernel(
    scal_ref, ssh_ref, h_ref, u_ref, f_ref, rts_ref, *rest,
    terms, n_steps, masked, nl_terms=None, n_tracers=0, tropts=(0.0, 1.0),
    cell_masked=False, stratified=False, fb=False, forced=False,
):
    """In-place rollout: inputs are ALIASED to outputs, the state lives in
    the (VMEM) out refs and each iteration reads and rewrites them. The
    loop carries nothing — a fori_loop that carries the state as values
    measures ~28 us/step of pure carry-copy overhead on the headline
    config, dwarfing the physics."""
    if masked:
        mask_ref, *rest = rest
        masks = tuple(mask_ref[c] for c in range(6))
    else:
        masks = None
    if nl_terms is not None:
        fvert_ref, *rest = rest
    else:
        fvert_ref = None
    if stratified:
        sw_ref, *rest = rest
        strat_w = sw_ref[...]
    else:
        strat_w = None
    if forced:
        # wind planes (6, ny2, nx, 1) + compressed int32 level-index
        # planes (12, ny2, nx, 1): [0..5] top, [6..11] bottom; scalar
        # drag/Rayleigh coefficients ride the SMEM scalar vector. The
        # one-hot masks are loop-invariant, so expand them ONCE before the
        # rollout loop (12 resident K-planes of VMEM for ~15% less
        # per-step work than re-expanding each iteration)
        fwind_ref, fidx_ref, *rest = rest
        forc = (
            tuple(fwind_ref[c] for c in range(6)),
            tuple(_level_onehot(fidx_ref[c], h_ref[0]) for c in range(6)),
            tuple(
                _level_onehot(fidx_ref[6 + c], h_ref[0]) for c in range(6)
            ),
            scal_ref[0, 6], scal_ref[0, 7], scal_ref[0, 8],
        )
    else:
        forc = None
    if n_tracers:
        if cell_masked:
            cmask_ref, *rest = rest
            cmask = tuple(cmask_ref[p] for p in range(2))
        else:
            cmask = None
        _tr_in, *rest = rest  # aliased to tr_out (read through the out ref)
        ssh_out, h_out, u_out, tr_out = rest
    else:
        cmask = None
        ssh_out, h_out, u_out = rest
        tr_out = None
    dt = scal_ref[0, 0]
    inv_dc = scal_ref[0, 1]
    s_div = scal_ref[0, 2]
    nl = _nl_pack(scal_ref, fvert_ref, nl_terms)

    f_edge = tuple(f_ref[c] for c in range(6))
    rts = tuple(rts_ref[p] for p in range(2))

    def body(_, token):
        ssh = tuple(ssh_out[p] for p in range(2))
        h = tuple(h_out[p] for p in range(2))
        u = tuple(u_out[c] for c in range(6))
        tr = (
            tuple(tr_out[i] for i in range(2 * n_tracers))
            if n_tracers else None
        )
        ssh_n, h_n, u_n, tr_n = _step_planes(
            ssh, h, u, f_edge, rts, dt, inv_dc, s_div, terms, masks, nl,
            tr, tropts, cmask, strat_w, fb, forc,
        )
        for p in range(2):
            ssh_out[p] = ssh_n[p]
            h_out[p] = h_n[p]
        for c in range(6):
            u_out[c] = u_n[c]
        for i in range(2 * n_tracers):
            tr_out[i] = tr_n[i]
        return token

    jax.lax.fori_loop(0, n_steps, body, 0)


@functools.partial(
    jax.jit, static_argnames=("n_steps", "interpret", "terms", "nl_terms",
                              "tropts", "fb")
)
def _pallas_rollout(
    ssh, h, u, f_edge, rts, scal, mask=None, f_vert=None, tracers=None,
    cmask=None, strat_w=None, fwind=None, fidx=None, *, terms, n_steps,
    interpret, nl_terms=None, tropts=(0.0, 1.0), fb=False,
):
    masked = mask is not None
    n_tracers = 0 if tracers is None else tracers.shape[0] // 2
    cell_masked = cmask is not None
    forced = fwind is not None
    kernel = functools.partial(
        _rollout_kernel, terms=terms, n_steps=n_steps, masked=masked,
        nl_terms=nl_terms, n_tracers=n_tracers, tropts=tropts,
        cell_masked=cell_masked, stratified=strat_w is not None, fb=fb,
        forced=forced,
    )
    ny2, nx, k = h.shape[1], h.shape[2], h.shape[3]
    flops_step = step_flop_count(
        ny2, nx, k, len(terms), masked, nonlinear=nl_terms is not None,
        n_tracers=n_tracers, forced=forced,
    )
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    operands = (scal, ssh, h, u, f_edge, rts)
    if masked:
        operands += (mask,)
    if nl_terms is not None:
        operands += (f_vert,)
    if strat_w is not None:
        operands += (strat_w,)
    if forced:
        operands += (fwind, fidx)
    out_shape = [
        jax.ShapeDtypeStruct(ssh.shape, ssh.dtype),
        jax.ShapeDtypeStruct(h.shape, h.dtype),
        jax.ShapeDtypeStruct(u.shape, u.dtype),
    ]
    aliases = {1: 0, 2: 1, 3: 2}
    if n_tracers:
        if cell_masked:
            operands += (cmask,)
        operands += (tracers,)
        aliases[len(operands) - 1] = 3
        out_shape.append(jax.ShapeDtypeStruct(tracers.shape, tracers.dtype))
    state_bytes = sum(o.size * o.dtype.itemsize for o in out_shape)
    return pl.pallas_call(
        kernel,
        out_shape=tuple(out_shape),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]
        + [vmem] * (len(operands) - 1),
        out_specs=(vmem,) * len(out_shape),
        cost_estimate=pl.CostEstimate(
            flops=flops_step * n_steps,
            bytes_accessed=2 * state_bytes,
            transcendentals=0,
        ),
        # the rollout state lives entirely in VMEM; the default 16 MB scoped
        # limit is far below the chip's physical VMEM, so raise it
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        input_output_aliases=aliases,
        interpret=interpret,
    )(*operands)


def step_flop_count(
    ny2: int, nx: int, k: int, n_terms: int, masked: bool = False,
    nonlinear: bool = False, n_tracers: int = 0, forced: bool = False,
) -> int:
    """Accurate FLOP count of one structured step (each Coriolis term is a
    single-plane FMA — an earlier estimate multiplied the term count by all
    6 edge planes, a 6x overcount). Per (m, i, k) lattice site:
      uf product 6; Coriolis FMAs 2*n_terms; flux 6*(add + 0.5-mul + u-mul);
      divergence accumulation 2*5; h update 2*2; ssh reduction+shift 2*2;
      u update 6*(2 FMAs) [+ 6 mask multiplies]. 2-D plane work (ssh
      gradient) is O(1/k) and ignored.

    The nonlinear (vector-invariant) step replaces the 2*n_terms Coriolis
    FMAs with: u^2 (6) + KE accumulation (2*5+2) + KE grad (6*2) + curl
    (2*7) + kite hv (2*12 FMAs, 12 three-tap stencils over 4 planes) + PV
    (4*2) + q_e (6*3) + flux*q (6) + two tangential passes (2*2*n_terms) +
    flux combine (6*3)."""
    per_site = 6 + 18 + 10 + 4 + 4 + 24 + (6 if masked else 0)
    if nonlinear:
        per_site += 6 + 12 + 12 + 14 + 24 + 8 + 18 + 6 + 4 * n_terms + 18
    else:
        per_site += 2 * n_terms
    # per tracer: 6 edge channels x (mean 2 + upwind 4 + flux mul 1 +
    # diffusion ~5) + divergence 10 + content 6 + divide 4
    per_site += n_tracers * 92
    if forced:
        # 6 channels x (2 one-hot expands + safe-h select + wind div +
        # drag FMA chain ~5 + rayleigh FMA + dt FMA) ~ 11 ops
        per_site += 66
    return per_site * ny2 * nx * k


def _scal(mesh: StructMesh, dt, dtype, forcing=None):
    dt = jnp.asarray(dt, dtype)
    if forcing is None:
        fs = [jnp.zeros((), dtype)] * 3
    else:
        fs = [
            jnp.asarray(forcing.drag_linear, dtype),
            jnp.asarray(forcing.drag_quadratic, dtype),
            jnp.asarray(forcing.rayleigh, dtype),
        ]
    return jnp.stack(
        [
            dt,
            (1.0 / mesh.dc).astype(dtype),
            (mesh.dv / mesh.area_cell).astype(dtype),
            # nonlinear metric scalars (computed exactly as the roll path
            # does, model.kinetic_energy_cell / curl_on_vertex, so the
            # fused and roll nonlinear paths agree to roundoff)
            (0.25 * mesh.dc * mesh.dv / mesh.area_cell).astype(dtype),
            (mesh.dc / (mesh.area_cell * 0.5)).astype(dtype),
            jnp.zeros((), dtype),
            # momentum-forcing coefficients (slots 6-8; zero when unforced)
            *fs,
        ]
    ).reshape(1, 9)


def _tiled_scal(mesh: StructMesh, dt, dtype, forcing=None,
                nonlinear: bool = False):
    """Runtime (1, 8) scalar vector for the tiled kernels: [dt, 1/dc,
    dv/A, drag_linear, drag_quadratic, rayleigh, ke_scale, curl_scale].
    jnp-computed, deliberately: dt AND the mesh metric scalars are
    differentiated inputs of pallas_rollout_diff, so under grad/jit they
    arrive as tracers and cannot be baked into the compiled kernel."""
    z = jnp.zeros((), dtype)
    dc = jnp.asarray(mesh.dc, dtype)
    dv = jnp.asarray(mesh.dv, dtype)
    area = jnp.asarray(mesh.area_cell, dtype)
    if forcing is None:
        fs = [z, z, z]
    else:
        fs = [
            jnp.asarray(forcing.drag_linear, dtype),
            jnp.asarray(forcing.drag_quadratic, dtype),
            jnp.asarray(forcing.rayleigh, dtype),
        ]
    if nonlinear:
        nl = [0.25 * dc * dv / area, dc / (area * 0.5)]
    else:
        nl = [z, z]
    return jnp.stack(
        [jnp.asarray(dt, dtype), 1.0 / dc, dv / area, *fs, *nl]
    ).reshape(1, 8)


_VMEM_BUDGET = 100 * 1024 * 1024


def vmem_estimate(ny2: int, nx: int, k: int, itemsize: int = 4,
                  n_tracers: int = 0, forced: bool = False) -> int:
    """Rough VMEM need of the fused kernel: 8 state planes + ~24 worth of
    live temporaries (the 64x64x100 config compiles to a ~32-plane stack),
    each lane-padded to a multiple of 128 levels. Each tracer adds 2 state
    planes + ~10 planes of live edge-flux temporaries; forcing adds ~4
    planes of transient one-hot/drag temporaries (its operands are
    compressed to singleton planes, see _forcing_setup)."""
    k_pad = -(-k // 128) * 128
    plane = ny2 * nx * k_pad * itemsize
    # forced: 12 resident one-hot planes (hoisted out of the rollout loop)
    # + ~2 planes of per-step drag temporaries
    return (32 + 12 * n_tracers + (14 if forced else 0)) * plane


def fits_in_vmem(mesh: StructMesh, k: int, itemsize: int = 4,
                 n_tracers: int = 0, forced: bool = False) -> bool:
    return vmem_estimate(
        mesh.ny2, mesh.nx, k, itemsize, n_tracers, forced
    ) <= _VMEM_BUDGET


def _nl_setup(mesh: StructMesh, dtype, nonlinear: bool):
    """(nl_terms, f_vert operand) for the fused kernels, validating the
    mesh supports the nonlinear step (same rules as model.structured_step).
    On wall-masked lattices the operand stacks [f_vertex (4); vertex_mask
    (4); vertex_kite_planes (12)] so ONE plane group carries every
    per-vertex constant the masked step needs."""
    if not nonlinear:
        return None, None
    from .model import _check_nl_mesh

    _check_nl_mesh(mesh)
    ny2, nx = mesh.ny2, mesh.nx
    f_vert = mesh.f_vertex.reshape(4, ny2, nx, 1).astype(dtype)
    if mesh.edge_mask is not None:
        f_vert = jnp.concatenate(
            [
                f_vert,
                mesh.vertex_mask.reshape(4, ny2, nx, 1).astype(dtype),
                mesh.vertex_kite_planes[:, :, :, None].astype(dtype),
            ]
        )
    return (mesh.vertex_cell_terms, mesh.edge_vertex_terms), f_vert


def _tr_planes(tracers, ny2, nx, k):
    """(2, ny2, nx, nT, K) -> (nT*2, ny2, nx, K) plane stack [t*2 + p]."""
    return jnp.moveaxis(tracers, 3, 0).reshape(-1, ny2, nx, k)


def _tr_unplanes(planes, ny2, nx, k):
    return jnp.moveaxis(planes.reshape(-1, 2, ny2, nx, k), 0, 3)


def _tracer_setup(state: StructState, mesh: StructMesh, dtype,
                  tracer_kappa, tracer_upwind):
    """(tracer plane operand, cell-mask operand, static tropts)."""
    if state.tracers is None:
        return None, None, (0.0, 1.0)
    ny2, nx = mesh.ny2, mesh.nx
    k = state.layer_thickness.shape[-1]
    tr = _tr_planes(state.tracers, ny2, nx, k)
    cmask = (
        None
        if mesh.cell_mask is None
        else mesh.cell_mask[..., None].astype(dtype)
    )
    # round the blend/diffusivity in the field dtype so in-kernel scalar
    # products match the roll path's
    npdt = np.dtype(dtype)
    tropts = (
        float(np.asarray(tracer_kappa).astype(npdt)),
        float(np.asarray(tracer_upwind).astype(npdt)),
    )
    return tr, cmask, tropts


def _strat_w(strat, dtype):
    return None if strat is None else strat.phi_weights.astype(dtype)


def _forcing_setup(forcing, ny2, nx, dtype):
    """Struct-layout Forcing (StructuredModel.to_struct_forcing) -> kernel
    operands: wind planes (6, ny2, nx, 1) and COMPRESSED one-hot level
    masks as int32 index planes (12, ny2, nx, 1) = [top x6; bottom x6],
    sentinel -1 on edges with no active level (closed/dead slots). The
    expansion (_level_onehot) reproduces the dense masks bitwise, so the
    fused paths agree with the roll/slab paths to the same roundoff as the
    unforced step. Non-one-hot masks raise when concrete; when traced
    (jit/grad) they NaN-poison the wind planes instead — loud, never
    silently mis-scaled."""
    if forcing is None:
        return None, None
    wind = jnp.asarray(forcing.wind_edge).reshape(6, ny2, nx, 1).astype(dtype)
    traced = any(
        isinstance(m, jax.core.Tracer)
        for m in (forcing.top_mask, forcing.bottom_mask)
    )
    if traced:
        # jit(grad(... wrt forcing)) — the production calling convention:
        # the masks arrive as tracers, so the one-hot STRUCTURE cannot be
        # validated eagerly (make_forcing builds one-hot masks by
        # construction). A NON-one-hot mask would compress lossily, and
        # this branch cannot raise like the concrete one below — so
        # instead of silently mis-scaling the physics, NaN-poison the
        # wind planes when any mask row fails the same one-hot/unit-weight
        # check the concrete branch enforces (0*NaN = NaN, so the poison
        # survives the one-hot products and every forced step goes NaN —
        # loud, never wrong-but-plausible). General level masks route via
        # the roll/gather paths.
        idx = []
        ok = jnp.bool_(True)
        for m in (forcing.top_mask, forcing.bottom_mask):
            mm = jnp.asarray(m).reshape(6, ny2, nx, -1)
            on = mm != 0
            cnt = on.sum(-1)
            ii = jnp.where(
                cnt == 1, jnp.argmax(on, axis=-1), -1
            ).astype(jnp.int32)
            picked = jnp.take_along_axis(
                mm, jnp.maximum(ii, 0)[..., None], axis=-1
            )[..., 0]
            ok = ok & jnp.all(cnt <= 1) & jnp.all(
                jnp.where(cnt == 1, picked == 1, True)
            )
            idx.append(ii)
        wind = wind * jnp.where(ok, 1.0, jnp.nan).astype(wind.dtype)
        return wind, jnp.concatenate(idx, axis=0)[..., None]
    idx = []
    for m in (forcing.top_mask, forcing.bottom_mask):
        m = np.asarray(m).reshape(6, ny2, nx, -1)
        k = m.shape[-1]
        on = m != 0
        cnt = on.sum(-1)
        ii = np.where(cnt == 1, on.argmax(-1), -1).astype(np.int32)
        recon = (np.arange(k)[None, None, None, :] == ii[..., None])
        if not np.array_equal(recon.astype(m.dtype), m):
            raise NotImplementedError(
                "Pallas paths support one-hot {0,1} forcing level masks "
                "only (make_forcing builds these); use the roll or "
                "gather/matrix path for general level masks"
            )
        idx.append(ii)
    fidx = jnp.asarray(np.concatenate(idx, axis=0)[..., None])
    return wind, fidx


def pallas_run_loop(
    state: StructState, mesh: StructMesh, dt, n_steps: int, *, interpret=None,
    nonlinear: bool = False, tracer_kappa: float = 0.0,
    tracer_upwind: float = 1.0, strat=None, fb: bool = False, forcing=None,
) -> StructState:
    """Run n_steps of the structured model in ONE fused on-chip kernel.

    The whole prognostic state must fit in VMEM (~64x64 cells x 100 levels
    per core); for larger meshes use model.structured_run_loop (HBM-
    streaming rolls) or the BSR matrix path. ``nonlinear=True`` fuses the
    vector-invariant momentum equation — wall-masked (culled channel/basin)
    lattices included, via the masked vertex constants StructuredModel
    precomputes (partial kites + live-vertex guard). Tracers
    (state.tracers, models/tracers.py) fuse into the same kernel — each
    tracer is one more pair of VMEM parity planes advected by the step's
    flux. ``forcing`` (struct-layout, StructuredModel.to_struct_forcing)
    fuses the wind/drag/Rayleigh momentum terms (models/forcing.py) into
    the same per-step VPU pass."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    k_ = state.layer_thickness.shape[-1]
    n_tr = 0 if state.tracers is None else state.tracers.shape[3]
    if not interpret and not fits_in_vmem(
        mesh, k_, state.layer_thickness.dtype.itemsize, n_tr,
        forcing is not None,
    ):
        raise ValueError(
            f"mesh too large for the fused-VMEM rollout "
            f"(~{vmem_estimate(mesh.ny2, mesh.nx, k_, n_tracers=n_tr) >> 20}"
            f" MB needed, {_VMEM_BUDGET >> 20} MB budget); use "
            "structured_run_loop or the MatrixModel path"
        )
    ny2, nx = mesh.ny2, mesh.nx
    k = state.layer_thickness.shape[-1]
    dtype = state.layer_thickness.dtype
    # 2-D fields carry a trailing singleton level axis so every in-kernel
    # array shares the 3-D lane layout (see _step_planes docstring)
    ssh = state.ssh[..., None]
    h = state.layer_thickness
    u = state.normal_velocity.reshape(6, ny2, nx, k)
    f_edge = mesh.f_edge.reshape(6, ny2, nx, 1).astype(dtype)
    rts = mesh.resting_thickness_sum[..., None].astype(dtype)
    mask = (
        None
        if mesh.edge_mask is None
        else mesh.edge_mask.reshape(6, ny2, nx, 1).astype(dtype)
    )
    nl_terms, f_vert = _nl_setup(mesh, dtype, nonlinear)
    tr, cmask, tropts = _tracer_setup(
        state, mesh, dtype, tracer_kappa, tracer_upwind
    )
    fwind, fidx = _forcing_setup(forcing, ny2, nx, dtype)
    out = _pallas_rollout(
        ssh, h, u, f_edge, rts, _scal(mesh, dt, dtype, forcing), mask, f_vert,
        tr, cmask, _strat_w(strat, dtype), fwind, fidx,
        terms=mesh.coriolis_terms, n_steps=n_steps, interpret=bool(interpret),
        nl_terms=nl_terms, tropts=tropts, fb=fb,
    )
    ssh_f, h_f, u_f = out[:3]
    tracers = _tr_unplanes(out[3], ny2, nx, k) if n_tr else None
    return StructState(
        ssh=ssh_f[..., 0],
        layer_thickness=h_f,
        normal_velocity=u_f.reshape(3, 2, ny2, nx, k),
        tracers=tracers,
    )


# ---------------------------------------------------------------------------
# Tiled single-step kernel: for meshes too large for the all-in-VMEM rollout.
# Grid over row tiles; each tile reads its (Rt, nx, K) block plus one halo
# row per side, delivered as tiny per-tile side inputs extracted with
# strided slices — read amplification (Rt+2)/Rt instead of the 3x a
# neighboring-blocks scheme would cost. One pallas_call per step inside the
# jitted scan: HBM traffic ~2 state passes per step (the roll formulation
# materializes ~8).
# ---------------------------------------------------------------------------


def _reach(nonlinear: bool, fb: bool) -> int:
    """Halo rows consumed per side per timestep by the tiled/slab window
    kernels: 1 for the linear core; 2 for nonlinear (derived fields
    recomputed on a 1-padded window) or forward-backward (fresh-thickness
    pressure reads one ring further); 3 for nonlinear + forward-backward
    (the fresh thickness itself needs the 1-padded flux window)."""
    if nonlinear:
        return 3 if fb else 2
    return 2 if fb else 1


def _window_steps(
    ssh, h, u, tr, scal, *, f_full, rts_full, masks_full=None, fv_full=None,
    wind_full=None, ti_full=None, bi_full=None, cm_full=None, strat_w=None,
    terms, nl_terms=None, tropts=(0.0, 1.0), fb=False, rows, q, reach, full,
):
    """Advance a halo-padded plane window by q timesteps (the window
    shrinks ``reach`` rows per side per step). The SINGLE implementation of
    the q-step superstep math, shared by the forward tiled kernel
    (_tiled_step_kernel) and the tiled adjoint kernel's in-kernel jax.vjp
    target — so forward and reverse can never drift apart. All scalars ride
    the (1, 8) runtime vector (_tiled_scal layout)."""
    dt = scal[0, 0]
    inv_dc = scal[0, 1]
    s_div = scal[0, 2]
    forced = wind_full is not None
    if forced:
        dlin, dquad, rayl = scal[0, 3], scal[0, 4], scal[0, 5]
    if nl_terms is not None:
        ke_scale, curl_scale = scal[0, 6], scal[0, 7]
        vc_terms, ev_terms = nl_terms
    for j in range(q):
        rows_j = rows + 2 * reach * (q - 1 - j)
        off = reach * j
        # constant fields get windowed; STATE arrives already at the window
        # size from the previous iteration's interior output
        win = lambda t: tuple(x[off : full - off] for x in t)
        forc_j = (
            (win(wind_full), win(ti_full), win(bi_full), dlin, dquad, rayl)
            if forced else None
        )
        if nl_terms is not None:
            ssh, h, u, tr = _step_slab_nl(
                ssh, h, u, win(f_full), win(rts_full), win(fv_full),
                dt, inv_dc, s_div, ke_scale, curl_scale, terms,
                vc_terms, ev_terms, rows_j, forc_j, tr, tropts, strat_w,
                win(masks_full) if masks_full is not None else None,
                win(cm_full) if cm_full is not None else None,
                fb=fb,
            )
        else:
            ssh, h, u, tr = _step_slab(
                ssh, h, u, win(f_full), win(rts_full),
                dt, inv_dc, s_div, terms, rows_j,
                win(masks_full) if masks_full is not None else None,
                forc_j, tr, tropts,
                win(cm_full) if cm_full is not None else None, strat_w, fb,
            )
    return ssh, h, u, tr


def _tiled_step_kernel(
    scal_ref, ssh_ref, h_ref, u_ref, f_ref, rts_ref,
    ssh_t, h_t, u_t, f_t, rts_t, ssh_b, h_b, u_b, f_b, rts_b, *rest,
    terms, rows, masked, q, n_tracers=0, tropts=(0.0, 1.0),
    cell_masked=False, stratified=False, forced=False, nl_terms=None,
    fb=False,
):
    """``q``-step temporal blocking: the tile carries reach*q halo rows per
    side and advances q timesteps per kernel invocation, shrinking the
    valid window by ``reach`` rows per side per step — q-fold fewer HBM
    passes over the state for O(q^2) extra boundary-row compute.
    Tracers ride as extra plane groups with the same halo scheme; the
    stratified Montgomery matmul runs per window (models/stratification.py).

    reach = 1 for the linear core; 2 for the NONLINEAR (vector-invariant)
    step, whose derived fields (flux/KE/edge PV) are recomputed locally on
    a 1-padded window (_step_slab_nl), and for FORWARD-BACKWARD, whose
    pressure stage reads the fresh thickness one ring out."""
    reach = _reach(nl_terms is not None, fb)

    def pad(center, top, bot, c):
        return jnp.concatenate([top[c], center[c], bot[c]], axis=0)

    if masked:
        m_ref, m_t, m_b, *rest = rest
        masks_full = tuple(pad(m_ref, m_t, m_b, c) for c in range(6))
    else:
        masks_full = None
    if nl_terms is not None:
        fv_ref, fv_t, fv_b, *rest = rest
        fv_full = tuple(
            pad(fv_ref, fv_t, fv_b, c) for c in range(fv_ref.shape[0])
        )
    if forced:
        # wind planes + compressed int32 level-index planes, halo-padded
        # like every other constant field (see _forcing_setup)
        fw_ref, fw_t, fw_b, fi_ref, fi_t, fi_b, *rest = rest
        wind_full = tuple(pad(fw_ref, fw_t, fw_b, c) for c in range(6))
        ti_full = tuple(pad(fi_ref, fi_t, fi_b, c) for c in range(6))
        bi_full = tuple(pad(fi_ref, fi_t, fi_b, 6 + c) for c in range(6))
    if n_tracers:
        t_ref, t_t, t_b, *rest = rest
        tr_full = tuple(
            pad(t_ref, t_t, t_b, i) for i in range(2 * n_tracers)
        )
    else:
        tr_full = None
    if cell_masked:
        cm_ref, cm_t, cm_b, *rest = rest
        cm_full = tuple(pad(cm_ref, cm_t, cm_b, p) for p in range(2))
    else:
        cm_full = None
    if stratified:
        sw_ref, *rest = rest
        strat_w = sw_ref[...]
    else:
        strat_w = None
    if n_tracers:
        ssh_out, h_out, u_out, t_out = rest
    else:
        ssh_out, h_out, u_out = rest
        t_out = None

    # ALL scalars ride a RUNTIME (1, 8) VMEM operand (_tiled_scal layout:
    # dt, 1/dc, dv/A, drag_lin, drag_quad, rayleigh, ke_scale, curl_scale).
    # They cannot be compile-time constants: dt AND the mesh metrics are
    # differentiated inputs of pallas_rollout_diff, so they arrive as
    # tracers under grad/jit. (An SMEM scalar operand would need a rank-2
    # index map under the tile grid, which Mosaic fails to legalize —
    # hence VMEM.)
    ssh = tuple(pad(ssh_ref, ssh_t, ssh_b, p) for p in range(2))
    h = tuple(pad(h_ref, h_t, h_b, p) for p in range(2))
    u = tuple(pad(u_ref, u_t, u_b, c) for c in range(6))
    f_full = tuple(pad(f_ref, f_t, f_b, c) for c in range(6))
    rts_full = tuple(pad(rts_ref, rts_t, rts_b, p) for p in range(2))

    ssh, h, u, tr = _window_steps(
        ssh, h, u, tr_full, scal_ref[...],
        f_full=f_full, rts_full=rts_full,
        masks_full=masks_full if masked else None,
        fv_full=fv_full if nl_terms is not None else None,
        wind_full=wind_full if forced else None,
        ti_full=ti_full if forced else None,
        bi_full=bi_full if forced else None,
        cm_full=cm_full if cell_masked else None,
        strat_w=strat_w,
        terms=terms, nl_terms=nl_terms, tropts=tropts, fb=fb,
        rows=rows, q=q, reach=reach, full=rows + 2 * reach * q,
    )
    for p in range(2):
        ssh_out[p] = ssh[p]
        h_out[p] = h[p]
    for c in range(6):
        u_out[c] = u[c]
    for i in range(2 * n_tracers):
        t_out[i] = tr[i]


# Scoped-VMEM limit for the TILED step kernel: like the tiled adjoint,
# its pipeline windows are per-tile blocks, so it can claim more of the
# physical 128 MB/core than the whole-array fused kernels. 116 MB
# verified on v5e by compiling AND running 500-step nonlinear q=2
# rollouts at 256x256x100 f32 (window cost 110 MB — over the old 100 MB
# budget; measured 3.77 vs 3.38 Gp/s at q=1).
_TILED_VMEM_BUDGET = 116 * 1024 * 1024

# Single-chip tiled rollouts read halo rows DIRECTLY from the state arrays
# via modular BlockSpec indices when the row tile is hq-aligned (see
# _make_tiled_step_call); False restores the gathered-halo operands for
# A/B measurement.
_TILED_DIRECT_HALOS = True


def tile_cost_planes(n_tracers: int = 0, nonlinear: bool = False,
                     forced: bool = False) -> int:
    """Per-WINDOW-ROW plane cost of the tiled kernel (the 'a' coefficient
    of tile_window_fits' two-term model): step temporaries + single-
    buffered window reads. Recalibrated for the direct-halo kernels
    (round-5 sweep, see tile_window_fits): base 70 for linear, nonlinear
    AND forward-backward; +8 when forced (the wind + level-index
    singleton planes pad to full k_pad lanes); tracer-carrying configs
    keep the previous calibrated costs exactly (+10 base +14/tracer —
    their compile boundary was not re-swept)."""
    per = 70 + 14 * n_tracers + (10 if n_tracers else 0)
    if forced:
        per += 8
    return per


# per-CENTER-ROW extra cost (double-buffered center in/out blocks scale
# with rt, not with the whole window — the round-5 sweep point that
# separates them: nonlinear rt=4/q=2 and rt=8/q=1 have the SAME 12-row
# window, yet the first compiles at 116 MB and the second does not)
_TILE_RT_PLANES = 16


def tile_window_fits(rt: int, q: int, nx: int, k: int, itemsize: int,
                     n_tracers: int = 0, reach: int = 1,
                     nonlinear: bool = False, forced: bool = False) -> bool:
    """Whether a (rt + 2*reach*q)-row kernel window fits the tiled-kernel
    VMEM budget. Two-term cost: a * window_rows + b * rt, with a =
    tile_cost_planes and b = _TILE_RT_PLANES, checked directly against
    _TILED_VMEM_BUDGET (= 928 plane-rows at 256x256x100 f32; plane-row =
    nx * k_pad * itemsize = 131072 B). RECALIBRATED on v5e Mosaic
    compile success for the direct-halo kernels (round-5 sweep), all
    points consistent with a=70, b=16: linear q4/rt4 OK (904), q2/rt8
    FAIL (968), q8/rt4 FAIL (1464), q1/rt8 OK (828); nonlinear q2/rt4 OK
    (904), q1/rt8 FAIL (968), q4/rt2 FAIL (1292); fb q2/rt4 OK (904,
    6.17 Gp/s); forced q2/rt4 OK (688 at a=78), forced q4/rt4 FAIL
    (1000). Trailing-singleton fields pad to a full 128-lane tile, so
    they count at the same k_pad as the 3-D fields."""
    k_pad = -(-k // 128) * 128
    a = tile_cost_planes(n_tracers, nonlinear, forced)
    cost_rows = a * (rt + 2 * reach * q) + _TILE_RT_PLANES * rt
    return cost_rows * nx * k_pad * itemsize <= _TILED_VMEM_BUDGET


def _pick_row_tile(ny2: int, nx: int, k: int, itemsize: int, q: int = 1,
                   n_tracers: int = 0, reach: int = 1,
                   nonlinear: bool = False, forced: bool = False) -> int:
    """Largest divisor of ny2 whose tile window fits the VMEM budget
    (tile_window_fits cost model)."""
    for t in range(1, ny2 + 1):
        if ny2 % t:
            continue
        rt = ny2 // t
        if tile_window_fits(rt, q, nx, k, itemsize, n_tracers, reach,
                            nonlinear, forced):
            return rt
    return 1


def auto_tile_plan(ny2: int, nx: int, k: int, itemsize: int,
                   n_tracers: int = 0, reach: int = 1,
                   nonlinear: bool = False, n_steps: int = 0,
                   forced: bool = False):
    """(row_tile, q) for the tiled rollout: deepest temporal blocking whose
    row tile stays at least as large as the PER-SIDE halo it carries
    (round-4 required the full 2-sided halo, but the round-5 budget sweep
    measured nonlinear rt=4/q=2 — halo 8 > rt 4 — FASTER than rt=4/q=1;
    with direct halo views linear q=4/rt=4 measures 12.3 Gp/s vs q=2's
    7.9 and fb q=2/rt=4 6.2 vs q=1's 4.0, so the recalibrated fit model
    admits them)."""
    q = 1
    for cand in (4, 2):
        if n_steps and n_steps % cand:
            continue
        rt_c = _pick_row_tile(ny2, nx, k, itemsize, cand, n_tracers, reach,
                              nonlinear, forced)
        if rt_c >= reach * cand:
            q = cand
            break
    return _pick_row_tile(ny2, nx, k, itemsize, q, n_tracers, reach,
                          nonlinear, forced), q


def _make_tiled_step_call(
    n_rows: int, nx: int, k: int, dtype, *, terms, rt: int, q: int,
    tropts=(0.0, 1.0), masked=False, forced=False, n_tracers=0,
    cell_masked=False, strat_shape=None, interpret=False, nl_terms=None,
    fb=False, direct_halos=False,
):
    """Build the q-step row-tiled pallas_call over an ``n_rows``-row
    parity-plane stack. The reach*q-row halo blocks per tile side are
    SEPARATE operands (grouped per tile, (planes, n_tiles*reach*q, nx,
    tr)), so the SAME kernel serves two callers: the single-chip tiled
    rollout, whose halos are periodic strided slices of the global state,
    and the sharded communication-avoiding superstep (sharded.
    ShardedStructuredModel.run_pallas), whose outermost halos arrive by
    lax.ppermute. ``nl_terms`` = (vertex_cell_terms, edge_vertex_terms)
    selects the nonlinear vector-invariant step (reach 2); ``fb`` the
    forward-backward scheme (reach 2; nonlinear+fb reach 3).

    ``direct_halos`` (single-chip periodic caller, needs rt % hq == 0):
    the halo operands are the CENTER arrays passed again, and their
    BlockSpecs address the neighbor tiles' boundary rows directly with
    modular hq-row block indices — the kernel DMAs halo rows straight
    from the state in HBM, eliminating the per-step strided-slice halo
    gather (its XLA dispatch AND its extra ~2*hq/rt state-pass of HBM
    traffic). In-place donation must be OFF in this mode: tile t+1 reads
    tile t's pre-step boundary rows, which donation would have already
    overwritten.

    Operand order: the (1, 8) runtime scalar vector (_tiled_scal); then
    (ssh, h, u, f, rts) centers; the same five as top halo blocks; the
    same five as bottom halo blocks; then optional groups in this order —
    mask triplet, f_vertex triplet (nonlinear), (wind, level-index)
    forcing triplets, tracer triplet, cell-mask triplet, stratification
    weights."""
    stratified = strat_shape is not None
    nonlinear = nl_terms is not None
    reach = _reach(nonlinear, fb)
    hq = reach * q
    n_tiles = n_rows // rt
    if direct_halos:
        assert rt % hq == 0, "direct halo views need hq-aligned row tiles"
    kernel = functools.partial(
        _tiled_step_kernel, terms=terms, rows=rt,
        masked=masked, q=q, n_tracers=n_tracers, tropts=tropts,
        cell_masked=cell_masked, stratified=stratified, forced=forced,
        nl_terms=nl_terms, fb=fb,
    )

    # index-map zeros derived from t (t * 0): literal 0s trace as i64 while
    # the grid index is i32, and Mosaic refuses mixed-type index-map results
    def center_spec(planes, r, tr):
        return pl.BlockSpec(
            (planes, r, nx, tr), lambda t: (t * 0, t, t * 0, t * 0),
            memory_space=pltpu.VMEM,
        )

    if direct_halos:
        # hq-row blocks over the (n_rows)-row center array itself: tile
        # t's top halo is block t*(rt/hq) - 1, its bottom (t+1)*(rt/hq),
        # both mod the block count (periodic wrap). The wrap MUST be raw
        # lax.rem on non-negative operands: under the package's x64
        # policy, jnp's %, // and where trace sign-correction converts
        # into the index map that Mosaic's convert_element_type lowering
        # re-expands forever (RecursionError at lowering).
        c_blk = rt // hq
        n_blk = n_rows // hq
        _rem = lambda v: jax.lax.rem(v, jnp.int32(n_blk))

        def top_spec(planes, tr):
            return pl.BlockSpec(
                (planes, hq, nx, tr),
                lambda t: (t * 0, _rem(t * c_blk - 1 + n_blk), t * 0, t * 0),
                memory_space=pltpu.VMEM,
            )

        def bot_spec(planes, tr):
            return pl.BlockSpec(
                (planes, hq, nx, tr),
                lambda t: (t * 0, _rem((t + 1) * c_blk), t * 0, t * 0),
                memory_space=pltpu.VMEM,
            )
    else:
        def top_spec(planes, tr):
            return pl.BlockSpec(
                (planes, hq, nx, tr), lambda t: (t * 0, t, t * 0, t * 0),
                memory_space=pltpu.VMEM,
            )

        bot_spec = top_spec

    halo_spec = top_spec

    def group(spec):
        # (ssh, h, u, f, rts) halo blocks
        return [
            spec(2, 1), spec(2, k), spec(6, k),
            spec(6, 1), spec(2, 1),
        ]

    sds = lambda planes, tr: jax.ShapeDtypeStruct(
        (planes, n_rows, nx, tr), dtype
    )
    out_shape = [sds(2, 1), sds(2, k), sds(6, k)]
    out_specs = [
        center_spec(2, rt, 1),
        center_spec(2, rt, k),
        center_spec(6, rt, k),
    ]
    in_specs = [
        # runtime scalar vector (_tiled_scal), same block for every tile
        pl.BlockSpec((1, 8), lambda t: (t * 0, t * 0),
                     memory_space=pltpu.VMEM),
        center_spec(2, rt, 1),   # ssh
        center_spec(2, rt, k),   # h
        center_spec(6, rt, k),   # u
        center_spec(6, rt, 1),   # f
        center_spec(2, rt, 1),   # rts
    ] + group(top_spec) + group(bot_spec)   # top halos, bottom halos
    # in-place donation is only safe when each tile reads ITS OWN block
    # alone; direct halo views read neighbor tiles' pre-step rows
    aliases = {} if direct_halos else {1: 0, 2: 1, 3: 2}
    if masked:
        in_specs += [center_spec(6, rt, 1), top_spec(6, 1), bot_spec(6, 1)]
    if nonlinear:
        # 4 f_vertex planes, +16 vertex-mask/kite-weight planes when walled
        nl_p = 4 + (4 + len(nl_terms[0]) if masked else 0)
        in_specs += [center_spec(nl_p, rt, 1), top_spec(nl_p, 1),
                     bot_spec(nl_p, 1)]
    if forced:
        in_specs += [
            center_spec(6, rt, 1), top_spec(6, 1), bot_spec(6, 1),
            center_spec(12, rt, 1), top_spec(12, 1), bot_spec(12, 1),
        ]
    if n_tracers:
        nt2 = 2 * n_tracers
        # tracer center operand position (for the alias map): count the
        # operands laid down so far
        tr_pos = len(in_specs)
        in_specs += [center_spec(nt2, rt, k), top_spec(nt2, k),
                     bot_spec(nt2, k)]
        if not direct_halos:
            aliases[tr_pos] = 3
        out_shape.append(sds(nt2, k))
        out_specs.append(center_spec(nt2, rt, k))
    if cell_masked:
        in_specs += [center_spec(2, rt, 1), top_spec(2, 1), bot_spec(2, 1)]
    if stratified:
        in_specs += [pl.BlockSpec(strat_shape,
                                  lambda t: (t * 0, t * 0),
                                  memory_space=pltpu.VMEM)]

    return pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        out_shape=tuple(out_shape),
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_TILED_VMEM_BUDGET
        ),
        # each tile reads its own center block and writes its own: in-place
        # is safe, and donation avoids a whole-state copy per scan step
        input_output_aliases=aliases,
        interpret=interpret,
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "terms", "row_tile", "n_steps", "interpret", "q", "tropts",
        "nl_terms", "fb", "direct_halos",
    ),
)
def _pallas_tiled_rollout(
    scal_t, ssh, h, u, f_edge, rts, mask=None, tracers=None, cmask=None,
    strat_w=None, fwind=None, fidx=None, f_vert=None, *,
    terms, row_tile, n_steps, interpret, q=1, tropts=(0.0, 1.0),
    nl_terms=None, fb=False, direct_halos=False,
):
    masked = mask is not None
    n_tracers = 0 if tracers is None else tracers.shape[0] // 2
    cell_masked = cmask is not None
    stratified = strat_w is not None
    forced = fwind is not None
    nonlinear = nl_terms is not None
    reach = _reach(nonlinear, fb)
    hq = reach * q
    ny2, nx, k = h.shape[1], h.shape[2], h.shape[3]
    rt = row_tile
    n_tiles = ny2 // rt
    # hq-aligned row tiles let the kernel read halo rows DIRECTLY from the
    # state arrays via modular block indices (no per-step strided-slice
    # gather, no extra HBM pass); misaligned plans keep the gathered-halo
    # operands. STATIC argument (resolved by the caller outside jit): a
    # global read here would be baked into the first compilation and
    # silently ignored on toggles.
    direct = direct_halos and rt % hq == 0 and n_tiles > 1
    step_call = _make_tiled_step_call(
        ny2, nx, k, h.dtype, terms=terms, rt=rt, q=q,
        tropts=tropts, masked=masked, forced=forced, n_tracers=n_tracers,
        cell_masked=cell_masked,
        strat_shape=None if strat_w is None else strat_w.shape,
        interpret=interpret, nl_terms=nl_terms, fb=fb,
        direct_halos=direct,
    )

    def halos(x):
        """(planes, ny2, nx, tr) -> top/bottom hq-row halo blocks per tile,
        (planes, n_tiles*hq, nx, tr) each, grouped per tile. Tile t's top
        halo is rows (t*rt - hq .. t*rt - 1) mod ny2, its bottom rows
        ((t+1)*rt .. (t+1)*rt + hq - 1) mod ny2 — extracted with strided
        slices directly (an earlier version rolled the FULL array first,
        adding two whole-state HBM passes per field per step)."""

        def rows_at(offsets):
            cols = []
            for off in offsets:
                o = off % rt
                shift = (off - o) // rt  # tile shift of the strided slice
                base = x[:, o::rt]  # (planes, n_tiles, nx, tr): row t*rt+o
                sh = shift % n_tiles
                if sh:
                    base = jnp.concatenate(
                        [base[:, sh:], base[:, :sh]], axis=1
                    )
                cols.append(base)
            stacked = jnp.stack(cols, axis=2)  # (planes, T, hq, nx, tr)
            return stacked.reshape(
                x.shape[0], n_tiles * len(offsets), *x.shape[2:]
            )

        return rows_at(range(-hq, 0)), rows_at(range(rt, rt + hq))

    if direct:
        # halo operands ARE the center arrays; their BlockSpecs address
        # the neighbor rows
        halos = lambda x: (x, x)
    f_t, f_b = halos(f_edge)
    rts_t, rts_b = halos(rts)
    if masked:
        m_t, m_b = halos(mask)
    if nonlinear:
        fv_t, fv_b = halos(f_vert)
    if cell_masked:
        cm_t, cm_b = halos(cmask)
    if forced:
        fw_t, fw_b = halos(fwind)
        fi_t, fi_b = halos(fidx)

    assert n_steps % q == 0

    def body(carry, _):
        if n_tracers:
            ssh_c, h_c, u_c, t_c = carry
        else:
            ssh_c, h_c, u_c = carry
        ssh_t, ssh_b = halos(ssh_c)
        h_t, h_b = halos(h_c)
        u_t, u_b = halos(u_c)
        args = (
            scal_t, ssh_c, h_c, u_c, f_edge, rts,
            ssh_t, h_t, u_t, f_t, rts_t, ssh_b, h_b, u_b, f_b, rts_b,
        )
        if masked:
            args += (mask, m_t, m_b)
        if nonlinear:
            args += (f_vert, fv_t, fv_b)
        if forced:
            args += (fwind, fw_t, fw_b, fidx, fi_t, fi_b)
        if n_tracers:
            t_t, t_b = halos(t_c)
            args += (t_c, t_t, t_b)
        if cell_masked:
            args += (cmask, cm_t, cm_b)
        if stratified:
            args += (strat_w,)
        out = step_call(*args)
        return tuple(out), None

    init = (ssh, h, u) + ((tracers,) if n_tracers else ())
    final, _ = jax.lax.scan(body, init, length=n_steps // q)
    return final


def pallas_tiled_run_loop(
    state: StructState, mesh: StructMesh, dt, n_steps: int,
    *, row_tile: int | None = None, interpret=None, q: int | None = None,
    tracer_kappa: float = 0.0, tracer_upwind: float = 1.0, strat=None,
    forcing=None, nonlinear: bool = False, fb: bool = False,
) -> StructState:
    """Fused-step rollout for meshes of ANY size: one Pallas call per q
    timesteps, gridded over row tiles with reach*q-row halos (temporal
    blocking — q-fold fewer HBM passes over the state for O(q^2) extra
    boundary-row compute). Tracers and layered stratification ride the
    same tiles. ``nonlinear`` fuses the vector-invariant momentum equation
    (walled lattices included — masked vertex constants ride the f_vertex
    plane group; derived fields recomputed locally on the 2-rows-per-step
    window, sharded._step_slab_nl); ``fb`` the forward-backward scheme
    (reach 2; nonlinear+fb reach 3)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    ny2, nx = mesh.ny2, mesh.nx
    k = state.layer_thickness.shape[-1]
    n_tr = 0 if state.tracers is None else state.tracers.shape[3]
    dtype = state.layer_thickness.dtype
    reach = _reach(nonlinear, fb)
    if q is None:
        if row_tile is None:
            _, q = auto_tile_plan(ny2, nx, k, dtype.itemsize, n_tr, reach,
                                  nonlinear, n_steps,
                                  forced=forcing is not None)
        else:
            # explicit row tile, auto q: deepest temporal blocking whose
            # window the fit model admits for THIS tile (same criterion
            # as auto_tile_plan)
            q = 1
            for cand in (4, 2):
                if n_steps % cand:
                    continue
                if tile_window_fits(row_tile, cand, nx, k, dtype.itemsize,
                                    n_tr, reach, nonlinear,
                                    forced=forcing is not None):
                    q = cand
                    break
    q = max(1, min(int(q), n_steps))
    while n_steps % q:
        q -= 1
    if row_tile is None:
        row_tile = _pick_row_tile(ny2, nx, k, dtype.itemsize, q, n_tr,
                                  reach, nonlinear,
                                  forced=forcing is not None)
    if ny2 % row_tile:
        raise ValueError(f"row_tile {row_tile} must divide ny2={ny2}")
    if row_tile + 2 * reach * q > ny2:
        q = max(1, (ny2 - row_tile) // (2 * reach))
        while n_steps % q:
            q -= 1
    nl_terms, f_vert = _nl_setup(mesh, dtype, nonlinear)
    ssh = state.ssh[..., None]
    h = state.layer_thickness
    u = state.normal_velocity.reshape(6, ny2, nx, k)
    f_edge = mesh.f_edge.reshape(6, ny2, nx, 1).astype(dtype)
    rts = mesh.resting_thickness_sum[..., None].astype(dtype)
    mask = (
        None
        if mesh.edge_mask is None
        else mesh.edge_mask.reshape(6, ny2, nx, 1).astype(dtype)
    )
    tr, cmask, tropts = _tracer_setup(
        state, mesh, dtype, tracer_kappa, tracer_upwind
    )
    cmask = None if cmask is None else cmask.reshape(2, ny2, nx, 1)
    fwind, fidx = _forcing_setup(forcing, ny2, nx, dtype)
    out = _pallas_tiled_rollout(
        _tiled_scal(mesh, dt, dtype, forcing, nonlinear),
        ssh, h, u, f_edge, rts, mask, tr, cmask, _strat_w(strat, dtype),
        fwind, fidx, f_vert,
        terms=mesh.coriolis_terms, row_tile=int(row_tile),
        n_steps=n_steps, interpret=bool(interpret), q=int(q),
        tropts=tropts, nl_terms=nl_terms, fb=fb,
        direct_halos=_TILED_DIRECT_HALOS,
    )
    ssh_f, h_f, u_f = out[:3]
    return StructState(
        ssh=ssh_f[..., 0],
        layer_thickness=h_f,
        normal_velocity=u_f.reshape(3, 2, ny2, nx, k),
        tracers=_tr_unplanes(out[3], ny2, nx, k) if n_tr else None,
    )


def structured_auto_run_loop(
    state: StructState, mesh: StructMesh, dt, n_steps: int, *, interpret=None,
    nonlinear: bool = False, tracer_kappa: float = 0.0,
    tracer_upwind: float = 1.0, strat=None, fb: bool = False, forcing=None,
) -> StructState:
    """Fastest applicable structured rollout: whole-loop-in-VMEM kernel when
    the state fits, tiled per-step kernel otherwise (tracers, layered
    stratification, momentum forcing, nonlinear dynamics — wall-masked
    lattices included — and forward-backward; nonlinear/FB tiles carry
    2-rows-per-step halos, nonlinear+FB 3); roll model on CPU. Every
    stepper x physics x size combination runs fused."""
    explicit = interpret is not None
    if not explicit:
        interpret = jax.default_backend() != "tpu"
    k = state.layer_thickness.shape[-1]
    n_tr = 0 if state.tracers is None else state.tracers.shape[3]
    if interpret and not _FORCE_TPU_ROUTING:
        from .model import structured_run_loop

        return structured_run_loop(state, mesh, dt, n_steps, nonlinear,
                                   forcing,
                                   tracer_kappa=tracer_kappa,
                                   tracer_upwind=tracer_upwind, strat=strat,
                                   fb=fb)
    if not explicit:
        # forced-routing tests on CPU still need interpret-mode kernels;
        # an EXPLICIT interpret= from the caller is honored as given
        interpret = _interp()
    if fits_in_vmem(mesh, k, state.layer_thickness.dtype.itemsize, n_tr,
                    forcing is not None):
        return pallas_run_loop(
            state, mesh, dt, n_steps, interpret=interpret,
            nonlinear=nonlinear,
            tracer_kappa=tracer_kappa, tracer_upwind=tracer_upwind,
            strat=strat, fb=fb, forcing=forcing,
        )
    return pallas_tiled_run_loop(state, mesh, dt, n_steps,
                                 interpret=interpret,
                                 q=None, tracer_kappa=tracer_kappa,
                                 tracer_upwind=tracer_upwind, strat=strat,
                                 forcing=forcing, nonlinear=nonlinear,
                                 fb=fb)


# ---------------------------------------------------------------------------
# Fused Pallas adjoint: the reverse sweep runs in VMEM too.
#
# The reverse of an n-step rollout needs the primal state at every step
# (the thickness flux u*h is bilinear). Instead of replaying the HBM-bound
# roll model (the round-1 fallback, ~18x the fused forward cost), the
# rollout is checkpointed at two levels and each b-step segment is reversed
# by ONE Pallas kernel that (a) recomputes the b primal states into VMEM
# from the segment checkpoint and (b) runs b adjoint steps — the adjoint
# step is jax.vjp of the same `_step_planes` math, traced INSIDE the
# kernel, so the transpose stencils fuse on the VPU exactly like the
# forward ones. (reference: the Enzyme whole-loop reverse,
# test/enzyme/test_Enzyme_end2end.jl:78-92 — here it runs at a small
# multiple of the fused forward speed instead of the host-loop speed.)
# ---------------------------------------------------------------------------


def _adjoint_segment_kernel(
    scal_ref, ssh_ref, h_ref, u_ref, f_ref, rts_ref,
    gs_ref, gh_ref, gu_ref, *rest, terms, b, masked, nl_terms=None,
    n_tracers=0, tropts=(0.0, 1.0), cell_masked=False, stratified=False,
    forced=False,
):
    """Reverse one b-step segment: inputs are the segment-start primal state
    and the cotangent at the segment end; outputs the cotangent at the
    segment start plus the segment's d(dt) contribution. Tracers ride as
    one more state slot — the adjoint step is the same in-kernel jax.vjp of
    _step_planes, so the tracer transpose stencils fuse like the rest.
    ``forced`` adds momentum-forcing inputs and the segment's d(wind) plane
    + d(drag_linear, drag_quadratic, rayleigh) accumulators — the forcing
    term is elementwise, so its transpose fuses at negligible cost. The
    one-hot LEVEL-MASK cotangents are not produced (the masks arrive as
    compressed int index planes; they are structural selectors — use the
    checkpointed-roll reverse if d(mask) is ever needed)."""
    if masked:
        mask_ref, *rest = rest
        masks = tuple(mask_ref[c] for c in range(6))
    else:
        masks = None
    if nl_terms is not None:
        fvert_ref, *rest = rest
    else:
        fvert_ref = None
    if stratified:
        sw_ref, *rest = rest
        strat_w = sw_ref[...]
    else:
        strat_w = None
    if forced:
        fwind_ref, fidx_ref, *rest = rest
        # hoist the one-hot expansion out of the recompute/reverse loops
        # (same trick as _rollout_kernel)
        f_top = tuple(_level_onehot(fidx_ref[c], h_ref[0]) for c in range(6))
        f_bot = tuple(
            _level_onehot(fidx_ref[6 + c], h_ref[0]) for c in range(6)
        )
        wind0 = tuple(fwind_ref[c] for c in range(6))
    cmask = None
    if n_tracers:
        if cell_masked:
            cmask_ref, *rest = rest
            cmask = tuple(cmask_ref[p] for p in range(2))
        tr_ref, gt_ref, *rest = rest
        gs_out, gh_out, gu_out, gt_out, *rest = rest
    else:
        tr_ref = gt_ref = gt_out = None
        gs_out, gh_out, gu_out, *rest = rest
    if stratified:
        dsw_out, *rest = rest
    if forced:
        dwind_out, dcoef_out, *rest = rest
    (ddt_out,) = rest
    dt = scal_ref[0, 0]
    inv_dc = scal_ref[0, 1]
    s_div = scal_ref[0, 2]
    nl = _nl_pack(scal_ref, fvert_ref, nl_terms)
    f_edge = tuple(f_ref[c] for c in range(6))
    rts = tuple(rts_ref[p] for p in range(2))
    coefs0 = (
        (scal_ref[0, 6], scal_ref[0, 7], scal_ref[0, 8]) if forced else None
    )

    def step_fn(s, t, w, wind=None, coefs=None):
        ssh, h, u, tr = s
        forc = (
            (wind, f_top, f_bot) + coefs if forced else None
        )
        return _step_planes(
            ssh, h, u, f_edge, rts, t, inv_dc, s_div, terms, masks, nl,
            tr, tropts, cmask, w, False, forc,
        )

    # forward recompute: b primal states live in VMEM (b is chosen so they
    # fit; the segment checkpoint is state[0])
    states = [(
        tuple(ssh_ref[p] for p in range(2)),
        tuple(h_ref[p] for p in range(2)),
        tuple(u_ref[c] for c in range(6)),
        tuple(tr_ref[i] for i in range(2 * n_tracers)) if n_tracers else None,
    )]
    for _ in range(b - 1):
        states.append(step_fn(
            states[-1], dt, strat_w,
            wind0 if forced else None, coefs0,
        ))

    cot = (
        tuple(gs_ref[p] for p in range(2)),
        tuple(gh_ref[p] for p in range(2)),
        tuple(gu_ref[c] for c in range(6)),
        tuple(gt_ref[i] for i in range(2 * n_tracers)) if n_tracers else None,
    )
    ddt = jnp.zeros((), dt.dtype)
    dsw = jnp.zeros_like(strat_w) if stratified else None
    dwind = dcoef = None
    for j in range(b - 1, -1, -1):
        if forced:
            _, vjp = jax.vjp(step_fn, states[j], dt, strat_w, wind0, coefs0)
            cot, ddt_j, dsw_j, dw_j, dc_j = vjp(cot)
            dwind = dw_j if dwind is None else tuple(
                a + bb for a, bb in zip(dwind, dw_j)
            )
            dcoef = dc_j if dcoef is None else tuple(
                a + bb for a, bb in zip(dcoef, dc_j)
            )
        else:
            _, vjp = jax.vjp(step_fn, states[j], dt, strat_w)
            cot, ddt_j, dsw_j = vjp(cot)
        ddt = ddt + ddt_j
        if stratified:
            dsw = dsw + dsw_j
    for p in range(2):
        gs_out[p] = cot[0][p]
        gh_out[p] = cot[1][p]
    for c in range(6):
        gu_out[c] = cot[2][c]
    for i in range(2 * n_tracers):
        gt_out[i] = cot[3][i]
    if stratified:
        dsw_out[...] = dsw
    if forced:
        for c in range(6):
            dwind_out[c] = dwind[c]
        dcoef_out[...] = jnp.stack(
            [dcoef[0], dcoef[1], dcoef[2]]
        ).reshape(1, 3)
    ddt_out[...] = ddt[None, None]


@functools.partial(
    jax.jit, static_argnames=("terms", "b", "interpret", "nl_terms", "tropts")
)
def _adjoint_segment(
    ckpt, cot, f_edge, rts, scal, mask, f_vert=None, cmask=None, strat_w=None,
    fwind=None, fidx=None, *, terms, b, interpret, nl_terms=None,
    tropts=(0.0, 1.0),
):
    """One fused reverse-segment call: (ckpt, cot_end) -> (cot_start, ddt
    [, dsw][, dwind, dcoef]). ``ckpt``/``cot`` are (ssh, h, u) or
    (ssh, h, u, tracer planes)."""
    ssh, h, u = ckpt[:3]
    gs, gh, gu = cot[:3]
    with_tr = len(ckpt) == 4
    tr = ckpt[3] if with_tr else None
    gt = cot[3] if with_tr else None
    n_tracers = tr.shape[0] // 2 if with_tr else 0
    masked = mask is not None
    cell_masked = cmask is not None
    forced = fwind is not None
    kernel = functools.partial(
        _adjoint_segment_kernel, terms=terms, b=b, masked=masked,
        nl_terms=nl_terms, n_tracers=n_tracers, tropts=tropts,
        cell_masked=cell_masked, stratified=strat_w is not None,
        forced=forced,
    )
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    operands = (scal, ssh, h, u, f_edge, rts, gs, gh, gu)
    if masked:
        operands += (mask,)
    if nl_terms is not None:
        operands += (f_vert,)
    if strat_w is not None:
        operands += (strat_w,)
    if forced:
        operands += (fwind, fidx)
    out_shape = [
        jax.ShapeDtypeStruct(gs.shape, gs.dtype),
        jax.ShapeDtypeStruct(gh.shape, gh.dtype),
        jax.ShapeDtypeStruct(gu.shape, gu.dtype),
    ]
    aliases = {6: 0, 7: 1, 8: 2}
    if with_tr:
        if cell_masked:
            operands += (cmask,)
        operands += (tr, gt)
        aliases[len(operands) - 1] = 3
        out_shape.append(jax.ShapeDtypeStruct(gt.shape, gt.dtype))
    if strat_w is not None:
        out_shape.append(jax.ShapeDtypeStruct(strat_w.shape, strat_w.dtype))
    if forced:
        out_shape.append(jax.ShapeDtypeStruct(fwind.shape, fwind.dtype))
        out_shape.append(jax.ShapeDtypeStruct((1, 3), scal.dtype))
    out_shape.append(jax.ShapeDtypeStruct((1, 1), scal.dtype))
    n_in = len(operands)
    ny2, nx, k = h.shape[1], h.shape[2], h.shape[3]
    flops_step = step_flop_count(
        ny2, nx, k, len(terms), masked, nonlinear=nl_terms is not None,
        n_tracers=n_tracers, forced=forced,
    )
    cot_bytes = sum(
        g.size * g.dtype.itemsize for g in ((gs, gh, gu) + ((gt,) if with_tr else ()))
    )
    out = pl.pallas_call(
        kernel,
        out_shape=tuple(out_shape),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]
        + [vmem] * (n_in - 1),
        out_specs=(vmem,) * len(out_shape),
        cost_estimate=pl.CostEstimate(
            # recompute b forward steps + ~2x for the transposed stencils
            flops=3 * flops_step * b,
            bytes_accessed=2 * cot_bytes,
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_ADJ_VMEM_BUDGET
        ),
        input_output_aliases=aliases,
        interpret=interpret,
    )(*operands)
    *out, ddt = out
    dwind = dcoef = dsw = None
    if forced:
        *out, dwind, dcoef = out
    if strat_w is not None:
        *out, dsw = out
    return tuple(out), ddt[0, 0], dsw, dwind, dcoef


# the adjoint segment kernel is the VMEM-hungriest thing in the repo (b
# resident primal states + per-step vjp residuals). Its kernel stack must
# leave room for the pallas in/out window allocations (~28 planes of single-
# buffered whole-array windows) within the physical 128 MB/core: a 110 MB
# stack budget compiles but OOMs the chip at link time.
_ADJ_VMEM_BUDGET = 100 * 1024 * 1024

# HBM ceiling for the tiled adjoint's resident primal states (outer
# checkpoints + one group's rebuilt inner states); the v5e has 16 GB and
# the live cotangent/halo working set needs a few states' worth of headroom
_ADJ_HBM_BUDGET = 8 * 1024**3

# Scoped-VMEM limit for the TILED adjoint kernel specifically: its in/out
# pipeline windows are small per-tile blocks (unlike the whole-array fused
# kernels, whose 110 MB budgets OOM at link time), so it can claim more of
# the physical 128 MB/core for the vjp working set. 116 MB verified on
# v5e by COMPILING AND RUNNING 48-step forced reverses at rt=4 (the same
# window OOMs the default 100 MB limit at a reported 111.8 MB).
_ADJ_TILED_VMEM_BUDGET = 116 * 1024 * 1024


def _adjoint_plan(n_steps: int, ny2: int, nx: int, k: int, itemsize: int,
                  nonlinear: bool = False, n_tracers: int = 0,
                  forced: bool = False):
    """Pick (b, m): segments of b steps reversed in-VMEM, grouped m segments
    per outer checkpoint. b: largest divisor of n_steps whose b resident
    primal states + working set fit the VMEM budget; m: divisor of
    n_steps//b nearest sqrt (balances outer-checkpoint HBM against inner
    rebuild frequency). Returns None when even b=1 does not fit."""
    k_pad = -(-k // 128) * 128
    plane = ny2 * nx * k_pad * itemsize
    # measured Mosaic stack footprint on the 64x64x100 headline config:
    # ~(42 + 21.3*b) plane-equivalents (b resident states at 8 planes plus
    # ~13 planes of per-step vjp residuals each, plus the base working set)
    # the nonlinear step carries ~2x the per-step vjp residuals (KE, PV,
    # kite planes), so budget twice the per-step footprint
    per_step = 44 if nonlinear else 22
    # each tracer: 2 more resident planes per state + ~12 planes of vjp
    # residuals (edge fluxes, upwind signs, the divide)
    per_step += 14 * n_tracers
    # forcing: 12 resident one-hot planes + ~8 planes/step of elementwise
    # vjp residuals (inv_h, |u|, sign, the drag chain)
    base = 44 + 4 * n_tracers + (14 if forced else 0)
    if forced:
        per_step += 8
    b_max = int((_ADJ_VMEM_BUDGET / plane - base) // per_step)
    if b_max < 1:
        return None
    b = max(d for d in range(1, min(b_max, n_steps) + 1) if n_steps % d == 0)
    s = n_steps // b
    target = max(1, int(np.sqrt(s)))
    m = min(
        (d for d in range(1, s + 1) if s % d == 0),
        key=lambda d: abs(d - target),
    )
    return b, m


@functools.partial(
    jax.jit,
    static_argnames=("terms", "n_steps", "big", "interpret", "nl_terms",
                     "tropts"),
)
def _pallas_forward_ckpts(
    ssh0, h0, u0, f_edge, rts, scal, mask=None, f_vert=None, tracers0=None,
    cmask=None, strat_w=None, fwind=None, fidx=None, *, terms, n_steps, big,
    interpret, nl_terms=None, tropts=(0.0, 1.0),
):
    """Fused forward in ``big``-step segments, emitting the state at the
    start of each segment (the outer checkpoints the reverse sweep needs).
    Bitwise-identical to one fused call — same per-step arithmetic, just
    interleaved with HBM checkpoint writes."""
    n_out = n_steps // big
    assert n_out * big == n_steps, (n_steps, big)
    with_tr = tracers0 is not None

    def fwd_outer(c, _):
        o = _pallas_rollout(
            c[0], c[1], c[2], f_edge, rts, scal, mask, f_vert,
            c[3] if with_tr else None, cmask, strat_w, fwind, fidx,
            terms=terms, n_steps=big, interpret=interpret, nl_terms=nl_terms,
            tropts=tropts,
        )
        return tuple(o), c  # emit the group's START state

    init = (ssh0, h0, u0) + ((tracers0,) if with_tr else ())
    final, outer_ckpts = jax.lax.scan(fwd_outer, init, length=n_out)
    return final, outer_ckpts


@functools.partial(
    jax.jit,
    static_argnames=("terms", "b", "m", "interpret", "nl_terms", "tropts"),
)
def _pallas_adjoint_from_ckpts(
    outer_ckpts, f_edge, rts, scal, cot0, mask=None, f_vert=None, cmask=None,
    strat_w=None, fwind=None, fidx=None, *, terms, b, m, interpret,
    nl_terms=None, tropts=(0.0, 1.0),
):
    """Reverse sweep given the outer checkpoints: per outer group (reversed),
    rebuild the m inner checkpoints with the fused forward kernel, then
    reverse-scan the fused adjoint segment kernel over them.
    ``cot0`` is (gs, gh, gu[, gt]); returns (cot_start tuple, d_dt,
    d_strat_w-or-None, d_wind-or-None, d_coefs-or-None)."""
    with_tr = len(cot0) == 4
    stratified = strat_w is not None
    forced = fwind is not None

    def rev_outer(carry, ckpt):
        cot, ddt, dsw, dwind, dcoef = carry

        def fwd_inner(c, _):
            o = _pallas_rollout(
                c[0], c[1], c[2], f_edge, rts, scal, mask, f_vert,
                c[3] if with_tr else None, cmask, strat_w, fwind, fidx,
                terms=terms, n_steps=b, interpret=interpret,
                nl_terms=nl_terms, tropts=tropts,
            )
            return tuple(o), c

        _, inner_ckpts = jax.lax.scan(fwd_inner, ckpt, length=m)

        def rev_inner(carry2, ick):
            cot2, ddt2, dsw2, dw2, dc2 = carry2
            cot2, ddt_j, dsw_j, dw_j, dc_j = _adjoint_segment(
                ick, cot2, f_edge, rts, scal, mask, f_vert, cmask, strat_w,
                fwind, fidx,
                terms=terms, b=b, interpret=interpret, nl_terms=nl_terms,
                tropts=tropts,
            )
            if stratified:
                dsw2 = dsw2 + dsw_j
            if forced:
                dw2 = dw2 + dw_j
                dc2 = dc2 + dc_j
            return (cot2, ddt2 + ddt_j, dsw2, dw2, dc2), None

        (cot, ddt, dsw, dwind, dcoef), _ = jax.lax.scan(
            rev_inner, (cot, ddt, dsw, dwind, dcoef), inner_ckpts,
            reverse=True,
        )
        return (cot, ddt, dsw, dwind, dcoef), None

    dsw0 = jnp.zeros_like(strat_w) if stratified else None
    dwind0 = jnp.zeros_like(fwind) if forced else None
    dcoef0 = jnp.zeros((1, 3), scal.dtype) if forced else None
    (cot, ddt, dsw, dwind, dcoef), _ = jax.lax.scan(
        rev_outer,
        (tuple(cot0), jnp.zeros((), scal.dtype), dsw0, dwind0, dcoef0),
        outer_ckpts, reverse=True,
    )
    return cot, ddt, dsw, dwind, dcoef


def _adjoint_aux(mesh: StructMesh, dt, dtype, forcing=None):
    """Plane-layout constant fields the adjoint kernels need."""
    ny2, nx = mesh.ny2, mesh.nx
    f_edge = mesh.f_edge.reshape(6, ny2, nx, 1).astype(dtype)
    rts = mesh.resting_thickness_sum[..., None].astype(dtype)
    mask = (
        None
        if mesh.edge_mask is None
        else mesh.edge_mask.reshape(6, ny2, nx, 1).astype(dtype)
    )
    return f_edge, rts, _scal(mesh, dt, dtype, forcing), mask


def _cot_from_planes(cot, ny2, nx, k):
    gs, gh, gu = cot[:3]
    tracers = _tr_unplanes(cot[3], ny2, nx, k) if len(cot) == 4 else None
    return StructState(
        ssh=gs[..., 0],
        layer_thickness=gh,
        normal_velocity=gu.reshape(3, 2, ny2, nx, k),
        tracers=tracers,
    )


def pallas_adjoint_rollout(
    state: StructState, mesh: StructMesh, dt, n_steps: int, g: StructState,
    *, plan=None, interpret=None, nonlinear: bool = False,
    tracer_kappa: float = 0.0, tracer_upwind: float = 1.0, strat=None,
    forcing=None,
):
    """Fused-kernel VJP of an n-step rollout: given the rollout's input
    ``state`` and an output cotangent ``g``, returns (d_state, d_dt) — the
    reverse sweep runs in Pallas segment kernels (see module comment).
    With ``forcing`` (struct layout), returns (d_state, d_dt, d_forcing)
    where d_forcing carries the exact wind and drag/Rayleigh-coefficient
    cotangents (level-mask cotangents are zero — structural selectors).
    ``interpret=True`` runs the kernels in interpret mode (CPU tests)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    ny2, nx = mesh.ny2, mesh.nx
    k = state.layer_thickness.shape[-1]
    dtype = state.layer_thickness.dtype
    n_tr = 0 if state.tracers is None else state.tracers.shape[3]
    if plan is None:
        plan = _adjoint_plan(n_steps, ny2, nx, k, dtype.itemsize, nonlinear,
                             n_tr, forcing is not None)
    if plan is None:
        raise ValueError("state too large for the fused adjoint segments")
    b, m = plan
    f_edge, rts, scal, mask = _adjoint_aux(mesh, dt, dtype, forcing)
    nl_terms, f_vert = _nl_setup(mesh, dtype, nonlinear)
    tr, cmask, tropts = _tracer_setup(
        state, mesh, dtype, tracer_kappa, tracer_upwind
    )
    sw = _strat_w(strat, dtype)
    fwind, fidx = _forcing_setup(forcing, ny2, nx, dtype)
    _, ckpts = _pallas_forward_ckpts(
        state.ssh[..., None],
        state.layer_thickness,
        state.normal_velocity.reshape(6, ny2, nx, k),
        f_edge, rts, scal, mask, f_vert, tr, cmask, sw, fwind, fidx,
        terms=mesh.coriolis_terms, n_steps=n_steps, big=b * m,
        interpret=bool(interpret), nl_terms=nl_terms, tropts=tropts,
    )
    cot0 = (
        g.ssh[..., None].astype(dtype),
        g.layer_thickness.astype(dtype),
        g.normal_velocity.reshape(6, ny2, nx, k).astype(dtype),
    )
    if n_tr:
        cot0 += (_tr_planes(g.tracers.astype(dtype), ny2, nx, k),)
    cot, ddt, _, dwind, dcoef = _pallas_adjoint_from_ckpts(
        ckpts, f_edge, rts, scal, cot0, mask, f_vert, cmask, sw, fwind, fidx,
        terms=mesh.coriolis_terms, b=b, m=m, interpret=bool(interpret),
        nl_terms=nl_terms, tropts=tropts,
    )
    d_state = _cot_from_planes(cot, ny2, nx, k)
    d_dt = ddt.astype(jnp.asarray(dt).dtype)
    if forcing is None:
        return d_state, d_dt
    return d_state, d_dt, _forcing_cotangent(forcing, dwind, dcoef, ny2, nx)


def _forcing_cotangent(forcing, dwind, dcoef, ny2, nx):
    """Assemble the struct-layout Forcing cotangent from the fused adjoint
    kernel's accumulators: exact wind + scalar coefficients; level-mask
    cotangents are ZERO by construction (the fused kernels carry the masks
    as compressed int index planes — structural selectors, not tunable
    fields; the checkpointed-roll reverse produces them if ever needed)."""
    return forcing.replace(
        wind_edge=dwind.reshape(3, 2, ny2, nx).astype(
            forcing.wind_edge.dtype
        ),
        top_mask=jnp.zeros_like(forcing.top_mask),
        bottom_mask=jnp.zeros_like(forcing.bottom_mask),
        drag_linear=dcoef[0, 0].astype(forcing.drag_linear.dtype),
        drag_quadratic=dcoef[0, 1].astype(forcing.drag_quadratic.dtype),
        rayleigh=dcoef[0, 2].astype(forcing.rayleigh.dtype),
    )


# ---------------------------------------------------------------------------
# Tiled Pallas adjoint: the reverse sweep of BEYOND-VMEM rollouts.
#
# pallas_rollout_diff's fallback reverse replays the HBM-bound roll model
# (~18x the tiled forward on 256x256x100). This section reverses q
# timesteps per tile in a single Pallas kernel instead: the kernel pads the
# tile's primal window (center + reach*q halo rows, exactly like the
# forward tiled kernel), traces jax.vjp of the SAME q-step window function
# (_window_steps) in-kernel, and emits the cotangent of the whole window —
# center block plus halo blocks, which the caller overlap-ADDS back into
# the global cotangent (the exact transpose of the forward halo
# extraction). Combined with two-level checkpointing (outer ckpts in HBM,
# inner states rebuilt with the forward tiled kernel), the reverse runs at
# a small multiple of the tiled forward's HBM traffic. Covers EVERY
# pallas_rollout_diff configuration: linear and nonlinear dynamics, wall
# masks, momentum forcing (exact wind + drag/Rayleigh cotangents), tracers
# and layered stratification — the production wind-stress-sensitivity
# adjoint at beyond-VMEM mesh size (reference bar: the whole-loop Enzyme
# reverse, test/enzyme/test_Enzyme_end2end.jl:78-92).
# ---------------------------------------------------------------------------


def _tiled_adjoint_kernel(
    scal_ref, ssh_ref, h_ref, u_ref, f_ref, rts_ref,
    ssh_t, h_t, u_t, f_t, rts_t, ssh_b, h_b, u_b, f_b, rts_b, *rest,
    terms, rows, masked, q, nl_terms=None, n_tracers=0, tropts=(0.0, 1.0),
    cell_masked=False, stratified=False, forced=False, strat_pad=None,
):
    """Reverse q timesteps on one tile: primal window state at the
    SUPERSTEP START (same operand groups as _tiled_step_kernel) + cotangent
    of the new interior -> cotangent of the padded window (center + halo
    blocks, separate outputs), plus the tile's d(scal) contribution and —
    when the corresponding subsystem is on — the d(wind) window blocks and
    the d(strat_w) contribution. The adjoint step is jax.vjp of the SAME
    _window_steps the forward tiled kernel runs, traced in-kernel, so the
    transpose stencils fuse on the VPU exactly like the forward ones.
    Level-mask cotangents are not produced (compressed int index planes —
    structural selectors, same convention as the fused adjoint segments)."""
    reach = _reach(nl_terms is not None, False)
    hq = reach * q

    def pad(center, top, bot, c):
        return jnp.concatenate([top[c], center[c], bot[c]], axis=0)

    masks_full = fv_full = cm_full = None
    wind_full = ti_full = bi_full = None
    strat_w0 = None
    if masked:
        m_ref, m_t, m_b, *rest = rest
        masks_full = tuple(pad(m_ref, m_t, m_b, c) for c in range(6))
    if nl_terms is not None:
        fv_ref, fv_t, fv_b, *rest = rest
        fv_full = tuple(
            pad(fv_ref, fv_t, fv_b, c) for c in range(fv_ref.shape[0])
        )
    if forced:
        fw_ref, fw_t, fw_b, fi_ref, fi_t, fi_b, *rest = rest
        wind_full = tuple(pad(fw_ref, fw_t, fw_b, c) for c in range(6))
        ti_full = tuple(pad(fi_ref, fi_t, fi_b, c) for c in range(6))
        bi_full = tuple(pad(fi_ref, fi_t, fi_b, 6 + c) for c in range(6))
    if n_tracers:
        t_ref, t_t, t_b, *rest = rest
    if cell_masked:
        cm_ref, cm_t, cm_b, *rest = rest
        cm_full = tuple(pad(cm_ref, cm_t, cm_b, p) for p in range(2))
    if stratified:
        sw_ref, *rest = rest
        strat_w0 = sw_ref[...]
    gs_ref, gh_ref, gu_ref, *rest = rest
    gt_ref = None
    if n_tracers:
        gt_ref, *rest = rest
    (gs_c, gh_c, gu_c, gs_ht, gh_ht, gu_ht, gs_hb, gh_hb, gu_hb,
     *rest) = rest
    if n_tracers:
        gt_c, gt_ht, gt_hb, *rest = rest
    if forced:
        dw_c, dw_ht, dw_hb, *rest = rest
    if stratified:
        dsw_out, *rest = rest
    (dscal_out,) = rest

    ssh0 = tuple(pad(ssh_ref, ssh_t, ssh_b, p) for p in range(2))
    h0 = tuple(pad(h_ref, h_t, h_b, p) for p in range(2))
    u0 = tuple(pad(u_ref, u_t, u_b, c) for c in range(6))
    f_full = tuple(pad(f_ref, f_t, f_b, c) for c in range(6))
    rts_full = tuple(pad(rts_ref, rts_t, rts_b, p) for p in range(2))
    tr0 = (
        tuple(pad(t_ref, t_t, t_b, i) for i in range(2 * n_tracers))
        if n_tracers else None
    )
    full = rows + 2 * hq

    def win_fn(state, scal, *extras):
        ssh, h, u = state[:3]
        tr = state[3] if n_tracers else None
        i = 0
        wind = None
        if forced:
            wind = extras[i]
            i += 1
        sw = None
        if stratified:
            sw = extras[i]
        ssh, h, u, tr = _window_steps(
            ssh, h, u, tr, scal,
            f_full=f_full, rts_full=rts_full, masks_full=masks_full,
            fv_full=fv_full, wind_full=wind, ti_full=ti_full,
            bi_full=bi_full, cm_full=cm_full, strat_w=sw,
            terms=terms, nl_terms=nl_terms, tropts=tropts, fb=False,
            rows=rows, q=q, reach=reach, full=full,
        )
        return (ssh, h, u) + ((tr,) if n_tracers else ())

    primal = (ssh0, h0, u0) + ((tr0,) if n_tracers else ())
    extras = ()
    if forced:
        extras += (wind_full,)
    if stratified:
        extras += (strat_w0,)
    cot_end = (
        tuple(gs_ref[p] for p in range(2)),
        tuple(gh_ref[p] for p in range(2)),
        tuple(gu_ref[c] for c in range(6)),
    ) + (
        (tuple(gt_ref[i] for i in range(2 * n_tracers)),)
        if n_tracers else ()
    )
    _, vjp = jax.vjp(win_fn, primal, scal_ref[...], *extras)
    cstate, dscal, *dex = vjp(cot_end)
    cssh, ch, cu = cstate[:3]
    for p in range(2):
        gs_ht[p] = cssh[p][:hq]
        gs_c[p] = cssh[p][hq : hq + rows]
        gs_hb[p] = cssh[p][hq + rows :]
        gh_ht[p] = ch[p][:hq]
        gh_c[p] = ch[p][hq : hq + rows]
        gh_hb[p] = ch[p][hq + rows :]
    for c in range(6):
        gu_ht[c] = cu[c][:hq]
        gu_c[c] = cu[c][hq : hq + rows]
        gu_hb[c] = cu[c][hq + rows :]
    if n_tracers:
        ctr = cstate[3]
        for i in range(2 * n_tracers):
            gt_ht[i] = ctr[i][:hq]
            gt_c[i] = ctr[i][hq : hq + rows]
            gt_hb[i] = ctr[i][hq + rows :]
    i = 0
    if forced:
        dwind = dex[i]
        i += 1
        for c in range(6):
            dw_ht[c] = dwind[c][:hq]
            dw_c[c] = dwind[c][hq : hq + rows]
            dw_hb[c] = dwind[c][hq + rows :]
    if stratified:
        dsw = dex[i]
        pr, pc = strat_pad
        # zero-padded to the (8, 128)-divisible block; caller slices back
        dsw_out[...] = jax.lax.dynamic_update_slice(
            jnp.zeros((1, pr, pc), dsw.dtype), dsw[None], (0, 0, 0)
        )
    # (1, 8, 128) lane-padded block: a (1, 8) output violates Mosaic's
    # (8, 128)-divisible block rule
    dscal_out[...] = jnp.broadcast_to(dscal.reshape(1, 8, 1), (1, 8, 128))


def _make_tiled_adjoint_call(
    n_rows: int, nx: int, k: int, dtype, *, terms, rt: int, q: int,
    masked=False, nl_terms=None, n_tracers=0, tropts=(0.0, 1.0),
    cell_masked=False, strat_shape=None, forced=False, interpret=False,
):
    """Build the per-tile reverse pallas_call. Operand order mirrors
    _make_tiled_step_call's (scal; state centers; top halos; bottom halos;
    then the optional groups in the same order — mask, f_vertex, wind +
    level-index, tracers, cell-mask, stratification weights), then the
    end-cotangent center blocks (ssh, h, u[, tracers]). Outputs: cotangent
    center + top-halo + bottom-halo blocks for ssh/h/u[, tracers], then
    [d(wind) center + halo blocks], [per-tile d(strat_w)], per-tile
    d(scal)."""
    nonlinear = nl_terms is not None
    stratified = strat_shape is not None
    reach = _reach(nonlinear, False)
    hq = reach * q
    n_tiles = n_rows // rt
    strat_pad = None
    if stratified:
        strat_pad = (
            -(-strat_shape[0] // 8) * 8, -(-strat_shape[1] // 128) * 128,
        )
    kernel = functools.partial(
        _tiled_adjoint_kernel, terms=terms, rows=rt, masked=masked, q=q,
        nl_terms=nl_terms, n_tracers=n_tracers, tropts=tropts,
        cell_masked=cell_masked, stratified=stratified, forced=forced,
        strat_pad=strat_pad,
    )

    def center_spec(planes, r, tr):
        return pl.BlockSpec(
            (planes, r, nx, tr), lambda t: (t * 0, t, t * 0, t * 0),
            memory_space=pltpu.VMEM,
        )

    def halo_spec(planes, tr):
        return pl.BlockSpec(
            (planes, hq, nx, tr), lambda t: (t * 0, t, t * 0, t * 0),
            memory_space=pltpu.VMEM,
        )

    def group():
        return [
            halo_spec(2, 1), halo_spec(2, k), halo_spec(6, k),
            halo_spec(6, 1), halo_spec(2, 1),
        ]

    in_specs = [
        pl.BlockSpec((1, 8), lambda t: (t * 0, t * 0),
                     memory_space=pltpu.VMEM),
        center_spec(2, rt, 1),
        center_spec(2, rt, k),
        center_spec(6, rt, k),
        center_spec(6, rt, 1),
        center_spec(2, rt, 1),
    ] + group() + group()
    if masked:
        in_specs += [center_spec(6, rt, 1), halo_spec(6, 1), halo_spec(6, 1)]
    if nonlinear:
        nl_p = 4 + ((4 + len(nl_terms[0])) if masked else 0)
        in_specs += [center_spec(nl_p, rt, 1), halo_spec(nl_p, 1),
                     halo_spec(nl_p, 1)]
    if forced:
        in_specs += [
            center_spec(6, rt, 1), halo_spec(6, 1), halo_spec(6, 1),
            center_spec(12, rt, 1), halo_spec(12, 1), halo_spec(12, 1),
        ]
    nt2 = 2 * n_tracers
    if n_tracers:
        in_specs += [center_spec(nt2, rt, k), halo_spec(nt2, k),
                     halo_spec(nt2, k)]
    if cell_masked:
        in_specs += [center_spec(2, rt, 1), halo_spec(2, 1), halo_spec(2, 1)]
    if stratified:
        in_specs += [pl.BlockSpec(strat_shape, lambda t: (t * 0, t * 0),
                                  memory_space=pltpu.VMEM)]
    in_specs += [
        center_spec(2, rt, 1),   # cot ssh (interior)
        center_spec(2, rt, k),   # cot h
        center_spec(6, rt, k),   # cot u
    ]
    if n_tracers:
        in_specs += [center_spec(nt2, rt, k)]

    sds = lambda planes, r, tr: jax.ShapeDtypeStruct(
        (planes, r, nx, tr), dtype
    )
    out_shape = [
        sds(2, n_rows, 1), sds(2, n_rows, k), sds(6, n_rows, k),
        sds(2, n_tiles * hq, 1), sds(2, n_tiles * hq, k),
        sds(6, n_tiles * hq, k),
        sds(2, n_tiles * hq, 1), sds(2, n_tiles * hq, k),
        sds(6, n_tiles * hq, k),
    ]
    out_specs = [
        center_spec(2, rt, 1), center_spec(2, rt, k), center_spec(6, rt, k),
        halo_spec(2, 1), halo_spec(2, k), halo_spec(6, k),
        halo_spec(2, 1), halo_spec(2, k), halo_spec(6, k),
    ]
    if n_tracers:
        out_shape += [sds(nt2, n_rows, k), sds(nt2, n_tiles * hq, k),
                      sds(nt2, n_tiles * hq, k)]
        out_specs += [center_spec(nt2, rt, k), halo_spec(nt2, k),
                      halo_spec(nt2, k)]
    if forced:
        out_shape += [sds(6, n_rows, 1), sds(6, n_tiles * hq, 1),
                      sds(6, n_tiles * hq, 1)]
        out_specs += [center_spec(6, rt, 1), halo_spec(6, 1),
                      halo_spec(6, 1)]
    if stratified:
        pr, pc = strat_pad
        out_shape += [jax.ShapeDtypeStruct((n_tiles, pr, pc), dtype)]
        out_specs += [pl.BlockSpec((1, pr, pc),
                                   lambda t: (t, t * 0, t * 0),
                                   memory_space=pltpu.VMEM)]
    out_shape += [jax.ShapeDtypeStruct((n_tiles, 8, 128), dtype)]
    out_specs += [pl.BlockSpec((1, 8, 128), lambda t: (t, t * 0, t * 0),
                               memory_space=pltpu.VMEM)]
    return pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        out_shape=tuple(out_shape),
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_ADJ_TILED_VMEM_BUDGET
        ),
        interpret=interpret,
    )


def _halo_unscatter(cot_global, cot_top, cot_bot, rt: int, hq: int):
    """Transpose of the forward halo extraction: overlap-ADD the per-tile
    halo-block cotangents back into the global cotangent plane stack.
    Tile t's top halo rows are global rows (t*rt - hq .. t*rt - 1) mod ny2,
    bottom rows ((t+1)*rt .. (t+1)*rt + hq - 1) mod ny2."""
    planes, ny2 = cot_global.shape[0], cot_global.shape[1]
    n_tiles = ny2 // rt

    def add_rows(y, blocks, offsets):
        stacked = blocks.reshape(planes, n_tiles, hq, *blocks.shape[2:])
        for j, off in enumerate(offsets):
            o = off % rt
            sh = ((off - o) // rt) % n_tiles
            v = stacked[:, :, j]
            if sh:
                # forward did base = roll(x[:, o::rt], -sh); transpose:
                # roll back before adding
                v = jnp.concatenate([v[:, n_tiles - sh :],
                                     v[:, : n_tiles - sh]], axis=1)
            y = y.at[:, o::rt].add(v)
        return y

    cot_global = add_rows(cot_global, cot_top, range(-hq, 0))
    cot_global = add_rows(cot_global, cot_bot, range(rt, rt + hq))
    return cot_global


def _pallas_tiled_adjoint(
    scal_t, ssh0, h0, u0, f_edge, rts, cot0, mask=None, *,
    terms, row_tile, n_steps, b, interpret, q=1, f_vert=None, fwind=None,
    fidx=None, tracers0=None, cmask=None, strat_w=None, tropts=(0.0, 1.0),
    nl_terms=None,
):
    """Reverse an n-step tiled rollout: forward for the outer checkpoints,
    then the reverse sweep. Convenience wrapper over _tiled_fwd_ckpts +
    _tiled_adjoint_from_ckpts (pallas_rollout_diff saves the checkpoints
    during its own forward instead). Returns (cot state tuple at t=0,
    d_scal, d_wind-or-None, d_strat_w-or-None)."""
    _, ckpts = _tiled_fwd_ckpts(
        scal_t, ssh0, h0, u0, f_edge, rts, mask, f_vert, fwind, fidx,
        tracers0, cmask, strat_w,
        terms=terms, row_tile=row_tile, n_steps=n_steps, b=b,
        interpret=interpret, q=q, tropts=tropts, nl_terms=nl_terms,
    )
    return _tiled_adjoint_from_ckpts(
        scal_t, ckpts, f_edge, rts, cot0, mask, f_vert, fwind, fidx,
        cmask, strat_w,
        terms=terms, row_tile=row_tile, n_steps=n_steps, b=b,
        interpret=interpret, q=q, tropts=tropts, nl_terms=nl_terms,
    )


def _tiled_calls(ny2, nx, k, dtype, mask, *, terms, rt, q, interpret,
                 adjoint, nl_terms=None, n_tracers=0, tropts=(0.0, 1.0),
                 cell_masked=False, strat_shape=None, forced=False,
                 direct_halos=False):
    """``direct_halos`` applies to the FORWARD call only: the adjoint
    window kernel keeps separate halo operands because its halo-row
    COTANGENTS are outputs (overlap-added back by _halo_unscatter)."""
    fwd_call = _make_tiled_step_call(
        ny2, nx, k, dtype, terms=terms, rt=rt, q=q, tropts=tropts,
        masked=mask is not None, forced=forced, n_tracers=n_tracers,
        cell_masked=cell_masked, strat_shape=strat_shape,
        interpret=interpret, nl_terms=nl_terms, direct_halos=direct_halos,
    )
    adj_call = None
    if adjoint:
        adj_call = _make_tiled_adjoint_call(
            ny2, nx, k, dtype, terms=terms, rt=rt, q=q,
            masked=mask is not None, nl_terms=nl_terms,
            n_tracers=n_tracers, tropts=tropts, cell_masked=cell_masked,
            strat_shape=strat_shape, forced=forced, interpret=interpret,
        )
    return fwd_call, adj_call


def _tile_halo_fns(rt, hq, n_tiles):
    def halos(x):
        def rows_at(offsets):
            cols = []
            for off in offsets:
                o = off % rt
                sh = ((off - o) // rt) % n_tiles
                base = x[:, o::rt]
                if sh:
                    base = jnp.concatenate(
                        [base[:, sh:], base[:, :sh]], axis=1
                    )
                cols.append(base)
            stacked = jnp.stack(cols, axis=2)
            return stacked.reshape(
                x.shape[0], n_tiles * len(offsets), *x.shape[2:]
            )

        return rows_at(range(-hq, 0)), rows_at(range(rt, rt + hq))

    return halos


def _tiled_superstep_args(
    scal_t, carry, halos, f_edge, rts, f_t, f_b, rts_t, rts_b, consts,
):
    """Assemble one tiled superstep's argument tuple in
    _make_tiled_step_call / _make_tiled_adjoint_call operand order.
    ``consts`` is the dict of optional constant operands + their
    precomputed halo blocks (None members skipped)."""
    ssh_c, h_c, u_c = carry[:3]
    ssh_t, ssh_b = halos(ssh_c)
    h_t, h_b = halos(h_c)
    u_t, u_b = halos(u_c)
    args = (
        scal_t, ssh_c, h_c, u_c, f_edge, rts,
        ssh_t, h_t, u_t, f_t, rts_t, ssh_b, h_b, u_b, f_b, rts_b,
    )
    if consts["mask"] is not None:
        args += (consts["mask"], consts["m_t"], consts["m_b"])
    if consts["f_vert"] is not None:
        args += (consts["f_vert"], consts["fv_t"], consts["fv_b"])
    if consts["fwind"] is not None:
        args += (consts["fwind"], consts["fw_t"], consts["fw_b"],
                 consts["fidx"], consts["fi_t"], consts["fi_b"])
    if len(carry) == 4:
        t_c = carry[3]
        t_t, t_b = halos(t_c)
        args += (t_c, t_t, t_b)
    if consts["cmask"] is not None:
        args += (consts["cmask"], consts["cm_t"], consts["cm_b"])
    if consts["strat_w"] is not None:
        args += (consts["strat_w"],)
    return args


def _tiled_consts(halos, mask, f_vert, fwind, fidx, cmask, strat_w):
    consts = {"mask": mask, "f_vert": f_vert, "fwind": fwind, "fidx": fidx,
              "cmask": cmask, "strat_w": strat_w}
    if mask is not None:
        consts["m_t"], consts["m_b"] = halos(mask)
    if f_vert is not None:
        consts["fv_t"], consts["fv_b"] = halos(f_vert)
    if fwind is not None:
        consts["fw_t"], consts["fw_b"] = halos(fwind)
        consts["fi_t"], consts["fi_b"] = halos(fidx)
    if cmask is not None:
        consts["cm_t"], consts["cm_b"] = halos(cmask)
    return consts


@functools.partial(
    jax.jit,
    static_argnames=("terms", "row_tile", "n_steps", "b", "interpret", "q",
                     "tropts", "nl_terms"),
)
def _tiled_fwd_ckpts(
    scal_t, ssh0, h0, u0, f_edge, rts, mask=None, f_vert=None, fwind=None,
    fidx=None, tracers0=None, cmask=None, strat_w=None, *,
    terms, row_tile, n_steps, b, interpret, q=1, tropts=(0.0, 1.0),
    nl_terms=None,
):
    """Tiled forward emitting the state at the start of each b-superstep
    group (the outer checkpoints the tiled reverse needs). Per-step values
    are bitwise identical to the plain tiled rollout — same window math
    per row. Covers every tiled configuration (masks, nonlinear, forcing,
    tracers, stratification)."""
    rt = row_tile
    ny2, nx, k = h0.shape[1], h0.shape[2], h0.shape[3]
    n_tiles = ny2 // rt
    assert n_steps % q == 0 and (n_steps // q) % b == 0
    m = (n_steps // q) // b
    dtype = h0.dtype
    n_tr = 0 if tracers0 is None else tracers0.shape[0] // 2
    reach = _reach(nl_terms is not None, False)
    hq = reach * q
    # hq-aligned tiles: the forward kernel reads halo rows directly from
    # the state (same optimization as _pallas_tiled_rollout; trace-time
    # read of the module toggle)
    direct = _TILED_DIRECT_HALOS and rt % hq == 0 and n_tiles > 1
    fwd_call, _ = _tiled_calls(
        ny2, nx, k, dtype, mask, terms=terms, rt=rt, q=q,
        interpret=interpret, adjoint=False, nl_terms=nl_terms,
        n_tracers=n_tr, tropts=tropts, cell_masked=cmask is not None,
        strat_shape=None if strat_w is None else strat_w.shape,
        forced=fwind is not None, direct_halos=direct,
    )
    halos = (lambda x: (x, x)) if direct else _tile_halo_fns(rt, hq, n_tiles)
    f_t, f_b = halos(f_edge)
    rts_t, rts_b = halos(rts)
    consts = _tiled_consts(halos, mask, f_vert, fwind, fidx, cmask, strat_w)

    def fwd_superstep(carry):
        args = _tiled_superstep_args(
            scal_t, carry, halos, f_edge, rts, f_t, f_b, rts_t, rts_b,
            consts,
        )
        return tuple(fwd_call(*args))

    def fwd_outer(c, _):
        start = c

        def inner(c2, _):
            return fwd_superstep(c2), None

        c, _ = jax.lax.scan(inner, c, length=b)
        return c, start

    init = (ssh0, h0, u0) + ((tracers0,) if n_tr else ())
    final, outer_ckpts = jax.lax.scan(fwd_outer, init, length=m)
    return final, outer_ckpts


@functools.partial(
    jax.jit,
    static_argnames=("terms", "row_tile", "n_steps", "b", "interpret", "q",
                     "tropts", "nl_terms"),
)
def _tiled_adjoint_from_ckpts(
    scal_t, outer_ckpts, f_edge, rts, cot0, mask=None, f_vert=None,
    fwind=None, fidx=None, cmask=None, strat_w=None, *,
    terms, row_tile, n_steps, b, interpret, q=1, tropts=(0.0, 1.0),
    nl_terms=None,
):
    """Reverse sweep given the outer checkpoints: per group (reversed),
    rebuild the b superstep-start states with the forward tiled kernel
    into HBM, then reverse-scan the per-tile window-adjoint kernel over
    them with halo overlap-add. Returns (cot state tuple at t=0, d_scal
    (8,), d_wind-or-None, d_strat_w-or-None) — the d(drag/Rayleigh)
    cotangents ride d_scal slots 3-5 (_tiled_scal layout)."""
    rt = row_tile
    ny2, nx, k = outer_ckpts[1].shape[2], outer_ckpts[1].shape[3], \
        outer_ckpts[1].shape[4]
    n_tiles = ny2 // rt
    assert n_steps % q == 0
    n_ss = n_steps // q
    assert n_ss % b == 0
    dtype = outer_ckpts[1].dtype
    forced = fwind is not None
    stratified = strat_w is not None
    with_tr = len(outer_ckpts) == 4
    n_tr = outer_ckpts[3].shape[1] // 2 if with_tr else 0
    reach = _reach(nl_terms is not None, False)
    hq = reach * q
    # the inner primal rebuilds use direct halo views like the plain
    # tiled forward; the REVERSE kernel keeps gathered halo operands
    # (its halo-row cotangents are outputs, overlap-added back)
    direct = _TILED_DIRECT_HALOS and rt % hq == 0 and n_tiles > 1
    fwd_call, adj_call = _tiled_calls(
        ny2, nx, k, dtype, mask, terms=terms, rt=rt, q=q,
        interpret=interpret, adjoint=True, nl_terms=nl_terms,
        n_tracers=n_tr, tropts=tropts, cell_masked=cmask is not None,
        strat_shape=None if strat_w is None else strat_w.shape,
        forced=forced, direct_halos=direct,
    )
    halos = _tile_halo_fns(rt, hq, n_tiles)
    f_t, f_b = halos(f_edge)
    rts_t, rts_b = halos(rts)
    consts = _tiled_consts(halos, mask, f_vert, fwind, fidx, cmask, strat_w)
    halos_d = (lambda x: (x, x)) if direct else halos
    if direct:
        fd_t = fd_b = f_edge
        rtsd_t = rtsd_b = rts
        consts_d = _tiled_consts(halos_d, mask, f_vert, fwind, fidx,
                                 cmask, strat_w)
    else:
        fd_t, fd_b, rtsd_t, rtsd_b, consts_d = f_t, f_b, rts_t, rts_b, consts

    def fwd_superstep(carry):
        args = _tiled_superstep_args(
            scal_t, carry, halos_d, f_edge, rts, fd_t, fd_b, rtsd_t, rtsd_b,
            consts_d,
        )
        return tuple(fwd_call(*args))

    def rev_superstep(ck, cot):
        """One reverse superstep given the primal state at its start."""
        args = _tiled_superstep_args(
            scal_t, ck, halos, f_edge, rts, f_t, f_b, rts_t, rts_b, consts,
        )
        args += tuple(cot)
        out = adj_call(*args)
        gs_n = _halo_unscatter(out[0], out[3], out[6], rt, hq)
        gh_n = _halo_unscatter(out[1], out[4], out[7], rt, hq)
        gu_n = _halo_unscatter(out[2], out[5], out[8], rt, hq)
        new_cot = (gs_n, gh_n, gu_n)
        pos = 9
        if n_tr:
            new_cot += (_halo_unscatter(out[9], out[10], out[11], rt, hq),)
            pos = 12
        dwind_j = dsw_j = None
        if forced:
            dwind_j = _halo_unscatter(
                out[pos], out[pos + 1], out[pos + 2], rt, hq
            )
            pos += 3
        if stratified:
            dsw_j = out[pos][:, : strat_w.shape[0],
                             : strat_w.shape[1]].sum(axis=0)
            pos += 1
        return new_cot, out[pos][:, :, 0].sum(axis=0), dwind_j, dsw_j

    def rev_outer(carry, ck_start):
        cot, dscal, dwind, dsw = carry

        # rebuild the b superstep-start states of this group into HBM
        def inner(c2, _):
            return fwd_superstep(c2), c2
        _, states = jax.lax.scan(inner, ck_start, length=b)

        def rev_inner(carry2, st):
            cot2, d2, dw2, ds2 = carry2
            cot2, dj, dwj, dsj = rev_superstep(st, cot2)
            if forced:
                dw2 = dw2 + dwj
            if stratified:
                ds2 = ds2 + dsj
            return (cot2, d2 + dj, dw2, ds2), None

        (cot, dscal, dwind, dsw), _ = jax.lax.scan(
            rev_inner, (cot, dscal, dwind, dsw), states, reverse=True
        )
        return (cot, dscal, dwind, dsw), None

    dwind0 = jnp.zeros_like(fwind) if forced else None
    dsw0 = jnp.zeros_like(strat_w) if stratified else None
    (cot, dscal, dwind, dsw), _ = jax.lax.scan(
        rev_outer,
        (tuple(cot0), jnp.zeros((8,), dtype), dwind0, dsw0),
        outer_ckpts, reverse=True,
    )
    return cot, dscal, dwind, dsw


def _checkpointed_roll_rollout(
    state: StructState, mesh: StructMesh, dt, n_steps: int,
    nonlinear: bool = False, tracer_kappa: float = 0.0,
    tracer_upwind: float = 1.0, strat=None, forcing=None,
) -> StructState:
    """Roll-model rollout with two-level (sqrt) checkpointing: reverse-mode
    memory is O(sqrt(n) * state) instead of O(n * intermediates). Used as
    the backward path of the fused rollouts below."""
    import math

    b = max(1, math.isqrt(n_steps))
    a, rem = divmod(n_steps, b)

    step = jax.checkpoint(
        lambda s, _: (structured_step(s, mesh, dt, nonlinear,
                                      forcing=forcing,
                                      tracer_kappa=tracer_kappa,
                                      tracer_upwind=tracer_upwind,
                                      strat=strat), None)
    )

    def chunk(s, _):
        s, _ = jax.lax.scan(step, s, length=b)
        return s, None

    if a:
        state, _ = jax.lax.scan(jax.checkpoint(chunk), state, length=a)
    if rem:
        state, _ = jax.lax.scan(step, state, length=rem)
    return state


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def pallas_rollout_diff(
    state: StructState, mesh: StructMesh, dt, n_steps: int,
    nonlinear: bool = False, tracer_kappa: float = 0.0,
    tracer_upwind: float = 1.0, strat=None, forcing=None,
) -> StructState:
    """n-step structured rollout, FAST forward and differentiable — the
    whole-loop reverse the reference validates with Enzyme (reference:
    test/enzyme/test_Enzyme_end2end.jl:78-92). Routing: in-VMEM meshes run
    the fused kernel forward and reverse through fused Pallas adjoint
    segments; beyond-VMEM meshes run the tiled kernel forward and reverse
    through the tiled Pallas adjoint (per-tile window vjp + halo
    overlap-add + two-level checkpointing) — EVERY configuration (linear,
    nonlinear, wall masks, forcing, tracers, stratification); CPU and
    general (non-one-hot) level masks fall back to the sqrt-checkpointed
    roll reverse. ``forcing`` (struct layout) is a differentiated input:
    the Pallas reverses accumulate the exact wind and
    drag/Rayleigh-coefficient cotangents in-kernel (level-mask cotangents
    are zero there — structural selectors; the roll fallback produces
    them exactly when the Pallas paths do not apply)."""
    return structured_auto_run_loop(
        state, mesh, dt, n_steps, nonlinear=nonlinear,
        tracer_kappa=tracer_kappa, tracer_upwind=tracer_upwind, strat=strat,
        forcing=forcing,
    )


def _adj_window_planes(q: int, n_tracers: int = 0, nonlinear: bool = False,
                       forced: bool = False, stratified: bool = False) -> int:
    """TRUE plane-equivalent VMEM requirement of the tiled ADJOINT window
    (padded forward window + q steps of in-kernel vjp residuals +
    cotangent buffers), checked DIRECTLY against _ADJ_TILED_VMEM_BUDGET.
    CALIBRATED on v5e 256x256x100 f32 compile success/failure at BOTH the
    100 MB and 116 MB scoped limits (round-5 sweep; a window of W rows
    costs planes * W * nx * k_pad * itemsize):
      linear:    rt=4 OK, rt=8 OOMs even @116      -> in (88, 127]: 120
      forced:    rt=4 needs 111.8 MB (compiler-reported = 142 planes),
                 OK @116, OOM @100                  -> 145
      nonlinear: rt=2 OK, rt=4 OOMs even @116      -> in (110, 127]: 120
      forced+nl: rt=2 OOMs @116, rt=1 OK           -> 160 (admits rt=1)
    Tracer/strat increments follow the fused-segment plan's ratios."""
    per = 65
    per += 26 * n_tracers
    if forced:
        per += 25 + (15 if nonlinear else 0)
    if stratified:
        per += 6
    return 55 + q * per


# reverse-side temporal blocking: MEASURED on v5e 256x256x100 f32 (round-5
# sweep) — q=2 forces the row tile from 4 down to 2 (the window residuals
# double) and lands at 8.48 ms/step vs q=1's 7.75, so deeper reverse
# blocking does not pay on this chip; the plan stays at q=1.
_ADJ_Q_ORDER = (1,)


def _tiled_adjoint_plan(state: StructState, mesh: StructMesh,
                        n_steps: int, nonlinear, strat, forcing,
                        fb: bool = False):
    """(rt, q, b) when the tiled Pallas adjoint applies (beyond-VMEM
    rollouts on TPU — linear, NONLINEAR, FORCED, tracer-carrying and
    stratified, wall masks OK), else None. The adjoint window holds the
    in-kernel vjp residuals on top of the forward working set, so its row
    tile comes from the heavier _adj_window_planes model."""
    if not _route_tpu() or fb:
        return None
    n_tr = 0 if state.tracers is None else state.tracers.shape[3]
    k = state.layer_thickness.shape[-1]
    itemsize = state.layer_thickness.dtype.itemsize
    forced = forcing is not None
    if fits_in_vmem(mesh, k, itemsize, n_tr, forced):
        return None  # the fused-VMEM adjoint segments handle this size
    if forced:
        try:
            _forcing_setup(forcing, mesh.ny2, mesh.nx,
                           state.layer_thickness.dtype)
        except NotImplementedError:
            return None  # general (non-one-hot) level masks: roll reverse
    reach = 2 if nonlinear else 1
    k_pad = -(-k // 128) * 128
    plane = mesh.nx * k_pad * itemsize
    limit = _ADJ_TILED_VMEM_BUDGET

    def pick_rt(q_c):
        planes = _adj_window_planes(q_c, n_tr, nonlinear, forced,
                                    strat is not None)
        for t in range(1, mesh.ny2 + 1):
            if mesh.ny2 % t:
                continue
            cand = mesh.ny2 // t
            if planes * (cand + 2 * reach * q_c) * plane <= limit:
                return cand
        return 0

    rt = q = 0
    for q_c in _ADJ_Q_ORDER:
        if n_steps % q_c:
            continue
        cand = pick_rt(q_c)
        if cand >= 1 and (q_c == 1 or cand >= 2 * reach * q_c):
            rt, q = cand, q_c
            break
    if rt < 1:
        return None
    # balanced two-level checkpoints: the outer stack (m = n_ss/b states)
    # and one group's rebuilt inner states (b) are both HBM-resident, so
    # pick b near sqrt(n_ss); bail to the checkpointed-roll reverse when
    # even the balanced plan exceeds the HBM budget.
    state_bytes = (
        (2 + (8 + 2 * n_tr) * k) * mesh.ny2 * mesh.nx * itemsize
    )
    n_ss = n_steps // q
    divs = [d for d in range(1, n_ss + 1) if n_ss % d == 0]
    b = min(divs, key=lambda d: (n_ss // d) + d)
    if ((n_ss // b) + b + 4) * state_bytes > _ADJ_HBM_BUDGET:
        return None
    return rt, q, b


def _tiled_diff_operands(state, mesh, dt, nonlinear, tracer_kappa,
                         tracer_upwind, strat, forcing):
    """Operand set shared by _rollout_fwd's tiled forward and
    _rollout_bwd's tiled reverse (must match exactly — the reverse
    re-derives what the forward saved checkpoints against)."""
    ny2, nx = mesh.ny2, mesh.nx
    k = state.layer_thickness.shape[-1]
    dtype = state.layer_thickness.dtype
    f_edge = mesh.f_edge.reshape(6, ny2, nx, 1).astype(dtype)
    rts = mesh.resting_thickness_sum[..., None].astype(dtype)
    mask_op = (
        None if mesh.edge_mask is None
        else mesh.edge_mask.reshape(6, ny2, nx, 1).astype(dtype)
    )
    nl_terms, f_vert = _nl_setup(mesh, dtype, nonlinear)
    tr, cmask, tropts = _tracer_setup(
        state, mesh, dtype, tracer_kappa, tracer_upwind
    )
    cmask = None if cmask is None else cmask.reshape(2, ny2, nx, 1)
    sw = _strat_w(strat, dtype)
    fwind, fidx = _forcing_setup(forcing, ny2, nx, dtype)
    scal_t = _tiled_scal(mesh, dt, dtype, forcing, nonlinear)
    return (scal_t, f_edge, rts, mask_op, f_vert, fwind, fidx, tr, cmask,
            sw, nl_terms, tropts)


def _fast_adjoint_plan(state: StructState, mesh: StructMesh, n_steps: int,
                       nonlinear: bool = False, forced: bool = False):
    """(b, m) when the fused adjoint applies on this backend/size, else None."""
    k = state.layer_thickness.shape[-1]
    itemsize = state.layer_thickness.dtype.itemsize
    n_tr = 0 if state.tracers is None else state.tracers.shape[3]
    if not _route_tpu() or not fits_in_vmem(
        mesh, k, itemsize, n_tr, forced
    ):
        return None
    return _adjoint_plan(n_steps, mesh.ny2, mesh.nx, k, itemsize, nonlinear,
                         n_tr, forced)


def _rollout_fwd(state, mesh, dt, n_steps, nonlinear=False,
                 tracer_kappa=0.0, tracer_upwind=1.0, strat=None,
                 forcing=None):
    plan = _fast_adjoint_plan(state, mesh, n_steps, nonlinear,
                              forcing is not None)
    if plan is None:
        tplan = _tiled_adjoint_plan(
            state, mesh, n_steps, nonlinear, strat, forcing,
        )
        if tplan is not None:
            # beyond-VMEM rollout on TPU (every subsystem): tiled forward
            # SAVING the outer checkpoints the tiled Pallas reverse
            # consumes
            rt, qt, bt = tplan
            ny2, nx = mesh.ny2, mesh.nx
            k = state.layer_thickness.shape[-1]
            n_tr = 0 if state.tracers is None else state.tracers.shape[3]
            (scal_t, f_edge, rts, mask_op, f_vert, fwind, fidx, tr, cmask,
             sw, nl_terms, tropts) = _tiled_diff_operands(
                state, mesh, dt, nonlinear, tracer_kappa, tracer_upwind,
                strat, forcing,
            )
            final, ckpts_t = _tiled_fwd_ckpts(
                scal_t,
                state.ssh[..., None], state.layer_thickness,
                state.normal_velocity.reshape(6, ny2, nx, k),
                f_edge, rts, mask_op, f_vert, fwind, fidx, tr, cmask, sw,
                terms=mesh.coriolis_terms, row_tile=rt, n_steps=n_steps,
                b=bt, interpret=_interp(), q=qt, tropts=tropts,
                nl_terms=nl_terms,
            )
            out = StructState(
                ssh=final[0][..., 0],
                layer_thickness=final[1],
                normal_velocity=final[2].reshape(3, 2, ny2, nx, k),
                tracers=(
                    _tr_unplanes(final[3], ny2, nx, k) if n_tr else None
                ),
            )
            return out, (None, ckpts_t, state, mesh, dt, strat, forcing)
        out = pallas_rollout_diff(
            state, mesh, dt, n_steps, nonlinear, tracer_kappa, tracer_upwind,
            strat, forcing,
        )
        return out, (None, None, state, mesh, dt, strat, forcing)
    # fast path: run the forward in fused big-step segments, SAVING the
    # outer checkpoints as residuals — the reverse sweep then skips one
    # whole forward rebuild (bitwise-identical final state)
    b, m = plan
    ny2, nx = mesh.ny2, mesh.nx
    k = state.layer_thickness.shape[-1]
    n_tr = 0 if state.tracers is None else state.tracers.shape[3]
    dtype = state.layer_thickness.dtype
    f_edge, rts, scal, mask = _adjoint_aux(mesh, dt, dtype, forcing)
    nl_terms, f_vert = _nl_setup(mesh, dtype, nonlinear)
    tr, cmask, tropts = _tracer_setup(
        state, mesh, dtype, tracer_kappa, tracer_upwind
    )
    fwind, fidx = _forcing_setup(forcing, ny2, nx, dtype)
    final, ckpts = _pallas_forward_ckpts(
        state.ssh[..., None],
        state.layer_thickness,
        state.normal_velocity.reshape(6, ny2, nx, k),
        f_edge, rts, scal, mask, f_vert, tr, cmask, _strat_w(strat, dtype),
        fwind, fidx,
        terms=mesh.coriolis_terms, n_steps=n_steps, big=b * m,
        interpret=_interp(), nl_terms=nl_terms, tropts=tropts,
    )
    out = StructState(
        ssh=final[0][..., 0],
        layer_thickness=final[1],
        normal_velocity=final[2].reshape(3, 2, ny2, nx, k),
        tracers=_tr_unplanes(final[3], ny2, nx, k) if n_tr else None,
    )
    return out, (ckpts, None, state, mesh, dt, strat, forcing)


def _rollout_bwd(n_steps, nonlinear, tracer_kappa, tracer_upwind, res, g):
    ckpts, ckpts_t, state, mesh, dt, strat, forcing = res
    if ckpts is not None:
        plan = _fast_adjoint_plan(state, mesh, n_steps, nonlinear,
                                  forcing is not None)
        b, m = plan
        ny2, nx = mesh.ny2, mesh.nx
        k = state.layer_thickness.shape[-1]
        n_tr = 0 if state.tracers is None else state.tracers.shape[3]
        dtype = state.layer_thickness.dtype
        f_edge, rts, scal, mask = _adjoint_aux(mesh, dt, dtype, forcing)
        nl_terms, f_vert = _nl_setup(mesh, dtype, nonlinear)
        _, cmask, tropts = _tracer_setup(
            state, mesh, dtype, tracer_kappa, tracer_upwind
        )
        sw = _strat_w(strat, dtype)
        fwind, fidx = _forcing_setup(forcing, ny2, nx, dtype)
        cot0 = (
            g.ssh[..., None].astype(dtype),
            g.layer_thickness.astype(dtype),
            g.normal_velocity.reshape(6, ny2, nx, k).astype(dtype),
        )
        if n_tr:
            cot0 += (_tr_planes(g.tracers.astype(dtype), ny2, nx, k),)
        cot, ddt, dsw, dwind, dcoef = _pallas_adjoint_from_ckpts(
            ckpts, f_edge, rts, scal, cot0, mask, f_vert, cmask, sw,
            fwind, fidx,
            terms=mesh.coriolis_terms, b=b, m=m, interpret=_interp(),
            nl_terms=nl_terms, tropts=tropts,
        )
        d_state = _cot_from_planes(cot, ny2, nx, k)
        d_dt = ddt.astype(jnp.asarray(dt).dtype)
        d_strat = None
        if strat is not None:
            # densities only parameterize phi_weights host-side: their
            # cotangent through the rollout is zero by construction
            d_strat = strat.replace(
                phi_weights=dsw.astype(strat.phi_weights.dtype),
                densities=jnp.zeros_like(strat.densities),
            )
        d_forcing = None
        if forcing is not None:
            d_forcing = _forcing_cotangent(forcing, dwind, dcoef, ny2, nx)
        return (d_state, jax.tree.map(jnp.zeros_like, mesh), d_dt, d_strat,
                d_forcing)
    # beyond-VMEM rollouts on TPU (every subsystem): tiled Pallas adjoint
    # (per-tile window vjp kernels + halo overlap-add) over the outer
    # checkpoints the forward saved — instead of the HBM-bound roll replay
    if ckpts_t is not None:
        rt, q, b = _tiled_adjoint_plan(
            state, mesh, n_steps, nonlinear, strat, forcing,
        )
        ny2, nx = mesh.ny2, mesh.nx
        k = state.layer_thickness.shape[-1]
        n_tr = 0 if state.tracers is None else state.tracers.shape[3]
        dtype = state.layer_thickness.dtype
        (scal_t, f_edge, rts, mask_op, f_vert, fwind, fidx, _tr_op, cmask,
         sw, nl_terms, tropts) = _tiled_diff_operands(
            state, mesh, dt, nonlinear, tracer_kappa, tracer_upwind,
            strat, forcing,
        )
        cot0 = (
            g.ssh[..., None].astype(dtype),
            g.layer_thickness.astype(dtype),
            g.normal_velocity.reshape(6, ny2, nx, k).astype(dtype),
        )
        if n_tr:
            cot0 += (_tr_planes(g.tracers.astype(dtype), ny2, nx, k),)
        cot, dscal, dwind, dsw = _tiled_adjoint_from_ckpts(
            scal_t, ckpts_t, f_edge, rts, cot0, mask_op, f_vert, fwind,
            fidx, cmask, sw,
            terms=mesh.coriolis_terms, row_tile=rt, n_steps=n_steps, b=b,
            interpret=_interp(), q=q, tropts=tropts, nl_terms=nl_terms,
        )
        d_state = _cot_from_planes(cot, ny2, nx, k)
        d_dt = dscal[0].astype(jnp.asarray(dt).dtype)
        d_strat = None
        if strat is not None:
            d_strat = strat.replace(
                phi_weights=dsw.astype(strat.phi_weights.dtype),
                densities=jnp.zeros_like(strat.densities),
            )
        d_forcing = None
        if forcing is not None:
            d_forcing = _forcing_cotangent(
                forcing, dwind, dscal[3:6].reshape(1, 3), ny2, nx
            )
        return (d_state, jax.tree.map(jnp.zeros_like, mesh), d_dt, d_strat,
                d_forcing)
    # fallback (CPU, or general non-one-hot level masks): sqrt-checkpointed
    # roll reverse — strat and forcing are differentiated inputs here too,
    # so d(phi_weights) and the Forcing cotangent are exact
    extras = []
    if strat is not None:
        extras.append(strat)
    if forcing is not None:
        extras.append(forcing)

    def rollout(s, t, *rest):
        i = 0
        w = f = None
        if strat is not None:
            w = rest[i]
            i += 1
        if forcing is not None:
            f = rest[i]
        return _checkpointed_roll_rollout(
            s, mesh, t, n_steps, nonlinear, tracer_kappa, tracer_upwind,
            w, f,
        )

    _, vjp = jax.vjp(rollout, state, dt, *extras)
    d_state, d_dt, *d_rest = vjp(g)
    d_strat = d_forcing = None
    i = 0
    if strat is not None:
        d_strat = d_rest[i]
        i += 1
    if forcing is not None:
        d_forcing = d_rest[i]
    return (d_state, jax.tree.map(jnp.zeros_like, mesh), d_dt, d_strat,
            d_forcing)


pallas_rollout_diff.defvjp(_rollout_fwd, _rollout_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def pallas_step(state: StructState, mesh: StructMesh, dt,
                tracer_kappa: float = 0.0,
                tracer_upwind: float = 1.0, strat=None,
                forcing=None) -> StructState:
    """One fused-kernel step, differentiable: Pallas forward, roll-model
    backward (equal math, so the VJP is exact)."""
    return pallas_run_loop(state, mesh, dt, 1, tracer_kappa=tracer_kappa,
                           tracer_upwind=tracer_upwind, strat=strat,
                           forcing=forcing)


def _step_fwd(state, mesh, dt, tracer_kappa=0.0, tracer_upwind=1.0,
              strat=None, forcing=None):
    return pallas_step(state, mesh, dt, tracer_kappa, tracer_upwind, strat,
                       forcing), (state, mesh, dt, strat, forcing)


def _step_bwd(tracer_kappa, tracer_upwind, res, g):
    state, mesh, dt, strat, forcing = res
    d_mesh = jax.tree.map(jnp.zeros_like, mesh)
    extras = []
    if strat is not None:
        extras.append(strat)
    if forcing is not None:
        extras.append(forcing)

    def step(s, t, *rest):
        i = 0
        w = f = None
        if strat is not None:
            w = rest[i]
            i += 1
        if forcing is not None:
            f = rest[i]
        return structured_step(s, mesh, t, forcing=f,
                               tracer_kappa=tracer_kappa,
                               tracer_upwind=tracer_upwind, strat=w)

    _, vjp = jax.vjp(step, state, dt, *extras)
    d_state, d_dt, *d_rest = vjp(g)
    d_strat = d_forcing = None
    i = 0
    if strat is not None:
        d_strat = d_rest[i]
        i += 1
    if forcing is not None:
        d_forcing = d_rest[i]
    return d_state, d_mesh, d_dt, d_strat, d_forcing


pallas_step.defvjp(_step_fwd, _step_bwd)
