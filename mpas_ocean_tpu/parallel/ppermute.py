"""Neighbor-only halo exchange via `lax.ppermute` rings.

The all_gather exchange (shard_step.py) ships every part's boundary pack to
every device — O(P) traffic per device per step. On a spatially coherent
partition (parallel/partition.py uses RCM-seeded greedy growth) each part
touches only a few neighbor parts, so the halo refresh decomposes into a
small static set of ring rotations: round `s` sends, on every device q at
once, exactly the values part (q+s) mod P needs from part q, as one
`lax.ppermute` with the rotation permutation. XLA schedules each rotation
as a single ICI neighbor transfer (this is the SURVEY section 8 plan:
"halo exchange via ppermute over ICI").

Send/recv orderings are agreed host-side: for every (sender, receiver)
pair the exchanged global ids are sorted, so the receiver scatters the
incoming pack with a precomputed slot list — no index data moves at run
time. Padding rows (parts with less traffic than the round's max) read
from and write to the reserved dump slot.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..models.shallow_water import PrognosticVars
from ..utils.pytree import pytree_dataclass, static_field
from .partition import PartitionedMesh

__all__ = ["PermuteRound", "build_permute_schedule", "halo_exchange_ppermute"]


@pytree_dataclass
class PermuteRound:
    """One ring rotation of the halo exchange (leading (P,) axis per leaf)."""

    shift: int = static_field()
    cell_send: jax.Array  # (P, Sc) local slots to pack (pad: dump)
    cell_recv: jax.Array  # (P, Sc) local halo slots to overwrite (pad: dump)
    edge_send: jax.Array  # (P, Se)
    edge_recv: jax.Array  # (P, Se)


def _owner_and_lookup(gids: np.ndarray, n_owned: np.ndarray, n_global: int,
                      dump: int):
    """(owner[n_global], local_slot[P, n_global]) from stacked gid tables."""
    n_parts = gids.shape[0]
    owner = np.full(n_global, -1, dtype=np.int64)
    lookup = np.full((n_parts, n_global), dump, dtype=np.int64)
    for p in range(n_parts):
        valid = gids[p] >= 0
        lookup[p, gids[p, valid]] = np.flatnonzero(valid)
        owner[gids[p, : n_owned[p]]] = p
    return owner, lookup


def _pad_rows(rows, width, fill):
    out = np.full((len(rows), width), fill, dtype=np.int32)
    for i, r in enumerate(rows):
        out[i, : len(r)] = r
    return out


def build_permute_schedule(part: PartitionedMesh) -> tuple[PermuteRound, ...]:
    """Host-side: decompose the halo exchange into ring rotations."""
    P = part.n_parts
    n_cells = len(part.part_of_cell)
    n_edges = int(part.edge_gids.max()) + 1
    c_dump = part.cell_gids.shape[1] - 1
    e_dump = part.edge_gids.shape[1] - 1

    cell_owner, cell_l = _owner_and_lookup(
        part.cell_gids, part.n_owned_cells, n_cells, c_dump
    )
    edge_owner, edge_l = _owner_and_lookup(
        part.edge_gids, part.n_owned_edges, n_edges, e_dump
    )

    # traffic[s][q] = sorted global ids flowing q -> (q+s) % P
    cell_traffic = [[[] for _ in range(P)] for _ in range(P)]
    edge_traffic = [[[] for _ in range(P)] for _ in range(P)]
    for p in range(P):
        halo_c = part.cell_gids[p, part.n_owned_cells[p] : part.n_local_cells[p]]
        for g in halo_c:
            q = cell_owner[g]
            cell_traffic[(p - q) % P][q].append(int(g))
        halo_e = part.edge_gids[p, part.n_owned_edges[p] : part.n_local_edges[p]]
        for g in halo_e:
            q = edge_owner[g]
            edge_traffic[(p - q) % P][q].append(int(g))

    rounds = []
    for s in range(1, P):
        c_t, e_t = cell_traffic[s], edge_traffic[s]
        if not any(c_t) and not any(e_t):
            continue
        sc = max(1, max(len(t) for t in c_t))
        se = max(1, max(len(t) for t in e_t))
        c_send_rows, c_recv_rows, e_send_rows, e_recv_rows = [], [], [], []
        for q in range(P):
            r = (q + s) % P
            ids = np.array(sorted(c_t[q]), dtype=np.int64)
            c_send_rows.append(cell_l[q, ids])
            ids_in = np.array(sorted(c_t[(q - s) % P]), dtype=np.int64)
            c_recv_rows.append(cell_l[q, ids_in])
            eids = np.array(sorted(e_t[q]), dtype=np.int64)
            e_send_rows.append(edge_l[q, eids])
            eids_in = np.array(sorted(e_t[(q - s) % P]), dtype=np.int64)
            e_recv_rows.append(edge_l[q, eids_in])
        rounds.append(
            PermuteRound(
                shift=s,
                cell_send=jnp.asarray(_pad_rows(c_send_rows, sc, c_dump)),
                cell_recv=jnp.asarray(_pad_rows(c_recv_rows, sc, c_dump)),
                edge_send=jnp.asarray(_pad_rows(e_send_rows, se, e_dump)),
                edge_recv=jnp.asarray(_pad_rows(e_recv_rows, se, e_dump)),
            )
        )
    return tuple(rounds)


def halo_exchange_ppermute(
    prog: PrognosticVars, rounds, axis: str, n_parts: int,
    apply_to: PrognosticVars | None = None,
) -> PrognosticVars:
    """Refresh halos with one ppermute per ring round (inside shard_map;
    round leaves carry no leading parts axis).

    ``prog`` supplies the PACKED (sent) values — the rounds' send columns
    index its arrays; received values overwrite the halo slots of
    ``apply_to`` (default: ``prog``). Splitting pack-source from
    apply-target lets the overlap path (parallel/overlap.py) issue the
    collectives against the early boundary-mini result while the full step
    computes."""
    ssh_s, h_s, u_s = prog.ssh, prog.layer_thickness, prog.normal_velocity
    tgt = prog if apply_to is None else apply_to
    ssh, h, u = tgt.ssh, tgt.layer_thickness, tgt.normal_velocity
    tr_s, tr = prog.tracers, tgt.tracers
    k = h.shape[1]
    for r in rounds:
        perm = [(i, (i + r.shift) % n_parts) for i in range(n_parts)]
        parts = [h_s[r.cell_send], ssh_s[r.cell_send][:, None]]
        if tr_s is not None:
            # tracers ride the same cell pack: (S, nT, K) -> (S, nT*K)
            parts.append(tr_s[r.cell_send].reshape(r.cell_send.shape[0], -1))
        crecv = jax.lax.ppermute(jnp.concatenate(parts, 1), axis, perm)
        h = h.at[r.cell_recv].set(crecv[:, :k])
        ssh = ssh.at[r.cell_recv].set(crecv[:, k])
        if tr_s is not None:
            inc = crecv[:, k + 1:].reshape(-1, tr.shape[1], tr.shape[2])
            tr = tr.at[r.cell_recv].set(inc)
        erecv = jax.lax.ppermute(u_s[r.edge_send], axis, perm)
        u = u.at[r.edge_recv].set(erecv)
    return PrognosticVars(ssh=ssh, layer_thickness=h, normal_velocity=u,
                          tracers=tr)


def halo_exchange_fields_ppermute(
    cell_fields, edge_fields, rounds, axis: str, n_parts: int
):
    """Refresh halo slots of arbitrary derived per-(cell|edge) fields with
    one ppermute per ring round (inside shard_map). Used by the nonlinear
    sharded step, whose PV-flux taps need OWNER-computed derived values
    (kinetic energy, thickness flux, edge PV) at halo elements — exchanging
    the derived fields keeps the 1-ring halo sufficient where the raw
    stencil would need two rings. Fields are (n_local, K) arrays; returns
    (cell_fields, edge_fields) tuples with halo slots overwritten."""
    cf, ef = list(cell_fields), list(edge_fields)
    for r in rounds:
        perm = [(i, (i + r.shift) % n_parts) for i in range(n_parts)]
        if cf:
            pack = jnp.concatenate([f[r.cell_send] for f in cf], axis=1)
            recv = jax.lax.ppermute(pack, axis, perm)
            o = 0
            for i, f in enumerate(cf):
                w = f.shape[1]
                cf[i] = f.at[r.cell_recv].set(recv[:, o:o + w])
                o += w
        if ef:
            pack = jnp.concatenate([f[r.edge_send] for f in ef], axis=1)
            recv = jax.lax.ppermute(pack, axis, perm)
            o = 0
            for i, f in enumerate(ef):
                w = f.shape[1]
                ef[i] = f.at[r.edge_recv].set(recv[:, o:o + w])
                o += w
    return tuple(cf), tuple(ef)
