"""Partition / halo-exchange diagnostics.

The BASELINE north-star metrics include halo-exchange overlap and weak-
scaling efficiency; the first step to either is knowing how much halo a
partition creates and how much traffic each exchange round moves. The
reference has no observability subsystem at all (SURVEY section 5); this
is the framework's equivalent of an MPI communication profile, computed
statically from the partition (the schedule is static, so the per-step
traffic is exact, not sampled).
"""

from __future__ import annotations

import numpy as np

from .partition import PartitionedMesh
from .ppermute import build_permute_schedule

__all__ = ["partition_stats", "format_stats"]


def partition_stats(part: PartitionedMesh, itemsize: int = 4,
                    n_vert_levels: int | None = None,
                    overlap: bool = True) -> dict:
    """Static communication/balance profile of a partition.

    Returns a dict with load-balance factors, halo fractions, and the exact
    per-step ppermute traffic (bytes, per device, using ``itemsize`` bytes
    per value and ``n_vert_levels`` levels per column). ``overlap=True``
    additionally builds the boundary mini mesh (a host-side pass over every
    part's boundary) to report overlap/redundancy fractions; pass False to
    skip that cost when only traffic/balance numbers are needed.
    """
    K = n_vert_levels if n_vert_levels is not None else part.local_mesh.n_vert_levels
    owned_c = part.n_owned_cells.astype(np.int64)
    halo_c = (part.n_local_cells - part.n_owned_cells).astype(np.int64)
    owned_e = part.n_owned_edges.astype(np.int64)
    halo_e = (part.n_local_edges - part.n_owned_edges).astype(np.int64)

    rounds = build_permute_schedule(part)
    # bytes sent per device per step: cells carry K+1 values, edges K
    per_round = []
    for r in rounds:
        c_vals = r.cell_send.shape[1] * (K + 1)
        e_vals = r.edge_send.shape[1] * K
        per_round.append(
            {
                "shift": r.shift,
                "cells": int(r.cell_send.shape[1]),
                "edges": int(r.edge_send.shape[1]),
                "bytes_per_device": int((c_vals + e_vals) * itemsize),
            }
        )

    interior_work = owned_c * K  # cell-levels each device integrates

    # overlap accounting (parallel/overlap.py): the collectives depend only
    # on the boundary mini step, so everything else — the full local step —
    # is scheduled while they fly. overlappable_compute_frac = share of the
    # per-step element-updates that are independent of the exchange;
    # mini_redundancy_frac = extra work the early boundary pass re-does.
    # SCALING NOTE: the mini mesh is a fixed-width (~2-ring) band around
    # each part's boundary, so redundancy scales as perimeter/area —
    # O(1/sqrt(cells_per_part)) for compact 2-D parts. The ~67% measured
    # on 64^2/8 parts (512 cells/part) drops to a few percent at
    # production part sizes (>=10^5 cells/part); but on DEGENERATE
    # partitions (depth-1 row slabs, tiny parts) the band covers most of
    # the part and overlap stops paying — check this fraction before
    # trusting overlap=True on a new decomposition.
    overlap_stats = {}
    if overlap:
        from .overlap import build_boundary_mini

        mini, _, _ = build_boundary_mini(part)
        mini_cells = mini.cell_from_local.shape[1]
        mini_edges = mini.edge_from_local.shape[1]
        local_elems = int((part.n_local_cells + part.n_local_edges).max())
        mini_elems = mini_cells + mini_edges
        overlap_stats = {
            "overlappable_compute_frac": float(
                local_elems / (local_elems + mini_elems)
            ),
            "mini_redundancy_frac": float(mini_elems / local_elems),
            "boundary_mini_elems_per_device": int(mini_elems),
        }
    return {
        "n_parts": part.n_parts,
        "cells_owned": {
            "min": int(owned_c.min()),
            "max": int(owned_c.max()),
            "imbalance": float(owned_c.max() / max(1, owned_c.mean())),
        },
        "halo_cell_fraction": float(halo_c.sum() / max(1, owned_c.sum())),
        "halo_edge_fraction": float(halo_e.sum() / max(1, owned_e.sum())),
        "exchange_rounds": per_round,
        "exchange_bytes_per_device_per_step": int(
            sum(r["bytes_per_device"] for r in per_round)
        ),
        "interior_cell_levels_per_device": int(interior_work.max()),
        # compute:communication ratio proxy — cell-levels integrated per
        # byte exchanged; higher = more room to hide the exchange
        "cell_levels_per_exchanged_byte": float(
            interior_work.max()
            / max(1, sum(r["bytes_per_device"] for r in per_round))
        ),
        **overlap_stats,
    }


def format_stats(stats: dict) -> str:
    lines = [
        f"partition: {stats['n_parts']} parts, "
        f"cells {stats['cells_owned']['min']}..{stats['cells_owned']['max']} "
        f"(imbalance {stats['cells_owned']['imbalance']:.3f})",
        f"halo: {100 * stats['halo_cell_fraction']:.1f}% cells, "
        f"{100 * stats['halo_edge_fraction']:.1f}% edges",
        f"exchange: {len(stats['exchange_rounds'])} ppermute rounds, "
        f"{stats['exchange_bytes_per_device_per_step']} B/device/step, "
        f"{stats['cell_levels_per_exchanged_byte']:.2f} cell-levels/B",
    ]
    if "overlappable_compute_frac" in stats:
        lines.append(
            f"overlap: {100 * stats['overlappable_compute_frac']:.1f}% of "
            f"per-step element updates run while the exchange flies "
            f"(+{100 * stats['mini_redundancy_frac']:.1f}% boundary-mini redundancy)"
        )
    for r in stats["exchange_rounds"]:
        lines.append(
            f"  round shift={r['shift']}: {r['cells']} cells + "
            f"{r['edges']} edges = {r['bytes_per_device']} B"
        )
    return "\n".join(lines)
