"""Structured in-run metrics logging.

Consumes the device-sampled series from
forward.run_loop.ocn_run_loop_with_monitor and renders it as JSON-lines
(machine-readable, one record per sample) and/or a human table. This plus
the partition/communication profile (parallel/stats.py) is the framework's
observability subsystem — the reference has only stdlib log statements and
one end-of-run NetCDF (SURVEY section 5).
"""

from __future__ import annotations

import json
import os

import numpy as np

__all__ = ["series_records", "write_jsonl", "format_table", "check_health"]

# metrics that are deliberately NaN-filled when their physics is off (the
# schema stays stable across runs); an all-NaN series for any OTHER metric
# is a genuine blow-up and must be reported, not skipped
_OPTIONAL_METRICS = frozenset({"pot_enstrophy"})


def _scalar_series(series: dict) -> dict:
    """Flatten vector-valued metrics (e.g. per-tracer ``tracer_content`` of
    shape (n, nT)) into one scalar series per component."""
    out = {}
    for k in sorted(series):
        a = np.asarray(series[k])
        if a.ndim <= 1:
            out[k] = a
        else:
            flat = a.reshape(a.shape[0], -1)
            for j in range(flat.shape[1]):
                out[f"{k}_{j}"] = flat[:, j]
    return out


def series_records(series: dict, dt: float, every: int) -> list[dict]:
    """Device series dict of (n,) or (n, ...) arrays -> per-sample records.
    Metrics that are deliberately NaN at every sample (pot_enstrophy in
    linear rollouts) are dropped; vector metrics get one column per slot."""
    arrs = _scalar_series(series)
    keys = [
        k for k, a in arrs.items()
        if not (k in _OPTIONAL_METRICS and np.isnan(a).all())
    ]
    n = len(next(iter(arrs.values())))
    return [
        {"step": (i + 1) * every, "time": (i + 1) * every * float(dt),
         **{k: float(arrs[k][i]) for k in keys}}
        for i in range(n)
    ]


def write_jsonl(path, series: dict, dt: float, every: int) -> str:
    records = series_records(series, dt, every)
    with open(os.fspath(path), "w") as f:
        for r in records:
            f.write(json.dumps(r) + "\n")
    return os.fspath(path)


def format_table(series: dict, dt: float, every: int) -> str:
    records = series_records(series, dt, every)
    keys = [k for k in records[0] if k != "step"]
    head = "step " + " ".join(f"{k:>16s}" for k in keys)
    lines = [head]
    for r in records:
        lines.append(
            f"{r['step']:4d} " + " ".join(f"{r[k]:16.8e}" for k in keys)
        )
    return "\n".join(lines)


def check_health(series: dict, volume_rtol: float = 1e-10) -> list[str]:
    """Scan the series for red flags; returns human-readable warnings
    (empty = healthy): non-finite fields, volume-conservation drift."""
    warnings = []
    for k, v in _scalar_series(series).items():
        a = np.asarray(v)
        if k in _OPTIONAL_METRICS and np.isnan(a).all():
            # metric not computed for this run (pot_enstrophy is NaN-filled
            # in linear rollouts) — not a health failure
            continue
        if not np.isfinite(a).all():
            warnings.append(f"{k} went non-finite at sample {int(np.argmax(~np.isfinite(a)))}")
    vol = np.asarray(series.get("volume", np.array([])))
    if vol.size >= 2 and vol[0] != 0:
        drift = abs(float(vol[-1] - vol[0]) / float(vol[0]))
        if drift > volume_rtol:
            warnings.append(f"volume drift {drift:.3e} exceeds rtol {volume_rtol:.1e}")
    return warnings
