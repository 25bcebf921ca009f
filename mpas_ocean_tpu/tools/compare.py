"""Model-output vs analytic-solution comparison tool.

Python re-design of the reference's analysis script (reference:
src/compare.py: ExactSolution mirror classes, RMSE `log_error`, and the
2x3 comparison panels): reads a model output NetCDF, evaluates the analytic
solution at the stored time, reports RMSE, and optionally renders panels.

Usage:
  python -m mpas_ocean_tpu.tools.compare output.nc --case igw --lx 10000
  python -m mpas_ocean_tpu.tools.compare output.nc --case kelvin --plot cmp.png
"""

from __future__ import annotations

import argparse
import json

import numpy as np

from ..infra.netcdf import read_netcdf
from ..verification.inertial_gravity_wave import InertialGravityWave
from ..verification.kelvin_wave import KelvinWave


def rmse(a, b):
    return float(np.sqrt(np.mean((np.asarray(a) - np.asarray(b)) ** 2)))


def compare_output(path, case: str = "igw", lx: float = 10000.0, f0: float = 1e-4):
    """Returns a dict of RMSEs of ssh and normalVelocity vs the analytic
    solution at the output's time."""
    ds = read_netcdf(path)
    t = float(ds["time"][0])
    x_c, y_c = ds["xCell"], ds["yCell"]
    x_e, y_e, ang = ds["xEdge"], ds["yEdge"], ds["angleEdge"]
    ssh = ds["ssh"][0] if ds["ssh"].ndim == 2 else ds["ssh"]
    u = ds["normalVelocity"]
    u = u[0] if u.ndim == 3 else u

    if case == "igw":
        sol = InertialGravityWave(lx=lx, f0=f0)
    elif case == "kelvin":
        sol = KelvinWave(lx=lx, f0=f0)
    else:
        raise ValueError(f"unknown case {case!r}")

    ssh_exact = sol.exact_ssh(x_c, y_c, t)
    u_exact = sol.exact_normal_velocity(x_e, y_e, ang, t)

    result = {
        "time": t,
        "case": case,
        "rmse_ssh": rmse(ssh, ssh_exact),
        "rmse_normalVelocity": rmse(u[:, 0], u_exact),
        "rms_ssh_exact": float(np.sqrt(np.mean(ssh_exact**2))),
    }
    return result, (x_c, y_c, ssh, ssh_exact)


def plot_comparison(fields, out_path):
    """Numeric / exact / difference scatter panels (standing in for the
    reference's polaris plot_horiz_field panels, compare.py:132-167)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    x, y, ssh, ssh_exact = fields
    fig, axes = plt.subplots(1, 3, figsize=(15, 4), constrained_layout=True)
    for ax, data, title in zip(
        axes,
        (ssh, ssh_exact, ssh - ssh_exact),
        ("numerical ssh", "exact ssh", "difference"),
    ):
        sc = ax.scatter(x / 1e3, y / 1e3, c=data, s=8, cmap="RdBu_r")
        ax.set_title(title)
        ax.set_xlabel("x [km]")
        ax.set_ylabel("y [km]")
        fig.colorbar(sc, ax=ax)
    fig.savefig(out_path, dpi=120)
    return out_path


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("output")
    p.add_argument("--case", default="igw", choices=["igw", "kelvin"])
    p.add_argument("--lx", type=float, default=10000.0, help="domain length [km]")
    p.add_argument("--f0", type=float, default=1e-4)
    p.add_argument("--plot", default=None, help="write comparison panels to PNG")
    args = p.parse_args(argv)

    result, fields = compare_output(args.output, args.case, args.lx, args.f0)
    if args.plot:
        result["plot"] = plot_comparison(fields, args.plot)
    print(json.dumps(result, indent=2))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
