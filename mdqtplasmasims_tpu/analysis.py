"""Offline ensemble aggregation.

The reference's statistics are aggregated across SLURM job directories
offline (README.md:61-67: "average the quantities recorded in each job
subfolder").  These helpers do that over the parameter-encoded directory
tree written by the experiments (same layout as the reference).
"""

from __future__ import annotations

import glob
import os
from typing import Dict, List, Optional, Sequence

import numpy as np

from .io.datfiles import read_rows


def job_dirs(param_dir: str) -> List[str]:
    """All job subdirectories of one parameter directory, sorted by job."""
    dirs = glob.glob(os.path.join(param_dir, "job*"))
    return sorted(dirs, key=lambda d: int(d.rsplit("job", 1)[-1] or 0))


def average_dat(param_dir: str, name: str,
                jobs: Optional[Sequence[str]] = None) -> np.ndarray:
    """Row-wise ensemble average of one .dat file across jobs.

    The first column (time) is taken from the first job; remaining columns
    are averaged.  Jobs with mismatched row counts are truncated to the
    shortest (a job killed by walltime produces fewer rows)."""
    dirs = list(jobs) if jobs is not None else job_dirs(param_dir)
    tables = [read_rows(os.path.join(d, name)) for d in dirs
              if os.path.exists(os.path.join(d, name))]
    if not tables:
        raise FileNotFoundError(f"{name} not found under {param_dir}")
    n = min(t.shape[0] for t in tables)
    stack = np.stack([t[:n] for t in tables])
    out = stack.mean(axis=0)
    out[:, 0] = stack[0, :, 0]
    return out


def stack_dat(param_dir: str, name: str) -> np.ndarray:
    """[n_jobs, rows, cols] stack of one .dat file across jobs."""
    dirs = job_dirs(param_dir)
    tables = [read_rows(os.path.join(d, name)) for d in dirs
              if os.path.exists(os.path.join(d, name))]
    n = min(t.shape[0] for t in tables)
    return np.stack([t[:n] for t in tables])


def ensemble_energies(param_dir: str) -> Dict[str, np.ndarray]:
    """Averaged energies.dat with named columns (cooling-family schema:
    t, EkinX, EkinY, EkinZ, Epot, dE, vxAvg — README.md:103-110)."""
    avg = average_dat(param_dir, "energies.dat")
    cols = ["t", "ekin_x", "ekin_y", "ekin_z", "epot", "de", "vx_avg"]
    return {c: avg[:, i] for i, c in enumerate(cols[:avg.shape[1]])}


def ensemble_temperature_curve(param_dir: str) -> np.ndarray:
    """[T, 2] (t, T_total) from averaged energies: T = 2/3 sum Ekin per
    axis (plasma units, T in units of E_c/k_B)."""
    e = ensemble_energies(param_dir)
    t_total = (2.0 / 3.0) * (e["ekin_x"] + e["ekin_y"] + e["ekin_z"])
    return np.stack([e["t"], t_total], axis=-1)
