"""Checkpoint / resume with the reference's ASCII state API plus a fast
native .npz format.

Reference schema (laserCoolingPlusExpansionMDQTSpeedUp.cpp:725-916;
README.md:132-142):
  ions_timestep%06d.dat        N <tab> counter
  conditions_timestep%06d.dat  R[0] R[1] R[2] V[0] V[1] V[2]  (%lg, trailing tab)
  wvFns_timestep%06d.dat       Re/Im pairs for all S amplitudes per row
  VZERO_timestep%06d_interval%d.dat   VAF interval velocity snapshots
  spinUpIonsList_timestep%06d.dat     one 0/1 per row (tagging family)
On restore the simulation clock is reconstructed as
``t = (c0 - 9)*TIMESTEP + 0.02`` (line 789).
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np

from .datfiles import format_rows, read_rows


def restore_time(c0: int, timestep: float = 0.002) -> float:
    return (float(c0) - 9.0) * timestep + 0.02


# ---------------------------------------------------------------- ASCII ----

def write_ions(directory: str, c0: int, n: int, counter: int) -> None:
    with open(os.path.join(directory, f"ions_timestep{c0:06d}.dat"), "w") as f:
        f.write(f"{n}\t{counter}")


def read_ions(directory: str, c0: int):
    with open(os.path.join(directory, f"ions_timestep{c0:06d}.dat")) as f:
        n, counter = f.read().split()
    return int(n), int(counter)


def write_conditions(directory: str, c0: int, R: np.ndarray, V: np.ndarray) -> None:
    rows = np.concatenate([np.asarray(R), np.asarray(V)], axis=1)
    # reference row format has a trailing tab: "%lg\t...%lg\t\n" (line 747)
    text = "".join("\t".join("%g" % v for v in row) + "\t\n" for row in rows)
    with open(os.path.join(directory, f"conditions_timestep{c0:06d}.dat"), "w") as f:
        f.write(text)


def read_conditions(directory: str, c0: int):
    arr = read_rows(os.path.join(directory, f"conditions_timestep{c0:06d}.dat"))
    return arr[:, :3], arr[:, 3:6]


def write_wvfns(directory: str, c0: int, psi: np.ndarray) -> None:
    psi = np.asarray(psi)
    flat = np.empty((psi.shape[0], 2 * psi.shape[1]))
    flat[:, 0::2] = psi.real
    flat[:, 1::2] = psi.imag
    text = "".join("".join("%g\t" % v for v in row) + "\n" for row in flat)
    with open(os.path.join(directory, f"wvFns_timestep{c0:06d}.dat"), "w") as f:
        f.write(text)


def read_wvfns(directory: str, c0: int) -> np.ndarray:
    arr = read_rows(os.path.join(directory, f"wvFns_timestep{c0:06d}.dat"))
    return arr[:, 0::2] + 1j * arr[:, 1::2]


def write_vzero(directory: str, c0: int, vholder: np.ndarray) -> None:
    """vholder: [n_intervals, N, 3] velocity snapshots (zeros when VAF
    intervals are disabled, matching the SpeedUp main where Zfunc is
    commented out)."""
    for k in range(vholder.shape[0]):
        path = os.path.join(directory, f"VZERO_timestep{c0:06d}_interval{k}.dat")
        with open(path, "w") as f:
            f.write(format_rows(vholder[k]))


def read_vzero(directory: str, c0: int, n_intervals: int) -> np.ndarray:
    out = []
    for k in range(n_intervals):
        out.append(read_rows(
            os.path.join(directory, f"VZERO_timestep{c0:06d}_interval{k}.dat")))
    return np.stack(out)


def write_spinup_list(directory: str, c0: int, spin_up: np.ndarray) -> None:
    path = os.path.join(directory, f"spinUpIonsList_timestep{c0:06d}.dat")
    with open(path, "w") as f:
        f.write("".join(f"{int(s)}\n" for s in np.asarray(spin_up)))


def read_spinup_list(directory: str, c0: int) -> np.ndarray:
    path = os.path.join(directory, f"spinUpIonsList_timestep{c0:06d}.dat")
    return np.loadtxt(path, dtype=np.int64).reshape(-1)


# --------------------------------------------------------------- native ----

def save_native(directory: str, c0: int, *, R, V, psi=None, counter=0,
                vholder=None, spin_up=None, extra: Optional[dict] = None) -> str:
    """Single-file .npz checkpoint (fast path alongside the ASCII schema)."""
    path = os.path.join(directory, f"checkpoint_{c0:06d}.npz")
    payload = dict(R=np.asarray(R), V=np.asarray(V), c0=np.int64(c0),
                   counter=np.int64(counter))
    if psi is not None:
        payload["psi"] = np.asarray(psi)
    if vholder is not None:
        payload["vholder"] = np.asarray(vholder)
    if spin_up is not None:
        payload["spin_up"] = np.asarray(spin_up)
    for k, v in (extra or {}).items():
        payload[k] = np.asarray(v)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        np.savez(f, **payload)
    os.replace(tmp, path)       # atomic publish
    return path


def load_native(directory: str, c0: int) -> dict:
    path = os.path.join(directory, f"checkpoint_{c0:06d}.npz")
    with np.load(path) as z:
        return {k: z[k] for k in z.files}


def latest_ascii_checkpoint(directory: str) -> Optional[int]:
    """Highest c0 among the ASCII ``ions_timestep*.dat`` checkpoints —
    the schema a reference binary advances when it continues a framework
    run (interop chaining), so resume paths compare it against the
    newest native .npz and take whichever is later."""
    import glob
    import re
    cs = [int(m.group(1))
          for p in glob.glob(os.path.join(directory, "ions_timestep*.dat"))
          if (m := re.search(r"ions_timestep(\d+)\.dat$", p))]
    return max(cs) if cs else None
