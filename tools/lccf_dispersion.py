"""Longitudinal collective-mode dispersion from the LCCF output.

The reference stores the Fourier-space ion current J(k, t) on a 12^3
integer-k grid (LCCF/printJ, laserCoolingPlusExpansionMDQTSpeedUp.cpp:
1040-1092; the call sites are active in the pre-SpeedUp program,
LaserCoolingPlusExpansionMDQT.cpp:1252-1254) but ships no spectral
analysis.  This tool completes the physics: it runs a laser-free
flagship config (om = om_dp = 0 — a pure Yukawa OCP that
disorder-induced-heats to Gamma ~ 2.5 and then evolves freely), records
J_interval0.dat, and extracts the longitudinal mode dispersion
omega_L(k) via analysis.lccf_spectrum (plus the transverse shear branch
omega_T(k) — 0 where no propagating mode resolves), comparing each
k-shell's longitudinal peak against the Debye-screened cold-plasmon law

    omega(k) = omega_pl * k / sqrt(k^2 + kappa^2),
    omega_pl = sqrt(3) omega_E,  kappa = sqrt(3 Ge)

(correlational QLCA corrections downshift the measured peak a few
percent at k ~ 1/a, so agreement is expected at the ~10% level, tighter
at the smallest k).

Usage:  python tools/lccf_dispersion.py [--n0 1024] [--tmax 40]
        [--out artifacts/lccf]
"""

from __future__ import annotations

import argparse
import glob
import json
import math
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n0", type=int, default=1024)
    ap.add_argument("--tmax", type=float, default=40.0)
    ap.add_argument("--sample-freq", type=int, default=40)
    ap.add_argument("--skip-time", type=float, default=8.0,
                    help="initial transient (DIH) to drop, in 1/omega_E")
    ap.add_argument("--max-shell", type=int, default=20)
    ap.add_argument("--out", default="/tmp/lccf_dispersion")
    args = ap.parse_args()

    from mdqtplasmasims_tpu.analysis import lccf_spectrum
    from mdqtplasmasims_tpu.experiments.laser_cooling import (
        CoolingConfig, run)
    from mdqtplasmasims_tpu.units import PlasmaUnits

    shutil.rmtree(args.out, ignore_errors=True)
    cfg = CoolingConfig(n0=args.n0, tmax=args.tmax,
                        sample_freq=args.sample_freq,
                        om=0.0, om_dp=0.0,          # lasers off: free OCP
                        record_lccf=True, save_directory=args.out)
    t0 = time.perf_counter()
    run(cfg, seed=1)
    wall = time.perf_counter() - t0
    d = glob.glob(os.path.join(args.out, "*", "job1"))[0]

    skip = int(args.skip_time / (cfg.timestep * cfg.sample_freq))
    spec = lccf_spectrum(d, timestep=cfg.timestep,
                         max_shell=args.max_shell, skip=skip)

    pu = PlasmaUnits(cfg.density, cfg.ge)
    L = PlasmaUnits.box_length(cfg.n0)
    kappa = pu.kappa
    dw = spec["omega"][1] - spec["omega"][0]
    print(f"# N0={cfg.n0} L={L:.2f}a kappa={kappa:.3f} "
          f"omega_pl={math.sqrt(3):.3f} omega_E  "
          f"(wall {wall:.1f}s, {len(spec['k_int2'])} shells, "
          f"d_omega={dw:.3f})")
    print("# |n|^2   k [1/a]   omega_peak   omega_theory   ratio   omega_T")
    rows = []
    for q, kn, pk, pt in zip(spec["k_int2"], spec["k"],
                             spec["omega_peak"], spec["omega_peak_t"]):
        k = 2.0 * math.pi * kn / L
        th = math.sqrt(3.0) * k / math.sqrt(k * k + kappa * kappa)
        rows.append(dict(n2=int(q), k=k, omega_peak=float(pk),
                         omega_theory=th, ratio=float(pk) / th,
                         omega_peak_t=float(pt)))
        # omega_T: shear-wave branch (0 = no propagating mode resolved;
        # expected at the post-DIH Gamma ~ 2.5 — transverse sound needs
        # Gamma >~ 5)
        print(f"  {q:5d}   {k:7.3f}   {pk:10.3f}   {th:12.3f}   "
              f"{pk / th:5.3f}   {pt:7.3f}")
    with open(os.path.join(args.out, "dispersion.json"), "w") as f:
        json.dump(dict(n0=cfg.n0, tmax=cfg.tmax, kappa=kappa,
                       d_omega=dw, wall_s=wall, rows=rows), f, indent=1)
    print("wrote", os.path.join(args.out, "dispersion.json"))


if __name__ == "__main__":
    main()
