"""Cross-validate the full 12-level MDQT flagship against the compiled
reference (laserCoolingPlusExpansionMDQTSpeedUp.cpp compiled with
tools/arma_shim.hpp as a drop-in Armadillo, shrunk to N0=256 / tmax=2 /
sampleFreq=10 for a ~2-minute CPU run).

  mkdir shim && cp tools/arma_shim.hpp shim/armadillo
  # patch N0/tmax/sampleFreq/saveDirectory in a copy of the reference file
  g++ -std=c++11 -fopenmp -O2 -Ishim -o refflag refflag.cpp -lm && ./refflag 1
  python tools/cross_validate_flagship.py <ref_job_dir>

Round-1 result: total-Ekin(t) and Epot(t) median relative difference 2.8%
(DIH rise and oscillation structure aligned); final S/P/D populations
within +-0.035 — all at the N=256 job-to-job stochastic level.
"""
import glob
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main(ref_dir: str) -> int:
    import jax
    jax.config.update("jax_platforms", "cpu")
    from mdqtplasmasims_tpu.experiments.laser_cooling import (
        CoolingConfig, run)

    ref = np.loadtxt(os.path.join(ref_dir, "energies.dat"))
    cfg = CoolingConfig(n0=256, tmax=2.0, sample_freq=10, use_pallas=False,
                        dtype="float64")
    final, res = run(cfg)
    outs = res["outs"]
    n = min(len(ref), len(outs["t"]))

    ek_ref = ref[:n, 1:4].sum(1)
    ek_my = outs["ekin"][:n].sum(1)
    ek_diff = float(np.median(np.abs(ek_ref - ek_my) / ek_ref))
    ep_diff = float(np.median(np.abs(ref[:n, 4] - outs["epot"][:n])
                              / ref[:n, 4]))
    print(f"total-Ekin median rel diff: {ek_diff:.3f}")
    print(f"Epot median rel diff:       {ep_diff:.3f}")

    pops_files = sorted(glob.glob(os.path.join(ref_dir,
                                               "statePopulationsVsVTime*.dat")))
    pr = np.loadtxt(pops_files[-1])
    ref_spd = pr[:, 1:4].mean(0)
    my_spd = np.asarray(outs["pops"][n - 1].mean(0))
    print(f"final S/P/D: ref {ref_spd.round(3)} vs mine {my_spd.round(3)}")

    ok = ek_diff < 0.1 and ep_diff < 0.1 and np.abs(ref_spd - my_spd).max() < 0.08
    print("CROSS-VALIDATION", "PASS" if ok else "FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main(sys.argv[1]))
