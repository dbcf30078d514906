"""Cross-validate the transport experiment against the compiled reference.

The reference's MonteCarloFollowedByMDAndTempAnisotropy.cpp has no
Armadillo dependency, so it can be compiled directly (g++ -fopenmp) and its
.dat outputs compared with this framework's on a matched configuration.
RNG streams differ, so the comparison is statistical: normalized VAF curve
shape, g(r) structure, mean temperature.

Usage:
  1. copy the reference file somewhere writable, shrink the constants
     (e.g. N=512, monteCarloSteps=30000, numVelAutoCorrsSteps=600) and set
     saveDirectory; compile:  g++ -std=c++11 -fopenmp -O2 -o ref ref.cpp -lm
  2. ./ref 1
  3. python tools/cross_validate_transport.py <ref_job_dir>

Round-1 result (N=512, Gamma=3, kappa=0.5, job-to-job stochastic level
~5-10% at this N):
  - normalized VAF curve: max |diff| 4.7% over the first 300 lags
  - g(r): correlation-hole position and first-peak height within 8%
  - mean temperature: 0.323 vs 0.356 (both straddle the nominal 1/Gamma =
    0.333; the reference's own comments note MC "won't" hit the exact
    target temperature, MonteCarlo...cpp:4-11)
  - per-axis temperatures fluctuate +-10% at N=512 in BOTH codes (slow
    axis equipartition in collisionless MD) — single-time per-axis ratios
    are not a meaningful comparison at this size.
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main(ref_dir: str) -> int:
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    from mdqtplasmasims_tpu.experiments.mc_md_anisotropy import (
        MCTransportConfig, run)

    cfg = MCTransportConfig(n=512, kappa=0.5, gamma=3.0, density=0.4,
                            mc_steps=30000, gr_every_mc=10000,
                            pre_record_md_steps=200, record_steps=600,
                            gr_every_record=100, instant_aniso_steps=200,
                            reequil_steps=100, aniso_relax_steps=100,
                            dtype="float64")
    res = run(cfg)

    ok = True
    vref = np.loadtxt(f"{ref_dir}/VAF.dat")
    nref = vref[:, 1] / vref[0, 1]
    nmine = res["vaf"] / res["vaf"][0]
    m = min(len(nref), len(nmine), 300)
    vaf_diff = np.abs(nref[:m] - nmine[:m]).max()
    print(f"normalized VAF max diff (first {m} lags): {vaf_diff:.3f}")
    ok &= vaf_diff < 0.15

    gref = np.loadtxt(f"{ref_dir}/pairPairCorrStepNum500.dat")
    gmine = np.asarray(res["gr_record"][-1][:len(gref)])
    peak_ref = gref[:, 1].max()
    peak_mine = gmine.max()
    print(f"g(r) first peak: ref {peak_ref:.3f} vs mine {peak_mine:.3f}")
    ok &= abs(peak_mine - peak_ref) / peak_ref < 0.2
    hole_ref = int(np.argmax(gref[:, 1] > 0.5))
    hole_mine = int(np.argmax(gmine > 0.5))
    print(f"correlation-hole edge bin: ref {hole_ref} vs mine {hole_mine}")
    ok &= abs(hole_ref - hole_mine) <= 2

    tref = np.loadtxt(f"{ref_dir}/temperature.dat").mean()
    tmine = float(res["temps"].mean())
    print(f"mean temperature: ref {tref:.3f} vs mine {tmine:.3f} "
          f"(nominal 1/Gamma = {1 / cfg.gamma:.3f})")
    ok &= abs(tmine - tref) / tref < 0.25

    print("CROSS-VALIDATION", "PASS" if ok else "FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main(sys.argv[1]))
