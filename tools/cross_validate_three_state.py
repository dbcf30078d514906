"""Cross-validate the 3-state QT engine against the compiled reference.

laserCoolNoPlasmaThreeState.cpp needs Armadillo only for small dense
complex matrices; tools/arma_shim.hpp is a minimal standalone drop-in
(our code, written for this purpose) so the unmodified reference physics
can compile anywhere:

  mkdir shim && cp tools/arma_shim.hpp shim/armadillo
  cp <reference>/laserCoolNoPlasmaThreeState.cpp ref3.cpp
  # optionally shrink tmax and point saveDirectory somewhere writable
  g++ -std=c++11 -fopenmp -O2 -Ishim -o ref3 ref3.cpp -lm && ./ref3 1
  python tools/cross_validate_three_state.py <ref_job_dir>/energies.dat

Round-1 result (N0=1000, det=-0.5, Om=0.5, T0=10 mK, t to 1390/gamma):
normalized Doppler-cooling curves EkinX(t)/EkinX(t0) agree to 1.1-2.6%
across seeds (initial EkinX differs only by the N=1000 sampling draw).
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main(ref_energies: str) -> int:
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    from mdqtplasmasims_tpu.experiments.three_state import (
        ThreeStateConfig, run)

    ref = np.loadtxt(ref_energies)
    tmax = float(ref[-1, 0])
    cfg = ThreeStateConfig(n0=1000, tmax=tmax, sample_freq=1000)
    res = run(cfg)
    n = min(len(ref), len(res["t"]))
    nref = ref[:n, 1] / ref[0, 1]
    nmine = res["ekin_x"][:n] / res["ekin_x"][0]
    d = float(np.abs(nref - nmine).max())
    print(f"normalized cooling-curve max diff over {n} samples: {d:.4f}")
    print("CROSS-VALIDATION", "PASS" if d < 0.08 else "FAIL")
    return 0 if d < 0.08 else 1


if __name__ == "__main__":
    sys.exit(main(sys.argv[1]))
