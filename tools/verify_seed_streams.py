"""Hardware verification of the in-kernel PRNG stream contract.

The fused production kernel identifies its hardware-PRNG stream by
(word 1 = a 31-bit draw per sampling segment, word 2 = ion tile * 2^20 +
tick mod 2^20; qt_fused.py kernel, scheduler.soa_init).  CPU interpret
modes cannot exercise this (`prng_seed` has no CPU lowering; the TPU
interpreter stubs the draws to zeros — tests/test_fused.py
TestInternalRNGSeeding covers only the scheduler-side plumbing), so this
script drives the real chip end to end and asserts:

* same seed -> bit-identical trajectories (determinism across processes'
  worth of dispatches);
* different seed -> divergent trajectories;
* jumps fire (per-ion clocks reset, so streams are live, not stuck);
* folded ensemble members (shared word 1, distinct word-2 tile slots)
  produce independent trajectories with healthy member-to-member spread.

Run: python tools/verify_seed_streams.py   (needs the TPU attached)
"""
import os
import sys
import tempfile

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

from mdqtplasmasims_tpu.experiments.laser_cooling import (   # noqa: E402
    CoolingConfig, build_scheduler, run, run_ensemble)
from mdqtplasmasims_tpu.util import safe_device_get          # noqa: E402


def main():
    tmp = tempfile.mkdtemp(prefix="seed_streams_")
    cfg = lambda sub: CoolingConfig(n0=256, tmax=2.0,
                                    save_directory=f"{tmp}/{sub}")
    sched = build_scheduler(cfg("a"))
    assert sched.fused_spec is not None and sched.fused_spec.internal_rng, \
        "must exercise the hardware internal-RNG path"

    f1, _ = run(cfg("a"), seed=3)
    f2, _ = run(cfg("b"), seed=3)
    f3, _ = run(cfg("c"), seed=4)
    R1, R2, R3 = (np.asarray(safe_device_get(f.R)) for f in (f1, f2, f3))
    assert np.array_equal(R1, R2), "same seed must be bit-deterministic"
    assert not np.allclose(R1, R3), "different seeds must diverge"

    tp1 = np.asarray(safe_device_get(f1.t_part))
    t_el = float(np.asarray(safe_device_get(f1.t))) \
        * sched.fused_spec.gamma_to_einstein
    frac_jumped = float((tp1 < 0.9 * t_el).mean())
    print(f"elapsed quantum time {t_el:.1f} gamma^-1; "
          f"fraction with reset clocks {frac_jumped:.3f}")
    assert frac_jumped > 0.5, "hardware PRNG jumps look dead"

    fe, re_ = run_ensemble(CoolingConfig(n0=256, tmax=1.0,
                                         save_directory=f"{tmp}/e"),
                           n_jobs=4, seed=5)
    Re = np.asarray(safe_device_get(fe.R))
    for i in range(1, 4):
        assert not np.allclose(Re[0], Re[i]), \
            f"member {i} duplicates member 0"
    eke = np.asarray(re_["ekin"], np.float64)
    assert np.isfinite(eke).all()
    last = eke[:, -1, 0]
    print(f"ensemble member EkinX at t=1: {last} "
          f"(rel spread {last.std() / last.mean():.3f})")
    assert last.std() / last.mean() > 1e-3, "members suspiciously identical"
    print("seed-stream verification OK")


if __name__ == "__main__":
    main()
