"""Hardware verify for the per-lane Rabi (``per_lane_om``) fused kernel.

Contract (and why it is not bit-exactness): the Om-split kernel
contracts TWO base coupling patterns (om*C_sp + om_dp*C_dp,
core/qt_fused.py) where the uniform kernel contracts one prefolded
matrix, so under the MXU's f32 matmul decomposition the two programs
round differently at the kernel's established numerical envelope
(~1e-5/tick — the same scale as the repo's fused-vs-XLA hardware
agreement, docs/ROOFLINE.md).  Quantum-jump thresholds amplify that to
full per-ion decorrelation over hundreds of ticks, exactly as any 1-ulp
perturbation would.  Algebraic equivalence is pinned at f32 ulp by the
CPU interpret tests (tests/test_experiments.py TestRabiSweep); here we
assert what hardware can promise:

 1. one MD step: every state plane agrees with the uniform fold to
    <= 1e-3 absolute (observed ~3e-4), R/V to <= 1e-5;
 2. full run (16 segments): per-member mean kinetic energy and S/P/D
    populations agree to < 2% relative — jump flips decorrelate
    individual trajectories, not the physics.

Usage: python tools/verify_om_hw.py   (needs the TPU backend)
"""
import dataclasses as dc
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mdqtplasmasims_tpu.util import enable_compilation_cache
enable_compilation_cache()

import jax
import jax.numpy as jnp
import numpy as np

from mdqtplasmasims_tpu.experiments.laser_cooling import (
    CoolingConfig, _initial_state_from_key, run_compiled_ensemble)
from mdqtplasmasims_tpu.util import safe_device_get

print("backend:", jax.default_backend())
oms = [(1.0, 1.0), (1.6, 0.5)]
om_rows = jnp.asarray(oms, jnp.float32)


def folds(nseg, sample_freq):
    base = CoolingConfig(n0=512, tmax=0.4, sample_freq=sample_freq)
    keys = jax.random.split(jax.random.PRNGKey(7), len(oms))
    states = jax.jit(jax.vmap(
        lambda k: _initial_state_from_key(base, k)))(keys)
    t0 = time.perf_counter()
    fs, os_ = run_compiled_ensemble(base, states, nseg, sweep_om=om_rows)
    jax.block_until_ready(fs.R)
    print(f"  sweep fold ({nseg} seg): {time.perf_counter() - t0:.1f}s")
    unis = []
    for om, om_dp in oms:
        fu, ou = run_compiled_ensemble(
            dc.replace(base, om=om, om_dp=om_dp), states, nseg)
        unis.append((safe_device_get(fu), safe_device_get(ou)))
    return safe_device_get(fs), safe_device_get(os_), unis


print("[1] one MD step: state planes vs uniform folds")
fs, _, unis = folds(nseg=1, sample_freq=1)
for j, (fu, _) in enumerate(unis):
    for name, tol in (("R", 1e-5), ("V", 1e-5), ("psi", 1e-3),
                      ("t_part", 1e-7)):
        d = np.abs(np.asarray(getattr(fs, name)[j])
                   - np.asarray(getattr(fu, name)[j])).max()
        print(f"  member {j} {name:7s} max|diff|={d:.3e} (tol {tol:g})")
        assert d <= tol, (j, name, d)

print("[2] full run: physics-level agreement")
fs, os_, unis = folds(nseg=16, sample_freq=4)
for j, (fu, ou) in enumerate(unis):
    ek_s = np.asarray(os_["ekin"][j]).mean()
    ek_u = np.asarray(ou["ekin"][j]).mean()
    pop_s = np.asarray(os_["pops"][j][-4:]).mean(axis=(0, 1))
    pop_u = np.asarray(ou["pops"][j][-4:]).mean(axis=(0, 1))
    rel_ek = abs(ek_s - ek_u) / abs(ek_u)
    rel_pop = np.abs(pop_s - pop_u).max()
    print(f"  member {j} ekin rel diff {rel_ek:.2%}; "
          f"S/P/D {pop_s.round(4)} vs {pop_u.round(4)} "
          f"(max abs diff {rel_pop:.4f})")
    assert rel_ek < 0.02, rel_ek
    assert rel_pop < 0.02, rel_pop
print("OK: per_lane_om hardware kernel verified (tick-level tight, "
      "run-level physics agreement)")
