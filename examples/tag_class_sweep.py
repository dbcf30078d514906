"""Map the tagged velocity class across a pump-detuning grid — the
whole sweep in ONE batched dispatch.

The randomFrozenStartTag family exists to tag a velocity class with an
optical pump and watch it relax (SURVEY.md 3.4); which class gets
tagged is set by the pump detuning, a compile-time constant of each
reference binary (randomFrozenStartTag422Linear.cpp:55-57) — so mapping
class vs detuning costs the reference one rebuild + SLURM array per
point.  Here the pump Hamiltonian is linear in (detuning, om), so each
grid point is one more batched member carrying traced Hamiltonian
tables (core/qt.sweep_qt_params), and the tagged-class curve comes from
one program: the projectively-measured spin-up ions' mean velocity
<vx> moves antisymmetrically with detuning (the Doppler-selected class
sits at u = v + det = 0), crossing zero on resonance.

Usage: python examples/tag_class_sweep.py [outdir]

Typical output (CPU f32, N0=512, jobs_per_point=2, ~56 s): tagged <vx>
runs +0.18 / +0.27 / +0.01 / -0.27 / -0.17 (plasma units) for
det = -2..+2 — antisymmetric, peaking at |det|=1 where the selected
class still sits on the thermal bulk — with the spin-up fraction
dipping at resonance: the velocity-class map at one-dispatch cost.
"""
import sys
import time

from mdqtplasmasims_tpu.analysis import sweep_table
from mdqtplasmasims_tpu.experiments.frozen_tagging import (FrozenTagConfig,
                                                           run_sweep)

OUT = sys.argv[1] if len(sys.argv) > 1 else None
DETS = [-2.0, -1.0, 0.0, 1.0, 2.0]

cfg = FrozenTagConfig(variant="422linear", n0=512, tstart=2.0, tmax=6.0,
                      timestep=0.01, sample_freq=40, tpump_seconds=3e-7,
                      save_directory=OUT)
t0 = time.perf_counter()
results, member_cfgs = run_sweep(cfg, [{"detuning": d} for d in DETS],
                                 jobs_per_point=2, seed=1)
wall = time.perf_counter() - t0

vx_rows = sweep_table(member_cfgs,
                      [r["out_tag"]["moments"][0] for r in results],
                      keys=("detuning",))
frac_rows = sweep_table(member_cfgs,
                        [r["spin_up"].mean() for r in results],
                        keys=("detuning",))
print(f"{len(DETS)} detuning points x 2 jobs in one batched program, "
      f"{wall:.1f} s wall")
print(f"{'det':>6s} {'tagged <vx>':>14s} {'spin-up frac':>14s}")
for vr, fr in zip(vx_rows, frac_rows):
    print(f"{vr['detuning']:+6.1f} {vr['mean']:+9.4f} +-{vr['sd']:5.4f} "
          f"{fr['mean']:9.3f} +-{fr['sd']:5.3f}")
