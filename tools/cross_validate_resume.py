"""Checkpoint interop proof: resume the *compiled reference binary* from a
framework-written checkpoint, and resume the framework from a
reference-written one (VERDICT round-1 item 3).

The reference's walltime-window chaining (README.md:51-53) restarts with
``newRun=0, c0=<last timestep>`` and reads ions_/conditions_/wvFns_/VZERO_
via fscanf (laserCoolingPlusExpansionMDQTSpeedUp.cpp:785-916, time formula
t=(c0-9)*TIMESTEP+0.02 at :789).  This script proves the framework's ASCII
state API is binary-compatible in BOTH directions:

  A. framework run to t=1  ->  reference binary (newRun=0, c0=499)
     continues to t=2 in the same job directory;
  B. reference binary run to t=1 (newRun=1)  ->  framework resume_state()
     continues to t=2.

Both splices are checked for total-energy continuity (same microstate
across the boundary, so the energy must match at the few-permille level of
one output interval's drift) and for live wavefunctions after the splice
(P/D populations nonzero -> the wvFns_ fscanf really parsed our files).

Usage:  python tools/cross_validate_resume.py [workdir]
(compiles the reference with tools/arma_shim.hpp; ~5 min on CPU)
"""

import glob
import os
import re
import shutil
import subprocess
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF = "/root/reference/laserCoolingPlusExpansionMDQTSpeedUp.cpp"
sys.path.insert(0, REPO)

N0, TMAX1, TMAX2, SAMPLE_FREQ, TIMESTEP = 256, 1.0, 2.0, 10, 0.002


def patch_source(dst: str, *, new_run: int, c0: int, tmax: float,
                 save_dir: str) -> None:
    src = open(REF).read()
    subs = [
        (r"#define N0 3500", f"#define N0 {N0}"),
        (r"#define tmax 30", f"#define tmax {tmax:g}"),
        (r"int sampleFreq = 40;", f"int sampleFreq = {SAMPLE_FREQ};"),
        (r"int newRun = 1;", f"int newRun = {new_run};"),
        (r"int c0 = 0;", f"int c0 = {c0};"),
        (r'char saveDirectory\[256\] = "dataLaserCool/";',
         f'char saveDirectory[256] = "{save_dir}/";'),
    ]
    for pat, rep in subs:
        src, n = re.subn(pat, rep, src)
        assert n == 1, pat
    open(dst, "w").write(src)


def compile_ref(workdir: str, name: str) -> str:
    shim = os.path.join(workdir, "shim")
    os.makedirs(shim, exist_ok=True)
    shutil.copy(os.path.join(REPO, "tools", "arma_shim.hpp"),
                os.path.join(shim, "armadillo"))
    out = os.path.join(workdir, name)
    subprocess.run(["g++", "-std=c++11", "-fopenmp", "-O2", "-I", shim,
                    "-o", out, os.path.join(workdir, name + ".cpp"), "-lm"],
                   check=True)
    return out


def etot(rows: np.ndarray) -> np.ndarray:
    return rows[:, 1:4].sum(1) + rows[:, 4]


def load_energies(path: str) -> np.ndarray:
    return np.loadtxt(path).reshape(-1, 7)


def splice_ok(e: np.ndarray, n_first_leg: int, label: str) -> bool:
    """Energy continuity across the resume boundary: compare the jump at
    the splice to the typical per-interval energy change around it."""
    tot = etot(e)
    jump = abs(tot[n_first_leg] - tot[n_first_leg - 1])
    steps = np.abs(np.diff(tot))
    typical = np.median(steps[max(0, n_first_leg - 10):n_first_leg + 10])
    rel = jump / max(tot[n_first_leg - 1], 1e-12)
    print(f"  {label}: splice jump {jump:.3e} ({rel * 100:.2f}% of Etot), "
          f"typical interval step {typical:.3e}")
    # the boundary must look like any other sample interval (allow 5x for
    # stochastic variation) and never a discontinuity in Etot
    return jump < 5 * typical + 1e-12 and rel < 0.05


def pops_alive(job_dir: str, first_k: int) -> bool:
    """P/D populations nonzero in the first post-splice snapshot -> the
    binary (or framework) really parsed the wavefunction checkpoint."""
    f = os.path.join(job_dir, f"statePopulationsVsVTime{first_k:06d}.dat")
    p = np.loadtxt(f)
    pd = float(p[:, 2:4].mean())
    print(f"  first post-splice P+D population: {pd:.4f}")
    return pd > 1e-3


def direction_a(workdir: str) -> bool:
    """Framework writes the checkpoint; the reference binary resumes."""
    print("direction A: framework -> reference binary")
    from mdqtplasmasims_tpu.experiments.laser_cooling import (CoolingConfig,
                                                              run, _save_dir)
    base = os.path.join(workdir, "dataA")
    cfg = CoolingConfig(n0=N0, tmax=TMAX1, sample_freq=SAMPLE_FREQ,
                        use_pallas=False, dtype="float64",
                        save_directory=base)
    run(cfg)
    job_dir = _save_dir(cfg)
    n_rows1 = load_energies(os.path.join(job_dir, "energies.dat")).shape[0]
    c0 = int(round(TMAX1 / TIMESTEP)) - 1          # framework writes n_md-1
    assert os.path.exists(os.path.join(job_dir,
                                       f"conditions_timestep{c0:06d}.dat"))

    patch_source(os.path.join(workdir, "refresume.cpp"), new_run=0, c0=c0,
                 tmax=TMAX2, save_dir="dataA")
    binary = compile_ref(workdir, "refresume")
    subprocess.run([binary, "1"], cwd=workdir, check=True, timeout=1800)

    e = load_energies(os.path.join(job_dir, "energies.dat"))
    print(f"  rows: {n_rows1} (framework) + {e.shape[0] - n_rows1} "
          f"(reference continuation)")
    ok = e.shape[0] > n_rows1 + 10
    # reference time reconstruction lands where the framework stopped
    ok &= abs(e[n_rows1, 0] - (TMAX1 + SAMPLE_FREQ * TIMESTEP)) < 0.05
    ok &= splice_ok(e, n_rows1, "A")
    # counter restored from ions_: snapshot numbering continues
    first_k = n_rows1
    ok &= pops_alive(job_dir, first_k)
    return bool(ok)


def direction_b(workdir: str) -> bool:
    """The reference binary writes the checkpoint; the framework resumes."""
    print("direction B: reference binary -> framework")
    from mdqtplasmasims_tpu.experiments.laser_cooling import (
        CoolingConfig, resume_state, run, write_outputs)
    patch_source(os.path.join(workdir, "reffresh.cpp"), new_run=1, c0=0,
                 tmax=TMAX1, save_dir="dataB")
    binary = compile_ref(workdir, "reffresh")
    subprocess.run([binary, "1"], cwd=workdir, check=True, timeout=1800)

    job_dirs = glob.glob(os.path.join(workdir, "dataB", "*", "job1"))
    assert len(job_dirs) == 1, job_dirs
    job_dir = job_dirs[0]
    ions = glob.glob(os.path.join(job_dir, "ions_timestep*.dat"))
    c0 = max(int(re.search(r"(\d{6})", os.path.basename(f)).group(1))
             for f in ions)
    e_ref = load_energies(os.path.join(job_dir, "energies.dat"))
    n_rows1 = e_ref.shape[0]

    cfg = CoolingConfig(n0=N0, tmax=TMAX2 - TMAX1, sample_freq=SAMPLE_FREQ,
                        use_pallas=False, dtype="float64")
    state = resume_state(job_dir, c0, cfg)
    n_ions = state.R.shape[0]
    print(f"  resumed N={n_ions} ions at t={float(state.t):.4f} "
          f"(c0={c0})")
    assert abs(float(state.t) - TMAX1) < 0.05
    final, res = run(cfg, state=state)
    # append the continuation rows the way a chained framework window would
    n_md_total = int(round(TMAX2 / TIMESTEP))
    write_outputs(job_dir, cfg, res["outs"], res["epot0"], final,
                  n_md_total, sample_offset=n_rows1)
    e = load_energies(os.path.join(job_dir, "energies.dat"))
    print(f"  rows: {n_rows1} (reference) + {e.shape[0] - n_rows1} "
          f"(framework continuation)")
    ok = e.shape[0] > n_rows1 + 10
    ok &= splice_ok(e, n_rows1, "B")
    # the resumed wavefunctions must keep evolving: P/D occupied at the end
    pops = np.abs(np.asarray(final.psi)) ** 2
    pd = float(pops[:, 2:].sum(1).mean())
    print(f"  final P+D population (framework leg): {pd:.4f}")
    ok &= pd > 1e-3
    return bool(ok)


def main(workdir: str = "/tmp/xval_resume") -> int:
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    shutil.rmtree(workdir, ignore_errors=True)
    os.makedirs(workdir, exist_ok=True)
    ok_a = direction_a(workdir)
    ok_b = direction_b(workdir)
    print("RESUME INTEROP", "PASS" if (ok_a and ok_b) else "FAIL",
          f"(A={ok_a}, B={ok_b})")
    return 0 if (ok_a and ok_b) else 1


if __name__ == "__main__":
    sys.exit(main(*sys.argv[1:]))
