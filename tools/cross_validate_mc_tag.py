"""Cross-validate the MC->QT tagging family against the compiled reference
(MonteCarloFollowedByQTTagging408Quad.cpp with tools/arma_shim.hpp, shrunk
to N=216 / monteCarloSteps=20000 / numPreRecordMDSteps=100 /
numVelAutoCorrsSteps=300; default 408-quad pump: tpump=1e-7 s, det=0,
Om=2).

Usage:
  1. copy the reference file somewhere writable, apply the shrink seds,
     copy arma_shim.hpp to <dir>/include/armadillo and compile:
       g++ -std=c++11 -O2 -fopenmp -I<dir>/include -o ref ref.cpp -lm
  2. ./ref 1 ; ./ref 2 ; ./ref 3
  3. python tools/cross_validate_mc_tag.py <dataSpinTagQuad/Gamma.../>

The default quad pump tags only ~4% of 216 ions (~8/job), so per-job
moments are shot-noise dominated; observables are pooled over 8 jobs
per side (~70 tagged ions), tag-count weighted:
  - pooled tagged-ion <vx^2> at the start of the recording phase (the
    quad pump tags high-|v| ions, so <vx^2>_tagged > 1/Gamma = thermal);
  - pooled tag fraction, recovered from the reference's tagged-only KDE
    integral (each tagged ion contributes 1/6 of unit area after the
    408Quad.cpp normalization, recordTaggedParticleMoments :1068-1140);
  - mean temperature over the collisionless recording phase;
  - normalized VAF curve over the first 200 lags (8-job means).

Round-1 result (8 reference jobs vs 8 framework seeds):
  pooled tagged <vx^2>  0.933 vs 0.886  (selectivity 2.80 vs 2.66x thermal)
  pooled tag fraction   0.0394 vs 0.0405
  mean temperature      0.331 vs 0.333
  VAF (8-job means)     max |diff| 0.001 over 200 lags
"""
import glob
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def ref_job(job_dir):
    mom = np.loadtxt(os.path.join(job_dir, "taggedMoments.dat"))
    temp = np.loadtxt(os.path.join(job_dir, "temperature.dat"))
    vaf = np.loadtxt(os.path.join(job_dir, "VAF.dat"))
    dist = np.loadtxt(sorted(glob.glob(
        os.path.join(job_dir, "vel_distX_timestep*.dat")))[0])
    # KDE integral -> tagged count: each ion's kernel has area
    # sqrt(2*pi)*sigma and the file is divided by 6*sqrt(2*pi)*sigma
    n_tagged = 6.0 * np.trapezoid(dist[:, 1], dist[:, 0])
    return dict(vx2=mom[0, 2], vx4=mom[0, 4], frac=n_tagged / 216.0,
                temp=float(np.mean(temp)), vaf=vaf[:, 1] / vaf[0, 1])


def main(ref_family_dir: str, variant: str = "408quad") -> int:
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    from mdqtplasmasims_tpu.experiments.mc_qt_tagging import (
        MCTagConfig, run)

    refs = [ref_job(d) for d in sorted(
        glob.glob(os.path.join(ref_family_dir, "job*")))]

    mine = []
    for seed in range(1, len(refs) + 1):
        cfg = MCTagConfig(variant=variant, n=216, mc_steps=20000,
                          pre_record_md_steps=100, record_steps=300,
                          job=seed, dtype="float64")
        res = run(cfg)
        vaf = res["vaf"] / res["vaf"][0]
        mine.append(dict(vx2=float(res["moments"][0, 1]),
                         frac=float(res["tags"].mean()),
                         temp=float(res["temps"].mean()), vaf=vaf))

    from mdqtplasmasims_tpu.analysis import weighted_pooled_mean

    def pooled_vx2(xs):  # tag-count-weighted across jobs
        return weighted_pooled_mean([x["vx2"] for x in xs],
                                    [x["frac"] for x in xs])

    ok = True
    vr, vm = pooled_vx2(refs), pooled_vx2(mine)
    print(f"pooled tagged <vx^2>: ref {vr:.3f} vs mine {vm:.3f}")
    ok &= abs(vr - vm) / vr < 0.30   # ~70 tagged ions/side -> ~10% rel std
    fr = np.mean([x["frac"] for x in refs])
    fm = np.mean([x["frac"] for x in mine])
    print(f"pooled tag fraction: ref {fr:.4f} vs mine {fm:.4f}")
    ok &= abs(fr - fm) < max(0.02, 0.3 * fr)
    tr = np.mean([x["temp"] for x in refs])
    tm = np.mean([x["temp"] for x in mine])
    print(f"mean temperature: ref {tr:.3f} vs mine {tm:.3f}")
    ok &= abs(tr - tm) / tr < 0.10
    thermal = 1.0 / 3.0
    print(f"tag selectivity <vx^2>_tag/thermal: "
          f"ref {vr / thermal:.2f} vs mine {vm / thermal:.2f}")
    if variant == "408quad":
        # the quadratic pump specifically selects high-|v| ions
        ok &= vm > 1.1 * thermal

    m_lags = min(min(len(x["vaf"]) for x in refs + mine), 200)
    vref = np.mean([x["vaf"][:m_lags] for x in refs], axis=0)
    vmine = np.mean([x["vaf"][:m_lags] for x in mine], axis=0)
    vd = float(np.abs(vref - vmine).max())
    print(f"normalized VAF max diff (first {m_lags} lags, "
          f"{len(refs)}-job means): {vd:.3f}")
    ok &= vd < 0.15

    print("CROSS-VALIDATION", "PASS" if ok else "FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main(*sys.argv[1:]))
