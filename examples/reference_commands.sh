#!/usr/bin/env bash
# One-to-one migration map: each of the reference's 11 compiled programs
# and how to run the equivalent experiment here.  In the reference every
# parameter change meant editing constants and recompiling (README.md:40-55);
# here everything is a CLI flag, and `--jobs K` replaces the SLURM array
# (sequential in-process, one compile shared across jobs; see
# run_ensemble.sh for the batched-on-chip variant of the cooling family).
#
# All physics defaults (detuning, Rabi frequency, pump window, ...) match
# the constants compiled into the corresponding reference file, so a bare
# invocation reproduces that program's behavior.
set -euo pipefail

# laserCoolingPlusExpansionMDQTSpeedUp.cpp  (flagship; the README's
# N0=3500 / tmax=30 production run — ~8 h there, ~20 s here)
python -m mdqtplasmasims_tpu.cli cooling --n0 3500 --tmax 30 \
    --save-directory dataLaserCool/ --job 1

# LaserCoolingPlusExpansionMDQT.cpp  (pre-SpeedUp generation: same physics
# per README.md:30, plus its interval-VAF and LCCF diagnostics)
python -m mdqtplasmasims_tpu.cli cooling --n0 3500 --tmax 30 \
    --vaf-intervals 3,5,7,9,11,13,15,17,19,21,23,25,27 \
    --record-lccf true --save-directory dataLaserCoolOld/

# laserCoolingPlasmaMagnesium.cpp  (byte-identical duplicate of the
# flagship — verified by diff; same command as the flagship)

# MonteCarloFollowedByMDAndTempAnisotropy.cpp  (classical transport +
# temperature-anisotropy relaxation)
python -m mdqtplasmasims_tpu.cli transport --n 4096 --gamma 3 --kappa 0.5 \
    --save-directory dataTransport/ --jobs 8

# MonteCarloFollowedByQTTagging408Linear.cpp / 408Quad / 422Linear
python -m mdqtplasmasims_tpu.cli mc-tag --variant 408linear --jobs 8 \
    --save-directory dataSpinTagLin/
python -m mdqtplasmasims_tpu.cli mc-tag --variant 408quad --jobs 8 \
    --save-directory dataSpinTagQuad/
python -m mdqtplasmasims_tpu.cli mc-tag --variant 422linear --jobs 8 \
    --save-directory dataSpinTag422/

# randomFrozenStartTag408Linear.cpp / 408Quad / 422Linear
python -m mdqtplasmasims_tpu.cli frozen-tag --variant 408linear --jobs 8 \
    --save-directory data408/
python -m mdqtplasmasims_tpu.cli frozen-tag --variant 408quad --jobs 8 \
    --save-directory data408quad/
python -m mdqtplasmasims_tpu.cli frozen-tag --variant 422linear --jobs 8 \
    --save-directory data422/

# laserCoolNoPlasmaThreeState.cpp  (free-ion 3-level Doppler cooling demo)
python -m mdqtplasmasims_tpu.cli three-state --detuning -0.5 --om 0.5 \
    --save-directory dataThreeState/
