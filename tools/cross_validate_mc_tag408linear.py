"""End-to-end cross-validation of the MC->QT 408-*Linear* tagging family
against the compiled reference — the last row of the 11/11 matrix
(VERDICT r2 item 5: MonteCarloFollowedByQTTagging408Linear.cpp was only
covered transitively, its coupling table via frozen-408Linear and its
pipeline via 408Quad).

Automates what the 408Quad validation did by hand: patch the reference
source to the shrunken test configuration (N=216, monteCarloSteps=20000,
numPreRecordMDSteps=100, numVelAutoCorrsSteps=300 — same shrink as
tools/cross_validate_mc_tag.py), compile it against the minimal Armadillo
drop-in (tools/arma_shim.hpp), run 8 jobs, then pool-compare with 8
framework seeds via cross_validate_mc_tag.main(variant="408linear").
Pump parameters stay the reference's own: tpump=2e-7 s, det=-2.5,
Om=0.7 (MonteCarloFollowedByQTTagging408Linear.cpp:85-87), which are
also the framework's VARIANT_DEFAULTS["408linear"].

Usage:  python tools/cross_validate_mc_tag408linear.py [workdir] [njobs]
(~20-40 min on one CPU core for the 8 reference jobs)
"""

import glob
import os
import re
import shutil
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF = "/root/reference/MonteCarloFollowedByQTTagging408Linear.cpp"
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def patch_source(dst: str, save_dir: str) -> None:
    src = open(REF).read()
    subs = [
        (r"const int N = 4096;", "const int N = 216;"),
        (r"const double monteCarloSteps = 100000;",
         "const double monteCarloSteps = 20000;"),
        (r"const int numPreRecordMDSteps = 200;",
         "const int numPreRecordMDSteps = 100;"),
        (r"const int numVelAutoCorrsSteps = 1500;",
         "const int numVelAutoCorrsSteps = 300;"),
        (r'char saveDirectory\[256\] = "data408/";',
         f'char saveDirectory[256] = "{save_dir}/";'),
    ]
    for pat, rep in subs:
        src, n = re.subn(pat, rep, src)
        assert n == 1, pat
    open(dst, "w").write(src)


def main(workdir: str = "/tmp/xval_mctag408lin", njobs: int = 8) -> int:
    njobs = int(njobs)
    shutil.rmtree(workdir, ignore_errors=True)
    os.makedirs(workdir, exist_ok=True)
    shim = os.path.join(workdir, "shim")
    os.makedirs(shim, exist_ok=True)
    shutil.copy(os.path.join(REPO, "tools", "arma_shim.hpp"),
                os.path.join(shim, "armadillo"))
    patch_source(os.path.join(workdir, "ref408lin.cpp"), "data408")
    binary = os.path.join(workdir, "ref408lin")
    subprocess.run(["g++", "-std=c++11", "-fopenmp", "-O2", "-I", shim,
                    "-o", binary, os.path.join(workdir, "ref408lin.cpp"),
                    "-lm"], check=True)
    for job in range(1, njobs + 1):
        subprocess.run([binary, str(job)], cwd=workdir, check=True,
                       timeout=3600)
        print(f"reference job {job}/{njobs} done", flush=True)

    fams = glob.glob(os.path.join(workdir, "data408", "*"))
    assert len(fams) == 1, fams
    from cross_validate_mc_tag import main as compare
    return compare(fams[0], variant="408linear")


if __name__ == "__main__":
    sys.exit(main(*sys.argv[1:]))
