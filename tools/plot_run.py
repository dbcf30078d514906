"""Quicklook plots for a job directory's .dat output tree.

Thin shim kept for the older ``python tools/plot_run.py`` invocation —
the implementation lives in :mod:`mdqtplasmasims_tpu.quicklook` and is
also exposed as the ``mdqt plot`` subcommand.

Usage:
    python tools/plot_run.py <job_dir> [-o out.png]

e.g. against the archived production soaks:
    python tools/plot_run.py \
        artifacts/soak/cooling/Ge10*NumIons3500/job1 -o cooling.png
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from mdqtplasmasims_tpu.quicklook import (  # noqa: E402,F401
    C, INK, MUTED, _earliest, _latest, _load, _style, collect_panels,
    main, render)

if __name__ == "__main__":
    main()
