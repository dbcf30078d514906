"""Device-mesh helpers.

The framework's parallelism axes (SURVEY.md section 2) are

* ``ens``  — independent stochastic realizations (the reference's SLURM job
  array, exampleSlurmFile.slurm:3); pure data parallelism, no collectives
  except diagnostic averaging.
* ``ions`` — sharding of the ion axis for the O(N^2) force kernel; requires
  one ``all_gather`` of positions per force refresh over ICI.

Single chip (the reference-parity mode) is mesh (1, 1) with no collectives.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
from jax.sharding import Mesh, PartitionSpec as P

ENS_AXIS = "ens"
ION_AXIS = "ions"


def factor_devices(n: int, max_ion_shards: int = 4) -> Tuple[int, int]:
    """Split n devices into (ens, ions).  Ensemble parallelism is perfectly
    scalable (no collectives), so the ion axis — which pays one all_gather
    per force refresh and only wins for large N — takes the *smallest*
    non-trivial factor (capped at max_ion_shards) and the ensemble axis
    gets everything else; e.g. 8 -> (ens=4, ions=2).  Pass an explicit
    split to make_mesh for a different policy (ions=1 maximizes
    throughput when every member fits on one chip)."""
    ions = 1
    for cand in range(2, min(max_ion_shards, n) + 1):
        if n % cand == 0:
            ions = cand
            break
    return n // ions, ions


def make_mesh(n_ens: Optional[int] = None, n_ions: int = 1,
              devices=None) -> Mesh:
    import numpy as np
    devices = devices if devices is not None else jax.devices()
    if n_ens is None:
        n_ens = len(devices) // n_ions
    grid = np.asarray(devices[:n_ens * n_ions]).reshape(n_ens, n_ions)
    return Mesh(grid, (ENS_AXIS, ION_AXIS))


def state_pspec():
    """PartitionSpec pytree for a batched SimState [E, N, ...]."""
    from ..state import SimState
    return SimState(
        R=P(ENS_AXIS, ION_AXIS), V=P(ENS_AXIS, ION_AXIS),
        F=P(ENS_AXIS, ION_AXIS), psi=P(ENS_AXIS, ION_AXIS),
        t_part=P(ENS_AXIS, ION_AXIS), key=P(ENS_AXIS, ION_AXIS),
        tick=P(ENS_AXIS), t=P(ENS_AXIS))
