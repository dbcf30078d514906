"""Ensemble + ion-sharded execution over a device mesh.

Replaces the reference's share-nothing SLURM job array
(exampleSlurmFile.slurm) with a single SPMD program: trajectories are
batched on the ``ens`` mesh axis (vmap within a device, shard_map across
devices) and the ion axis may additionally be sharded for the O(N^2) force
kernel, with one ``all_gather`` of positions over ICI per force refresh.

RNG: every (job, ion-shard) pair gets an independent threefry key via
nested ``jax.random.split`` (``shard_keys``: base -> per-job -> per-shard)
— replacing (and fixing) the reference's ``srand48(time+job)`` plus
unseeded ``std::random_device`` (SURVEY.md L4).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..state import SimState
from ..core.scheduler import CoolingScheduler, fold_sweep_lanes
from ..ops.yukawa import yukawa_forces_potential
from .mesh import ENS_AXIS, ION_AXIS, state_pspec


def batched_initial_states(init_one: Callable[[jax.Array], SimState],
                           keys: jax.Array) -> SimState:
    """vmap an initializer over per-job keys -> SimState with leading E."""
    return jax.vmap(init_one)(keys)


def sharded_forces_fn(L: float, ldeb: float, chunk: int = 512):
    """Row-sharded force evaluation: gather the global positions over the
    ion axis, compute this shard's force rows locally."""

    def fn(R_local):
        R_full = jax.lax.all_gather(R_local, ION_AXIS, axis=0, tiled=True)
        return yukawa_forces_potential(R_local, L, ldeb, chunk=chunk,
                                       cols=R_full)
    return fn


def ring_forces_fn(L: float, ldeb: float, axis: str = ION_AXIS,
                   chunk: int = 512):
    """Ring-permute force evaluation for very large N: instead of
    all-gathering the global positions (memory O(N) per chip), circulate
    position blocks around the ICI ring with ``ppermute`` and accumulate
    partial row forces — the blockwise/ring-attention idea applied to the
    N x N pair interaction (SURVEY.md section 5, long-context analog).
    Peak per-chip memory is O(N/k); bandwidth rides the ring."""

    def fn(R_local):
        k = jax.lax.axis_size(axis)
        n_loc = R_local.shape[0]
        perm = [(i, (i + 1) % k) for i in range(k)]

        def body(i, carry):
            F, pot, buf = carry
            Fi, poti = yukawa_forces_potential(R_local, L, ldeb, chunk=chunk,
                                               cols=buf)
            buf = jax.lax.ppermute(buf, axis, perm)
            return F + Fi, pot + poti, buf

        F0 = jnp.zeros_like(R_local)
        pot0 = jnp.zeros_like(R_local[:, 0])
        F, pot, _ = jax.lax.fori_loop(0, k, body, (F0, pot0, R_local))
        return F, pot
    return fn


def make_sharded_md_step(scheduler_factory: Callable[[Callable], "CoolingScheduler"],
                         mesh: Mesh, L: float, ldeb: float,
                         forces: str = "gather"):
    """Build a jitted [E, N, ...] SimState -> SimState step over the mesh.

    ``scheduler_factory(forces_fn)`` returns a scheduler whose ``md_step``
    advances one single-system state; it is vmapped over the local ensemble
    block inside shard_map.  ``forces`` picks the cross-shard force path:
    ``"gather"`` (one all_gather of positions per refresh) or ``"ring"``
    (ppermute circulation, O(N/k) peak memory per chip — for huge N).
    """
    if forces not in ("gather", "ring"):
        raise ValueError(f"forces must be 'gather' or 'ring', got "
                         f"{forces!r}")
    fn = (ring_forces_fn(L, ldeb) if forces == "ring"
          else sharded_forces_fn(L, ldeb))
    sched = scheduler_factory(fn)
    spec = state_pspec()

    def local_step(state: SimState) -> SimState:
        # state leaves are local blocks [E_loc, N_loc, ...]; key is
        # [E_loc, 1] typed keys (one per (ens, ion-shard)); tick/t: [E_loc].
        def one(member: SimState) -> SimState:
            member = member._replace(key=member.key[0])
            out = sched.md_step(member)
            return out._replace(key=out.key[None])
        return jax.vmap(one)(state)

    step = shard_map(local_step, mesh=mesh, in_specs=(spec,), out_specs=spec)
    return jax.jit(step)


def ring_n3l_fused_forces(sched: "CoolingScheduler", ldeb: float,
                          e_loc: int, npad: int, mrows: jax.Array,
                          axis: str = ION_AXIS):
    """Cross-shard Newton's-third-law force schedule for the ion-sharded
    fused path: each unordered tile pair is evaluated ONCE and the
    reaction rows ride the ring back to their owner shard — where the
    gather path (yukawa_forces_soa_cols_batched against an all_gather of
    the global positions) pays both ordered halves of every cross-shard
    pair (~2x the pair math at large shard counts).

    Schedule (the classic half-ring force decomposition): shard m's own
    block pairs run the triangle-enumerated half-pair kernel locally; a
    (positions, mask, reaction-accumulator) buffer then circulates the
    ring via ``ppermute``.  At hop s, shard m holds the block of shard
    (m - s) mod I and computes the cross tile once with
    ``yukawa_forces_cross_n3l_soa_batched`` — for hops s <= (I-1)//2
    always, at the antipodal hop of an even ring (s = I/2) only on the
    lower-index shard of each pair (SPMD computes the tile on both and
    masks one — one redundant tile out of I(I+1)/2).  Skipped later hops
    still permute, carrying each accumulator the full I hops home, where
    its reaction rows join the local forces.

    Pair-math per shard: (I+1)/2 block tiles (one of them half) vs the
    gather path's I full tiles — the crossover analysis and the measured
    virtual-mesh A/B live in docs/ROOFLINE.md.  Returns ``soa_forces``
    mapping ``Rp [3, E_loc*npad] -> F [3, E_loc*npad]`` (row-masked, as
    the fused loop requires)."""
    from ..ops.yukawa import (yukawa_forces_cross_n3l_soa_batched,
                              yukawa_forces_n3l_soa_batched)

    def soa_forces(Rp):
        k = jax.lax.axis_size(axis)
        me = jax.lax.axis_index(axis)
        perm = [(i, (i + 1) % k) for i in range(k)]
        F = yukawa_forces_n3l_soa_batched(Rp, mrows, e_loc, sched.L,
                                          ldeb, interpret=sched.interpret)
        cm = (jnp.broadcast_to(mrows, (e_loc, npad))
              if mrows.shape[0] == 1 else mrows)
        row_mask = cm.reshape(1, e_loc * npad)
        if k == 1:
            return F * row_mask
        buf_R = jnp.swapaxes(Rp.reshape(3, e_loc, npad), 0, 2)
        buf_R = jnp.swapaxes(buf_R, 0, 1)                # [E, npad, 3]
        buf_m = cm
        buf_G = jnp.zeros_like(buf_R)
        for s in range(1, k):
            buf_R, buf_m, buf_G = jax.lax.ppermute(
                (buf_R, buf_m, buf_G), axis, perm)
            if s > k // 2:
                continue                 # carry the accumulator home
            Fc, G = yukawa_forces_cross_n3l_soa_batched(
                Rp, mrows, buf_R, buf_m, e_loc, sched.L, ldeb,
                interpret=sched.interpret)
            if k % 2 == 0 and s == k // 2:
                owner = (me - s) % k     # antipodal: compute once/pair
                w = (me < owner).astype(Fc.dtype)
                Fc, G = Fc * w, G * w
            F = F + Fc
            buf_G = buf_G + G
        # one more hop completes the ring: each accumulator returns to
        # the shard that owns its block
        _, _, buf_G = jax.lax.ppermute((buf_R, buf_m, buf_G), axis, perm)
        F = F + jnp.swapaxes(jnp.swapaxes(buf_G, 0, 1), 0, 2).reshape(
            3, e_loc * npad)
        return F * row_mask
    return soa_forces


def fused_local_stepper(sched: "CoolingScheduler", ldeb: float,
                        n_ion_shards: int, ion_forces: str = "gather"):
    """Local (per-device) fused production stepper for shard_map.

    Returns ``local_run(states, n_steps)`` advancing a local ensemble
    block [E_loc, N_loc, ...] by ``n_steps`` multirate MD steps entirely
    on the production kernels: members fold into the fused Pallas
    tick-block kernel's ion axis (core/qt_fused.py) and forces run the
    Pallas half-pair N3L kernel when each member's ions are device-local
    (``n_ion_shards == 1``, the production ensemble layout), or the
    full-tile rows x cols kernel against an ``all_gather`` of the
    member's global positions when the ion axis is sharded (large-N
    layout; the reaction half of each pair lives on another shard).
    Pallas interpret mode (``sched.interpret``) makes the same program
    run on the CPU mesh for tests and the driver dry run.

    RNG: per-member rolls (or in-kernel PRNG streams) come from each
    member's own key, so trajectories are invariant to how the ensemble
    axis is laid out across devices.

    ``local_run(states, n_steps, mask=None, sweep_e0=None)``: the
    optional local ``mask [E_loc, N_loc]`` marks each member's real ions
    (Poissonian-N fold); masked lanes are kept exactly inert —
    row-masked forces on every path and source masking via the kernels'
    mask columns.  ``sweep_e0 [E_loc, S]`` gives each local member its
    own diagonal energies (detuning sweep; requires a spec with
    ``per_lane_e0``).

    ``split_last=True`` splits the LAST MD step at the reference's
    output instant — one quantum tick in
    (laserCoolingPlusExpansionMDQTSpeedUp.cpp:1365-1368) — and returns
    ``(states_mid, states_end)`` so the sharded sampler sees the exact
    state the reference's output() sees."""
    from ..ops.yukawa import (yukawa_forces_n3l_soa,
                              yukawa_forces_n3l_soa_batched,
                              yukawa_forces_soa_cols_batched)
    if ion_forces not in ("gather", "ring_n3l"):
        raise ValueError(f"ion_forces must be 'gather' or 'ring_n3l', "
                         f"got {ion_forces!r}")

    def local_run(states: SimState, n_steps: int, mask=None,
                  sweep_e0=None, sweep_om=None, split_last: bool = False):
        E_loc, n_loc = states.R.shape[0], states.R.shape[1]
        npad = sched._npad(n_loc)
        if mask is None:
            mrows = jnp.zeros((1, npad),
                              jnp.float32).at[0, :n_loc].set(1.0)
        else:
            mrows = jnp.zeros((E_loc, npad), jnp.float32).at[
                :, :n_loc].set(mask.astype(jnp.float32))
        if n_ion_shards == 1:
            if E_loc == 1 and mask is None:
                # one member per device: the unbatched half-pair kernel
                # skips the reaction buffer's ensemble dim (measured
                # equal-rate to the single-chip path: 10.9 us/tick at
                # N0=3500 — tools/bench_sharded.py)
                soa_forces = lambda Rp: yukawa_forces_n3l_soa(
                    Rp, mrows, sched.L, ldeb,
                    interpret=sched.interpret)
            else:
                soa_forces = lambda Rp: yukawa_forces_n3l_soa_batched(
                    Rp, mrows, E_loc, sched.L, ldeb,
                    interpret=sched.interpret)
        elif ion_forces == "ring_n3l":
            soa_forces = ring_n3l_fused_forces(sched, ldeb, E_loc, npad,
                                               mrows)
        else:
            cm = (jnp.broadcast_to(mrows, (E_loc, npad))
                  if mrows.shape[0] == 1 else mrows)
            col_mask = jax.lax.all_gather(cm, ION_AXIS, axis=1,
                                          tiled=True)   # [E, I*npad]
            row_mask = cm.reshape(E_loc * npad)

            def soa_forces(Rp):
                R3 = jnp.swapaxes(Rp.reshape(3, E_loc, npad), 0, 1)
                cols = jax.lax.all_gather(jnp.swapaxes(R3, 1, 2),
                                          ION_AXIS, axis=1, tiled=True)
                F = yukawa_forces_soa_cols_batched(
                    Rp, cols, col_mask, E_loc, sched.L, ldeb,
                    interpret=sched.interpret)
                # the full-tile kernel has no row mask: zero padded/masked
                # row lanes so they stay inert as they feed back
                return F * row_mask[None, :]

        e0p, omp = fold_sweep_lanes(sched.fused_spec, npad,
                                    sweep_e0=sweep_e0, sweep_om=sweep_om)
        local = states._replace(key=states.key[:, 0])
        carry = sched.soa_ens_init(local, local.F)
        n_full = n_steps - 1 if split_last else n_steps
        carry = jax.lax.fori_loop(
            0, n_full,
            lambda i, c: sched.soa_ens_md_step(c, soa_forces,
                                               per_member_rolls=True,
                                               e0_lanes=e0p,
                                               om_lanes=omp),
            carry)
        if not split_last:
            out = sched.soa_ens_restore(carry, local)
            return out._replace(key=out.key[:, None])
        carry = sched.soa_ens_md_step(carry, soa_forces,
                                      per_member_rolls=True,
                                      e0_lanes=e0p, om_lanes=omp,
                                      n_ticks=1)
        mid = sched.soa_ens_restore(carry, local)
        if sched.ratio > 1:
            carry = sched.soa_ens_md_step(carry, soa_forces,
                                          per_member_rolls=True,
                                          e0_lanes=e0p, om_lanes=omp,
                                          n_ticks=sched.ratio - 1,
                                          reuse_forces=True)
        out = sched.soa_ens_restore(carry, local)
        return (mid._replace(key=mid.key[:, None]),
                out._replace(key=out.key[:, None]))
    return local_run


def make_sharded_fused_step(sched: "CoolingScheduler", ldeb: float,
                            mesh: Mesh, n_steps: int = 1, with_mask=False,
                            ion_forces: str = "gather"):
    """Jitted sharded [E, N, ...] SimState -> SimState over ``n_steps``
    MD steps on the fused production path (see fused_local_stepper).
    ``sched`` must carry a ``fused_spec``.  With ``with_mask`` the step
    takes ``(states, mask [E, N])`` for Poissonian-N members.
    ``ion_forces``: cross-shard force schedule when the ion axis is
    sharded — ``"gather"`` (all_gather + full-tile) or ``"ring_n3l"``
    (each pair once, reactions ppermuted home)."""
    if sched.fused_spec is None:
        raise ValueError("make_sharded_fused_step needs a scheduler with "
                         "a fused_spec (build with use_pallas=True or "
                         "fused_interpret=True)")
    spec = state_pspec()
    local = fused_local_stepper(sched, ldeb, mesh.shape[ION_AXIS],
                                ion_forces=ion_forces)
    # check_vma=False: pallas_call does not yet annotate its outputs with
    # varying-mesh-axes metadata, so the vma checker rejects any Pallas
    # kernel inside shard_map
    if with_mask:
        step = shard_map(lambda s, m: local(s, n_steps, mask=m),
                         mesh=mesh,
                         in_specs=(spec, P(ENS_AXIS, ION_AXIS)),
                         out_specs=spec, check_vma=False)
    else:
        step = shard_map(lambda s: local(s, n_steps), mesh=mesh,
                         in_specs=(spec,), out_specs=spec,
                         check_vma=False)
    return jax.jit(step)


def shard_keys(base_key: jax.Array, n_ens: int, n_ion_shards: int) -> jax.Array:
    """[E, I] typed keys: independent stream per (job, ion shard)."""
    ens_keys = jax.random.split(base_key, n_ens)

    def per_ens(k):
        return jax.random.split(k, n_ion_shards)
    return jax.vmap(per_ens)(ens_keys)


def member_sharded(fn, mesh):
    """Multi-chip form of a batched job array for the share-nothing
    families (transport, tagging, 3-state toy): wrap an [E]-batched
    member function — every input and output pytree leaf carries the
    member axis leading — so members shard over the mesh's ``ens`` axis.
    Pure data parallelism, zero collectives (SURVEY.md §2 parallelism
    axis 2: the reference's SLURM array, spread over chips).

    These families keep whole members on one device (their production N
    fits comfortably), so a mesh with an ion axis would only replicate
    work; ask for ``make_mesh(n_ions=1)`` instead."""
    if ION_AXIS in mesh.shape and mesh.shape[ION_AXIS] != 1:
        raise ValueError(
            "member_sharded shards members only; use make_mesh(n_ions=1) "
            f"(got {mesh.shape[ION_AXIS]} ion shards)")
    n_ens = mesh.shape[ENS_AXIS]
    spec = P(ENS_AXIS)

    def wrapped(*args):
        e = jax.tree.leaves(args[0])[0].shape[0]
        if e % n_ens:
            raise ValueError(f"{e} members do not divide over "
                             f"{n_ens} ens-axis devices")
        # check_vma=False: scan carries inside the pipelines start as
        # replicated constants and become varying when combined with the
        # sharded member data (same waiver as make_sharded_fused_step)
        return shard_map(fn, mesh=mesh, in_specs=(spec,) * len(args),
                         out_specs=spec, check_vma=False)(*args)

    return wrapped
