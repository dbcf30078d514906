"""Force/potential kernel validation against brute-force numpy."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mdqtplasmasims_tpu.ops.yukawa import (
    yukawa_forces, yukawa_forces_potential, yukawa_potential)
from mdqtplasmasims_tpu.units import PlasmaUnits


def brute_force(R, L, ldeb, mask=None):
    d = R[:, None, :] - R[None, :, :]
    d -= L * np.round(d / L)
    r = np.sqrt((d ** 2).sum(-1))
    valid = (r > 0) & (r < L / 2)
    if mask is not None:
        valid = valid & (mask[None, :] > 0)
    rs = np.where(valid, r, 1.0)
    ft = np.where(valid, (1 / rs + 1 / ldeb) * np.exp(-rs / ldeb) / rs ** 2, 0.0)
    F = (d * ft[:, :, None]).sum(1)
    pot = np.where(valid, np.exp(-rs / ldeb) / rs, 0.0).sum(1)
    if mask is not None:
        F = F * mask[:, None]
        pot = pot * mask
    return F, pot


@pytest.fixture(scope="module")
def system():
    n0 = 300
    pu = PlasmaUnits(density=2.0, Ge=0.1)
    L = PlasmaUnits.box_length(n0)
    rng = np.random.default_rng(42)
    R = rng.uniform(0, L, (n0, 3))
    return R, L, pu.debye_length


def test_forces_match_numpy(system):
    R, L, ldeb = system
    F_np, pot_np = brute_force(R, L, ldeb)
    F, pot = yukawa_forces_potential(jnp.asarray(R), L, ldeb, chunk=128)
    assert np.abs(np.array(F) - F_np).max() < 1e-10
    assert np.abs(np.array(pot) - pot_np).max() < 1e-10


def test_potential_scalar(system):
    R, L, ldeb = system
    _, pot_np = brute_force(R, L, ldeb)
    ep = float(yukawa_potential(jnp.asarray(R), L, ldeb))
    assert ep == pytest.approx(pot_np.sum() / 2 / R.shape[0], rel=1e-12)


def test_newton_third_law(system):
    """Total force vanishes (the reference's racy scatter violates this
    nondeterministically; ours is exact)."""
    R, L, ldeb = system
    F = np.array(yukawa_forces(jnp.asarray(R), L, ldeb))
    assert np.abs(F.sum(0)).max() < 1e-9


def test_mask(system):
    R, L, ldeb = system
    n = R.shape[0]
    mask = np.ones(n)
    mask[n // 2:] = 0.0
    F_np, _ = brute_force(R, L, ldeb, mask)
    F = np.array(yukawa_forces(jnp.asarray(R), L, ldeb,
                               mask=jnp.asarray(mask), chunk=128))
    assert np.abs(F - F_np).max() < 1e-10
    assert np.abs(F[n // 2:]).max() == 0.0


def test_uneven_chunking(system):
    R, L, ldeb = system
    F_a = np.array(yukawa_forces(jnp.asarray(R), L, ldeb, chunk=128))
    F_b = np.array(yukawa_forces(jnp.asarray(R), L, ldeb, chunk=77))
    assert np.abs(F_a - F_b).max() < 1e-10


def test_n3l_kernel_interpret(system):
    """Half-pair Pallas kernel (interpret mode) matches the XLA path,
    including the padded-lane handling (n=300 is not a tile multiple)."""
    from mdqtplasmasims_tpu.ops.yukawa import yukawa_forces_n3l_pallas
    R, L, ldeb = system
    Rj = jnp.asarray(R, jnp.float32)
    F_ref = np.array(yukawa_forces(Rj, L, ldeb, chunk=128))
    F = np.array(yukawa_forces_n3l_pallas(Rj, L, ldeb, tile=128,
                                          interpret=True))
    scale = np.abs(F_ref).max()
    assert np.abs(F - F_ref).max() < 2e-5 * scale
    assert np.abs(F.sum(0)).max() < 2e-5 * scale


@pytest.mark.parametrize("n", [120, 250, 480, 640, 1600, 2000])
def test_n3l_triangle_schedule(n):
    """The triangle-enumerated half-pair schedule must cover every
    unordered tile pair exactly once across grid sizes (nt = 1, 2, 4, 5,
    13, 16 at tile=128), including the single-tile and even/odd cases."""
    from mdqtplasmasims_tpu.ops.yukawa import (yukawa_forces,
                                               yukawa_forces_n3l_pallas)
    pu = PlasmaUnits(density=2.0, Ge=0.1)
    L = PlasmaUnits.box_length(n)
    rng = np.random.default_rng(n)
    Rj = jnp.asarray(rng.uniform(0, L, (n, 3)), jnp.float32)
    F_ref = np.array(yukawa_forces(Rj, L, pu.debye_length, chunk=128))
    F = np.array(yukawa_forces_n3l_pallas(Rj, L, pu.debye_length,
                                          tile=128, interpret=True))
    scale = np.abs(F_ref).max()
    assert np.abs(F - F_ref).max() < 2e-5 * scale


def test_soa_force_tile_divides_qt_padding():
    """The SoA loop pads with the QT tile (512/896/1024/1792/3584 per
    core.scheduler.auto_qt_tile); the auto force tile must divide every
    such npad — regression for the n0=600 (npad=896) trace crash."""
    from mdqtplasmasims_tpu.core.scheduler import auto_qt_tile
    from mdqtplasmasims_tpu.ops.yukawa import soa_force_tile
    for n in (64, 300, 600, 1000, 3500, 6000, 14000, 56000):
        t = auto_qt_tile(n)
        npad = -(-max(n, t) // t) * t
        ft = soa_force_tile(npad)
        assert npad % ft == 0, (n, npad, ft)


def test_n3l_soa_non512_padding():
    """yukawa_forces_n3l_soa with a QT-tile padding 512 does not divide
    (npad=896 at n=600) must agree with the XLA forces — the auto force
    tile drops to 128 there."""
    from mdqtplasmasims_tpu.ops.yukawa import (yukawa_forces,
                                               yukawa_forces_n3l_soa)
    n, npad = 600, 896
    pu = PlasmaUnits(density=2.0, Ge=0.1)
    L = PlasmaUnits.box_length(n)
    rng = np.random.default_rng(6)
    R = rng.uniform(0, L, (n, 3)).astype(np.float32)
    Rp = jnp.zeros((3, npad), jnp.float32).at[:, :n].set(R.T)
    mask_row = jnp.zeros((1, npad), jnp.float32).at[0, :n].set(1.0)
    F = np.asarray(yukawa_forces_n3l_soa(Rp, mask_row, L,
                                         pu.debye_length, interpret=True))
    F_ref = np.asarray(yukawa_forces(jnp.asarray(R), L, pu.debye_length,
                                     chunk=128))
    scale = np.abs(F_ref).max()
    assert np.abs(F[:, :n].T - F_ref).max() < 2e-5 * scale
    assert np.abs(F[:, n:]).max() == 0.0


def test_n3l_kernel_mask(system):
    """Masked-out ions neither exert nor receive force through either the
    direct or the reaction (third-law) path of the half-pair kernel."""
    from mdqtplasmasims_tpu.ops.yukawa import yukawa_forces_n3l_pallas
    R, L, ldeb = system
    n = R.shape[0]
    mask = np.ones(n, np.float32)
    mask[n // 2:] = 0.0
    F_np, _ = brute_force(R, L, ldeb, mask)
    F = np.array(yukawa_forces_n3l_pallas(
        jnp.asarray(R, jnp.float32), L, ldeb,
        mask=jnp.asarray(mask), tile=128, interpret=True))
    scale = np.abs(F_np).max()
    assert np.abs(F - F_np).max() < 2e-5 * scale
    assert np.abs(F[n // 2:]).max() == 0.0


def test_mc_family_equivalence(system):
    """The MC family force law exp(-kr)(1/r^3 + k/r^2) equals the cooling
    family law (1/r + 1/lDeb) exp(-r/lDeb)/r^2 with k = 1/lDeb."""
    R, L, ldeb = system
    kappa = 1.0 / ldeb
    d = R[:, None, :] - R[None, :, :]
    d -= L * np.round(d / L)
    r = np.sqrt((d ** 2).sum(-1))
    valid = (r > 0) & (r < L / 2)
    rs = np.where(valid, r, 1.0)
    aij = np.where(valid, np.exp(-kappa * rs) * (rs ** -3 + kappa / rs ** 2), 0.0)
    F_mc = (d * aij[:, :, None]).sum(1)
    F = np.array(yukawa_forces(jnp.asarray(R), L, ldeb, chunk=128))
    assert np.abs(F - F_mc).max() < 1e-10


def test_n3l_batched_kernel_interpret(system):
    """Batched half-pair kernel: each ensemble member matches the
    single-system kernel and jobs stay uncoupled."""
    from mdqtplasmasims_tpu.ops.yukawa import (
        yukawa_forces_n3l_pallas, yukawa_forces_n3l_pallas_batched)
    R, L, ldeb = system
    rng = np.random.default_rng(7)
    RE = jnp.asarray(np.stack([R, rng.uniform(0, L, R.shape)]), jnp.float32)
    FE = np.array(yukawa_forces_n3l_pallas_batched(RE, L, ldeb, tile=128,
                                                   interpret=True))
    for e in range(2):
        F1 = np.array(yukawa_forces_n3l_pallas(RE[e], L, ldeb, tile=128,
                                               interpret=True))
        np.testing.assert_array_equal(FE[e], F1)


class TestDataCarriedLdeb:
    """Kappa sweeps: when ``ldeb`` is a jax array the N3L kernels read
    1/ldeb from the position operand's spare column instead of a
    compile-time constant (_half_pair_tile), so one compiled program
    serves members with different screening lengths."""

    def test_traced_ldeb_matches_static(self, system):
        from mdqtplasmasims_tpu.ops.yukawa import yukawa_forces_n3l_pallas
        R, L, ldeb = system
        R32 = jnp.asarray(R, jnp.float32)
        F_static = np.array(yukawa_forces_n3l_pallas(
            R32, L, ldeb, tile=128, interpret=True))
        # f64 scalar: 1/ldeb rounds to f32 exactly as the static
        # trace-time constant does -> bit equality
        F_data = np.array(yukawa_forces_n3l_pallas(
            R32, L, jnp.asarray(ldeb), tile=128, interpret=True))
        np.testing.assert_array_equal(F_static, F_data)

    def test_batched_per_member_ldeb(self, system):
        """[E] ldeb array: each member's forces equal a static-ldeb call
        at that member's screening length."""
        from mdqtplasmasims_tpu.ops.yukawa import (
            yukawa_forces_n3l_pallas, yukawa_forces_n3l_pallas_batched)
        R, L, ldeb = system
        rng = np.random.default_rng(11)
        RE = jnp.asarray(np.stack([R, rng.uniform(0, L, R.shape)]),
                         jnp.float32)
        ldebs = np.asarray([ldeb, 0.5 * ldeb], np.float32)
        FE = np.array(yukawa_forces_n3l_pallas_batched(
            RE, L, jnp.asarray(ldebs), tile=128, interpret=True))
        for e in range(2):
            F1 = np.array(yukawa_forces_n3l_pallas(
                RE[e], L, float(ldebs[e]), tile=128, interpret=True))
            np.testing.assert_allclose(FE[e], F1, rtol=1e-6, atol=1e-6)
        assert np.abs(FE[1] - np.array(yukawa_forces_n3l_pallas(
            RE[1], L, ldeb, tile=128, interpret=True))).max() > 1e-3

    def test_vmapped_traced_ldeb(self, system):
        """The transport sweep's actual composition: vmap over members
        whose traced ldeb differs, one pallas program."""
        from mdqtplasmasims_tpu.ops.yukawa import yukawa_forces_n3l_pallas
        R, L, ldeb = system
        rng = np.random.default_rng(13)
        RE = jnp.asarray(np.stack([R, rng.uniform(0, L, R.shape)]),
                         jnp.float32)
        ldebs = jnp.asarray([ldeb, 0.7 * ldeb], jnp.float32)
        FV = np.array(jax.vmap(
            lambda r, ld: yukawa_forces_n3l_pallas(r, L, ld, tile=128,
                                                   interpret=True))(
            RE, ldebs))
        for e in range(2):
            F1 = np.array(yukawa_forces_n3l_pallas(
                RE[e], L, float(ldebs[e]), tile=128, interpret=True))
            np.testing.assert_allclose(FV[e], F1, rtol=1e-6, atol=1e-6)
