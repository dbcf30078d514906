"""IO tests: .dat formatting, checkpoint schemas, directory naming."""

import numpy as np
import pytest

from mdqtplasmasims_tpu.io import checkpoint as ckpt
from mdqtplasmasims_tpu.io.datfiles import format_rows, read_rows, write_rows
from mdqtplasmasims_tpu.io.dirs import (cooling_dir, frozen_tag_dir,
                                        mc_tag_dir, mc_transport_dir,
                                        three_state_dir)


class TestDatFiles:
    def test_format_matches_printf_g(self):
        """%g semantics: 6 significant digits, scientific when needed."""
        arr = np.array([[1.5, 2.25e-7, 3.0, -4.123456789, 123456789.0]])
        assert format_rows(arr) == "1.5\t2.25e-07\t3\t-4.12346\t1.23457e+08\n"

    def test_roundtrip(self, tmp_path):
        arr = np.random.default_rng(0).normal(size=(37, 4))
        p = str(tmp_path / "x.dat")
        write_rows(p, arr)
        back = read_rows(p)
        # %g keeps 6 significant digits
        assert np.allclose(back, arr, rtol=1e-5, atol=1e-12)

    def test_read_fscanf_style(self, tmp_path):
        """Whitespace-tolerant parsing (the reference's fscanf)."""
        p = str(tmp_path / "y.dat")
        with open(p, "w") as f:
            f.write("1.5\t2.5\t\n  3e-2   4e2\n")
        back = read_rows(p)
        assert back.shape == (2, 2)
        assert back[1, 0] == pytest.approx(0.03)


class TestCheckpoint:
    def test_conditions_roundtrip(self, tmp_path):
        d = str(tmp_path)
        R = np.random.default_rng(1).uniform(0, 20, (50, 3))
        V = np.random.default_rng(2).normal(size=(50, 3))
        ckpt.write_conditions(d, 123, R, V)
        R2, V2 = ckpt.read_conditions(d, 123)
        assert np.allclose(R2, R, rtol=1e-5)
        assert np.allclose(V2, V, rtol=1e-5)
        # trailing-tab row format of the reference (SpeedUp.cpp:747)
        with open(tmp_path / "conditions_timestep000123.dat") as f:
            line = f.readline()
        assert line.endswith("\t\n")

    def test_wvfns_roundtrip(self, tmp_path):
        d = str(tmp_path)
        psi = (np.random.default_rng(3).normal(size=(20, 12))
               + 1j * np.random.default_rng(4).normal(size=(20, 12)))
        ckpt.write_wvfns(d, 7, psi)
        psi2 = ckpt.read_wvfns(d, 7)
        assert np.allclose(psi2, psi, rtol=1e-5, atol=1e-9)

    def test_ions_and_spinup(self, tmp_path):
        d = str(tmp_path)
        ckpt.write_ions(d, 42, 3500, 375)
        assert ckpt.read_ions(d, 42) == (3500, 375)
        spins = np.random.default_rng(5).integers(0, 2, 100)
        ckpt.write_spinup_list(d, 42, spins)
        assert np.array_equal(ckpt.read_spinup_list(d, 42), spins)

    def test_native_roundtrip(self, tmp_path):
        d = str(tmp_path)
        R = np.ones((10, 3))
        V = np.zeros((10, 3))
        psi = np.ones((10, 5), complex)
        ckpt.save_native(d, 9, R=R, V=V, psi=psi, counter=4)
        z = ckpt.load_native(d, 9)
        assert np.array_equal(z["R"], R)
        assert np.array_equal(z["psi"], psi)
        assert int(z["counter"]) == 4

    def test_restore_time(self):
        # t = (c0-9)*dt + 0.02 (SpeedUp.cpp:789)
        assert ckpt.restore_time(9) == pytest.approx(0.02)
        assert ckpt.restore_time(14999) == pytest.approx(29.982 + 0.018)


class TestDirNaming:
    def test_cooling_matches_reference_sprintf(self):
        """SpeedUp.cpp:1153 with the default parameters."""
        d = cooling_dir("base", ge=0.1, density=2.0, sig0=4.0, te=19.0,
                        frac_of_sig=0.0, detuning=-1.0, detuning_dp=1.0,
                        om=1.0, om_dp=1.0, n0=3500, job=7)
        assert d == ("base/Ge10Density2000E+11Sig040Te19SigFrac0"
                     "DetSP-100DetDP100OmSP100OmDP100NumIons3500/job7")

    def test_frozen_tag_matches_reference(self):
        """randomFrozenStartTag422Linear.cpp:955 defaults."""
        d = frozen_tag_dir("b", tpump_seconds=1e-7, tstart=15,
                           detuning=-1.0, om=1.3, density=2.0, ge=0.1,
                           n0=3500, job=1)
        assert d == ("b/PumpTime100PumpStart15Det100Om130"
                     "Density20Ge100NumIons3500/job1")

    def test_transport_and_mc_tag(self):
        assert mc_transport_dir("b", gamma=3, kappa=0.5, n=4096, job=2) == \
            "b/Gamma300Kappa50NumIons4096/job2"
        d = mc_tag_dir("b", gamma=3, kappa=0.5, n=4096, tpump_seconds=2e-7,
                       detuning=-2.5, om=0.7, density=2.0, job=1)
        assert d == ("b/Gamma300Kappa50NumIons4096PumpTime200"
                     "Det250Om70Density20/job1")

    def test_three_state(self):
        d = three_state_dir("b", om=0.5, detuning=-0.5, n0=1000,
                            temperature_k=0.01, job=3)
        assert d == "b/Om50/Det-50NumIons1000InitialTemp10000uK/job3"
