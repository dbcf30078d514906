"""Literal numpy transcription of the reference's 12-state qstep().

This is a TEST ORACLE, requested by the round-1 review: a direct,
line-by-line transcription of laserCoolingPlusExpansionMDQTSpeedUp.cpp
(qstep: lines 438-717; cs/gs tables: lines 1163-1215) into f64 numpy,
kept deliberately naive (per-ion 12x12 matrices, explicit branches) so
it can be checked against the C++ by eye.  It exists only so the tests
can pin the framework's vectorized QT engine — including the
time-dependent D->P beat-note channels — to the reference algebra at
1e-12, independently of how levels.py derives its tables.

Conventions: 0-based state indices (wvFn1 -> 0, ...); the five uniform
rolls per tick are supplied explicitly in the framework's order
(jump?, source, S-vs-D branch, kick sign, destination).
"""

import numpy as np

KRAT = 0.3950                      # kRat, SpeedUp.cpp:147

# cs[k] = |dest><src| channel operators, SpeedUp.cpp:1163-1181 (0-based)
CS = [(1, 2), (1, 3), (0, 3), (0, 4), (1, 4), (0, 5),
      (6, 5), (7, 5), (8, 5), (7, 4), (8, 4), (9, 4),
      (8, 3), (9, 3), (10, 3), (9, 2), (10, 2), (11, 2)]


def gs_table(dr):
    """gs[k] amplitudes, SpeedUp.cpp:1182-1199."""
    return np.sqrt(np.array([
        1.0, 2. / 3, 1. / 3, 2. / 3, 1. / 3, 1.0,
        dr * 2. / 3, dr * 4. / 15, dr * 1. / 15,
        dr * 2. / 5, dr * 2. / 5, dr * 1. / 5,
        dr * 1. / 5, dr * 2. / 5, dr * 2. / 5,
        dr * 1. / 15, dr * 4. / 15, dr * 2. / 3]))


def decay_matrix(dr):
    """decayMatrix = sum_k gs_k^2 cs_k^T cs_k (diagonal), SpeedUp.cpp:1202-1205."""
    gs = gs_table(dr)
    D = np.zeros((12, 12))
    for k, (dest, src) in enumerate(CS):
        D[src, src] += gs[k] ** 2
    return D


def hamiltonian(velQuant, expDetuning, tPart, *, detuning, detuningDP,
                Om, OmDP, dr, gamToEinsteinFreq):
    """hamil of SpeedUp.cpp:505-521 (non-Hermitian, includes -i/2 decay)."""
    gs = gs_table(dr)
    I = 1j

    def ket_bra(a, b):
        m = np.zeros((12, 12), dtype=complex)
        m[a, b] = 1.0
        return m

    # hamCouplingTermNoTimeDep (SpeedUp.cpp:1207-1215): -cs[k]^T terms
    coup = np.zeros((12, 12), dtype=complex)
    for k in (0, 2, 4, 5):
        dest, src = CS[k]
        coup += -1. * ket_bra(src, dest) * gs[k] * Om / 2
    for k in (6, 9, 12, 14, 15, 17):
        dest, src = CS[k]
        coup += -1. * ket_bra(src, dest) * gs[k] * OmDP / 2 / np.sqrt(dr)

    # time-dependent beat-note channels (SpeedUp.cpp:508)
    phase = np.exp(I * 2. * (velQuant + expDetuning) * (1 + KRAT)
                   * tPart * gamToEinsteinFreq)
    coup = coup - OmDP / 2 * ket_bra(8, 5) * gs[8] / np.sqrt(dr) * phase
    coup = coup - OmDP / 2 * ket_bra(9, 4) * gs[11] / np.sqrt(dr) * phase

    # energy terms (SpeedUp.cpp:506-511)
    totalDetRightSP = -detuning - velQuant - expDetuning
    totalDetLeftSP = -detuning + velQuant + expDetuning
    H = np.zeros((12, 12), dtype=complex)
    for s in (2, 3):
        H[s, s] += totalDetRightSP
    for s in (4, 5):
        H[s, s] += totalDetLeftSP
    u = velQuant + expDetuning
    for s in (6, 7):
        H[s, s] += -detuning + detuningDP + (1 - KRAT) * u
    for s in (10, 11):
        H[s, s] += -detuning + detuningDP + (KRAT - 1) * u
    for s in (8, 9):
        H[s, s] += -detuning + detuningDP - u - KRAT * u

    H = H + coup + coup.conj().T
    H = H - 0.5j * decay_matrix(dr)          # hamDecayTerm
    return H


def collapse_chain(dr):
    """Jump-destination (dest, prob) lists in the reference's literal
    if-chain order, transcribed from SpeedUp.cpp:613-703.  gs indices per
    the cs[] channel table; probabilities are the chain's thresholds."""
    gs2 = gs_table(dr) ** 2
    return {
        (2, "S"): [(1, 1.0)],
        (2, "D"): [(11, gs2[17] / dr), (10, gs2[16] / dr),
                   (9, 1.0 - (gs2[17] + gs2[16]) / dr)],
        (3, "S"): [(0, gs2[2]), (1, 1.0 - gs2[2])],
        (3, "D"): [(10, gs2[14] / dr), (9, gs2[13] / dr),
                   (8, 1.0 - (gs2[14] + gs2[13]) / dr)],
        (4, "S"): [(1, gs2[4]), (0, 1.0 - gs2[4])],
        (4, "D"): [(9, gs2[11] / dr), (8, gs2[10] / dr),
                   (7, 1.0 - (gs2[11] + gs2[10]) / dr)],
        (5, "S"): [(0, 1.0)],
        (5, "D"): [(8, gs2[8] / dr), (7, gs2[7] / dr),
                   (6, 1.0 - (gs2[8] + gs2[7]) / dr)],
    }


def qstep(wvFn, velPlas, tPart, rolls, *, detuning, detuningDP, Om, OmDP,
          dr, plasVelToQuantVel, gamToEinsteinFreq, dtQuant, vKick,
          vKickDP, fracOfSig=0.0, Te=19.0, density=2.0, sig0=4.0, t=0.0,
          reNormalizewvFns=False, dest_state_order=False,
          gs_convention="speedup"):
    """One reference quantum tick for one ion (SpeedUp.cpp:438-717).

    Returns (wvFn', velPlas', tPart').  ``rolls`` are the five uniforms in
    the framework's order: [jump?, source, branch, sign, destination].
    ``dest_state_order=True`` maps the destination roll through the
    framework's state-ascending cumulative instead of the reference's
    if-chain order (identical distribution, different uniform->outcome
    map) so trajectories are bit-comparable.

    ``gs_convention="pre_speedup"`` reproduces the original
    LaserCoolingPlusExpansionMDQT.cpp:502 generation: there gs[] are
    *rates* and the DP Ehrenfest sum is vKickDP*(OmDP/sqrt(dr))*
    sum Im(p)*sqrt(gs_rate) — with sqrt(gs_rate) = gs_amplitude this is
    the SpeedUp expression with OmDP/dr replaced by OmDP/sqrt(dr) (a
    factor sqrt(dr) ~ 1/4 smaller DP kick).  Everything else (dp,
    Hamiltonian, RK stages, collapse chains — old :481,:518,:534-579,
    :586-700) is algebraically identical between the two generations
    once the rate<->amplitude change of variables is applied.
    """
    gs = gs_table(dr)
    h = dtQuant * gamToEinsteinFreq
    expDetuning = (0.0126 * fracOfSig * Te * t
                   / (np.sqrt(density) * sig0
                      * np.sqrt(1 + 0.00014314 * t * t * Te
                                / (density * sig0 * sig0))))
    velQuant = velPlas * plasVelToQuantVel
    tPart = tPart + dtQuant
    D = decay_matrix(dr)
    dp = h * float(np.real(wvFn.conj() @ (D @ wvFn)))
    kick = 0.0
    if rolls[0] > dp:                         # no jump
        # Ehrenfest force from the density matrix (SpeedUp.cpp:490-503);
        # p_ab = <a|psi><psi|b> = psi_a conj(psi_b) with 0-based indices
        def p(a, b):
            return wvFn[a] * np.conj(wvFn[b])
        dp_pref = (OmDP / dr if gs_convention == "speedup"
                   else OmDP / np.sqrt(dr))
        kick = (vKick * Om * (p(1, 2).imag * gs[0] + p(0, 3).imag * gs[2]
                              - p(1, 4).imag * gs[4]
                              - p(0, 5).imag * gs[5]) * h
                + vKickDP * dp_pref
                * (p(8, 5).imag * gs[8] + p(9, 4).imag * gs[11]
                   + p(10, 3).imag * gs[14] + p(11, 2).imag * gs[17]
                   - p(6, 5).imag * gs[6] - p(7, 4).imag * gs[9]
                   - p(8, 3).imag * gs[12] - p(9, 2).imag * gs[15]) * h)

        H = hamiltonian(velQuant, expDetuning, tPart, detuning=detuning,
                        detuningDP=detuningDP, Om=Om, OmDP=OmDP, dr=dr,
                        gamToEinsteinFreq=gamToEinsteinFreq)
        matPrefactor = np.eye(12, dtype=complex) - 1j * h * H

        def slope(phi):
            dphi = h * float(np.real(phi.conj() @ (D @ phi)))
            pref = 1.0 / np.sqrt(1.0 - dphi)
            return (pref * (matPrefactor @ phi) - phi) / h

        k1 = slope(wvFn)
        k2 = slope(wvFn + 0.5 * h * k1)
        k3 = slope(wvFn + 0.5 * h * k2)
        k4 = slope(wvFn + h * k3)
        wvFn = wvFn + (k1 + 3 * k2 + 3 * k3 + k4) / 8 * h
    else:                                     # jump: collapse (lines 573-703)
        tPart = 0.0
        norms = np.abs(wvFn[2:6]) ** 2
        probs = norms / norms.sum()
        rand2, randDOrS, randDir, rand3 = rolls[1], rolls[2], rolls[3], rolls[4]
        sDecay = not (randDOrS < dr / (dr + 1.0))
        kick = ((vKick if sDecay else vKickDP)
                * (1.0 if randDir < 0.5 else -1.0))
        # source roll: rand2 < prob3 -> state 3, < prob3+prob4 -> 4, ...
        src = 2 + int(np.searchsorted(np.cumsum(probs), rand2, side="right"))
        src = min(src, 5)
        chain = collapse_chain(dr)[(src, "S" if sDecay else "D")]
        if dest_state_order:
            # same destination distribution, but the uniform is mapped
            # through a state-index-ascending cumulative (the framework's
            # vectorized convention) instead of the reference's literal
            # if-chain order; the chain/table equivalence is asserted
            # separately by test_jump_tables_match_reference_chains.
            chain = sorted(chain)
        cum = 0.0
        dest = chain[-1][0]
        for d, p_ in chain:
            cum += p_
            if rand3 < cum:
                dest = d
                break
        wvFn = np.zeros(12, dtype=complex)
        wvFn[dest] = 1.0
    velPlas = velPlas + kick
    if reNormalizewvFns:
        wvFn = wvFn / np.sqrt(np.sum(np.abs(wvFn) ** 2))
    return wvFn, velPlas, tPart
