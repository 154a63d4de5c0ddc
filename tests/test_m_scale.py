"""Bucket stickiness during learning: model growth must cost only the
log2 mcap doublings, never shape thrash (VERDICT r3 item #2; CLAUDE.md's
recompile warning).  Every distinct (npad, kpad, mcap) triple is one XLA
compile of the fused predict (and md_chunk) — a learning run that grew
m past several power-of-2 boundaries must show exactly those
transitions and NO atom/neighbor-axis churn."""

import numpy as np

from autoforce_tpu import units
from autoforce_tpu.calculator.active import ActiveCalculator
from autoforce_tpu.calculator.oracles import LennardJones
from autoforce_tpu.md import Langevin
from autoforce_tpu.system import bulk_fcc, maxwell_boltzmann_velocities


def test_no_shape_thrash_during_learning(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    lj = LennardJones(epsilon=0.15, sigma=2.3, rc=4.5)
    calc = ActiveCalculator(
        covariance=None, calculator=lj, logfile=None, pckl=None,
        tape=None, kernel_kw=dict(cutoff=4.5, lmax=3, nmax=3),
        ediff=0.002, ediff_tot=0.01, fdiff=0.02, noise_f=0.01,
    )
    s = bulk_fcc("Cu", 3.6).repeat((2, 2, 3))
    s.rattle(0.1, seed=0)
    s.calc = calc
    maxwell_boltzmann_velocities(s, 800.0, seed=1)
    dyn = Langevin(s, dt=2 * units.fs, temperature_K=800, friction=0.02,
                   seed=2)
    dyn.run(60)
    ndata, m = calc.size
    assert m > 32, f"model too small to exercise mcap growth (m={m})"

    # mcap transitions are exactly the power-of-2 doublings from the
    # initial 32 bucket to the final capacity — no more, no less
    mcap = calc.model._mcap
    expected = int(np.log2(mcap / 32))
    assert calc.model.mcap_growth == expected, (
        calc.model.mcap_growth, mcap, m
    )
    # the atom axis never moved (fixed N) and the neighbor bucket's
    # +20% headroom absorbed thermal fluctuation: at most ONE growth
    assert calc.event_counts.get("npad_growth", 0) == 0
    assert calc.event_counts.get("kpad_growth", 0) <= 1

    # frozen-model MD on the grown model keeps every bucket fixed
    ev0 = dict(calc.event_counts)
    calc._calc = None
    dyn.run(20)
    assert calc.event_counts.get("kpad_growth", 0) == ev0.get(
        "kpad_growth", 0
    )
    assert calc.event_counts.get("npad_growth", 0) == 0
    assert calc.model._mcap == mcap
