"""Replica-batched device MD: R walkers in one chunk == R separate
chunks; ensemble driver parity with DeviceMD; ensemble active learning."""

import jax
import jax.numpy as jnp
import numpy as np

from autoforce_tpu import units
from autoforce_tpu.md.device_md import DeviceMD, md_chunk, md_chunk_replicas
from autoforce_tpu.md.replica_md import ReplicaMD
from autoforce_tpu.system import bulk_fcc, maxwell_boltzmann_velocities

from test_parallel import build_state


def _replica_inputs(eng, model, nrep=3):
    cfgs = []
    vels = []
    rng = np.random.default_rng(0)
    for r in range(nrep):
        s = bulk_fcc("Cu", 3.6).repeat((2, 2, 1))
        s.rattle(0.05, seed=20 + r)
        cfgs.append(eng.make_config(s))
    npad = cfgs[0].npad
    n = len(s)
    for r in range(nrep):
        v = np.zeros((npad, 3))
        v[:n] = rng.normal(0, 0.01, (n, 3))
        vels.append(v)
    masses = np.ones((npad, 1))
    masses[:n, 0] = 63.5
    vs = np.ones(npad)
    return cfgs, vels, masses, vs


def test_md_chunk_replicas_matches_separate_chunks():
    """Each walker of the batched chunk reproduces its own md_chunk
    trajectory exactly (same per-replica PRNG key)."""
    eng, model, _ = build_state()
    ma = model.full_model_arrays()
    cfgs, vels, masses, vs = _replica_inputs(eng, model, nrep=3)
    keys = jax.random.split(jax.random.PRNGKey(7), 3)
    kw = dict(params=eng.params, exponent=eng.exponent, pair_terms=(),
              check_beta=True, kind="dot")
    a = dict(dt=jnp.asarray(0.5), kT=jnp.asarray(0.01),
             fric=jnp.asarray(0.02), skin=jnp.asarray(10.0),
             bthr=jnp.asarray(1e9), nsteps=jnp.asarray(5, np.int32))

    for thermostat in ("langevin", "nhc"):
        nhc = {}
        nhc_r = {}
        if thermostat == "nhc":
            Q = np.array([3.0, 1.0, 1.0])
            nhc = dict(nhc_Q=jnp.asarray(Q), nhc_dof=jnp.asarray(24.0),
                       nhc_vxi=jnp.zeros(3), nhc_xi=jnp.zeros(3))
            nhc_r = dict(nhc_Q=jnp.asarray(Q), nhc_dof=jnp.asarray(24.0),
                         nhc_vxi=jnp.zeros((3, 3)), nhc_xi=jnp.zeros((3, 3)))
        singles = []
        for r in range(3):
            out = md_chunk(
                cfgs[r], ma, eng.radii_table(), eng.znum_table(),
                jnp.asarray(vs), jnp.asarray(vels[r]), jnp.asarray(masses),
                cfgs[r].positions, keys[r], a["dt"], a["kT"], a["fric"],
                a["skin"], a["bthr"], a["nsteps"], *eng.chem_args(),
                thermostat=thermostat, **nhc, **kw,
            )
            singles.append(out)
        stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *cfgs)
        out_r = md_chunk_replicas(
            stacked, ma, eng.radii_table(), eng.znum_table(),
            jnp.asarray(vs), jnp.asarray(np.stack(vels)),
            jnp.asarray(masses), stacked.positions, keys,
            a["dt"], a["kT"], a["fric"], a["skin"], a["bthr"], a["nsteps"],
            *eng.chem_args(), thermostat=thermostat, **nhc_r, **kw,
        )
        assert int(out_r[6]) == 5
        for r in range(3):
            np.testing.assert_allclose(
                np.asarray(out_r[0])[r], np.asarray(singles[r][0]),
                atol=1e-10, err_msg=f"{thermostat} pos r={r}",
            )
            np.testing.assert_allclose(
                np.asarray(out_r[1])[r], np.asarray(singles[r][1]),
                atol=1e-10, err_msg=f"{thermostat} vel r={r}",
            )
            np.testing.assert_allclose(
                float(np.asarray(out_r[4])[r]), float(singles[r][4]),
                rtol=1e-10, err_msg=f"{thermostat} e r={r}",
            )
            np.testing.assert_allclose(
                float(np.asarray(out_r[5])[r]), float(singles[r][5]),
                atol=1e-10, err_msg=f"{thermostat} beta r={r}",
            )


def test_replica_md_driver_matches_device_md(tmp_path, monkeypatch):
    """NVE ensemble driver == per-replica DeviceMD (deterministic)."""
    monkeypatch.chdir(tmp_path)
    from autoforce_tpu.calculator.active import ActiveCalculator

    def make_systems():
        out = []
        for r in range(2):
            s = bulk_fcc("Cu", 3.6).repeat((2, 2, 1))
            s.rattle(0.05, seed=30 + r)
            maxwell_boltzmann_velocities(s, 400, seed=40 + r)
            out.append(s)
        return out

    # ensemble run
    eng, model, _ = build_state()
    calc = ActiveCalculator(covariance=model, calculator=None, logfile=None,
                            pckl=None, tape=None, skin=0.3)
    systems = make_systems()
    dyn = ReplicaMD(systems, calc, dt=2.0 * units.fs, chunk=7,
                    check_beta=False, thermostat="none")
    dyn.run(20)

    # reference: independent DeviceMD per replica
    for r, ref in enumerate(make_systems()):
        eng2, model2, _ = build_state()
        calc2 = ActiveCalculator(covariance=model2, calculator=None,
                                 logfile=None, pckl=None, tape=None, skin=0.3)
        ref.calc = calc2
        d2 = DeviceMD(ref, calc2, dt=2.0 * units.fs, chunk=7,
                      check_beta=False, thermostat="none",
                      device_rebuild=False)
        d2.run(20)
        np.testing.assert_allclose(
            systems[r].positions, ref.positions, atol=1e-9,
            err_msg=f"replica {r}",
        )


def test_replica_md_ensemble_active_learning(tmp_path, monkeypatch):
    """On-the-fly learning from an ensemble: the tripping walker samples,
    the updated model serves all walkers."""
    monkeypatch.chdir(tmp_path)
    from autoforce_tpu.calculator.active import ActiveCalculator
    from autoforce_tpu.calculator.oracles import LennardJones

    lj = LennardJones(epsilon=0.15, sigma=2.3, rc=4.0)
    calc = ActiveCalculator(
        covariance=None, calculator=lj, logfile=None, pckl=None, tape=None,
        kernel_kw=dict(cutoff=4.0, lmax=2, nmax=2),
        ediff=0.05, ediff_tot=0.1, fdiff=0.2, seed=0,
    )
    systems = []
    for r in range(2):
        s = bulk_fcc("Cu", 3.6).repeat((2, 2, 1))
        s.rattle(0.03, seed=50 + r)
        s.calc = calc
        maxwell_boltzmann_velocities(s, 200, seed=60 + r)
        systems.append(s)
    # seed the model through the first walker
    systems[0].get_potential_energy()
    assert calc.size[1] > 0
    dyn = ReplicaMD(systems, calc, dt=2.0 * units.fs, temperature_K=200,
                    chunk=10, seed=3)
    dyn.run(30)
    assert dyn.nsteps >= 30
    assert calc.size[1] > 0
    for s in systems:
        assert np.isfinite(s.positions).all()
