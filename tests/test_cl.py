"""CLI layer: ARGS file, md/relax/train drivers, socket calculator."""

import os
import threading

import numpy as np
import pytest

from autoforce_tpu.io.poscar import read_poscar, write_poscar
from autoforce_tpu.io.xyz import read_xyz, write_xyz
from autoforce_tpu.system import SinglePointCalculator, bulk_fcc


def write_ARGS(tmp, **kw):
    with open(os.path.join(tmp, "ARGS"), "w") as f:
        for k, v in kw.items():
            f.write(f"{k} = {v!r}\n")


@pytest.fixture
def in_tmp(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    return str(tmp_path)


def test_poscar_roundtrip(in_tmp):
    s = bulk_fcc("Cu", 3.6).repeat((2, 1, 1))
    s.rattle(0.02, seed=0)
    write_poscar("POSCAR", s)
    s2 = read_poscar("POSCAR")
    assert (s2.numbers == np.sort(s.numbers)).all()
    np.testing.assert_allclose(s2.cell, s.cell, atol=1e-10)


def test_args_units_and_calculator_names(in_tmp):
    """ARGS expressions may use unit names (reference imports kcal_mol into
    its cl namespace, theforce/cl/__init__.py:16); 'GAUSSIAN' resolves to
    the gaussian adapter like 'VASP' (reference cl/__init__.py:31-55)."""
    import autoforce_tpu.cl as cline
    from autoforce_tpu import units
    from autoforce_tpu.calculator.gaussian import GaussianCalculator

    with open(os.path.join(in_tmp, "ARGS"), "w") as f:
        f.write("calculator = 'GAUSSIAN'\n")
        f.write("ediff = 1.5 * kcal_mol   # unit name in an expression\n")
        f.write("fdiff = 2 * kcal_mol\n")
    cline.refresh()
    assert cline.ARGS["ediff"] == pytest.approx(1.5 * units.kcal_mol)
    assert isinstance(cline.ARGS["calculator"], GaussianCalculator)
    os.remove(os.path.join(in_tmp, "ARGS"))
    cline.refresh()


def test_args_and_md(in_tmp):
    import autoforce_tpu.cl as cline

    write_ARGS(
        in_tmp,
        calculator="LJ",
        ediff=0.05,
        fdiff=0.1,
        kernel_kw=dict(cutoff=4.0, lmax=2, nmax=2),
        pckl="model.pckl",
        tape="model.sgpr",
        logfile="active.log",
    )
    cline.refresh()
    assert cline.ARGS["ediff"] == 0.05
    from autoforce_tpu.cl.md import md

    atoms = bulk_fcc("Cu", 3.6)
    atoms.rattle(0.03, seed=1)
    md(atoms, dynamics="LANGEVIN", tem=200.0, dt=2.0, picos=-10,
       trajectory="md.extxyz", ml_filter=0.0)
    assert os.path.isfile("md.extxyz")
    frames = read_xyz("md.extxyz")
    assert len(frames) >= 10
    assert os.path.isdir("model.pckl")


def test_relax_cli(in_tmp):
    import autoforce_tpu.cl as cline

    write_ARGS(
        in_tmp,
        calculator="LJ",
        kernel_kw=dict(cutoff=4.0, lmax=2, nmax=2),
        pckl=None,
        tape=None,
        logfile=None,
    )
    cline.refresh()
    from autoforce_tpu.cl.relax import relax

    atoms = bulk_fcc("Cu", 3.6)
    atoms.rattle(0.05, seed=2)
    relax(atoms, fmax=0.5, confirm=False, trajectory="relax.extxyz")
    assert os.path.isfile("relax.extxyz")


def test_relax_cli_device(in_tmp):
    """algo='DEVICE': the FIRE loop runs on-chip (opt/device_fire.py),
    including the variable-cell (UnitCellFilter) composition."""
    import autoforce_tpu.cl as cline

    write_ARGS(
        in_tmp,
        calculator="LJ",
        kernel_kw=dict(cutoff=4.0, lmax=2, nmax=2),
        pckl=None, tape=None, logfile=None,
        ediff=0.02, fdiff=0.05, seed=0,
    )
    cline.refresh()
    from autoforce_tpu.cl.relax import relax

    atoms = bulk_fcc("Cu", 3.6).repeat((2, 2, 2))
    atoms.rattle(0.05, seed=2)
    relax(atoms, fmax=0.3, confirm=False, algo="DEVICE",
          trajectory="relaxdev.extxyz")
    assert os.path.isfile("relaxdev.extxyz")
    f = atoms.get_forces()
    assert np.sqrt((f * f).sum(axis=1).max()) < 0.3
    # variable-cell route: the on-chip UnitCellFilter composition runs
    # and satisfies the Optimizer contract on the model surface.  (A
    # freshly-seeded active model can legitimately read fmax below
    # threshold at once — the host path behaves identically; the cell
    # MATH is equality-tested against the host filter in
    # tests/test_device_fire.py::test_device_fire_cell_matches_host_filter.)
    cline.refresh()
    atoms2 = bulk_fcc("Cu", 3.85).repeat((2, 2, 2))
    atoms2.rattle(0.04, seed=3)
    relax(atoms2, fmax=0.15, confirm=False, algo="DEVICE", cell=True,
          trajectory="relaxdevc.extxyz")
    assert os.path.isfile("relaxdevc.extxyz")
    assert np.isfinite(atoms2.positions).all()
    assert np.isfinite(np.asarray(atoms2.cell)).all()
    f = atoms2.get_forces()
    assert np.sqrt((f * f).sum(axis=1).max()) < 0.15


def test_train_and_scores(in_tmp):
    import autoforce_tpu.cl as cline
    from autoforce_tpu.calculator.oracles import LennardJones
    from autoforce_tpu.regression.scores import compare_trajectories

    lj = LennardJones(epsilon=0.15, sigma=2.3, rc=4.0)
    frames = []
    for k in range(4):
        s = bulk_fcc("Cu", 3.6)
        s.rattle(0.08, seed=k)
        s.calc = lj
        res = {
            "energy": s.get_potential_energy(),
            "forces": s.get_forces(),
            "stress": s.get_stress(),
        }
        s.calc = SinglePointCalculator(s, **res)
        frames.append(s)
    write_xyz("data.extxyz", frames)

    write_ARGS(
        in_tmp,
        kernel_kw=dict(cutoff=4.0, lmax=2, nmax=2),
        pckl="model.pckl",
        tape=None,
        logfile=None,
        ediff=0.01,
        fdiff=0.05,
    )
    cline.refresh()
    from autoforce_tpu.cl.train import train

    calc = train(["data.extxyz"])
    assert calc.size[0] >= 1 and calc.size[1] >= 1

    # score the trained model against the data
    from autoforce_tpu.cl.test import test as cl_test

    cl_test("data.extxyz")
    sc = compare_trajectories("test_ML.extxyz", "test_FP.extxyz")
    assert sc["forces"]["r2"] > 0.8, sc


def test_socket_calculator(in_tmp):
    from autoforce_tpu.calculator.oracles import LennardJones
    from autoforce_tpu.calculator.socket import Server, SocketCalculator, serve_request

    lj = LennardJones(epsilon=0.15, sigma=2.3, rc=4.0)
    port = 16789
    server = Server("localhost", port, callback=serve_request, args=(lj,))
    t = threading.Thread(target=server.listen, daemon=True)
    t.start()

    sc = SocketCalculator(port=port)
    import time

    for _ in range(50):  # wait for the server thread to start listening
        try:
            sc.ping()
            break
        except (ConnectionRefusedError, OSError):
            time.sleep(0.1)
    s = bulk_fcc("Cu", 3.6)
    s.rattle(0.05, seed=3)
    res = sc.calculate(s)
    s.calc = lj
    np.testing.assert_allclose(res["energy"], s.get_potential_energy(), rtol=1e-8)
    np.testing.assert_allclose(res["forces"], s.get_forces(), atol=1e-6)
    sc.close()
    t.join(timeout=5)


def test_tape_tools(in_tmp):
    from autoforce_tpu.io.tape import SgprTape
    from autoforce_tpu.io.tape_tools import dedup, slice_traj, truncate
    from autoforce_tpu.regression.sgpr import InducingEnv
    import numpy as np

    tape = SgprTape("a.sgpr")
    env1 = InducingEnv.from_arrays(29, [[1.0, 0, 0], [0, 1.2, 0]], [29, 29])
    env2 = InducingEnv.from_arrays(29, [[1.1, 0, 0]], [29])
    s = bulk_fcc("Cu", 3.6)
    s.calc = SinglePointCalculator(s, energy=-1.0, forces=np.zeros((4, 3)))
    tape.write(env1)
    tape.write(env1)  # duplicate
    tape.write(env2)
    tape.write(s)
    tape.write(s)  # duplicate
    assert len(tape.read()) == 5
    n = dedup("a.sgpr", "b.sgpr")
    assert n == 3
    assert len(SgprTape("b.sgpr").read()) == 3
    n = truncate("b.sgpr", "c.sgpr", 2)
    assert len(SgprTape("c.sgpr").read()) == 2

    write_xyz("t.extxyz", [s.copy() for _ in range(10)])
    n = slice_traj("t.extxyz", "t2.extxyz", "::3")
    assert n == 4


def test_md_device_dynamics(in_tmp):
    """cl.md dynamics='DEVICE' path (device-resident integrator)."""
    import autoforce_tpu.cl as cline

    write_ARGS(
        in_tmp,
        calculator="LJ",
        kernel_kw=dict(cutoff=4.0, lmax=2, nmax=2),
        pckl=None, tape=None, logfile=None,
        ediff=0.05, fdiff=0.1,
    )
    cline.refresh()
    from autoforce_tpu.cl.md import md

    atoms = bulk_fcc("Cu", 3.6)
    atoms.rattle(0.03, seed=1)
    md(atoms, dynamics="DEVICE", tem=200.0, dt=2.0, picos=-30,
       trajectory="mdd.extxyz", ml_filter=0.0, loginterval=10)
    assert os.path.isfile("mdd.extxyz")
    assert np.isfinite(atoms.positions).all()

    # ensemble variant: replicas=3 drives ReplicaMD through the same CLI
    atoms2 = bulk_fcc("Cu", 3.6)
    atoms2.rattle(0.03, seed=2)
    md(atoms2, dynamics="DEVICE", tem=200.0, dt=2.0, picos=-20,
       trajectory="mdr.extxyz", ml_filter=0.0, loginterval=10, replicas=3)
    assert os.path.isfile("mdr.extxyz")
    assert np.isfinite(atoms2.positions).all()



def test_md_device_dynamics_with_mesh(in_tmp):
    """cl.md dynamics='DEVICE' under a mesh declared in the ARGS file —
    the reference's `mpirun -n 8 python -m theforce.cl.md` UX maps to
    one `mesh = make_mesh(...)` line (no process-level setup)."""
    import autoforce_tpu.cl as cline

    with open("ARGS", "w") as f:
        f.write("calculator = 'LJ'\n")
        f.write("kernel_kw = dict(cutoff=4.0, lmax=2, nmax=2)\n")
        f.write("pckl = None\ntape = None\nlogfile = None\n")
        f.write("ediff = 0.05\nfdiff = 0.1\n")
        f.write("mesh = make_mesh(data=4, model=2)\n")
    cline.refresh()
    from autoforce_tpu.cl.md import md

    atoms = bulk_fcc("Cu", 3.6).repeat((2, 2, 1))
    atoms.rattle(0.03, seed=1)
    md(atoms, dynamics="DEVICE", tem=200.0, dt=2.0, picos=-20,
       trajectory="mdm.extxyz", ml_filter=0.0, loginterval=10)
    assert os.path.isfile("mdm.extxyz")
    assert np.isfinite(atoms.positions).all()


def test_md_device_npt_dynamics(in_tmp):
    """cl.md dynamics='DEVICE' + bulk_modulus: on-chip isotropic MTK NPT
    (the reference's pfactor gate applied to the device path)."""
    import autoforce_tpu.cl as cline

    write_ARGS(
        in_tmp,
        calculator="LJ",
        kernel_kw=dict(cutoff=4.0, lmax=2, nmax=2),
        pckl=None, tape=None, logfile=None,
        ediff=0.05, fdiff=0.1,
    )
    cline.refresh()
    from autoforce_tpu.cl.md import md

    atoms = bulk_fcc("Cu", 3.6).repeat((2, 2, 2))
    atoms.rattle(0.03, seed=1)
    cell0 = np.asarray(atoms.cell).copy()
    md(atoms, dynamics="DEVICE", tem=200.0, dt=2.0, picos=-30,
       trajectory="mdnpt.extxyz", ml_filter=0.0, loginterval=10,
       bulk_modulus=140.0, stress=0.0, eps_cell=0.03)
    assert os.path.isfile("mdnpt.extxyz")
    assert np.isfinite(atoms.positions).all()
    assert np.abs(np.asarray(atoms.cell) - cell0).max() > 1e-8  # cell moved

def test_neb_cli(in_tmp):
    """cl.neb: host band and the on-chip band (device=True) both produce
    a finite barrier and the band trajectory file."""
    import autoforce_tpu.cl as cline

    write_ARGS(
        in_tmp,
        calculator="LJ",
        kernel_kw=dict(cutoff=4.0, lmax=2, nmax=2),
        pckl=None, tape=None, logfile=None,
        ediff=0.05, fdiff=0.1,
    )
    cline.refresh()
    from autoforce_tpu.cl.neb import neb

    def endpoints():
        a = bulk_fcc("Cu", 3.6).repeat((2, 2, 2))
        a.rattle(0.04, seed=1)
        b = bulk_fcc("Cu", 3.6).repeat((2, 2, 2))
        b.rattle(0.04, seed=2)
        return [a, b]

    for device, traj in ((False, "nebh.extxyz"), (True, "nebd.extxyz")):
        band = neb(endpoints(), nimages=5, fmax=0.3, relax_ends=False,
                   device=device, trajectory=traj)
        assert os.path.isfile(traj)
        assert np.isfinite(band.barrier())


def test_init_model_and_singlepoint(in_tmp):
    import autoforce_tpu.cl as cline

    write_ARGS(
        in_tmp,
        calculator="LJ",
        kernel_kw=dict(cutoff=4.0, lmax=2, nmax=2),
        pckl="model.pckl", tape=None, logfile=None,
        ediff=0.02, fdiff=0.06,
    )
    cline.refresh()
    from autoforce_tpu.cl.init_model import init_model

    atoms = bulk_fcc("Cu", 3.6)
    calc = init_model(atoms, samples=2, rattle=0.05)
    assert calc.size[1] >= 1
    assert os.path.isdir("model.pckl")

    from autoforce_tpu.cl.singlepoint import singlepoint

    res = singlepoint(bulk_fcc("Cu", 3.6), output="sp.extxyz")
    assert np.isfinite(res["energy"])
    assert os.path.isfile("sp.extxyz")


def test_offline_cli(in_tmp):
    import autoforce_tpu.cl as cline
    from autoforce_tpu.calculator.oracles import LennardJones

    lj = LennardJones(epsilon=0.15, sigma=2.3, rc=4.0)
    frames = []
    for k in range(3):
        s = bulk_fcc("Cu", 3.6)
        s.rattle(0.08, seed=30 + k)
        res = lj.calculate(s)
        s.calc = SinglePointCalculator(s, **res)
        frames.append(s)
    write_xyz("off.extxyz", frames)
    write_ARGS(
        in_tmp,
        kernel_kw=dict(cutoff=4.0, lmax=2, nmax=2),
        pckl=None, tape=None, logfile=None,
        ediff=0.02, fdiff=0.06,
    )
    cline.refresh()
    from autoforce_tpu.cl.offline import offline

    calc = offline("off.extxyz")
    assert calc.size[0] >= 1 and calc.size[1] >= 1
