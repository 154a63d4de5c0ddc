"""Remote helpers (port forward/clear/twinrun) and visualization."""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

from autoforce_tpu.remote import clear_port, port_pids, twinrun
from autoforce_tpu.system import bulk_fcc


def test_port_pids_and_clear(tmp_path):
    # a listening helper process we own
    code = (
        "import socket, time\n"
        "s = socket.socket(); s.bind(('127.0.0.1', 0))\n"
        "print(s.getsockname()[1], flush=True)\n"
        "s.listen(1); time.sleep(60)\n"
    )
    proc = subprocess.Popen([sys.executable, "-c", code],
                            stdout=subprocess.PIPE, text=True)
    try:
        port = int(proc.stdout.readline())
        pids = port_pids(port)
        if not pids:
            pytest.skip("lsof unavailable or namespace hides sockets")
        assert proc.pid in pids
        out = clear_port(port)
        assert any(pid == proc.pid and ok for pid, ok in out)
        proc.wait(timeout=5)
    finally:
        if proc.poll() is None:
            proc.kill()


def test_twinrun_roundtrip(tmp_path, monkeypatch):
    """twinrun starts a calc_server, runs the script against it, and
    shuts the server down (reference util/twinrun.py)."""
    monkeypatch.chdir(tmp_path)
    # subprocesses must run on CPU like the in-process test env
    # (conftest pins the platform via jax.config, which children can't see)
    monkeypatch.setenv("JAX_PLATFORMS", "cpu")
    # find a free port
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    script = tmp_path / "driver.py"
    script.write_text(
        "import sys\n"
        f"sys.path.insert(0, {os.path.dirname(os.path.dirname(os.path.abspath(__file__)))!r})\n"
        "from autoforce_tpu.calculator.socket import SocketCalculator\n"
        "from autoforce_tpu.system import bulk_fcc\n"
        "s = bulk_fcc('Cu', 3.6)\n"
        "s.rattle(0.03, seed=0)\n"
        f"s.calc = SocketCalculator(ip='127.0.0.1', port={port})\n"
        "e = s.get_potential_energy()\n"
        "print('E', e)\n"
        "import numpy as np\n"
        "assert np.isfinite(e)\n"
    )
    rc = twinrun(str(script), ip="127.0.0.1", port=port, calculator="EMT")
    assert rc == 0
    # server is gone
    assert port_pids(port) == []


def test_plot_trajectory(tmp_path):
    from autoforce_tpu.analysis.visual import plot_trajectory, show_trajectory

    traj = []
    for k in range(5):
        s = bulk_fcc("Cu", 3.6)
        s.rattle(0.02, seed=k)
        traj.append(s)
    fig = plot_trajectory(traj, out=str(tmp_path / "traj.png"))
    assert (tmp_path / "traj.png").exists()
    assert fig is not None
    # nglview is absent in this image: the gate raises a clear error
    with pytest.raises(ImportError):
        show_trajectory(traj)


def test_spatial_ordering_roundtrip():
    """Morton ordering permutes consistently and is invertible."""
    s = bulk_fcc("Cu", 3.6).repeat((4, 4, 4))
    s.rattle(0.05, seed=0)
    ordered, perm = s.spatially_ordered(cell_size=4.0)
    assert sorted(perm.tolist()) == list(range(len(s)))
    np.testing.assert_allclose(ordered.positions, s.positions[perm])
    np.testing.assert_array_equal(ordered.numbers, s.numbers[perm])
    inv = np.argsort(perm)
    np.testing.assert_allclose(ordered.positions[inv], s.positions)
    # locality: a SCRAMBLED system (e.g. atoms read from a shuffled file)
    # regains near-diagonal neighbor indices after Morton ordering.
    # (Crystals built by repeat() are already space-filling — measured
    # on-chip, reordering them changes nothing; see BASELINE.md r3.)
    from autoforce_tpu.neighbors import neighbor_table

    def mean_idx_span(sysm):
        t = neighbor_table(sysm.positions, sysm.cell, sysm.pbc, 4.0)
        rows = np.arange(len(sysm))[:, None]
        return float(np.abs(t.idx - rows)[t.mask].mean())

    rng = np.random.default_rng(0)
    scrambled = s.permuted(rng.permutation(len(s)))
    reordered, _ = scrambled.spatially_ordered(cell_size=4.0)
    assert mean_idx_span(reordered) < 0.75 * mean_idx_span(scrambled)
