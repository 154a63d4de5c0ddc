"""Mesh-path wall-clock / collective accounting (simulation harness).

Real multi-chip hardware is not available in this image, so this tool
runs the SPMD device-resident MD path on an N-virtual-device CPU mesh
(`--xla_force_host_platform_device_count`) and reports

  * per-step wall time of ``sharded_md_chunk`` vs the single-device
    ``md_chunk`` on the same workload (CPU wall times do NOT predict TPU
    times — they validate that the sharded program's step structure and
    collective schedule execute, and bound the framework-level overhead),
  * the analytic per-step collective traffic of the sharded program
    (what would ride the ICI on real hardware).

Collectives per sharded MD step (see sharded_md_chunk):
  - psum of the energy scalar over ('data', 'model'),
  - psum of the (N, 3) position cotangent (forces) — the big one,
  - with check_beta: all_gather of the (N/d_data, M) covariance block
    over 'model' + pmean + a scalar pmax over 'data'.

The sibling chunks add per step, on top of the MD set:
  - NPT / variable-cell FIRE: the strain cotangent psum rides the SAME
    backward as the forces (a scalar or 3x3 — negligible bytes);
  - NEB: the MD set once per image (one vmapped psum; R scalars + one
    (R, N, 3) cotangent);
  - committee: the MD set once per expert (E energy scalars; the force
    cotangent stays ONE (N, 3) psum — the expert sum happens before
    the backward) + E covariance all_gathers for the weights;
  - in-loop rebuild: one scalar pmax over 'data' per breach (validity)
    — the rebuild itself is local to each shard.

CLI (self-configuring; spawns a forced-CPU subprocess):

    python -m autoforce_tpu.parallel.mesh_bench -n 8 --natoms 256 \
        --steps 50 [--n-model 2] [--check-beta]
"""

from __future__ import annotations

import os
import subprocess
import sys


def _worker(n_devices, n_model, natoms_target, steps, check_beta):
    import time

    import jax
    import jax.numpy as jnp
    import numpy as np

    from ..descriptor.soap import SoapParams
    from ..engine import Engine
    from ..md.device_md import md_chunk
    from ..neighbors import displacements, neighbor_table
    from ..parallel.mesh import make_mesh, mesh_pad, sharded_md_chunk
    from ..regression.sgpr import InducingEnv, SgprModel
    from ..system import bulk_fcc

    rc = 4.5
    eng = Engine(params=SoapParams(lmax=3, nmax=3, rc=rc), exponent=4,
                 species=[29])
    model = SgprModel(eng)
    for seed in range(16):
        s = bulk_fcc("Cu", 3.6)
        s.rattle(0.1, seed=seed)
        t = neighbor_table(s.positions, s.cell, s.pbc, rc)
        r = displacements(s.positions, s.cell, t)
        i = seed % len(s)
        mask = t.mask[i]
        model.add_inducing(
            InducingEnv.from_arrays(
                s.numbers[i], r[i][mask], s.numbers[t.idx[i][mask]]
            ),
            remake=False,
        )
    m = model.m
    rng = np.random.default_rng(0)
    model.mu = rng.normal(size=m) * 0.1
    model.choli = np.linalg.inv(
        np.linalg.cholesky(model.M + 1e-6 * np.eye(m))
    )
    model._model_arrays = None

    reps = max(1, round((natoms_target / 4) ** (1 / 3)))
    sysm = bulk_fcc("Cu", 3.6).repeat((reps, reps, reps))
    sysm.rattle(0.05, seed=7)
    cfg = eng.make_config(sysm)
    ma = model.full_model_arrays()
    npad = cfg.npad
    mcap = ma.mu.shape[0]
    vs = np.ones(npad)
    vel = rng.normal(0, 0.005, (npad, 3))
    masses = np.ones((npad, 1))
    common = dict(
        dt=jnp.asarray(0.5), kT=jnp.asarray(0.01), fric=jnp.asarray(0.02),
        skin=jnp.asarray(1e3), bthr=jnp.asarray(1e9),
        nsteps=jnp.asarray(int(steps), np.int32),
    )
    key = jax.random.PRNGKey(0)
    kw = dict(params=eng.params, exponent=eng.exponent, pair_terms=(),
              check_beta=check_beta, thermostat="langevin", kind="dot")

    def run_single():
        return md_chunk(
            cfg, ma, eng.radii_table(), eng.znum_table(), jnp.asarray(vs),
            jnp.asarray(vel), jnp.asarray(masses), cfg.positions, key,
            common["dt"], common["kT"], common["fric"], common["skin"],
            common["bthr"], common["nsteps"], None, None, **kw,
        )

    mesh = make_mesh(n_data=n_devices // n_model, n_model=n_model)
    cfg2, ma2, oidx, vs2 = mesh_pad(cfg, ma, vs, mesh)
    n2 = cfg2.positions.shape[0]

    def padn(a):
        a = np.asarray(a)
        return np.pad(a, ((0, n2 - npad),) + ((0, 0),) * (a.ndim - 1))

    amask = jnp.asarray(np.asarray(cfg2.atom_mask)[:, None].astype(float))

    def run_sharded():
        return sharded_md_chunk(
            cfg2, ma2, eng.radii_table(), eng.znum_table(), vs2, amask,
            jnp.asarray(padn(vel)), jnp.asarray(np.ones((n2, 1))),
            jnp.asarray(padn(np.asarray(cfg.positions))), key,
            common["dt"], common["kT"], common["fric"], common["skin"],
            common["bthr"], common["nsteps"], oidx, mesh=mesh, **kw,
        )

    def timed(f):
        r = f()
        jax.block_until_ready(r)
        t0 = time.time()
        r = f()
        jax.block_until_ready(r)
        return (time.time() - t0) / steps * 1000, r

    t1, r1 = timed(run_single)
    t2, r2 = timed(run_sharded)
    err = float(
        np.abs(np.asarray(r2[0])[:npad] - np.asarray(r1[0])).max()
    )

    d_data = n_devices // n_model
    fbytes = 8  # f64 on the CPU harness; 4 on TPU
    psum_forces = n2 * 3 * fbytes
    gath_cov = (n2 // d_data) * mcap * fbytes if check_beta else 0
    print(
        f"mesh_bench: devices={n_devices} mesh=({d_data}x{n_model}) "
        f"natoms={len(sysm)} m={m} steps={steps}"
    )
    print(
        f"  single-device: {t1:8.2f} ms/step   sharded: {t2:8.2f} ms/step "
        f"(CPU wall; overhead x{t2 / t1:.2f})"
    )
    print(f"  trajectory |dpos|max vs single: {err:.2e}")
    print(
        "  per-step collective payload/device (would ride ICI on TPU): "
        f"psum(E) 8 B + psum(forces) {psum_forces / 1024:.1f} KiB"
        + (
            f" + all_gather(cov) {gath_cov / 1024:.1f} KiB + pmax(beta) 8 B"
            if check_beta
            else ""
        )
    )


def main(argv=None):
    import argparse

    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("-n", "--devices", type=int, default=8)
    parser.add_argument("--n-model", type=int, default=2)
    parser.add_argument("--natoms", type=int, default=256)
    parser.add_argument("--steps", type=int, default=50)
    parser.add_argument("--check-beta", action="store_true")
    ns = parser.parse_args(argv)
    env = dict(os.environ)
    env["PALLAS_AXON_POOL_IPS"] = ""
    env["JAX_PLATFORMS"] = "cpu"
    env["JAX_ENABLE_X64"] = "1"
    flags = [
        f
        for f in env.get("XLA_FLAGS", "").split()
        if "xla_force_host_platform_device_count" not in f
    ]
    flags.append(f"--xla_force_host_platform_device_count={ns.devices}")
    env["XLA_FLAGS"] = " ".join(flags)
    pkg_parent = os.path.dirname(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    env["PYTHONPATH"] = os.pathsep.join(
        [pkg_parent] + ([env["PYTHONPATH"]] if env.get("PYTHONPATH") else [])
    )
    code = (
        "from autoforce_tpu.parallel.mesh_bench import _worker; "
        f"_worker({ns.devices}, {ns.n_model}, {ns.natoms}, {ns.steps}, "
        f"{ns.check_beta})"
    )
    proc = subprocess.run([sys.executable, "-c", code], env=env)
    return proc.returncode


if __name__ == "__main__":
    sys.exit(main())
