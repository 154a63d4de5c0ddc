"""Benchmark: MD predict steps/sec at ~1k and ~10k atoms (SGPR SOAP).

Prints ONE JSON line with the headline metric plus diagnostics:
  {"metric": ..., "value": N, "unit": "steps/sec", "vs_baseline": N,
   "ms_per_step": ..., "std_steps_per_sec": ..., "est_mfu": ...,
   "flops_per_step": ..., "natoms": 1008, "scale_10k": {...}}

- value/vs_baseline: Langevin MD steps/sec at 1008 atoms vs the measured
  torch/double reimplementation of the reference's per-step pattern
  (the reference itself cannot run here — it requires ASE; see
  baselines/torch_baseline.py).  Cached in bench_baseline.json.
- est_mfu: XLA-reported FLOPs of the fused predict step (forward + VJP)
  divided by measured step time and chip peak (bf16 MXU peak for the
  detected device kind).  The engine runs matmuls at 'highest' precision
  (3-pass bf16, CLAUDE.md), so the practically reachable ceiling is ~1/3
  of that peak — est_mfu is the honest fraction of nominal peak.
- scale_10k: the same measurement at 10192 atoms (the 10k-atom regime of
  the reference's BCM+LAMMPS headline config, SURVEY.md §6).
"""

import json
import os
import sys
import time

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, HERE)

# persistent compilation cache: repeated bench runs skip the slow
# remote compiles (harmless if the backend ignores it)
import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

NATOMS_REPS = (6, 6, 7)  # 4 * 252 = 1008 atoms
REPS_10K = (13, 14, 14)  # 4 * 2548 = 10192 atoms
REPS_100K = (29, 29, 30)  # 4 * 25230 = 100920 atoms
M_INDUCING = 256
RC = 6.0
LMAX = NMAX = 3
SKIN = 1.2  # swept in round 1: 0.3/0.9/1.2/1.6/2.0 -> optimum ~1.2 at 300 K
# OTF quality bar: the learned model's irreducible force error is set
# by its own sampling thresholds (fdiff = 1.5 * ediff = 0.13 eV/A at
# the reference's 2 kcal/mol band) — the block FAILS if the learned
# surface is worse than threshold-consistent (measured r5: 0.105-0.110)
OTF_F_MAE_BOUND = 0.15  # eV/A

# nominal bf16 MXU peak per chip (public numbers)
PEAK_FLOPS = {
    "TPU v5 lite": 197e12,
    "TPU v5e": 197e12,
    "TPU v5": 459e12,
    "TPU v4": 275e12,
    "TPU v6 lite": 918e12,
}


def build_workload(cache_dir=os.path.join(HERE, "baselines", "bench_model.pckl"),
                   m_inducing=None):
    from autoforce_tpu.descriptor.soap import SoapParams
    from autoforce_tpu.engine import Engine
    from autoforce_tpu.neighbors import displacements, neighbor_table
    from autoforce_tpu.regression.sgpr import InducingEnv, SgprModel
    from autoforce_tpu.system import bulk_fcc

    m_inducing = m_inducing or M_INDUCING
    if cache_dir and os.path.isdir(cache_dir):
        from autoforce_tpu.io.model_io import load_model

        model = load_model(cache_dir)
        if model.m == m_inducing:
            return model.engine, model

    eng = Engine(params=SoapParams(lmax=LMAX, nmax=NMAX, rc=RC), exponent=4,
                 species=[29])
    model = SgprModel(eng)
    # synthetic inducing set: LCEs from rattled unit cells (batched staging)
    envs = []
    small = bulk_fcc("Cu", 3.6).repeat((2, 2, 2))
    rng = np.random.default_rng(0)
    for seed in range(m_inducing):
        s = small.copy()
        s.positions = s.positions + rng.normal(0, 0.08, s.positions.shape)
        t = neighbor_table(s.positions, s.cell, s.pbc, RC)
        r = displacements(s.positions, s.cell, t)
        i = seed % len(s)
        m = t.mask[i]
        envs.append(InducingEnv.from_arrays(29, r[i][m], s.numbers[t.idx[i][m]]))
    ev = eng.make_envs([(e.rvec, e.numbers) for e in envs])
    p, lone = eng.env_descriptors(ev)
    p = np.asarray(p, dtype=np.float64)
    for i, e in enumerate(envs):
        e.desc = p[i]
        e.lone = bool(np.asarray(lone)[i])
        model.X.append(e)
    model.M = (p @ p.T) ** eng.exponent

    # train on LJ data so the benchmark dynamics are physical (an untrained
    # random-weight model superheats and that distorts MD-chunk lengths)
    from autoforce_tpu.calculator.oracles import LennardJones
    from autoforce_tpu.regression.sgpr import DataRecord

    lj = LennardJones(epsilon=0.15, sigma=2.3, rc=RC)
    for k in range(6):
        s = small.copy()
        s.rattle(0.06, seed=50 + k)
        s.calc = lj
        model.add_data(DataRecord.from_system(s), remake=False)
    model.make_munu(optimize=True, noise_f=0.01)
    if cache_dir:
        from autoforce_tpu.io.model_io import save_model

        save_model(model, cache_dir)
    return eng, model


def make_system(reps):
    from autoforce_tpu.system import bulk_fcc

    s = bulk_fcc("Cu", 3.6).repeat(reps)
    s.rattle(0.05, seed=1)
    return s


def make_ms_system(reps, rattle=0.02):
    """4-species mixture (Li/Ge/P/S numbers) on an fcc host — the
    species-count regime of the reference's flagship Li10GeP2S12 config
    (reference cost grows 'often exponentially' with species,
    README.md:95-96; here it is ~linear in S^2 via the descriptor dim)."""
    from autoforce_tpu.system import bulk_fcc

    s = bulk_fcc("Cu", 3.7).repeat(reps)
    rng = np.random.default_rng(0)
    s.numbers[:] = rng.choice(
        [3, 32, 15, 16], size=len(s), p=[0.4, 0.04, 0.08, 0.48]
    )
    s.rattle(rattle, seed=1)
    return s


def make_lgps_system(reps=(4, 4, 2), rattle=0.02):
    """Ordered 4-species crystal at flagship scale — the workload class
    of the reference's headline result (on-the-fly learning in
    Li10GeP2S12, README.md:99-113).  A fixed 32-site motif (Li13 Ge1 P3
    S15 ~ the LGPS 10:1:2:12 stoichiometry) tiles a 2x2x2 fcc block, so
    the crystal has a FINITE local-environment vocabulary (unlike
    make_ms_system's random occupancy, whose ~every-env-unique diversity
    keeps the sampler tripping every step: measured r4, m hit 913 in 15
    steps).  Learning saturates the way the reference's flagship run
    does; Li (shallowest well) stays mobile at 500 K and keeps feeding
    genuinely new environments at a realistic, sparse rate."""
    from autoforce_tpu.system import bulk_fcc

    base = bulk_fcc("Cu", 3.7).repeat((2, 2, 2))  # 32 sites, ordered
    motif = [3, 16] * 13 + [15, 16, 15, 32, 16, 15]  # Li13 S15 P3 Ge1
    base.numbers[:] = np.array(motif)
    s = base.repeat(reps)
    s.rattle(rattle, seed=1)
    return s


def build_ms_workload(
    cache_dir=os.path.join(HERE, "baselines", "bench_model_ms.pckl"),
):
    from autoforce_tpu.calculator.oracles import LennardJones
    from autoforce_tpu.descriptor.soap import SoapParams
    from autoforce_tpu.engine import Engine
    from autoforce_tpu.neighbors import displacements, neighbor_table
    from autoforce_tpu.regression.sgpr import DataRecord, InducingEnv, SgprModel

    if cache_dir and os.path.isdir(cache_dir):
        from autoforce_tpu.io.model_io import load_model

        model = load_model(cache_dir)
        if model.m == M_INDUCING:
            return model.engine, model

    eng = Engine(params=SoapParams(lmax=LMAX, nmax=NMAX, rc=RC), exponent=4,
                 species=[3, 15, 16, 32])
    model = SgprModel(eng)
    small = make_ms_system((2, 2, 2))
    rng = np.random.default_rng(0)
    envs = []
    for seed in range(M_INDUCING):
        s = small.copy()
        s.positions = s.positions + rng.normal(0, 0.08, s.positions.shape)
        t = neighbor_table(s.positions, s.cell, s.pbc, RC)
        r = displacements(s.positions, s.cell, t)
        i = seed % len(s)
        m = t.mask[i]
        envs.append(
            InducingEnv.from_arrays(
                s.numbers[i], r[i][m], s.numbers[t.idx[i][m]]
            )
        )
    ev = eng.make_envs([(e.rvec, e.numbers) for e in envs])
    p, lone = eng.env_descriptors(ev)
    p = np.asarray(p, dtype=np.float64)
    zs = np.array([e.number for e in envs])
    for i, e in enumerate(envs):
        e.desc = p[i]
        e.lone = bool(np.asarray(lone)[i])
        model.X.append(e)
    model.M = (p @ p.T) ** eng.exponent * (zs[:, None] == zs[None, :])
    lj = LennardJones(epsilon=0.15, sigma=2.3, rc=RC)
    for k in range(4):
        s = small.copy()
        s.rattle(0.06, seed=50 + k)
        s.calc = lj
        model.add_data(DataRecord.from_system(s), remake=False)
    model.make_munu(optimize=True, noise_f=0.01)
    if cache_dir:
        from autoforce_tpu.io.model_io import save_model

        save_model(model, cache_dir)
    return eng, model


def flops_per_step(eng, model, system):
    """XLA-reported FLOPs of the fused predict step (fwd + VJP) — the
    per-MD-step device work (integrator adds O(N) negligible flops)."""
    from autoforce_tpu.engine import predict_fn

    cfg = eng.make_config(system)
    ma = model.full_model_arrays()
    vs = np.ones(cfg.npad)
    import jax.numpy as jnp

    try:
        lowered = predict_fn.lower(
            cfg, ma, eng.radii_table(),
            jnp.asarray(vs, dtype=cfg.positions.dtype),
            eng.params, eng.exponent,
            znum=eng.znum_table(),
        )
        ca = lowered.compile().cost_analysis()
        ca = ca[0] if isinstance(ca, list) else ca
        return float(ca["flops"])
    except Exception:
        return None


def measure_device_md(eng, model, system, steps=300, chunk=100, repeats=3,
                      warmup=150, temperature_K=300, kpad_min=0):
    """Headline: real Langevin MD with the device-resident integrator
    (forces + thermostat + integration on-chip; host re-entry only for
    Verlet-skin neighbor rebuilds).  Returns per-repeat steps/sec.

    A workload whose start configuration is far from the model's own
    equilibrium (the multispecies mixture) superheats and then relaxes
    over thousands of steps; measuring inside that transient is bimodal —
    the neighbor bucket grows mid-window and the md_chunk recompile
    (~20 s on the remote axon backend) poisons a repeat.  Long warmup at
    the measurement friction lets kpad saturate first; downstream,
    report the MEDIAN over repeats so one residual recompile cannot
    shift the headline."""
    from autoforce_tpu import units
    from autoforce_tpu.calculator.active import ActiveCalculator
    from autoforce_tpu.md.device_md import DeviceMD
    from autoforce_tpu.system import maxwell_boltzmann_velocities

    calc = ActiveCalculator(
        covariance=model, calculator=None, logfile=None, pckl=None, tape=None,
        skin=SKIN, kpad_min=kpad_min,
    )
    system = system.copy()
    system.calc = calc
    maxwell_boltzmann_velocities(system, temperature_K, seed=3)
    dyn = DeviceMD(system, calc, dt=2 * units.fs, temperature_K=temperature_K,
                   friction=0.02, chunk=chunk, check_beta=False)
    dyn.run(warmup)  # compile + let the neighbor bucket settle
    out = []
    for _ in range(repeats):
        t0 = time.time()
        dyn.run(steps)
        out.append(steps / (time.time() - t0))
    return out


def measure_replicas(eng, model, system, R=16, steps=300, warmup=150,
                     chunk=400, temperature_K=300):
    """Aggregate throughput of R batched walkers (md_chunk_replicas) —
    the arithmetic-intensity lever: the inducing set is read from HBM
    once per step for ALL walkers (VERDICT r2 weak #1)."""
    from autoforce_tpu import units
    from autoforce_tpu.calculator.active import ActiveCalculator
    from autoforce_tpu.md.replica_md import ReplicaMD
    from autoforce_tpu.system import maxwell_boltzmann_velocities

    calc = ActiveCalculator(
        covariance=model, calculator=None, logfile=None, pckl=None,
        tape=None, skin=SKIN,
    )
    systems = []
    for r in range(R):
        s = system.copy()
        s.rattle(0.01, seed=100 + r)
        maxwell_boltzmann_velocities(s, temperature_K, seed=200 + r)
        systems.append(s)
    rmd = ReplicaMD(systems, calc, dt=2 * units.fs,
                    temperature_K=temperature_K, friction=0.02, chunk=chunk,
                    check_beta=False)
    rmd.run(warmup)
    t0 = time.time()
    rmd.run(steps)
    dt = time.time() - t0
    return R * steps / dt


def accuracy_gate(eng, model, system, nve_steps=1000, reps=None):
    """On-chip accuracy assertions (VERDICT r2 weak #5): force/energy vs
    a float64 CPU reference on one snapshot, plus total-energy drift over
    a short on-chip NVE segment.  Institutionalizes the round-2 bf16
    reduce-of-dot lesson: a silent precision regression (e.g. removing
    engine.precise_sum: 0.69 eV energy error at 1008 atoms) trips the
    gate, which the CPU x64 test suite cannot see.

    All energy thresholds are PER-ATOM (VERDICT r3 weak #5: an absolute
    bound false-trips at 10k and drifts silently at 1k).  ``reps``
    selects the snapshot size; pass ``nve_steps=0`` for a snapshot-only
    gate (used for the 10k point, where the f64 CPU reference predict
    dominates wall time)."""
    import subprocess

    from autoforce_tpu import units
    from autoforce_tpu.calculator.active import ActiveCalculator
    from autoforce_tpu.md.device_md import DeviceMD
    from autoforce_tpu.system import maxwell_boltzmann_velocities

    reps = tuple(reps or NATOMS_REPS)
    n = len(system)
    cfg = eng.make_config(system)
    ma = model.full_model_arrays()
    vs = np.ones(cfg.npad)
    e, f, *_ = eng.predict(cfg, ma, vs)
    e_chip = float(e)
    f_chip = np.asarray(f)[:n]

    # float64 reference in a CPU subprocess (this process owns the TPU).
    # The reference depends only on (model, system), both deterministic —
    # cache it keyed by a model fingerprint so repeat runs (and the 10k
    # point, whose f64 CPU predict dominated round-4's overrun) skip the
    # subprocess entirely.
    import hashlib

    mu_hash = hashlib.sha256(
        np.ascontiguousarray(model.mu).tobytes()
        + np.int64(model.m).tobytes()
    ).hexdigest()[:16]
    out_npz = os.path.join(HERE, "baselines", f"_acc_ref_{n}.npz")
    cached = None
    if os.path.isfile(out_npz):
        try:
            prev = np.load(out_npz, allow_pickle=False)
            if "mu_hash" in prev and str(prev["mu_hash"]) == mu_hash:
                cached = prev
        except Exception:
            cached = None
    code = (
        f"import sys; sys.path.insert(0, {HERE!r})\n"
        "import numpy as np, jax\n"
        "jax.config.update('jax_enable_x64', True)\n"
        "import bench\n"
        "from autoforce_tpu.io.model_io import load_model\n"
        f"model = load_model({os.path.join(HERE, 'baselines', 'bench_model.pckl')!r})\n"
        "eng = model.engine\n"
        f"system = bench.make_system({reps!r})\n"
        "cfg = eng.make_config(system)\n"
        "ma = model.full_model_arrays()\n"
        "vs = np.ones(cfg.npad)\n"
        "e, f, *_ = eng.predict(cfg, ma, vs)\n"
        f"np.savez({out_npz!r}, e=float(e), f=np.asarray(f)[:len(system)],\n"
        f"         mu_hash={mu_hash!r})\n"
    )
    if cached is None:
        env = dict(os.environ)
        env["PALLAS_AXON_POOL_IPS"] = ""
        env["JAX_PLATFORMS"] = "cpu"
        subprocess.run([sys.executable, "-c", code], env=env, check=True,
                       timeout=900)
    ref = cached if cached is not None else np.load(out_npz)
    e_err = abs(e_chip - float(ref["e"]))
    f_mae = float(np.abs(f_chip - ref["f"]).mean())

    # on-chip NVE conservation (skipped for snapshot-only gates)
    drift = 0.0
    if nve_steps:
        s = system.copy()
        maxwell_boltzmann_velocities(s, 300, seed=11)
        calc = ActiveCalculator(covariance=model, calculator=None,
                                logfile=None, pckl=None, tape=None, skin=SKIN)
        s.calc = calc

        def etot():
            return s.get_potential_energy() + s.get_kinetic_energy()

        dyn = DeviceMD(s, calc, dt=2 * units.fs, chunk=500, check_beta=False,
                       thermostat="none")
        e0 = etot()
        dyn.run(nve_steps)
        e1 = etot()
        drift = abs(e1 - e0) / n * (1000.0 / nve_steps)

    # thresholds sit between the measured-good values (e_err ~4e-5
    # eV/atom, f_mae ~5e-5, drift 2.6e-4; measured r3 on-chip) and the
    # failure signatures (bf16 reduce-of-dot fold, measured r3 in
    # isolation: 2.7e-4 eV/atom; r2 in the full path: 6.8e-4)
    ok = e_err / n < 2e-4 and f_mae < 1e-2 and drift < 1e-3
    out = {
        "natoms": n,
        "e_abs_err_per_atom": round(e_err / n, 9),
        "f_mae_vs_f64_eV_A": round(f_mae, 8),
        "ok": bool(ok),
    }
    if nve_steps:
        out["nve_drift_eV_atom_1ksteps"] = round(drift, 8)
    return out


def measure_otf(grow_cap=400, prod_steps=400, chunk=50,
                temperature_K=400, ediff=None, m_target=512,
                max_inducing=1024, grow_wall_cap=900.0,
                prod_wall_cap=480.0):
    """Flagship on-the-fly learning at flagship scale (VERDICT r3 item
    #1): a 1024-atom ordered 4-species LGPS-like crystal learns its PES
    from a per-pair LJ-mixture oracle DURING device-resident Langevin MD
    with the uncertainty trip ON (check_beta=True), the model growing
    from seed — the workload class of the reference's headline result
    (on-the-fly learning during 1000-atom multi-species MD,
    README.md:99-113; hot path theforce/calculator/active.py:425-534).

    Three phases, all with the trip armed:
      growth      — run until m >= m_target, OR the sampler goes quiet
                    (a full check window with zero oracle calls: the
                    crystal's env vocabulary is covered — how the
                    reference's flagship run actually saturates), OR the
                    step/wall caps: the sampling-dense regime; wall is
                    dominated by model updates, reported per event.
      production  — prod_steps more with learning still ON (trips now
                    sparse): steps/s *including* learning.  This is the
                    regime the reference's flagship numbers live in.
      frozen      — same steps with the oracle detached: the overhead
                    denominator (learning_overhead_x = prod/frozen
                    wall ratio; target <= 2x).
    Also reports the wall-fraction breakdown (sampling / refit solves /
    oracle, ActiveCalculator.phase_wall), event counts, bucket-growth
    recompile counts, and the learned model's force MAE vs the oracle."""
    import shutil
    import tempfile

    from autoforce_tpu import units
    from autoforce_tpu.calculator.active import ActiveCalculator
    from autoforce_tpu.calculator.oracles import MixtureLennardJones
    from autoforce_tpu.md.device_md import DeviceMD
    from autoforce_tpu.system import maxwell_boltzmann_velocities

    # LGPS-like bonding hierarchy: a strongly-bound S/P/Ge frame
    # (kT/eps ~ 0.08, solidly crystalline at 400 K) with moderately
    # bound, mobile Li (kT/eps ~ 0.23).  Measured r4: a uniformly
    # shallow mixture (Li eps 0.08 -> kT/eps 0.54) melts, heats to
    # ~1500 K on model-update discontinuities, and the sampler then
    # rightly never quiets (a liquid's env space is unbounded) — the
    # flagship workload is the reference's superionic SOLID
    eps = {(3, 3): 0.15, (32, 32): 0.45, (15, 15): 0.45, (16, 16): 0.40}
    sig = {(3, 3): 2.0, (32, 32): 2.5, (15, 15): 2.2, (16, 16): 2.3}
    oracle = MixtureLennardJones(eps, sig, rc=RC)
    # the reference's own sampling thresholds (active.py:118-122:
    # ediff = 2 kcal/mol, ediff_tot = 4, fdiff = 3): measured r4, a
    # 0.02 eV ediff pins covloss AT the threshold and the sampler adds
    # ~50 LCEs per step forever (m hit 944 in 36 steps on the ordered
    # crystal) — the flagship regime is the reference's own band
    ediff = ediff if ediff is not None else 2 * units.kcal_mol

    tmp = tempfile.mkdtemp(prefix="otf1k_")
    cwd = os.getcwd()
    os.chdir(tmp)  # active_uncertain/FP side files land here
    try:
        calc = ActiveCalculator(
            covariance=None, calculator=oracle,
            logfile=os.path.join(tmp, "active.log"), pckl=None, tape=None,
            kernel_kw=dict(cutoff=RC, lmax=LMAX, nmax=NMAX),
            ediff=ediff, ediff_tot=2 * ediff, fdiff=1.5 * ediff,
            noise_f=0.01, max_inducing=max_inducing, skin=SKIN,
        )
        s = make_lgps_system()
        s.calc = calc
        maxwell_boltzmann_velocities(s, temperature_K, seed=13)
        # friction 0.05/fs: each model update is a small force
        # discontinuity = energy injection; the thermostat must drain
        # it faster than the sampling-dense phase injects it
        dyn = DeviceMD(s, calc, dt=2 * units.fs,
                       temperature_K=temperature_K, friction=0.05,
                       chunk=chunk, seed=14)
        assert dyn.check_beta

        # -------- growth: to m_target / sampler-quiet / caps
        t0 = time.time()
        grow_steps = 0
        exit_reason = "m_target"
        quiet = 0
        while calc.size[1] < m_target:
            fp0 = calc.event_counts.get("fp_calls", 0)
            dyn.run(20)  # fine-grained: caps can't overshoot much
            grow_steps += 20
            quiet = (quiet + 1
                     if calc.event_counts.get("fp_calls", 0) == fp0
                     else 0)
            if quiet >= max(1, chunk // 20):
                exit_reason = "sampler_quiet"
                break
            if grow_steps >= grow_cap:
                exit_reason = "step_cap"
                break
            if time.time() - t0 > grow_wall_cap:
                exit_reason = "wall_cap"
                break
        t_grow = time.time() - t0
        m_grow = calc.size[1]
        pw_g = dict(calc.phase_wall)
        ev_g = dict(calc.event_counts)

        # -------- production: learning stays armed (wall-capped in
        # sub-chunks: if the sampler never quiets the block still
        # reports an honest, bounded steps/s-including-learning)
        t0 = time.time()
        prod_done = 0
        while prod_done < prod_steps:
            # 20-step sub-chunks: the cap can only overshoot by one
            # sub-chunk, and a trip-free boundary costs ~1 RTT (the
            # chain stays device-resident), so the granularity is free
            sub = min(20, prod_steps - prod_done)
            dyn.run(sub)
            prod_done += sub
            if time.time() - t0 > prod_wall_cap:
                break
        t_prod = time.time() - t0
        prod_steps = prod_done
        ndata, m = calc.size
        pw = {k: v - pw_g.get(k, 0.0) for k, v in calc.phase_wall.items()}
        ev = {k: v - ev_g.get(k, 0) for k, v in calc.event_counts.items()}

        # learned-model accuracy vs the oracle on the final snapshot
        ref = s.copy()
        ref.calc = oracle
        res = calc.calculate(s)
        f_mae = float(np.abs(res["forces"] - ref.get_forces()).mean())
        e_err_per_atom = float(
            abs(res["energy"] - ref.get_potential_energy()) / len(s)
        )

        # -------- frozen: same steps, oracle detached, same shapes
        calc._calc = None
        s2 = s.copy()
        s2.calc = calc
        maxwell_boltzmann_velocities(s2, temperature_K, seed=15)
        dyn2 = DeviceMD(s2, calc, dt=2 * units.fs,
                        temperature_K=temperature_K, friction=0.05,
                        chunk=chunk, check_beta=False)
        dyn2.run(chunk)  # warm the frozen chunk
        t0 = time.time()
        dyn2.run(prod_steps)
        t_frozen = time.time() - t0

        host_wall = sum(pw.values())
        # vocabulary saturation: the overhead target (prod ~ frozen) is
        # only reachable AFTER the crystal's thermal env vocabulary is
        # covered; measured r5 (both 300 K and 400 K): m was still
        # growing at the 120-step horizon (the reference's flagship
        # demos run tens of ps before quieting), so saturation is
        # REPORTED, not assumed
        saturated = exit_reason == "sampler_quiet" and ev.get(
            "added_inducing", 0) == 0
        grow_upd = sum(
            pw_g.get(k, 0.0)
            for k in ("upd_inducing", "upd_data", "upd_refit")
        )
        return {
            "natoms": len(s),
            "nspecies": 4,
            "grow": {
                "steps": grow_steps,
                "wall_s": round(t_grow, 1),
                "exit": exit_reason,
                "m_at_exit": m_grow,
                "added_inducing": ev_g.get("added_inducing", 0),
                "fp_calls": ev_g.get("fp_calls", 0),
                "updates": ev_g.get("updates", 0),
                "update_wall_s": round(grow_upd, 1),
                "update_wall_frac": round(grow_upd / max(t_grow, 1e-9), 3),
            },
            "prod_steps": prod_steps,
            "steps_per_sec_incl_learning": round(prod_steps / t_prod, 2),
            "frozen_steps_per_sec": round(prod_steps / t_frozen, 2),
            "learning_overhead_x": round(t_prod / t_frozen, 2),
            "final_m": m,
            "final_ndata": ndata,
            "prod_fp_calls": ev.get("fp_calls", 0),
            "prod_updates": ev.get("updates", 0),
            "recompiles": {
                "mcap_growth": calc.model.mcap_growth,
                "kpad_growth": calc.event_counts.get("kpad_growth", 0),
                "npad_growth": calc.event_counts.get("npad_growth", 0),
            },
            "prod_wall_fracs": {
                "device_md": round(
                    max(0.0, t_prod - host_wall) / t_prod, 3),
                "sampling": round(
                    (pw.get("upd_inducing", 0.0) + pw.get("upd_data", 0.0)
                     - pw.get("oracle", 0.0)) / t_prod, 3),
                "refit_solves": round(
                    pw.get("upd_refit", 0.0) / t_prod, 3),
                "oracle": round(pw.get("oracle", 0.0) / t_prod, 3),
                "predict_host": round(pw.get("predict", 0.0) / t_prod, 3),
            },
            "saturated": bool(saturated),
            "f_mae_vs_oracle": round(f_mae, 5),
            "e_err_per_atom_vs_oracle": round(e_err_per_atom, 7),
        }
    finally:
        os.chdir(cwd)
        shutil.rmtree(tmp, ignore_errors=True)


def measure_m_scale(ms=(1024, 2048), steps=200, chunk=100):
    """The large-m regime (VERDICT r3 item #2): reference workflows run
    max_inducing ~1000+ (theforce/calculator/active.py defaults; BCM
    spawns at saturation, active_bcm.py:462-472) while every other bench
    point pins m=256.  For each m: device-MD steps/s at 1008 atoms,
    est_mfu (the (N,m)x(m,) covariance matmuls become MXU-relevant
    here), and the model-update latencies that scale in m (add_data
    O(n*m), make_munu solve O(m^3), one add_1inducing trial).  The
    largest m also reports the 10k-atom steps/s."""
    from autoforce_tpu.calculator.oracles import LennardJones
    from autoforce_tpu.regression.sgpr import DataRecord
    from autoforce_tpu.system import bulk_fcc

    out = {}
    for m in ms:
        cache = os.path.join(HERE, "baselines", f"bench_model_m{m}.pckl")
        eng, model = build_workload(cache_dir=cache, m_inducing=m)
        system = make_system(NATOMS_REPS)
        reps = measure_device_md(eng, model, system, steps=steps,
                                 chunk=chunk, repeats=3, warmup=chunk)
        v = float(np.median(reps))
        fl = flops_per_step(eng, model, system)
        est = mfu(fl, v)
        entry = {
            "steps_per_sec_1k": round(v, 2),
            "ms_per_step_1k": round(1000.0 / v, 3),
            "est_mfu": round(est, 4) if est else None,
            "flops_per_step": fl,
        }
        if m == max(ms):
            reps10 = measure_device_md(eng, model, make_system(REPS_10K),
                                       steps=max(60, steps // 3),
                                       chunk=60, repeats=3, warmup=60)
            v10 = float(np.median(reps10))
            entry["steps_per_sec_10k"] = round(v10, 2)
            entry["ms_per_step_10k"] = round(1000.0 / v10, 3)

        # update-op latencies at this m (host+device hybrid ops)
        lj = LennardJones(epsilon=0.15, sigma=2.3, rc=RC)
        small = bulk_fcc("Cu", 3.6).repeat((2, 2, 2))
        small.rattle(0.06, seed=99)
        small.calc = lj
        t0 = time.time()
        model.add_data(DataRecord.from_system(small), remake=False)
        t_add = time.time() - t0
        t0 = time.time()
        model.make_munu(noise_f=0.01)
        t_munu = time.time() - t0
        # one accept/reject inducing trial (the sampling-loop unit cost)
        from autoforce_tpu.neighbors import displacements, neighbor_table

        probe = small.copy()
        probe.rattle(0.08, seed=100)
        t = neighbor_table(probe.positions, probe.cell, probe.pbc, RC)
        r = displacements(probe.positions, probe.cell, t)
        msk = t.mask[0]
        from autoforce_tpu.regression.sgpr import InducingEnv

        env = InducingEnv.from_arrays(29, r[0][msk],
                                      probe.numbers[t.idx[0][msk]])
        t0 = time.time()
        model.add_1inducing(env, ediff=np.inf)  # always rejects: pure trial
        t_trial = time.time() - t0
        model.pop_1data()
        model.make_munu(noise_f=0.01)
        entry.update({
            "add_data_ms": round(1000 * t_add, 1),
            "make_munu_ms": round(1000 * t_munu, 1),
            "inducing_trial_ms": round(1000 * t_trial, 1),
        })
        out[f"m{m}"] = entry
    return out


def measure_baseline(eng, model, system, cache="bench_baseline.json"):
    path = os.path.join(HERE, cache)
    key = f"{len(system)}x{model.m}_l{LMAX}n{NMAX}rc{RC}"
    if os.path.isfile(path):
        with open(path) as f:
            data = json.load(f)
        if key in data:
            return data[key], False
    from baselines.torch_baseline import measure_baseline as mb
    from autoforce_tpu.neighbors import neighbor_table

    t = neighbor_table(system.positions, system.cell, system.pbc, RC)
    Xd = np.stack([x.desc for x in model.X])
    val = mb(system, t, Xd, model.mu, steps=2, lmax=LMAX, nmax=NMAX, rc=RC)
    data = {}
    if os.path.isfile(path):
        with open(path) as f:
            data = json.load(f)
    data[key] = val
    with open(path, "w") as f:
        json.dump(data, f)
    return val, True


def mfu(flops, steps_per_sec):
    kind = jax.devices()[0].device_kind
    peak = PEAK_FLOPS.get(kind)
    if peak is None or flops is None:
        return None
    return flops * steps_per_sec / peak


def main():
    """All blocks run under a global wall budget with incremental
    partial output (VERDICT r4 weak #2: round-4's bench hit the
    driver's external timeout and lost EVERY number, including the
    accuracy gates).  Resilience layers:
      * the accumulating result dict is dumped to bench_partial.json
        after every block;
      * SIGTERM/SIGINT (what `timeout` sends) print the single JSON
        line with whatever completed, then exit 0;
      * each block declares an estimated cost and is skipped (loudly,
        in its slot) when the remaining budget cannot cover it —
        ordered so the headline + accuracy + flagship-OTF numbers
        land first."""
    import signal

    t_start = time.time()
    budget = float(os.environ.get("BENCH_WALL_S", "3000"))
    deadline = t_start + budget
    out = {}
    state = {"printed": False}

    def emit():
        if not state["printed"]:
            state["printed"] = True
            out["bench_wall_s"] = round(time.time() - t_start, 1)
            print(json.dumps(out))
            sys.stdout.flush()

    def flush_partial():
        try:
            with open(os.path.join(HERE, "bench_partial.json"), "w") as f:
                json.dump(out, f)
        except OSError:
            pass

    def on_term(sig, frame):
        out["terminated"] = f"signal {sig} after {round(time.time() - t_start, 1)}s"
        print(f"bench: terminated by signal {sig}; emitting partial JSON",
              file=sys.stderr)
        emit()
        os._exit(0)

    signal.signal(signal.SIGTERM, on_term)
    signal.signal(signal.SIGINT, on_term)

    def block(key, est_s, fn):
        left = deadline - time.time()
        if left < est_s:
            out[key] = {"skipped": f"wall budget: {int(left)}s left < "
                                   f"est {est_s}s"}
        else:
            try:
                out[key] = fn()
            except Exception as err:
                out[key] = {"error": repr(err)}
        flush_partial()

    # ---- headline (required: everything else hangs off this model)
    try:
        eng, model = build_workload()
        system = make_system(NATOMS_REPS)
        fl = flops_per_step(eng, model, system)
        # chunk = traced upper bound per device call; the skin-breach
        # early exit keeps it adaptive (sweep r2: 100 -> 237, 400 -> 254,
        # 800 -> 263 steps/s at 1008 atoms)
        runs = measure_device_md(eng, model, system, steps=600, chunk=800)
        ours = float(np.mean(runs))
        std = float(np.std(runs))
    except Exception as err:
        out.update({"metric": "bench workload failed", "value": None,
                    "unit": "steps/sec", "vs_baseline": None,
                    "error": repr(err)})
        emit()
        return
    est = mfu(fl, ours)
    out.update({
        "metric": f"Langevin MD steps/sec, {len(system)} atoms, "
                  f"m={model.m} (SGPR SOAP, device-resident MD)",
        "value": round(ours, 3),
        "unit": "steps/sec",
        "vs_baseline": None,
        "ms_per_step": round(1000.0 / ours, 3),
        "std_steps_per_sec": round(std, 3),
        "est_mfu": round(est, 4) if est else None,
        "flops_per_step": fl,
        "natoms": len(system),
        "device": jax.devices()[0].device_kind,
    })
    flush_partial()

    # ---- on-chip accuracy gate FIRST (CLAUDE.md: numerics changes are
    # validated on the TPU or not at all; round-4 lost this to a later
    # block's overrun)
    def _acc():
        acc = accuracy_gate(eng, model, make_system(NATOMS_REPS))
        if not acc["ok"]:
            print(f"ACCURACY FAIL: {acc}", file=sys.stderr)
        return acc

    block("accuracy", 240, _acc)

    def _scale10k():
        big = make_system(REPS_10K)
        fl10 = flops_per_step(eng, model, big)
        runs10 = measure_device_md(eng, model, big, steps=100, warmup=50)
        v10 = float(np.mean(runs10))
        return {
            "natoms": len(big),
            "steps_per_sec": round(v10, 3),
            "std_steps_per_sec": round(float(np.std(runs10)), 3),
            "ms_per_step": round(1000.0 / v10, 3),
            "est_mfu": round(mfu(fl10, v10), 4) if mfu(fl10, v10) else None,
            "flops_per_step": fl10,
        }

    block("scale_10k", 200, _scale10k)

    # flagship on-the-fly learning at 1008 atoms / 4 species, with the
    # quality bars ASSERTED (VERDICT r4 item #6): slow or wrong learning
    # fails loudly, like an accuracy failure
    inf_ = float("inf")

    def _otf():
        otf = measure_otf(grow_wall_cap=min(700.0, deadline - time.time()
                                            - 500.0),
                          prod_wall_cap=300.0)
        # ok = the flagship flow COMPLETED and learned a
        # threshold-consistent surface.  learning_overhead_x is a
        # measurement, gated only once the sampler saturates (the
        # 120-step bench horizon does not reach the quiet phase on this
        # workload; see BASELINE.md round-5 OTF study)
        ok = otf.get("f_mae_vs_oracle", inf_) <= OTF_F_MAE_BOUND
        if otf.get("saturated") and otf.get(
                "learning_overhead_x", inf_) > 2.0:
            ok = False
        otf["ok"] = bool(ok)
        otf["f_mae_bound"] = OTF_F_MAE_BOUND
        return otf

    block("otf_1k", 1300, _otf)
    otf = out.get("otf_1k")
    if not (isinstance(otf, dict) and otf.get("ok")):
        print(f"OTF FAIL (missing, slow, or inaccurate): {otf}",
              file=sys.stderr)

    # large-m regime (models are cached in baselines/, so repeat runs
    # skip the build+solve)
    block("m_scale", 700, measure_m_scale)

    # snapshot-only accuracy gate at the 10k point (per-atom bounds)
    def _acc10k():
        acc10k = accuracy_gate(eng, model, make_system(REPS_10K),
                               nve_steps=0, reps=REPS_10K)
        if not acc10k["ok"]:
            print(f"ACCURACY FAIL (10k): {acc10k}", file=sys.stderr)
        return acc10k

    block("accuracy_10k", 400, _acc10k)

    # 100k-atom point: 10x the reference's biggest (BCM+LAMMPS 10k)
    # config, still on ONE chip.  kpad_min 176 = the natural bucket at
    # this density (r2's 256 cost 32%; ms/step ~linear in the bucket)
    def _scale100k():
        huge = make_system(REPS_100K)
        runs100 = measure_device_md(eng, model, huge, steps=30, chunk=30,
                                    repeats=3, warmup=15, kpad_min=176)
        v100 = float(np.median(runs100))
        return {
            "natoms": len(huge),
            "steps_per_sec": round(v100, 3),
            "repeats": [round(float(r), 2) for r in runs100],
            "ms_per_step": round(1000.0 / v100, 1),
        }

    block("scale_100k", 350, _scale100k)

    # 4-species (LGPS-like species count) diffusive point: exercises the
    # S^2 descriptor blocks and the on-device neighbor rebuild path.
    # kpad_min 256: one bucket above the stationary 224 so no recompile
    # lands inside a measured repeat (costs ~10% vs the 224 bucket)
    def _ms():
        eng_ms, model_ms = build_ms_workload()
        big_ms = make_ms_system(NATOMS_REPS)
        runs_ms = measure_device_md(eng_ms, model_ms, big_ms, steps=400,
                                    chunk=400, warmup=2400, repeats=7,
                                    temperature_K=100, kpad_min=256)
        vms = float(np.median(runs_ms))
        q1, q3 = np.percentile(runs_ms, [25, 75])
        return {
            "natoms": len(big_ms),
            "nspecies": 4,
            "steps_per_sec": round(vms, 3),
            "iqr": [round(float(q1), 2), round(float(q3), 2)],
            "repeats": [round(float(r), 2) for r in runs_ms],
            "ms_per_step": round(1000.0 / vms, 3),
        }

    block("multispecies_1k", 450, _ms)

    # replica-batched walkers: aggregate throughput / MFU of R=16
    # independent 1008-atom Langevin walkers in ONE device program
    def _reps():
        R = 16
        agg = measure_replicas(eng, model, make_system(NATOMS_REPS), R=R)
        per = agg / R
        est_r = mfu(fl, agg)
        return {
            "replicas": R,
            "aggregate_steps_per_sec": round(agg, 1),
            "per_walker_steps_per_sec": round(per, 1),
            "est_mfu": round(est_r, 4) if est_r else None,
        }

    block("replicas_1k", 300, _reps)

    # BCM committee chunk: per-expert work is one (N, m) MXU covariance
    # pair and the expert-invariant descriptor/gather work hoists out of
    # the vmap, so committees should cost ~nothing on-chip (BASELINE.md
    # round-3 measurement: E=2..5 all within noise of single-model)
    def _committee():
        import jax
        import jax.numpy as jnp

        from autoforce_tpu import units
        from autoforce_tpu.calculator.active import ActiveCalculator
        from autoforce_tpu.md.device_md import (DeviceMD, md_chunk,
                                                md_chunk_committee)

        calc = ActiveCalculator(covariance=model, calculator=None,
                                logfile=None, pckl=None, tape=None,
                                skin=SKIN)
        s_c = make_system(NATOMS_REPS)
        s_c.calc = calc
        s_c.get_potential_energy()
        cfgc = calc.cfg
        mac = model.full_model_arrays()
        dtc = cfgc.positions.dtype
        vsc = model.vscale_for(np.asarray(cfgc.numbers))
        vsc = np.where(np.isfinite(vsc), vsc, DeviceMD._VS_UNSEEN)
        velc = np.zeros((cfgc.npad, 3))
        velc[: len(s_c)] = np.random.default_rng(0).normal(
            0, 5e-3, (len(s_c), 3)
        )
        msc = np.ones((cfgc.npad, 1))
        msc[: len(s_c), 0] = s_c.get_masses()
        NSC = 100
        chem_z, mixL = eng.chem_args()
        ckw = dict(params=eng.params, exponent=eng.exponent,
                   pair_terms=eng.pair_terms, check_beta=True,
                   thermostat="langevin", kind=eng.kernel_kind)
        carr = (jnp.asarray(velc, dtype=dtc), jnp.asarray(msc, dtype=dtc),
                cfgc.positions, jax.random.PRNGKey(0),
                jnp.asarray(2 * units.fs, dtype=dtc),
                jnp.asarray(units.kB * 300, dtype=dtc),
                jnp.asarray(0.02, dtype=dtc), jnp.asarray(1e3, dtype=dtc),
                jnp.asarray(1e9, dtype=dtc), jnp.asarray(NSC, np.int32))

        def rate(f):
            jax.block_until_ready(f()[0])
            best = 1e9
            for _ in range(3):
                t0 = time.time()
                jax.block_until_ready(f()[0])
                best = min(best, time.time() - t0)
            return NSC / best

        v_one = rate(lambda: md_chunk(
            cfgc, mac, eng.radii_table(), eng.znum_table(),
            jnp.asarray(vsc, dtype=dtc), *carr, chem_z, mixL, **ckw))
        E = 3
        ma_c = jax.tree.map(lambda x: jnp.stack([x] * E), mac)
        v_com = rate(lambda: md_chunk_committee(
            cfgc, ma_c, eng.radii_table(), eng.znum_table(),
            jnp.asarray(np.stack([vsc] * E), dtype=dtc),
            jnp.zeros(E, dtype=dtc), *carr, chem_z, mixL, **ckw))
        return {
            "experts": E,
            "steps_per_sec": round(v_com, 1),
            "single_model_steps_per_sec": round(v_one, 1),
            "cost_vs_single": round(v_one / v_com, 3),
        }

    block("committee_1k", 250, _committee)

    # device-resident NPT (isotropic MTK barostat + virial from the
    # forces' backward pass) and FIRE relaxation: short steady-state
    # windows — these document the capability's throughput class
    def _npt():
        from autoforce_tpu import units
        from autoforce_tpu.calculator.active import ActiveCalculator
        from autoforce_tpu.md.device_npt import DeviceNPT
        from autoforce_tpu.system import maxwell_boltzmann_velocities

        calc = ActiveCalculator(covariance=model, calculator=None,
                                logfile=None, pckl=None, tape=None,
                                skin=SKIN)
        s_npt = make_system(NATOMS_REPS)
        s_npt.calc = calc
        maxwell_boltzmann_velocities(s_npt, 300, seed=3)
        dyn = DeviceNPT(s_npt, calc, 2 * units.fs, temperature_K=300,
                        pressure_GPa=0.0, tdamp=50 * units.fs,
                        pdamp=500 * units.fs, chunk=100, check_beta=False,
                        isotropic=True)
        dyn.run(150)
        t0 = time.time()
        dyn.run(300)
        v_npt = 300.0 / (time.time() - t0)
        return {"steps_per_sec": round(v_npt, 1),
                "ms_per_step": round(1000.0 / v_npt, 3)}

    block("npt_1k", 200, _npt)

    def _fire():
        from autoforce_tpu.calculator.active import ActiveCalculator
        from autoforce_tpu.opt.device_fire import DeviceFIRE

        calc = ActiveCalculator(covariance=model, calculator=None,
                                logfile=None, pckl=None, tape=None,
                                skin=SKIN)
        s_f = make_system(NATOMS_REPS)
        s_f.calc = calc
        dopt = DeviceFIRE(s_f, calc, dt=0.05, chunk=150, check_beta=False)
        dopt.run(fmax=1e-12, steps=150)
        t0 = time.time()
        dopt.run(fmax=1e-12, steps=300)
        v_f = 300.0 / (time.time() - t0)
        return {"iters_per_sec": round(v_f, 1)}

    block("relax_fire_1k", 160, _fire)

    # the measured torch/double per-step baseline (cached across runs)
    def _vs_baseline():
        base, _fresh = measure_baseline(eng, model, system)
        return round(ours / base, 2)

    block("vs_baseline", 120, _vs_baseline)
    if isinstance(out.get("vs_baseline"), dict):  # error/skip marker
        out["vs_baseline_note"] = out["vs_baseline"]
        out["vs_baseline"] = None

    emit()


if __name__ == "__main__":
    main()
