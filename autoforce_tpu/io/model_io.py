"""Model folder persistence (role of the reference's .pckl folders,
gppotential.py:1060-1119, 1342-1368) in a portable npz+json+extxyz layout:

    folder/
      meta.json      descriptor/kernel config, species, noise, mean, stats
      arrays.npz     M, Ke, Kf, Kv, mu, choli
      inducing.npz   ragged inducing envs (concatenated + offsets)
      data.extxyz    training structures with energy/forces/stress targets
"""

from __future__ import annotations

import json
import os

import numpy as np

from ..descriptor.radial import DefaultRadii, RadiiFromDict, UniformRadii
from ..descriptor.soap import SoapParams
from ..engine import Engine
from ..regression.sgpr import DataRecord, InducingEnv, SgprModel
from ..system import SinglePointCalculator
from .xyz import read_xyz, write_xyz


def _kernel_state(kind):
    """Serialize the base kernel: plain string kinds as-is, KernelExpr as
    its eval-able state string (reference `gp` state files)."""
    from ..kernelalgebra import KernelExpr

    if isinstance(kind, KernelExpr):
        return {"expr": kind.state}
    return kind


def _kernel_from_state(st):
    if isinstance(st, dict) and "expr" in st:
        from ..kernelalgebra import from_state

        return from_state(st["expr"])
    return st if st is not None else "dot"


def _radii_state(radii):
    if isinstance(radii, UniformRadii):
        return {"type": "uniform", "value": radii.value}
    if isinstance(radii, DefaultRadii):
        return {"type": "default", "default": radii.default,
                "special": {str(k): v for k, v in radii.special.items()}}
    if isinstance(radii, RadiiFromDict):
        return {"type": "dict", "d": {str(k): v for k, v in radii.d.items()}}
    raise TypeError(f"cannot serialize radii {radii!r}")


def _radii_from_state(st):
    if st["type"] == "uniform":
        return UniformRadii(st["value"])
    if st["type"] == "default":
        return DefaultRadii(st["default"], {int(k): v for k, v in st["special"].items()})
    if st["type"] == "dict":
        return RadiiFromDict({int(k): v for k, v in st["d"].items()})
    raise ValueError(st)


def save_model(model: SgprModel, folder):
    os.makedirs(folder, exist_ok=True)
    eng = model.engine
    meta = {
        "version": 1,
        "params": {
            "lmax": eng.params.lmax,
            "nmax": eng.params.nmax,
            "rc": eng.params.rc,
            "cut_n": eng.params.cut_n,
            "normalize": eng.params.normalize,
        },
        "exponent": eng.exponent,
        "species": eng.species,
        "radii": _radii_state(eng.radii),
        "pair_terms": [vars(t) for t in eng.pair_terms],
        "chemical": eng.chemical,
        "kernel_kind": _kernel_state(eng.kernel_kind),
        "noise_state": {str(k): float(v) for k, v in model.noise_state.items()},
        "scaled_noise": {str(k): float(v) for k, v in model.scaled_noise.items()},
        "mean_weights": {str(k): float(v) for k, v in model.mean_weights.items()},
        "ridge": float(model.ridge),
        "stats": model.stats,
        "vscale": {str(k): float(v) for k, v in model.vscale.items()},
        "size": list(model.size),
    }
    with open(os.path.join(folder, "meta.json"), "w") as f:
        json.dump(meta, f, indent=1)
    # uncompressed: the model is auto-saved after EVERY update
    # (active.py save_model, reference active.py:985-987) and zlib of the
    # (3N*ndata x m) force block measured 6.7 s per save at the flagship
    # scale vs ~0.5 s raw write — compression was 90% of the update wall
    np.savez(
        os.path.join(folder, "arrays.npz"),
        M=model.M, Ke=model.Ke, Kf=model.Kf, Kv=model.Kv,
        mu=model.mu, choli=model.choli,
    )
    # ragged inducing envs
    if model.X:
        counts = np.array([len(x.numbers) for x in model.X])
        np.savez_compressed(
            os.path.join(folder, "inducing.npz"),
            central=np.array([x.number for x in model.X]),
            counts=counts,
            numbers=np.concatenate([x.numbers for x in model.X]) if counts.sum() else np.zeros(0, int),
            rvec=np.concatenate([x.rvec for x in model.X]).reshape(-1, 3) if counts.sum() else np.zeros((0, 3)),
        )
    # data with targets
    systems = []
    for rec in model.data:
        s = rec.system.copy()
        s.calc = SinglePointCalculator(s, energy=rec.e, forces=rec.f, stress=rec.s)
        systems.append(s)
    write_xyz(os.path.join(folder, "data.extxyz"), systems)
    # human-readable info (reference writes info/stats files)
    with open(os.path.join(folder, "info"), "w") as f:
        f.write("data: {}, inducing: {}\n".format(*model.size))
    if model.stats:
        with open(os.path.join(folder, "stats"), "w") as f:
            st = model.stats
            f.write(
                f"ediff -> mean: {st['e_mean']} std: {st['e_mae']}  "
                f"fdiff -> mean: {st['f_mean']} std: {st['f_mae']}  "
                f"R2: {st['r2']}\n"
            )


def load_model(folder) -> SgprModel:
    with open(os.path.join(folder, "meta.json")) as f:
        meta = json.load(f)
    params = SoapParams(**meta["params"])
    from ..pairkernels import PairTerm

    engine = Engine(
        params=params,
        exponent=meta["exponent"],
        radii=_radii_from_state(meta["radii"]),
        species=meta["species"],
        pair_terms=tuple(PairTerm(**t) for t in meta.get("pair_terms", [])),
        chemical=meta.get("chemical"),
        kernel=_kernel_from_state(meta.get("kernel_kind")),
    )
    model = SgprModel(engine)
    arr = np.load(os.path.join(folder, "arrays.npz"))
    model.M = arr["M"]
    model.Ke = arr["Ke"]
    model.Kf = arr["Kf"]
    model.Kv = arr["Kv"]
    model.mu = arr["mu"]
    model.choli = arr["choli"]
    model.ridge = float(meta["ridge"])
    model.noise_state = {k: float(v) for k, v in meta["noise_state"].items()}
    model.scaled_noise = {k: float(v) for k, v in meta["scaled_noise"].items()}
    model.mean_weights = {int(k): float(v) for k, v in meta["mean_weights"].items()}
    model.vscale = {int(k): float(v) for k, v in meta["vscale"].items()}
    ind_path = os.path.join(folder, "inducing.npz")
    if os.path.isfile(ind_path):
        ind = np.load(ind_path)
        ofs = np.concatenate([[0], np.cumsum(ind["counts"])]).astype(int)
        for i, z in enumerate(ind["central"]):
            model.X.append(
                InducingEnv.from_arrays(
                    int(z),
                    ind["rvec"][ofs[i] : ofs[i + 1]],
                    ind["numbers"][ofs[i] : ofs[i + 1]],
                )
            )
    data_path = os.path.join(folder, "data.extxyz")
    if os.path.isfile(data_path):
        for s in read_xyz(data_path):
            model.data.append(DataRecord.from_system(s))
    model.restage()
    model.make_stats() if (model.m and model.ndata and len(model.mu)) else None
    return model
