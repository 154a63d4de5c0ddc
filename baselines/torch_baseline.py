"""Baseline emulation of the reference's CPU/torch hot path.

The reference repo publishes no benchmark numbers (BASELINE.md) and cannot
run in this image (it requires ASE, which is not installed), so the
baseline is *measured* from an independent reimplementation of its
per-MD-step computational pattern (SURVEY.md §3.1), written from scratch
in torch double precision exactly the way the reference executes it:

  * per-atom Python loop building each LCE's SOAP descriptor with torch
    tensor ops (reference stages descriptors per ``Local``,
    descriptor/atoms.py:405-410 → sesoap.py:161-260),
  * covariance row-block against the inducing set as dot products ^ zeta
    (similarity/universal.py:109-122),
  * energy = cov @ mu and forces by one torch.autograd backward through
    the whole graph (calculator/active.py:548-611).

No code is copied from the reference; the SOAP math here reuses this
repo's polynomial solid-harmonics formulation, transcribed to torch.
"""

import math

import numpy as np
import torch


def torch_solid_harmonics(xyz, lmax):
    """r^l Ylm, [l, m] packed dense; same recursion as descriptor/harmonics.py."""
    x, y, z = xyz[:, 0], xyz[:, 1], xyz[:, 2]
    r2 = (xyz * xyz).sum(dim=1)
    Y00 = math.sqrt(1.0 / (4 * math.pi))
    one = torch.ones_like(x)
    P = [[Y00 * one]]
    for l in range(1, lmax + 1):
        row = []
        for m in range(l - 1):
            a = math.sqrt((4.0 * l * l - 1.0) / (l * l - m * m))
            b = -math.sqrt(((l - 1.0) ** 2 - m * m) / (4.0 * (l - 1.0) ** 2 - 1.0))
            row.append(a * (z * P[l - 1][m] + r2 * b * P[l - 2][m]))
        row.append(math.sqrt(2.0 * l + 1.0) * z * P[l - 1][l - 1])
        row.append(-math.sqrt(1.0 + 1.0 / (2.0 * l)) * P[l - 1][l - 1])
        P.append(row)
    C = [one]
    S = [torch.zeros_like(x)]
    for m in range(1, lmax + 1):
        C.append(x * C[-1] - y * S[-1])
        S.append(y * C[-2] + x * S[-1])
    L = lmax + 1
    Yr = torch.zeros((len(x), L, L), dtype=xyz.dtype)
    Yi = torch.zeros((len(x), L, L), dtype=xyz.dtype)
    for l in range(L):
        for m in range(l + 1):
            Yr[:, l, m] = P[l][m] * C[m]
            Yi[:, l, m] = P[l][m] * S[m]
    return Yr, Yi


def _tables(nmax, lmax):
    a = np.array(
        [
            [
                1.0 / ((2 * l + 1) * 2 ** (2 * n + l) * math.factorial(n) * math.factorial(n + l))
                for l in range(lmax + 1)
            ]
            for n in range(nmax + 1)
        ]
    )
    nnl = np.sqrt(a[None] * a[:, None])
    L = lmax + 1
    w = np.zeros((L, L))
    for l in range(L):
        w[l, 0] = 1.0
        for m in range(1, l + 1):
            w[l, m] = 2.0
    return torch.tensor(nnl), torch.tensor(w)


class TorchSoapBaseline:
    def __init__(self, lmax=3, nmax=3, rc=6.0):
        self.lmax, self.nmax, self.rc = lmax, nmax, rc
        self.nnl, self.w = _tables(nmax, lmax)

    def descriptor(self, rvec):
        """One LCE (single species), torch double, differentiable."""
        d2 = (rvec * rvec).sum(dim=1)
        d = d2.sqrt()
        cut = torch.where(d < self.rc, (1.0 - d / self.rc) ** 2, torch.zeros_like(d))
        g = cut * torch.exp(-0.5 * d2)
        ns = 2.0 * torch.arange(self.nmax + 1, dtype=rvec.dtype)
        f = g[:, None] * d[:, None] ** ns[None]
        Yr, Yi = torch_solid_harmonics(rvec, self.lmax)
        cR = torch.einsum("kn,klm->nlm", f, Yr)
        cI = torch.einsum("kn,klm->nlm", f, Yi)
        p = torch.einsum("ulm,vlm,lm->uvl", cR, cR, self.w) + torch.einsum(
            "ulm,vlm,lm->uvl", cI, cI, self.w
        )
        p = (p * self.nnl).reshape(-1)
        return p / (p.norm() + torch.finfo(p.dtype).eps)

    def md_step(self, positions, nbr_idx_list, nbr_off_list, cell, X_desc, mu, zeta=4):
        """One reference-style MD predict step: per-atom descriptor loop,
        cov block, energy, one backward for forces."""
        pos = torch.tensor(positions, dtype=torch.float64, requires_grad=True)
        cell_t = torch.tensor(cell, dtype=torch.float64)
        descs = []
        for i in range(len(positions)):
            j = torch.from_numpy(nbr_idx_list[i])
            off = torch.tensor(nbr_off_list[i], dtype=torch.float64)
            r = pos[j] - pos[i] + off @ cell_t
            descs.append(self.descriptor(r))
        P = torch.stack(descs)
        cov = (P @ X_desc.t()) ** zeta
        energy = (cov @ mu).sum()
        energy.backward()
        forces = -pos.grad.detach().numpy()
        return float(energy), forces


def measure_baseline(system, table, X_desc_np, mu_np, steps=3, lmax=3, nmax=3, rc=6.0):
    """Steps/sec of the torch-pattern baseline on the given workload."""
    import time

    torch.set_num_threads(torch.get_num_threads())
    base = TorchSoapBaseline(lmax=lmax, nmax=nmax, rc=rc)
    nbr_idx_list = []
    nbr_off_list = []
    for i in range(len(system)):
        m = table.mask[i]
        nbr_idx_list.append(table.idx[i][m].astype(np.int64))
        nbr_off_list.append(table.off[i][m].astype(np.float64))
    X = torch.tensor(X_desc_np, dtype=torch.float64)
    mu = torch.tensor(mu_np, dtype=torch.float64)
    # warmup
    base.md_step(system.positions, nbr_idx_list, nbr_off_list, system.cell, X, mu)
    t0 = time.time()
    for _ in range(steps):
        base.md_step(system.positions, nbr_idx_list, nbr_off_list, system.cell, X, mu)
    dt = (time.time() - t0) / steps
    return 1.0 / dt
