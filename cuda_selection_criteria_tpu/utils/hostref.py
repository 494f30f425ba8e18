"""Scalar host reference engine (numpy) - the differential-testing twin.

The reference validates its GPU path against its CPU path
(run_comparison_experiment.sh:93-110). Here the roles are: TPU engine
(parallel.selection) vs this deliberately-simple scalar numpy engine, which
follows the sequential reference control flow (sorted rows, CB break,
criterion gate, union confirm - src/selection.cpp:152-291) one pair at a
time. Used by experiments/compare_engines.py and as a slow-but-obvious
fallback engine.
"""

import math

import numpy as np

from ..ops.estimators import sigma


def histogram(regs):
    c = np.zeros(64, dtype=np.int64)
    vals, cnts = np.unique(np.asarray(regs, np.uint8), return_counts=True)
    c[vals] = cnts
    return c


def ertl_mle_scalar(c, p, relerr=1e-2):
    """Scalar Ertl Algorithm 8 (reference: hll.h:629-688)."""
    q = 64 - p
    m = 1 << p
    if c[q + 1] == m:
        return float("inf")
    k_min = 0
    while c[k_min] == 0:
        k_min += 1
    k_min_p = max(1, k_min)
    k_max = q + 1
    while k_max and c[k_max] == 0:
        k_max -= 1
    k_max_p = min(q, k_max)
    z = 0.0
    for k in range(k_max_p, k_min_p - 1, -1):
        z = 0.5 * z + float(c[k])
    z = math.ldexp(z, -k_min_p)
    c_prime = int(c[q + 1]) + (int(c[k_max_p]) if q else 0)
    a = z + float(c[0])
    m_prime = m - int(c[0])
    g0 = z + math.ldexp(float(c[q + 1]), -q)
    x = m_prime / (0.5 * g0 + a) if g0 <= 1.5 * a else (m_prime / g0) * math.log1p(g0 / a)
    g_prev = 0.0
    delta = x
    eps = relerr / math.sqrt(m)
    while delta > x * eps:
        _, kappa_m1 = math.frexp(x)
        xp = math.ldexp(x, -max(k_max_p + 1, kappa_m1 + 2))
        xp2 = xp * xp
        h = xp - xp2 / 3 + (xp2 * xp2) * (1.0 / 45.0 - xp2 / 472.5)
        for k in range(kappa_m1, k_max_p - 1, -1):
            hp = 1.0 - h
            h = (xp + h * hp) / (xp + hp)
            xp += xp
        g = c_prime * h
        for k in range(k_max_p - 1, k_min_p - 1, -1):
            hp = 1.0 - h
            h = (xp + h * hp) / (xp + hp)
            xp += xp
            g += float(c[k]) * h
        g += x * a
        delta = delta * ((g - m_prime) / (g_prev - g)) if g_prev < g <= m_prime else 0.0
        x += delta
        g_prev = g
    return x * m


def report(regs, p):
    return ertl_mle_scalar(histogram(regs), p)


def union_size(regs_a, regs_b, p):
    return ertl_mle_scalar(histogram(np.maximum(regs_a, regs_b)), p)


def smh_a(v1, v2, n_rows, n_bands):
    for band in range(n_bands):
        if np.array_equal(
            v1[band * n_rows : (band + 1) * n_rows],
            v2[band * n_rows : (band + 1) * n_rows],
        ):
            return True
    return False


class PairOracle:
    """Exact per-pair cascade evaluation on sorted bank arrays.

    Used both by the sequential host engine and as the adjudication pass of
    the TPU engine: on TPU, f64 is double-float emulation (~48-bit
    mantissa), so the device screens pairs with a safety margin and every
    candidate is re-evaluated here in true IEEE f64 - the emitted pair set
    and Jaccard strings are bit-exact on every backend.
    """

    def __init__(self, p, regs, e, aux=None, aux_param=None, criterion=None,
                 tau=0.9, z_score=1.96, order_n=1, apply_cb=True):
        self.p = p
        self.regs = regs
        self.e = e
        self.aux = aux
        self.aux_param = aux_param
        self.criterion = criterion
        self.tau = np.float64(np.float32(tau))
        self.order_n = order_n
        self.apply_cb = apply_cb
        if criterion in ("smh_a", "smh_only"):
            from ..ops.criteria import smh_band_params

            self.n_rows, self.n_bands = smh_band_params(aux_param, float(tau))
        elif criterion in ("hll_a", "hll_an"):
            self.zs = np.float64(np.float32(z_score) * np.float32(sigma(aux_param)))

    def gates_pass(self, i, k):
        """Exact pruning cascade up to (excluding) the primary union."""
        e1, e2 = self.e[i], self.e[k]
        if e2 == 0:
            return False
        if self.apply_cb and not (e1 / e2 >= self.tau):
            return False
        crit = self.criterion
        if crit in ("smh_a", "smh_only"):
            if not smh_a(self.aux[i], self.aux[k], self.n_rows, self.n_bands):
                return False
        elif crit == "hll_a":
            t_hat = int(union_size(self.aux[i], self.aux[k], self.aux_param))
            t_hat_mas = t_hat / (1.0 + self.zs)
            k_mas = ((1.0 + e1 / e2) * e2 - t_hat_mas) / t_hat_mas
            if not (k_mas >= self.tau):
                return False
        elif crit == "hll_an":
            t_hat = union_size(self.aux[i], self.aux[k], self.aux_param)
            j_hat = (e1 + e2 - t_hat) / t_hat
            s = 0.0
            num = 1.0
            for _ in range(self.order_n):
                num *= self.zs
                s += num
            c_corr = min(1.0, (1.0 + self.zs) * e2 / t_hat) * (1.0 + e1 / e2) * s
            if not (j_hat + c_corr >= self.tau):
                return False
        return True

    def evaluate(self, i, k):
        """Full exact cascade for sorted-pair (i, k): (selected, jacc)."""
        if not self.gates_pass(i, k):
            return False, None
        t = union_size(self.regs[i], self.regs[k], self.p)
        jacc = (self.e[i] + self.e[k] - t) / t
        return (jacc >= self.tau), float(jacc)

    def confirm_pairs(self, pairs, batch=2048):
        """Exact cascade over many candidate pairs: [(i, k, jacc)] for the
        selected ones, in input order.

        The primary unions are batched: one vectorized max-merge plus ONE
        bincount per chunk replaces the per-pair register scan (the f64
        MLE itself stays the scalar reference loop, so every selected
        Jaccard is bit-identical to evaluate())."""
        gated = [(i, k) for (i, k) in pairs if self.gates_pass(i, k)]
        out = []
        for c0 in range(0, len(gated), batch):
            chunk = gated[c0:c0 + batch]
            ii = np.fromiter((i for i, _ in chunk), np.int64, len(chunk))
            kk = np.fromiter((k for _, k in chunk), np.int64, len(chunk))
            merged = np.maximum(self.regs[ii], self.regs[kk]).astype(np.int64)
            offs = (np.arange(len(chunk))[:, None] * 64 + merged).ravel()
            hists = np.bincount(
                offs, minlength=len(chunk) * 64
            ).reshape(len(chunk), 64)
            for (i, k), c in zip(chunk, hists):
                t = ertl_mle_scalar(c, self.p)
                jacc = (self.e[i] + self.e[k] - t) / t
                if jacc >= self.tau:
                    out.append((i, k, float(jacc)))
        return out


def select_pairs_host(bank, tau, criterion, z_score=1.96, order_n=1,
                      apply_cb=True):
    """Sequential scalar selection: the control-flow twin of the reference's
    OpenMP loops (sorted rows, CB break, criterion gate, union confirm -
    src/selection.cpp:152-291). Returns [(name_i, name_j, jacc)] in row
    order."""
    cards = bank.cards
    order = np.argsort(cards, kind="stable")
    e = np.trunc(cards[order])
    regs = bank.regs[order]
    aux = bank.aux[order] if bank.aux is not None else None
    names = [bank.names[i] for i in order]

    oracle = PairOracle(
        bank.p, regs, e, aux=aux, aux_param=bank.aux_param,
        criterion=criterion, tau=tau, z_score=z_score, order_n=order_n,
        apply_cb=apply_cb,
    )
    out = []
    n = bank.n
    for i in range(n - 1):
        for k in range(i + 1, n):
            if e[k] == 0:
                continue
            if apply_cb and not (e[i] / e[k] >= oracle.tau):
                break
            selected, jacc = oracle.evaluate(i, k)
            if selected:
                out.append((names[i], names[k], jacc))
    return out
