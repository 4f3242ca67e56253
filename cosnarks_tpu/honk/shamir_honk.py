"""Shamir driver for the collaborative UltraHonk prover.

Counterpart of the reference's ShamirCoUltraHonk
(co-ultrahonk/src/co_ultra_prover.rs:115 and the Shamir impl of
NoirUltraHonkProver, co-noir-common/src/mpc/shamir.rs): n parties,
threshold t with 2t < n, witness polynomials Shamir-shared. Reuses the
Rep3 co-prover's SVec container (cosnarks_tpu/honk/co_driver.py) with a
single live component — every linear component manipulation the
co-prover performs is valid per-share for Shamir too, so co_prove runs
unchanged over this driver.

Protocol notes (semi-honest, honest majority):
- randomness: every party deals a batch; the sum is random as long as
  one dealer is honest (the host-scalar analog of DN07 without the
  Vandermonde extraction — n deals yield 1 random value instead of
  n - t, which is fine at test scale; mpc/shamir.py has the batched
  device DN07 for the Groth16/PLONK provers).
- multiplication: double-share masking — open(x*y + r_2t) via a
  degree-2t interpolation over all n broadcast shares, then subtract
  r_t (shamir/network.rs degree_reduce semantics without routing
  through a king: the masked value is public-safe to broadcast).
- commitments: each party MSMs its share vector; the commitment is the
  Lagrange-at-zero combination of the n partial points (the pointshare
  open of the reference's Shamir driver).
"""

from __future__ import annotations

import numpy as np

from .builder import R
from .co_driver import SVec, _arr


def _lagrange0(xs: list[int]) -> list[int]:
    """Lagrange coefficients at 0 for sample points xs (mod R)."""
    out = []
    for j, xj in enumerate(xs):
        num = den = 1
        for k, xk in enumerate(xs):
            if k == j:
                continue
            num = num * xk % R
            den = den * ((xk - xj) % R) % R
        out.append(num * pow(den, -1, R) % R)
    return out


def shamir_share(value: int, t: int, n: int, rng) -> list[int]:
    """One Shamir sharing of `value`: degree-t polynomial evals at 1..n."""
    coeffs = [value % R] + [rng.randrange(R) for _ in range(t)]
    shares = []
    for x in range(1, n + 1):
        acc = 0
        for c in reversed(coeffs):
            acc = (acc * x + c) % R
        shares.append(acc)
    return shares


class ShamirHonkDriver:
    """Host-scalar Shamir protocol over the party network (n >= 2t+1)."""

    def __init__(self, net, rng, n_parties: int = 3, t: int = 1):
        if 2 * t + 1 > n_parties:
            raise ValueError("need n >= 2t + 1")
        self.net = net
        self.rng = rng
        self.id = net.id
        self.n = n_parties
        self.t = t
        self.rounds = 0
        # interpolating over ALL n points reconstructs any polynomial of
        # degree <= n-1, which covers both t and 2t opens
        self.lag = _lagrange0(list(range(1, n_parties + 1)))

    # -- construction -------------------------------------------------------
    def from_shares(self, shares) -> SVec:
        a = [int(getattr(s, "a", s)) % R for s in shares]
        return SVec(a, np.zeros(len(a), dtype=object), self)

    def promote_vec(self, values) -> SVec:
        v = _arr(values) % R
        return SVec(v, np.zeros(len(v), dtype=object), self)

    def zeros(self, n: int) -> SVec:
        z = np.zeros(n, dtype=object)
        return SVec(z, z.copy(), self)

    def add_public_vec(self, x: SVec, v) -> SVec:
        # a constant shifts every share (constant polynomial addition)
        return SVec((x.a + _arr(v)) % R, x.b, self)

    # -- randomness ---------------------------------------------------------
    def _deal(self, values: list[int], degree: int) -> np.ndarray:
        """Every party Shamir-shares its `values` at `degree`; returns
        this party's summed shares. One point-to-point round."""
        m = len(values)
        per_party = [[] for _ in range(self.n)]
        for v in values:
            sh = shamir_share(v, degree, self.n, self.rng)
            for j in range(self.n):
                per_party[j].append(sh[j])
        for j in range(self.n):
            if j != self.id:
                self.net.send(j, per_party[j])
        acc = np.array(per_party[self.id], dtype=object)
        for j in range(self.n):
            if j != self.id:
                acc = (acc + _arr(self.net.recv(j))) % R
        self.rounds += 1
        return acc

    def rand_vec(self, m: int) -> SVec:
        mine = [self.rng.randrange(R) for _ in range(m)]
        return SVec(self._deal(mine, self.t),
                    np.zeros(m, dtype=object), self)

    def _double_rand(self, m: int):
        """(r_t, r_2t) shares of the same batch of random values."""
        mine = [self.rng.randrange(R) for _ in range(m)]
        rt = self._deal(mine, self.t)
        r2t = self._deal(mine, 2 * self.t)
        return rt, r2t

    # -- protocol -----------------------------------------------------------
    def _interp(self, rows: dict[int, list], mine) -> np.ndarray:
        acc = _arr(mine) * self.lag[self.id] % R
        for j, vals in rows.items():
            acc = (acc + _arr(vals) * self.lag[j]) % R
        return acc

    def open_vec(self, x: SVec) -> np.ndarray:
        others = self.net.broadcast([int(v) for v in x.a])
        self.rounds += 1
        return self._interp(others, x.a)

    def mul_open_vec(self, x: SVec, y: SVec) -> np.ndarray:
        local = x.a * y.a % R  # degree 2t <= n-1: directly interpolable
        others = self.net.broadcast([int(v) for v in local])
        self.rounds += 1
        return self._interp(others, local)

    def mul_vec(self, x: SVec, y: SVec) -> SVec:
        m = len(x.a)
        rt, r2t = self._double_rand(m)
        masked = (x.a * y.a + r2t) % R
        others = self.net.broadcast([int(v) for v in masked])
        self.rounds += 1
        opened = self._interp(others, masked)  # x*y + r, public-safe
        return SVec((opened - rt) % R, np.zeros(m, dtype=object), self)

    def inv_vec_leaking_zeros(self, x: SVec) -> SVec:
        r = self.rand_vec(len(x))
        opened = self.mul_open_vec(x, r)
        inv = np.array([pow(int(v), -1, R) if v else 0 for v in opened],
                       dtype=object)
        return SVec(r.a * inv % R, x.b, self)

    def inv_vec(self, x: SVec) -> SVec:
        r = self.rand_vec(len(x))
        opened = self.mul_open_vec(x, r)
        if any(int(v) == 0 for v in opened):
            raise ZeroDivisionError("cannot invert zero share")
        inv = np.array([pow(int(v), -1, R) for v in opened], dtype=object)
        return SVec(r.a * inv % R, x.b, self)

    def array_prod_mul(self, arr: SVec) -> SVec:
        """Constant-round prefix products (same masking schedule as the
        Rep3 driver / co-plonk/src/mpc/shamir.rs)."""
        n = len(arr)
        r = self.rand_vec(n + 1)
        r_inv = self.inv_vec(r)
        r_head = SVec(np.repeat(r_inv.a[0], n), arr.b, self)
        r_tail = SVec(r.a[1:], arr.b, self)
        unblind = self.mul_vec(r_head, r_tail)
        masked = self.mul_vec(SVec(r.a[:n], arr.b, self), arr)
        opened = self.mul_open_vec(
            masked, SVec(r_inv.a[1:], arr.b, self))
        prefix = opened.copy()
        for i in range(1, n):
            prefix[i] = prefix[i] * prefix[i - 1] % R
        return SVec(unblind.a * prefix % R, arr.b, self)

    # -- EC commitments -----------------------------------------------------
    def commit_open(self, coeffs, crs):
        from ..ec import curves
        from ..ec.host import host_curve
        from . import polyops

        if isinstance(coeffs, SVec):
            avals = [int(v) % R for v in coeffs.a]
        else:
            avals = [int(getattr(s, "a", s)) % R for s in coeffs]
        idx = [i for i, c in enumerate(avals) if c]
        if idx:
            mine = polyops._host_pippenger(
                [crs.monomials[i] for i in idx], [avals[i] for i in idx])
        else:
            mine = None
        others = self.net.broadcast(_enc(mine))
        self.rounds += 1
        g1 = host_curve(curves.BN254_G1)
        acc = None
        if mine is not None:
            acc = g1.mul(g1.lift_affine(mine), self.lag[self.id])
        for j, enc in others.items():
            pt = _dec(enc)
            if pt is not None:
                acc = g1.add(acc, g1.mul(g1.lift_affine(pt), self.lag[j]))
        return g1.affine_ints(acc) if acc is not None else None


def _enc(pt):
    return ("inf",) if pt is None else (int(pt[0]), int(pt[1]))


def _dec(enc):
    return None if enc == ("inf",) else (enc[0], enc[1])


def share_proving_key_shamir(pk, rng, n_parties: int = 3,
                             t: int = 1) -> list[dict]:
    """Split the witness polynomials of a plain proving key into n Shamir
    share dicts (reference split_proving_key_shamir, co-noir/src/lib.rs)."""
    from .co_prover import SHARED_PK_ENTITIES

    per_party = [dict() for _ in range(n_parties)]
    for name in SHARED_PK_ENTITIES:
        cols = [[] for _ in range(n_parties)]
        for v in pk.polynomials[name]:
            sh = shamir_share(int(v), t, n_parties, rng)
            for i in range(n_parties):
                cols[i].append(sh[i])
        for i in range(n_parties):
            per_party[i][name] = cols[i]
    return per_party
