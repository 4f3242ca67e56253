"""Rep3 shared-vector driver for the collaborative UltraHonk prover.

The MPC counterpart of relations.FV: an `SVec` holds the two replicated
components of a vector of secret-shared field elements as numpy object
arrays. Linear algebra (add/sub/neg, public scaling) is local; `*`
between two SVecs performs ONE batched Rep3 multiplication round
(local_mul + reshare, mpc-core rep3/arithmetic.rs:104-177) through the
driver bound to the operands — this is what lets the plain relation
formulas in relations.py run unchanged over shares, with the same
batching discipline as the reference's co_decider relations (every
operator call is a whole-vector round, cf. T::mul_many usage in
co-ultrahonk/src/co_decider/relations/*.rs).

Openings, batched inversion (masked, zero-leaking — CoUtils::
batch_invert_leaking_zeros), the constant-round prefix product
(array_prod_mul, co-plonk/src/mpc/rep3.rs:182-218) and additive-MSM
commitment opens (pointshare open_half_point) live on the driver.
"""

from __future__ import annotations

import numpy as np

from ..mpc.rep3_scalar import AShare, HostRng
from .builder import R


def _arr(x):
    return x if isinstance(x, np.ndarray) else np.array(x, dtype=object)


class SVec:
    """Vector of replicated shares (component arrays a, b)."""

    __slots__ = ("a", "b", "drv")
    _is_shared = True

    def __init__(self, a, b, drv):
        self.a = _arr(a)
        self.b = _arr(b)
        self.drv = drv

    def __len__(self):
        return len(self.a)

    # -- linear -------------------------------------------------------------
    def _pub(self, o):
        """Public operand -> object array (FV, int, numpy array)."""
        if hasattr(o, "a") and not hasattr(o, "_is_shared"):
            return o.a  # relations.FV
        return o

    def __add__(self, o):
        if isinstance(o, SVec):
            return SVec((self.a + o.a) % R, (self.b + o.b) % R, self.drv)
        return self.drv.add_public_vec(self, self._pub(o))

    __radd__ = __add__

    def __sub__(self, o):
        if isinstance(o, SVec):
            return SVec((self.a - o.a) % R, (self.b - o.b) % R, self.drv)
        return self.drv.add_public_vec(self, -_arr(self._pub(o)) % R)

    def __rsub__(self, o):
        return self.__neg__().__add__(o)

    def __neg__(self):
        return SVec((-self.a) % R, (-self.b) % R, self.drv)

    def __mul__(self, o):
        if isinstance(o, SVec):
            return self.drv.mul_vec(self, o)
        v = _arr(self._pub(o))
        return SVec(self.a * v % R, self.b * v % R, self.drv)

    __rmul__ = __mul__

    def sum(self) -> AShare:
        return AShare(int(self.a.sum() % R), int(self.b.sum() % R))

    def tolist(self) -> list[AShare]:
        return [AShare(int(a), int(b)) for a, b in zip(self.a, self.b)]

    # -- sumcheck plumbing (mirrors relations.FV) ---------------------------
    def slice_strided(self, offset, limit):
        return SVec(self.a[offset:limit:2], self.b[offset:limit:2], self.drv)

    def concat(self, others) -> "SVec":
        return SVec(np.concatenate([self.a] + [o.a for o in others]),
                    np.concatenate([self.b] + [o.b for o in others]),
                    self.drv)

    def block_sums(self, nblocks: int) -> "SVec":
        return SVec(self.a.reshape(nblocks, -1).sum(axis=1) % R,
                    self.b.reshape(nblocks, -1).sum(axis=1) % R, self.drv)

    def fold(self, u: int) -> "SVec":
        ea, oa = self.a[0::2], self.a[1::2]
        eb, ob = self.b[0::2], self.b[1::2]
        na = (ea + u * (oa - ea)) % R
        nb = (eb + u * (ob - eb)) % R
        if len(na) < 2:
            pad = np.zeros(2 - len(na), dtype=object)
            na = np.concatenate([na, pad])
            nb = np.concatenate([nb, pad.copy()])
        return SVec(na, nb, self.drv)

    def at(self, i: int) -> AShare:
        return AShare(int(self.a[i]), int(self.b[i]))


class Rep3HonkDriver:
    """Vectorized host-scalar Rep3 protocol bound to a party network."""

    def __init__(self, net, rng: HostRng):
        self.net = net
        self.rng = rng
        self.id = net.id
        self.rounds = 0

    # -- construction -------------------------------------------------------
    def from_shares(self, shares: list[AShare]) -> SVec:
        return SVec([s.a for s in shares], [s.b for s in shares], self)

    def promote_vec(self, values) -> SVec:
        v = _arr(values) % R
        z = np.zeros(len(v), dtype=object)
        if self.id == 0:
            return SVec(v, z, self)
        if self.id == 2:
            return SVec(z, v, self)
        return SVec(z, np.zeros(len(v), dtype=object), self)

    def rand_vec(self, n: int) -> SVec:
        shares = [self.rng.rand_share(R) for _ in range(n)]
        return self.from_shares(shares)

    def zeros(self, n: int) -> SVec:
        z = np.zeros(n, dtype=object)
        return SVec(z, z.copy(), self)

    # -- protocol -----------------------------------------------------------
    def add_public_vec(self, x: SVec, v) -> SVec:
        v = _arr(v)
        if self.id == 0:
            return SVec((x.a + v) % R, x.b, self)
        if self.id == 2:
            return SVec(x.a, (x.b + v) % R, self)
        return SVec(x.a, x.b, self)

    def _zero_vec(self, n: int):
        return np.array([self.rng.zero_add(R) for _ in range(n)],
                        dtype=object)

    def mul_vec(self, x: SVec, y: SVec) -> SVec:
        local = (x.a * y.a + x.a * y.b + x.b * y.a
                 + self._zero_vec(len(x.a))) % R
        other = self.net.reshare_backward([int(v) for v in local])
        self.rounds += 1
        return SVec(local, other, self)

    def open_vec(self, x: SVec) -> np.ndarray:
        other = self.net.reshare_backward([int(v) for v in x.b])
        self.rounds += 1
        return (x.a + x.b + _arr(other)) % R

    def mul_open_vec(self, x: SVec, y: SVec) -> np.ndarray:
        local = (x.a * y.a + x.a * y.b + x.b * y.a
                 + self._zero_vec(len(x.a))) % R
        others = self.net.broadcast([int(v) for v in local])
        self.rounds += 1
        out = local.copy()
        for vals in others.values():
            out = (out + _arr(vals)) % R
        return out

    def inv_vec_leaking_zeros(self, x: SVec) -> SVec:
        """Masked batch inversion; zero entries open as zero and stay zero
        (CoUtils::batch_invert_leaking_zeros)."""
        r = self.rand_vec(len(x))
        opened = self.mul_open_vec(x, r)
        inv = np.array([pow(int(v), -1, R) if v else 0 for v in opened],
                       dtype=object)
        return SVec(r.a * inv % R, r.b * inv % R, self)

    def inv_vec(self, x: SVec) -> SVec:
        r = self.rand_vec(len(x))
        opened = self.mul_open_vec(x, r)
        if any(int(v) == 0 for v in opened):
            raise ZeroDivisionError("cannot invert zero share")
        inv = np.array([pow(int(v), -1, R) for v in opened], dtype=object)
        return SVec(r.a * inv % R, r.b * inv % R, self)

    def array_prod_mul(self, arr: SVec) -> SVec:
        """Constant-round prefix products out[i] = prod_{j<=i} arr[j]
        (co-plonk/src/mpc/rep3.rs:182-218)."""
        n = len(arr)
        r = self.rand_vec(n + 1)
        r_inv = self.inv_vec(r)
        r_head = SVec(np.repeat(r_inv.a[0], n), np.repeat(r_inv.b[0], n),
                      self)
        r_tail = SVec(r.a[1:], r.b[1:], self)
        unblind = self.mul_vec(r_head, r_tail)
        masked = self.mul_vec(SVec(r.a[:n], r.b[:n], self), arr)
        opened = self.mul_open_vec(masked, SVec(r_inv.a[1:], r_inv.b[1:],
                                                self))
        prefix = opened.copy()
        for i in range(1, n):
            prefix[i] = prefix[i] * prefix[i - 1] % R
        return SVec(unblind.a * prefix % R, unblind.b * prefix % R, self)

    # -- EC commitments -----------------------------------------------------
    def commit_open(self, coeffs: SVec | list, crs):
        """Commit to a shared polynomial and open the commitment: each
        party MSMs its additive component ('a'), then the three additive
        EC points are exchanged and summed (rep3 pointshare
        open_half_point — the a-components are uniform shares, so the
        partial MSMs reveal nothing beyond the opened commitment)."""
        from ..ec import curves
        from ..ec.host import host_curve
        from . import polyops

        if isinstance(coeffs, SVec):
            avals = [int(v) for v in coeffs.a]
        else:
            avals = [int(s.a) for s in coeffs]
        idx = [i for i, c in enumerate(avals) if c % R]
        if idx:
            mine = polyops._host_pippenger(
                [crs.monomials[i] for i in idx], [avals[i] % R for i in idx])
        else:
            mine = None
        others = self.net.broadcast(_encode_pt(mine))
        self.rounds += 1
        g1 = host_curve(curves.BN254_G1)
        acc = g1.lift_affine(mine)
        for enc in others.values():
            acc = g1.add(acc, g1.lift_affine(_decode_pt(enc)))
        return g1.affine_ints(acc) if acc is not None else None


def _encode_pt(pt):
    return ("inf",) if pt is None else (int(pt[0]), int(pt[1]))


def _decode_pt(enc):
    if enc is None or (isinstance(enc, (tuple, list)) and enc
                       and enc[0] == "inf"):
        return None
    return (int(enc[0]), int(enc[1]))
