"""Host-side BN254 pairing (reduced Tate with denominator elimination).

Used only by verifiers and tests — the proving hot path never pairs. The
reference delegates this to arkworks ark-ec pairing (co-groth16/src/
verifier.rs); here it's a few hundred lines of python-int tower arithmetic.

Correctness notes:
 - Tower: Fq2 = Fq[u]/(u^2+1); Fq6 = Fq2[v]/(v^3 - (9+u)); Fq12 = Fq6[w]/(w^2 - v).
 - G2 points live on the D-twist E': y^2 = x^3 + 3/(9+u); the embedding into
   E(Fq12) is (x, y) -> (x*w^2, y*w^3).
 - Reduced Tate: f_{r,P}(psi(Q)) ^ ((q^12-1)/r). Verticals are dropped
   (denominator elimination, valid for even embedding degree).
 - Any reduced pairing differs from the ate pairing snarkjs uses by a fixed
   exponent coprime to r, so product-of-pairings == 1 checks are equivalent.
"""

from __future__ import annotations

import functools

from ..ff.spec import BN254_FQ, BN254_FR
from .tower import make_fp, make_fp2

Q = BN254_FQ.p
R = BN254_FR.p

Fp = make_fp(Q)
Fp2 = make_fp2(Q)


class Fp6:
    """c0 + c1 v + c2 v^2 over Fp2, v^3 = xi = 9 + u."""

    __slots__ = ("c0", "c1", "c2")

    def __init__(self, c0, c1, c2):
        self.c0, self.c1, self.c2 = c0, c1, c2

    @classmethod
    def zero(cls):
        return cls(Fp2.zero(), Fp2.zero(), Fp2.zero())

    @classmethod
    def one(cls):
        return cls(Fp2.one(), Fp2.zero(), Fp2.zero())

    def __add__(self, o):
        return Fp6(self.c0 + o.c0, self.c1 + o.c1, self.c2 + o.c2)

    def __sub__(self, o):
        return Fp6(self.c0 - o.c0, self.c1 - o.c1, self.c2 - o.c2)

    def __neg__(self):
        return Fp6(-self.c0, -self.c1, -self.c2)

    def __mul__(self, o):
        if isinstance(o, Fp2):
            return Fp6(self.c0 * o, self.c1 * o, self.c2 * o)
        a0, a1, a2 = self.c0, self.c1, self.c2
        b0, b1, b2 = o.c0, o.c1, o.c2
        t0 = a0 * b0
        t1 = a1 * b1
        t2 = a2 * b2
        c0 = t0 + ((a1 + a2) * (b1 + b2) - t1 - t2).mul_by_nonresidue_9u()
        c1 = (a0 + a1) * (b0 + b1) - t0 - t1 + t2.mul_by_nonresidue_9u()
        c2 = (a0 + a2) * (b0 + b2) - t0 - t2 + t1
        return Fp6(c0, c1, c2)

    def mul_by_v(self):
        return Fp6(self.c2.mul_by_nonresidue_9u(), self.c0, self.c1)

    def inv(self):
        a, b, c = self.c0, self.c1, self.c2
        t0 = a * a - (b * c).mul_by_nonresidue_9u()
        t1 = (c * c).mul_by_nonresidue_9u() - a * b
        t2 = b * b - a * c
        d = (a * t0 + (c * t1 + b * t2).mul_by_nonresidue_9u()).inv()
        return Fp6(t0 * d, t1 * d, t2 * d)

    def is_zero(self):
        return self.c0.is_zero() and self.c1.is_zero() and self.c2.is_zero()

    def __eq__(self, o):
        return self.c0 == o.c0 and self.c1 == o.c1 and self.c2 == o.c2


class Fp12:
    """c0 + c1 w over Fp6, w^2 = v."""

    __slots__ = ("c0", "c1")

    def __init__(self, c0, c1):
        self.c0, self.c1 = c0, c1

    @classmethod
    def one(cls):
        return cls(Fp6.one(), Fp6.zero())

    def __mul__(self, o):
        a0, a1 = self.c0, self.c1
        b0, b1 = o.c0, o.c1
        t0 = a0 * b0
        t1 = a1 * b1
        c0 = t0 + t1.mul_by_v()
        c1 = (a0 + a1) * (b0 + b1) - t0 - t1
        return Fp12(c0, c1)

    def sqr(self):
        return self * self

    def inv(self):
        d = (self.c0 * self.c0 - (self.c1 * self.c1).mul_by_v()).inv()
        return Fp12(self.c0 * d, -(self.c1 * d))

    def pow(self, e: int):
        if e < 0:
            return self.inv().pow(-e)
        acc = Fp12.one()
        base = self
        while e:
            if e & 1:
                acc = acc * base
            base = base * base
            e >>= 1
        return acc

    def __eq__(self, o):
        return self.c0 == o.c0 and self.c1 == o.c1

    def is_one(self):
        return self == Fp12.one()


def _fq12_from_fp2_coeffs(w0=None, w2=None, w3=None):
    """Build an Fp12 element from sparse w-power coefficients (Fp2 values).

    w^k with k in {0..5}: c0 holds (w^0, w^2, w^4) as v-powers (w^2 = v),
    c1 holds (w^1, w^3, w^5).
    """
    z = Fp2.zero()
    c0 = [z, z, z]
    c1 = [z, z, z]
    if w0 is not None:
        c0[0] = w0
    if w2 is not None:
        c0[1] = w2
    if w3 is not None:
        c1[1] = w3
    return Fp12(Fp6(*c0), Fp6(*c1))


FINAL_EXP = (Q**12 - 1) // R


def miller_tate(P, Qp) -> Fp12:
    """f_{r,P}(psi(Q)) with P affine G1 (ints), Qp affine G2 (int pairs).

    psi(Q) = (xQ * w^2, yQ * w^3); line values assembled sparsely.
    """
    if P is None or Qp is None:
        return Fp12.one()
    xp, yp = Fp(P[0]), Fp(P[1])
    xq = Fp2(*Qp[0])
    yq = Fp2(*Qp[1])
    f = Fp12.one()
    tx, ty = xp, yp
    bits = bin(R)[3:]  # skip MSB; T starts at P
    for b in bits:
        # tangent at T: lam = 3 tx^2 / (2 ty)
        lam = (tx * tx * 3) * (ty + ty).inv()
        # line: y_psi - ty - lam*(x_psi - tx)  = (lam*tx - ty) - lam*x_psi + y_psi
        l = _fq12_from_fp2_coeffs(
            w0=Fp2(lam * tx - ty, Fp.zero()),
            w2=xq * (-lam),
            w3=yq,
        )
        f = f.sqr() * l
        # T = 2T
        x3 = lam * lam - tx - tx
        ty = lam * (tx - x3) - ty
        tx = x3
        if b == "1":
            if tx == xp:
                # T == -P (the final add of the loop, since r is odd):
                # the line is the vertical x - xp, which lies in Fp6 and is
                # killed by the final exponentiation — skip it.
                continue
            lam = (ty - yp) * (tx - xp).inv()
            l = _fq12_from_fp2_coeffs(
                w0=Fp2(lam * tx - ty, Fp.zero()),
                w2=xq * (-lam),
                w3=yq,
            )
            f = f * l
            x3 = lam * lam - tx - xp
            ty = lam * (tx - x3) - ty
            tx = x3
    return f


def pairing(P, Qp) -> Fp12:
    """Reduced Tate pairing e(P, Q) for G1 x G2 affine host points."""
    return miller_tate(P, Qp).pow(FINAL_EXP)


def pairing_product_is_one(pairs) -> bool:
    """Check prod e(P_i, Q_i) == 1 with a single final exponentiation."""
    f = Fp12.one()
    for P, Qp in pairs:
        f = f * miller_tate(P, Qp)
    return f.pow(FINAL_EXP).is_one()


@functools.lru_cache(maxsize=1)
def _g2_host():
    from ..ec import curves, host

    return host.host_curve(curves.BN254_G2)


def g1_neg(P):
    if P is None:
        return None
    return (P[0], (-P[1]) % Q)
