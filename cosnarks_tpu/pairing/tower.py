"""Host-side (python-int) field towers: Fp, Fp2 — extended to Fp6/Fp12 in
bn254.py for pairings. Used as the correctness oracle for device kernels and
for the (host-side, non-hot) Groth16/PLONK verifiers, the role arkwork's
ark-ff/ark-ec play for the reference's verifier (co-groth16/src/verifier.rs).
"""

from __future__ import annotations

import functools


@functools.lru_cache(maxsize=None)
def make_fp(p: int):
    class Fp:
        modulus = p
        __slots__ = ("v",)

        def __init__(self, v: int):
            self.v = v % p

        def __add__(self, o):
            return Fp(self.v + o.v)

        def __sub__(self, o):
            return Fp(self.v - o.v)

        def __neg__(self):
            return Fp(-self.v)

        def __mul__(self, o):
            if isinstance(o, int):
                return Fp(self.v * o)
            return Fp(self.v * o.v)

        __rmul__ = __mul__

        def inv(self):
            return Fp(pow(self.v, -1, p))

        def __eq__(self, o):
            return isinstance(o, Fp) and self.v == o.v

        def __hash__(self):
            return hash((p, self.v))

        def is_zero(self):
            return self.v == 0

        @classmethod
        def zero(cls):
            return cls(0)

        @classmethod
        def one(cls):
            return cls(1)

        def conjugate(self):
            return self

        def __repr__(self):
            return f"Fp({self.v})"

    return Fp


@functools.lru_cache(maxsize=None)
def make_fp2(p: int):
    """Fp2 = Fp[u]/(u^2 + 1) (both BN254 and BLS12-381 use nonresidue -1)."""
    Fp = make_fp(p)

    class Fp2:
        __slots__ = ("c0", "c1")
        base = Fp

        def __init__(self, c0, c1):
            self.c0 = c0 if isinstance(c0, Fp) else Fp(c0)
            self.c1 = c1 if isinstance(c1, Fp) else Fp(c1)

        def __add__(self, o):
            return Fp2(self.c0 + o.c0, self.c1 + o.c1)

        def __sub__(self, o):
            return Fp2(self.c0 - o.c0, self.c1 - o.c1)

        def __neg__(self):
            return Fp2(-self.c0, -self.c1)

        def __mul__(self, o):
            if isinstance(o, int):
                return Fp2(self.c0 * o, self.c1 * o)
            if isinstance(o, Fp):
                return Fp2(self.c0 * o, self.c1 * o)
            t0 = self.c0 * o.c0
            t1 = self.c1 * o.c1
            t2 = (self.c0 + self.c1) * (o.c0 + o.c1)
            return Fp2(t0 - t1, t2 - t0 - t1)

        __rmul__ = __mul__

        def inv(self):
            norm = self.c0 * self.c0 + self.c1 * self.c1
            ninv = norm.inv()
            return Fp2(self.c0 * ninv, -(self.c1 * ninv))

        def conjugate(self):
            return Fp2(self.c0, -self.c1)

        def mul_by_nonresidue_9u(self):
            """Multiply by xi = 9 + u (BN254 Fp6 tower nonresidue)."""
            # (c0 + c1 u)(9 + u) = 9c0 - c1 + (c0 + 9c1) u
            return Fp2(self.c0 * 9 - self.c1, self.c0 + self.c1 * 9)

        def __eq__(self, o):
            return isinstance(o, Fp2) and self.c0 == o.c0 and self.c1 == o.c1

        def __hash__(self):
            return hash((p, self.c0.v, self.c1.v))

        def is_zero(self):
            return self.c0.is_zero() and self.c1.is_zero()

        @classmethod
        def zero(cls):
            return cls(0, 0)

        @classmethod
        def one(cls):
            return cls(1, 0)

        def __repr__(self):
            return f"Fp2({self.c0.v}, {self.c1.v})"

    return Fp2
