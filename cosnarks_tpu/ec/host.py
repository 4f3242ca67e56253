"""Host-side python-int elliptic-curve oracle (affine/Jacobian over the
tower classes). Ground truth for the device curve kernels and utility for
small host-side point math (proof assembly, verification keys)."""

from __future__ import annotations

import functools

from ..pairing.tower import make_fp, make_fp2


class HostCurve:
    """y^2 = x^3 + b over a host field class F (make_fp / make_fp2 output)."""

    def __init__(self, F, b, generator, scalar_order: int):
        self.F = F
        self.b = b
        self.generator = generator  # (x, y) as F elements
        self.order = scalar_order

    def on_curve(self, pt) -> bool:
        if pt is None:
            return True
        x, y = pt
        return y * y == x * x * x + self.b

    def add(self, P, Q):
        if P is None:
            return Q
        if Q is None:
            return P
        x1, y1 = P
        x2, y2 = Q
        if x1 == x2:
            if y1 == y2:
                return self.double(P)
            return None
        lam = (y2 - y1) * (x2 - x1).inv()
        x3 = lam * lam - x1 - x2
        return (x3, lam * (x1 - x3) - y1)

    def double(self, P):
        if P is None:
            return None
        x, y = P
        if y.is_zero():
            return None
        lam = (x * x * 3) * (y + y).inv()
        x3 = lam * lam - x - x
        return (x3, lam * (x - x3) - y)

    def neg(self, P):
        if P is None:
            return None
        return (P[0], -P[1])

    def mul(self, P, k: int):
        k %= self.order
        acc = None
        while k:
            if k & 1:
                acc = self.add(acc, P)
            P = self.double(P)
            k >>= 1
        return acc

    def msm(self, points, scalars):
        acc = None
        for P, s in zip(points, scalars):
            acc = self.add(acc, self.mul(P, s))
        return acc

    def jac_to_affine(self, jac):
        """(x, y, z) ints/tuples -> affine (x, y) ints/tuples or None."""
        x, y, z = (self._lift(c) for c in jac)
        if z.is_zero():
            return None
        zinv = z.inv()
        z2 = zinv * zinv
        ax = x * z2
        ay = y * z2 * zinv
        return self._lower((ax, ay))

    def _lift(self, c):
        if isinstance(c, tuple):
            return self.F(c[0], c[1])
        return self.F(c)

    def _lower(self, pt):
        if pt is None:
            return None
        out = []
        for c in pt:
            if hasattr(c, "c0"):
                out.append((c.c0.v, c.c1.v))
            else:
                out.append(c.v)
        return tuple(out)

    def affine_ints(self, pt):
        return self._lower(pt)

    def lift_affine(self, pt):
        if pt is None:
            return None
        return tuple(self._lift(c) for c in pt)


@functools.lru_cache(maxsize=None)
def _host_curve_cached(name):
    from . import curves

    spec = curves.BY_NAME[name]
    q = spec.ops.field.p
    if spec.ops.coord_ndim == 2:
        F = make_fp2(q)
        b = F(*spec.b)
        gen = (F(*spec.generator[0]), F(*spec.generator[1]))
    else:
        F = make_fp(q)
        b = F(spec.b)
        gen = (F(spec.generator[0]), F(spec.generator[1]))
    return HostCurve(F, b, gen, spec.scalar_field.p)


def host_curve(spec) -> HostCurve:
    return _host_curve_cached(spec.name)
