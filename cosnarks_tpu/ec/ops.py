"""Field-ops interfaces so curve/poly kernels are generic over Fq vs Fq2.

The reference gets this genericity from arkworks' trait system
(ark-ec CurveGroup over any base field); here a small hashable "ops" object
bound to a :class:`~cosnarks_tpu.ff.spec.Field` provides the same surface for
vectorized limb arrays.

Element layouts:
  Fq : (..., nlimbs)        uint32 Montgomery limbs
  Fq2: (..., 2, nlimbs)     c0 + c1*u with u^2 = nonresidue (both curves: -1)
"""

from __future__ import annotations

import jax.numpy as jnp

from ..ff import mont
from ..ff.spec import Field


class FqOps:
    """Base-field ops: thin veneer over cosnarks_tpu.ff.mont."""

    def __init__(self, field: Field):
        self.field = field
        self.coord_ndim = 1  # trailing dims per element

    def mul(self, a, b):
        return mont.mul(self.field, a, b)

    def mulstack(self, xs, ys):
        # collapse independent products into one batched mul (small graphs,
        # bigger VPU batches)
        r = self.mul(jnp.stack(xs), jnp.stack(ys))
        return tuple(r[i] for i in range(len(xs)))

    def sqr(self, a):
        return mont.sqr(self.field, a)

    def add(self, a, b):
        return mont.add(self.field, a, b)

    def sub(self, a, b):
        return mont.sub(self.field, a, b)

    def neg(self, a):
        return mont.neg(self.field, a)

    def double(self, a):
        return mont.add(self.field, a, a)

    def inv(self, a):
        return mont.inv(self.field, a)

    def is_zero(self, a):
        return mont.is_zero(self.field, a)

    def zeros(self, shape=()):
        return mont.zeros(self.field, shape)

    def zeros_like(self, a):
        return jnp.zeros_like(a)

    def one(self, shape=()):
        return mont.broadcast_one(self.field, shape)

    def one_like(self, a):
        return self.one(a.shape[:-1])

    def constant(self, value, shape=()):
        return mont.constant(self.field, value, shape)

    def select(self, mask, a, b):
        return jnp.where(mask[..., None], a, b)

    # host <-> device; host representation: python int
    def encode(self, values):
        return mont.encode(self.field, values)

    def decode(self, arr):
        return mont.decode(self.field, arr)

    def __hash__(self):
        return hash(("fq", self.field))

    def __eq__(self, other):
        return type(other) is FqOps and other.field == self.field


class Fq2Ops:
    """Quadratic extension Fq[u]/(u^2 - nonresidue); Karatsuba multiply.

    Host representation of an element: (c0, c1) tuple of python ints.
    """

    def __init__(self, field: Field, nonresidue: int = -1):
        if nonresidue != -1:
            raise NotImplementedError("only u^2 = -1 towers so far")
        self.field = field
        self.base = FqOps(field)
        self.coord_ndim = 2

    def mul(self, a, b):
        f = self.field
        a0, a1 = a[..., 0, :], a[..., 1, :]
        b0, b1 = b[..., 0, :], b[..., 1, :]
        t0 = mont.mul(f, a0, b0)
        t1 = mont.mul(f, a1, b1)
        # (a0+a1)(b0+b1) - t0 - t1 = a0b1 + a1b0
        t2 = mont.mul(f, mont.add(f, a0, a1), mont.add(f, b0, b1))
        c0 = mont.sub(f, t0, t1)  # u^2 = -1
        c1 = mont.sub(f, mont.sub(f, t2, t0), t1)
        return jnp.stack([c0, c1], axis=-2)

    def mulstack(self, xs, ys):
        r = self.mul(jnp.stack(xs), jnp.stack(ys))
        return tuple(r[i] for i in range(len(xs)))

    def sqr(self, a):
        f = self.field
        a0, a1 = a[..., 0, :], a[..., 1, :]
        # (a0+a1)(a0-a1) = a0^2 - a1^2 ; c1 = 2 a0 a1
        c0 = mont.mul(f, mont.add(f, a0, a1), mont.sub(f, a0, a1))
        c1 = mont.mul(f, mont.add(f, a0, a0), a1)
        return jnp.stack([c0, c1], axis=-2)

    def add(self, a, b):
        return jnp.stack(
            [
                mont.add(self.field, a[..., 0, :], b[..., 0, :]),
                mont.add(self.field, a[..., 1, :], b[..., 1, :]),
            ],
            axis=-2,
        )

    def sub(self, a, b):
        return jnp.stack(
            [
                mont.sub(self.field, a[..., 0, :], b[..., 0, :]),
                mont.sub(self.field, a[..., 1, :], b[..., 1, :]),
            ],
            axis=-2,
        )

    def neg(self, a):
        return jnp.stack(
            [
                mont.neg(self.field, a[..., 0, :]),
                mont.neg(self.field, a[..., 1, :]),
            ],
            axis=-2,
        )

    def double(self, a):
        return self.add(a, a)

    def inv(self, a):
        # (a0 - a1 u) / (a0^2 + a1^2)
        f = self.field
        a0, a1 = a[..., 0, :], a[..., 1, :]
        norm = mont.add(f, mont.sqr(f, a0), mont.sqr(f, a1))
        ninv = mont.inv(f, norm)
        return jnp.stack(
            [mont.mul(f, a0, ninv), mont.neg(f, mont.mul(f, a1, ninv))],
            axis=-2,
        )

    def is_zero(self, a):
        return jnp.all(a == 0, axis=(-1, -2))

    def zeros(self, shape=()):
        return mont.zeros(self.field, tuple(shape) + (2,))

    def zeros_like(self, a):
        return jnp.zeros_like(a)

    def one(self, shape=()):
        return jnp.stack(
            [mont.broadcast_one(self.field, shape), mont.zeros(self.field, shape)],
            axis=-2,
        )

    def one_like(self, a):
        return self.one(a.shape[:-2])

    def constant(self, value, shape=()):
        c0, c1 = value  # tuple of ints
        return jnp.stack(
            [
                mont.constant(self.field, c0, shape),
                mont.constant(self.field, c1, shape),
            ],
            axis=-2,
        )

    def select(self, mask, a, b):
        return jnp.where(mask[..., None, None], a, b)

    def encode(self, values):
        flat = []
        for c0, c1 in values:
            flat.extend([c0, c1])
        arr = mont.encode(self.field, flat)
        return arr.reshape(len(values), 2, self.field.nlimbs)

    def decode(self, arr):
        ints = mont.decode(self.field, arr.reshape(-1, self.field.nlimbs))
        return [(ints[i], ints[i + 1]) for i in range(0, len(ints), 2)]

    def __hash__(self):
        return hash(("fq2", self.field))

    def __eq__(self, other):
        return type(other) is Fq2Ops and other.field == self.field
