"""Fused Pallas kernels for Jacobian point add/double (G1 / prime-field
coordinates).

One kernel executes the complete add (12 Montgomery muls + edge handling)
with every intermediate held in vector registers/VMEM — versus ~12 separate
HBM-roundtripping kernels on the XLA path. The group-law code is the SAME
generic `curve.add`/`curve.double` used everywhere; it runs inside the
kernel over a lane-vector field-ops backend (`LaneOps`), so there is a
single source of truth for the formulas.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..ff import pallas_mont as pm
from ..ff.spec import Field
from . import curve as ec
from .curve import CurveSpec


class LaneOps:
    """Field ops on elements represented as tuples of (TILE,) lane vectors.

    Only valid inside a Pallas kernel body (or any trace where elements are
    per-limb vectors)."""

    coord_ndim = 1

    def __init__(self, field: Field):
        self.field = field

    def mul(self, a, b):
        return tuple(pm.mont_mul_lanes(self.field, list(a), list(b)))

    def mulstack(self, xs, ys):
        return tuple(self.mul(x, y) for x, y in zip(xs, ys))

    def sqr(self, a):
        return self.mul(a, a)

    def add(self, a, b):
        return tuple(pm.add_lanes(self.field, list(a), list(b)))

    def sub(self, a, b):
        return tuple(pm.sub_lanes(self.field, list(a), list(b)))

    def double(self, a):
        return self.add(a, a)

    def is_zero(self, a):
        z = a[0] == 0
        for limb in a[1:]:
            z = z & (limb == 0)
        return z

    def zeros_like(self, a):
        return tuple(jnp.zeros_like(x) for x in a)

    def one_like(self, a):
        return tuple(
            jnp.full_like(x, np.uint32(c))
            for x, c in zip(a, self.field.one_mont)
        )

    def select(self, mask, a, b):
        return tuple(jnp.where(mask, x, y) for x, y in zip(a, b))

    def __hash__(self):
        return hash(("lane", self.field))

    def __eq__(self, other):
        return type(other) is LaneOps and other.field == self.field


@functools.lru_cache(maxsize=None)
def _lane_spec(spec: CurveSpec) -> CurveSpec:
    return CurveSpec(
        spec.name + "_lanes", LaneOps(spec.ops.field), spec.scalar_field,
        spec.b, spec.generator,
    )


def _load(ref, n):
    t = ref[:].T
    return tuple(t[i] for i in range(n))


def _store(ref, limbs):
    ref[:] = jnp.stack(limbs, axis=0).T


@functools.lru_cache(maxsize=None)
def _add_call(spec: CurveSpec, total: int, tile: int):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n = spec.ops.field.nlimbs
    kspec = _lane_spec(spec)

    def kernel(x1, y1, z1, x2, y2, z2, ox, oy, oz):
        P = (_load(x1, n), _load(y1, n), _load(z1, n))
        Q = (_load(x2, n), _load(y2, n), _load(z2, n))
        X3, Y3, Z3 = ec.add(kspec, P, Q)
        _store(ox, X3)
        _store(oy, Y3)
        _store(oz, Z3)

    bspec = pl.BlockSpec((tile, n), lambda i: (i, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(total // tile,),
        in_specs=[bspec] * 6,
        out_specs=(bspec,) * 3,
        out_shape=tuple(
            jax.ShapeDtypeStruct((total, n), jnp.uint32) for _ in range(3)
        ),
    )


@functools.lru_cache(maxsize=None)
def _double_call(spec: CurveSpec, total: int, tile: int):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n = spec.ops.field.nlimbs
    kspec = _lane_spec(spec)

    def kernel(x1, y1, z1, ox, oy, oz):
        P = (_load(x1, n), _load(y1, n), _load(z1, n))
        X3, Y3, Z3 = ec.double(kspec, P)
        _store(ox, X3)
        _store(oy, Y3)
        _store(oz, Z3)

    bspec = pl.BlockSpec((tile, n), lambda i: (i, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(total // tile,),
        in_specs=[bspec] * 3,
        out_specs=(bspec,) * 3,
        out_shape=tuple(
            jax.ShapeDtypeStruct((total, n), jnp.uint32) for _ in range(3)
        ),
    )


@functools.lru_cache(maxsize=None)
def _madd_call(spec: CurveSpec, total: int, tile: int, masked: bool):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n = spec.ops.field.nlimbs
    kspec = _lane_spec(spec)

    def kernel(*refs):
        if masked:
            x1, y1, z1, x2, y2, vm, ox, oy, oz = refs
        else:
            x1, y1, z1, x2, y2, ox, oy, oz = refs
            vm = None
        P = (_load(x1, n), _load(y1, n), _load(z1, n))
        Q = (_load(x2, n), _load(y2, n))
        valid = None if vm is None else (vm[:].T[0] != 0)
        X3, Y3, Z3 = ec.madd(kspec, P, Q, valid)
        _store(ox, X3)
        _store(oy, Y3)
        _store(oz, Z3)

    bspec = pl.BlockSpec((tile, n), lambda i: (i, 0), memory_space=pltpu.VMEM)
    n_in = 6 if masked else 5
    return pl.pallas_call(
        kernel,
        grid=(total // tile,),
        in_specs=[bspec] * n_in,
        out_specs=(bspec,) * 3,
        out_shape=tuple(
            jax.ShapeDtypeStruct((total, n), jnp.uint32) for _ in range(3)
        ),
    )


DEFAULT_TILE = 512


def _flatten_pad(coords, n, tile):
    shape = coords[0].shape[:-1]
    total = max(1, int(np.prod(shape, dtype=np.int64)))
    t = min(tile, max(8, 1 << (total - 1).bit_length()))
    pad = -total % t
    flat = [c.reshape(total, n) for c in coords]
    if pad:
        flat = [
            jnp.concatenate([c, jnp.zeros((pad, n), jnp.uint32)]) for c in flat
        ]
    return flat, shape, total, t, pad


def add(spec: CurveSpec, P, Q, tile: int = DEFAULT_TILE):
    n = spec.ops.field.nlimbs
    flat, shape, total, t, pad = _flatten_pad(list(P) + list(Q), n, tile)
    out = _add_call(spec, total + pad, t)(*flat)
    return tuple(o[:total].reshape(shape + (n,)) for o in out)


def double(spec: CurveSpec, P, tile: int = DEFAULT_TILE):
    n = spec.ops.field.nlimbs
    flat, shape, total, t, pad = _flatten_pad(list(P), n, tile)
    out = _double_call(spec, total + pad, t)(*flat)
    return tuple(o[:total].reshape(shape + (n,)) for o in out)


def madd(spec: CurveSpec, P, Q_affine, valid=None, tile: int = DEFAULT_TILE):
    """Fused complete mixed add (Jacobian P + affine Q); `valid` lanes=False
    pass P through. The MSM bucket-accumulation hot kernel."""
    n = spec.ops.field.nlimbs
    coords = list(P) + list(Q_affine)
    masked = valid is not None
    if masked:
        vm = jnp.broadcast_to(
            valid.astype(jnp.uint32)[..., None], valid.shape + (n,)
        )
        coords.append(vm)
    flat, shape, total, t, pad = _flatten_pad(coords, n, tile)
    out = _madd_call(spec, total + pad, t, masked)(*flat)
    return tuple(o[:total].reshape(shape + (n,)) for o in out)
