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


@functools.lru_cache(maxsize=None)
def _wreduce_call(spec: CurveSpec, nwin: int, W: int):
    """One grid cell per window: load that window's W bucket points as
    (8, W/8) limb tiles, compute  sum_j (j+1) * S_j  entirely in VMEM,
    store one Jacobian point (padded to an (8, n) block).

    Replaces the XLA-level msm._weighted_bucket_sum whose ~70 shrinking
    batched-add dispatches are dominated by per-dispatch latency, not by
    the ~2B complete adds of math. Weight-split identity with j = H*l + h:
      sum_j (j+1) S_j = H * sum_l l*R_l + sum_h (h+1)*C_h
    and both weighted sums come from DOUBLE SUFFIX ladders
    (sum_h (h+1) C_h = U_0,  sum_l l*R_l = U_1,  U = suffix(suffix(.))),
    implemented as fori_loops over dynamic-shift rolls so the kernel has
    ~10 group-op callsites regardless of W (unrolled trees took Mosaic
    minutes per callsite to compile).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n = spec.ops.field.nlimbs
    kspec = _lane_spec(spec)
    L = 8
    H = W // L

    def ladder(pts, width, shape):
        """suffix[j] = sum_{j' >= j} pts[j'] along the lane axis.

        Wide (lane-aligned) ladders run as a fori_loop over dynamic-shift
        rolls — one add callsite for all log2(width) levels (Mosaic takes
        minutes per unrolled complete-add callsite). Narrow ladders
        (tpu.dynamic_rotate rejects lane dims not multiple of 128) unroll
        with static rolls."""
        idx = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
        zero = tuple(jnp.zeros(shape, jnp.uint32) for _ in range(n))
        inf = (kspec.ops.one_like(zero), kspec.ops.one_like(zero), zero)
        nlev = max(1, (width - 1).bit_length())

        def shifted_add(pts, s, amount):
            keep = idx < (jnp.int32(width) - s)
            shifted = tuple(
                tuple(jnp.where(keep, pltpu.roll(x, amount, 1), i)
                      for x, i in zip(c, ic))
                for c, ic in zip(pts, inf))
            return ec.add(kspec, pts, shifted)

        if shape[1] % 128 == 0:
            def body(t, pts):
                s = jnp.left_shift(jnp.int32(1), t)
                return shifted_add(pts, s, jnp.int32(width) - s)

            return jax.lax.fori_loop(0, nlev, body, pts)
        for t in range(nlev):
            pts = shifted_add(pts, jnp.int32(1 << t), width - (1 << t))
        return pts

    def kernel(bx, by, bz, ox, oy, oz):
        s = tuple(
            tuple(ref[0][i] for i in range(n)) for ref in (bx, by, bz))
        # C_h = sum_l S[l, h]: 3 static sublane-halving adds -> (1, H)
        cols = s
        m = L
        while m > 1:
            half = m // 2
            cols = ec.add(
                kspec,
                tuple(tuple(x[:half] for x in c) for c in cols),
                tuple(tuple(x[half:m] for x in c) for c in cols))
            m = half
        # w2 = sum_h (h+1) C_h = U[0], U = suffix(suffix(C))
        u = ladder(ladder(cols, H, (1, H)), H, (1, H))
        w2 = tuple(tuple(x[0:1, 0:1] for x in c) for c in u)
        # R_l = sum_h S[l, h]: lane suffix ladder, first lane of each row
        rows = ladder(s, H, (L, H))
        rows = tuple(
            tuple(x[:, 0:1].reshape(1, L) for x in c) for c in rows)
        # w1 = sum_l l*R_l = U[1], U = suffix(suffix(R))
        u = ladder(ladder(rows, L, (1, L)), L, (1, L))
        w1 = tuple(tuple(x[0:1, 1:2] for x in c) for c in u)
        w1 = jax.lax.fori_loop(
            0, H.bit_length() - 1, lambda _, a: ec.double(kspec, a), w1)
        X3, Y3, Z3 = ec.add(kspec, w1, w2)
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, n), 1)
        for ref, limbs in ((ox, X3), (oy, Y3), (oz, Z3)):
            # (8, n) block: rows are sublane padding (Mosaic wants the
            # second-to-last block dim % 8); limbs placed via iota select
            # (concat of offset-mismatched tiny vectors doesn't lower),
            # lane broadcast first, sublane broadcast second
            acc = jnp.zeros((1, n), jnp.uint32)
            for i, limb in enumerate(limbs):
                acc = jnp.where(lane == i, jnp.broadcast_to(limb, (1, n)),
                                acc)
            ref[:] = jnp.broadcast_to(acc, (8, n))[None]

    bspec = pl.BlockSpec((1, n, L, H), lambda w: (w, 0, 0, 0),
                         memory_space=pltpu.VMEM)
    ospec = pl.BlockSpec((1, 8, n), lambda w: (w, 0, 0),
                         memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(nwin,),
        in_specs=[bspec] * 3,
        out_specs=(ospec,) * 3,
        out_shape=tuple(
            jax.ShapeDtypeStruct((nwin, 8, n), jnp.uint32)
            for _ in range(3)),
    )


def weighted_bucket_sum(spec: CurveSpec, buckets):
    """sum_j (j+1) * buckets[:, j] per window as ONE fused kernel launch.

    buckets: 3-tuple of (nwin, W, n) with W a power of two >= 64."""
    n = spec.ops.field.nlimbs
    nwin, W = buckets[0].shape[:2]
    blocks = tuple(
        x.reshape(nwin, 8, W // 8, n).transpose(0, 3, 1, 2)
        for x in buckets)
    out = _wreduce_call(spec, nwin, W)(*blocks)
    return tuple(x[:, 0, :] for x in out)  # 3-tuple of (nwin, n)


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
