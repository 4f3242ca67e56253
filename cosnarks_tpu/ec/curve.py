"""Vectorized short-Weierstrass (a=0) Jacobian curve kernels, generic over
the coordinate field ops (Fq for G1, Fq2 for G2).

TPU-native counterpart of arkworks ark-ec group arithmetic the reference
leans on for MSMs (co-groth16/src/groth16.rs:221-288). Points are pytrees
(X, Y, Z) of limb arrays; infinity is encoded as Z == 0 and handled
branchlessly with selects so everything jits/vmaps with static shapes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..ff.bigint import LIMB_BITS
from ..ff.spec import BLS12_381_FQ, BLS12_381_FR, BN254_FQ, BN254_FR, Field
from .ops import Fq2Ops, FqOps


class CurveSpec:
    """A curve group: coordinate ops + scalar field + generator/b constant."""

    def __init__(self, name, coord_ops, scalar_field: Field, b, generator):
        self.name = name
        self.ops = coord_ops
        self.scalar_field = scalar_field
        self.b = b  # host int (Fq) or (c0, c1) (Fq2)
        self.generator = generator  # host affine (x, y)

    def __hash__(self):
        return hash(("curve", self.name))

    def __eq__(self, other):
        return isinstance(other, CurveSpec) and other.name == self.name

    def __repr__(self):
        return f"CurveSpec({self.name})"


def point_inf(spec: CurveSpec, shape=()):
    o = spec.ops
    return (o.one(shape), o.one(shape), o.zeros(shape))


def is_inf(spec: CurveSpec, P):
    return spec.ops.is_zero(P[2])


def neg(spec: CurveSpec, P):
    X, Y, Z = P
    return (X, spec.ops.neg(Y), Z)


def select_point(spec: CurveSpec, mask, P, Q):
    sel = spec.ops.select
    return tuple(sel(mask, a, b) for a, b in zip(P, Q))


def _mulstack(o, xs, ys):
    """Batched independent products — dispatched through the ops object so
    in-kernel (lane-vector) backends can unroll instead of stacking."""
    return o.mulstack(tuple(xs), tuple(ys))


def _pallas_batch(spec, P) -> bool:
    # Route EVERY prime-field EC group op through the fused Pallas kernel on
    # accelerator backends: each op is then one custom call in the XLA graph
    # (vs ~6k HLO ops), which keeps MSM scan graphs compilable, and the
    # Mosaic kernel is compiled once per tile shape.
    from .ops import FqOps

    if type(spec.ops) is not FqOps:
        return False
    if P[0].ndim > 1 and int(np.prod(P[0].shape[:-1], dtype=np.int64)) == 0:
        return False  # empty batch (e.g. scan edge slices)
    try:
        return jax.default_backend() != "cpu"
    except Exception:  # pragma: no cover
        return False


def double(spec: CurveSpec, P):
    """dbl-2009-l (a=0). Infinity (Z=0) maps to infinity automatically."""
    if _pallas_batch(spec, P):
        from . import pallas_ec

        return pallas_ec.double(spec, P)
    o = spec.ops
    X, Y, Z = P
    A, B, YZ = _mulstack(o, (X, Y, Y), (X, Y, Z))  # X^2, Y^2, Y*Z
    XB = o.add(X, B)
    C, T = _mulstack(o, (B, XB), (B, XB))  # B^2, (X+B)^2
    D = o.double(o.sub(T, o.add(A, C)))
    E = o.add(o.double(A), A)
    F = o.mul(E, E)
    X3 = o.sub(F, o.double(D))
    C8 = o.double(o.double(o.double(C)))
    Y3 = o.sub(o.mul(E, o.sub(D, X3)), C8)
    Z3 = o.double(YZ)
    return (X3, Y3, Z3)


def add(spec: CurveSpec, P, Q):
    """Complete Jacobian add (add-2007-bl + select-based edge handling):
    correct for P=inf, Q=inf, P=Q (falls back to double), P=-Q (-> inf)."""
    if _pallas_batch(spec, P) and P[0].shape == Q[0].shape:
        from . import pallas_ec

        return pallas_ec.add(spec, P, Q)
    o = spec.ops
    X1, Y1, Z1 = P
    X2, Y2, Z2 = Q
    Z1Z1, Z2Z2, t1, t2 = _mulstack(o, (Z1, Z2, Y1, Y2), (Z1, Z2, Z2, Z1))
    Z12 = o.add(Z1, Z2)
    U1, U2, S1, S2, W = _mulstack(
        o, (X1, X2, t1, t2, Z12), (Z2Z2, Z1Z1, Z2Z2, Z1Z1, Z12)
    )
    H = o.sub(U2, U1)
    rhalf = o.sub(S2, S1)
    H2 = o.double(H)
    r = o.double(rhalf)
    I, r2 = _mulstack(o, (H2, r), (H2, r))
    J, V, Z3 = _mulstack(
        o, (H, U1, o.sub(W, o.add(Z1Z1, Z2Z2))), (I, I, H)
    )
    X3 = o.sub(r2, o.add(J, o.double(V)))
    rVX, S1J = _mulstack(o, (r, S1), (o.sub(V, X3), J))
    Y3 = o.sub(rVX, o.double(S1J))

    p_inf = o.is_zero(Z1)
    q_inf = o.is_zero(Z2)
    h_zero = o.is_zero(H)
    r_zero = o.is_zero(rhalf)
    finite = ~(p_inf | q_inf)
    same = h_zero & r_zero & finite
    cancel = h_zero & ~r_zero & finite  # P = -Q

    res = (X3, Y3, o.select(cancel, o.zeros_like(Z3), Z3))
    res = select_point(spec, same, double(spec, P), res)
    res = select_point(spec, p_inf, Q, res)
    res = select_point(spec, q_inf, P, res)
    return res


def madd(spec: CurveSpec, P, Q_affine, valid=None):
    """Complete mixed add: Jacobian P + affine Q = (x2, y2) (implicit Z2=1).

    madd-2007-bl (7M+4S) + select-based edge handling: correct for P=inf
    (returns Q), P=Q (doubles), P=-Q (infinity). `valid` is a boolean lane
    mask — invalid lanes return P unchanged (the MSM bucket-accumulation
    hot path uses this for segment-tail padding).
    """
    if _pallas_batch(spec, P):
        from . import pallas_ec

        return pallas_ec.madd(spec, P, Q_affine, valid)
    o = spec.ops
    X1, Y1, Z1 = P
    X2, Y2 = Q_affine
    Z1Z1 = o.mul(Z1, Z1)
    U2, Z1c = _mulstack(o, (X2, Z1), (Z1Z1, Z1Z1))
    S2 = o.mul(Y2, Z1c)
    H = o.sub(U2, X1)
    rhalf = o.sub(S2, Y1)
    HH = o.mul(H, H)
    I = o.double(o.double(HH))
    r = o.double(rhalf)
    J, V, r2 = _mulstack(o, (H, X1, r), (I, I, r))
    X3 = o.sub(r2, o.add(J, o.double(V)))
    rVX, Y1J, ZH = _mulstack(
        o, (r, Y1, o.add(Z1, H)), (o.sub(V, X3), J, o.add(Z1, H))
    )
    Y3 = o.sub(rVX, o.double(Y1J))
    Z3 = o.sub(ZH, o.add(Z1Z1, HH))

    p_inf = o.is_zero(Z1)
    h_zero = o.is_zero(H)
    r_zero = o.is_zero(rhalf)
    same = h_zero & r_zero & ~p_inf
    cancel = h_zero & ~r_zero & ~p_inf
    res = (X3, Y3, o.select(cancel, o.zeros_like(Z3), Z3))
    res = select_point(spec, same, double(spec, P), res)
    res = select_point(spec, p_inf, (X2, Y2, o.one_like(Z1)), res)
    if valid is not None:
        res = select_point(spec, valid, res, P)
    return res


def proj_point_inf(spec: CurveSpec, shape=()):
    """Projective identity (0 : 1 : 0)."""
    o = spec.ops
    return (o.zeros(shape), o.one(shape), o.zeros(shape))


def _mul_b3(spec: CurveSpec, o, x):
    """x * 3b for the RCB complete formulas. Small-int 3b (both G1 curves:
    9 and 12) is a double/add chain (~4 modadds, vs ~450 lane-ops for a
    full mul); Fq2 twists (G2) multiply by the encoded constant."""
    b = spec.b
    if isinstance(b, int) and 0 < 3 * b <= 64:
        b3 = 3 * b
        # left-to-right binary chain on the multiplier
        acc = x
        for bit in bin(b3)[3:]:
            acc = o.double(acc)
            if bit == "1":
                acc = o.add(acc, x)
        return acc
    p = o.field.p
    if isinstance(b, tuple):
        c = o.constant((3 * b[0] % p, 3 * b[1] % p),
                       x.shape[: x.ndim - o.coord_ndim])
        return o.mul(x, c)
    b3 = 3 * b % p
    if p - b3 <= 64:  # small negative constant (Grumpkin b = -17): chain
        acc = x
        for bit in bin(p - b3)[3:]:
            acc = o.double(acc)
            if bit == "1":
                acc = o.add(acc, x)
        return o.neg(acc)
    shape = x.shape[: x.ndim - 1] if hasattr(x, "ndim") else None
    return o.mul(x, o.constant(b3, shape))


def proj_add(spec: CurveSpec, P, Q):
    """COMPLETE projective add, a=0 short Weierstrass (Renes-Costello-
    Batina 2015/1060 alg 7). Straight-line: no selects, no is_zero, valid
    for every input pair including identity (0:1:0), P=Q and P=-Q —
    complete because both curves' E(Fq) groups have odd order.

    12 muls + 2 small-constant muls: replaces the 23-mul select-chained
    complete Jacobian add on the MSM reduction paths.
    """
    if _pallas_batch(spec, P) and P[0].shape == Q[0].shape:
        from . import pallas_ec

        return pallas_ec.proj_add(spec, P, Q)
    o = spec.ops
    X1, Y1, Z1 = P
    X2, Y2, Z2 = Q
    t0, t1, t2, s3, s4, s5 = _mulstack(
        o,
        (X1, Y1, Z1, o.add(X1, Y1), o.add(Y1, Z1), o.add(X1, Z1)),
        (X2, Y2, Z2, o.add(X2, Y2), o.add(Y2, Z2), o.add(X2, Z2)),
    )
    t3 = o.sub(s3, o.add(t0, t1))  # X1Y2 + X2Y1
    t4 = o.sub(s4, o.add(t1, t2))  # Y1Z2 + Y2Z1
    t5 = o.sub(s5, o.add(t0, t2))  # X1Z2 + X2Z1
    t0 = o.add(o.double(t0), t0)   # 3 X1X2
    t2 = _mul_b3(spec, o, t2)      # 3b Z1Z2
    z = o.add(t1, t2)
    t1 = o.sub(t1, t2)
    y = _mul_b3(spec, o, t5)       # 3b (X1Z2+X2Z1)
    A, B, C, D, E, F = _mulstack(
        o, (t4, t3, y, t1, t0, z), (y, t1, t0, z, t3, t4)
    )
    return (o.sub(B, A), o.add(D, C), o.add(F, E))


def proj_madd(spec: CurveSpec, P, Q_affine, valid=None):
    """COMPLETE projective mixed add (RCB alg 8, Z2=1): 11 muls + 2
    small-constant muls. `valid` lanes=False return P unchanged. NOTE:
    Q_affine must be a real affine point (the implicit Z2=1 means "point
    at infinity" cannot be encoded; mask such lanes out via `valid`)."""
    if _pallas_batch(spec, P):
        from . import pallas_ec

        return pallas_ec.proj_madd(spec, P, Q_affine, valid)
    o = spec.ops
    X1, Y1, Z1 = P
    x2, y2 = Q_affine
    t0, t1, s3, u, v = _mulstack(
        o,
        (X1, Y1, o.add(X1, Y1), x2, y2),
        (x2, y2, o.add(x2, y2), Z1, Z1),
    )
    t3 = o.sub(s3, o.add(t0, t1))  # X1y2 + x2Y1
    t4 = o.add(u, X1)              # x2Z1 + X1
    t5 = o.add(v, Y1)              # y2Z1 + Y1
    t0 = o.add(o.double(t0), t0)   # 3 X1x2
    t2 = _mul_b3(spec, o, Z1)
    z = o.add(t1, t2)
    t1 = o.sub(t1, t2)
    y = _mul_b3(spec, o, t4)
    A, B, C, D, E, F = _mulstack(
        o, (t5, t3, y, t1, t0, z), (y, t1, t0, z, t3, t5)
    )
    res = (o.sub(B, A), o.add(D, C), o.add(F, E))
    if valid is not None:
        res = select_point(spec, valid, res, P)
    return res


def proj_double(spec: CurveSpec, P):
    """Projective doubling (RCB alg 9, a=0): 8 muls + 1 small-constant
    mul; complete (identity doubles to identity)."""
    if _pallas_batch(spec, P):
        from . import pallas_ec

        return pallas_ec.proj_double(spec, P)
    o = spec.ops
    X, Y, Z = P
    t0, t1, t2, xy = _mulstack(o, (Y, Y, Z, X), (Y, Z, Z, Y))
    z3 = o.double(o.double(o.double(t0)))  # 8 Y^2
    t2 = _mul_b3(spec, o, t2)
    y3 = o.add(t0, t2)
    x3, z3 = _mulstack(o, (t2, t1), (z3, z3))
    t2 = o.add(o.double(t2), t2)  # 3 * (3b Z^2)
    t0 = o.sub(t0, t2)
    Y3, X3 = _mulstack(o, (t0, t0), (y3, xy))
    return (o.double(X3), o.add(x3, Y3), z3)


def proj_to_jacobian(spec: CurveSpec, P):
    """(X:Y:Z) projective -> (XZ, YZ^2, Z) Jacobian. Identity (0:1:0)
    maps to (0,0,0), a valid Jacobian infinity encoding (Z=0)."""
    o = spec.ops
    X, Y, Z = P
    XZ, Z2 = _mulstack(o, (X, Z), (Z, Z))
    return (XZ, o.mul(Y, Z2), Z)


def _bmask(o, mask):
    extra = (1,) * o.coord_ndim
    return mask.reshape(mask.shape + extra)


def add_unsafe(spec: CurveSpec, P, Q):
    """Jacobian add handling infinities but NOT P == +-Q (undefined there).

    ~30% cheaper than :func:`add`; safe when summands are distinct with
    cryptographic probability (e.g. bucket reduction over random shares).
    """
    o = spec.ops
    X1, Y1, Z1 = P
    X2, Y2, Z2 = Q
    Z1Z1, Z2Z2, t1, t2 = _mulstack(o, (Z1, Z2, Y1, Y2), (Z1, Z2, Z2, Z1))
    Z12 = o.add(Z1, Z2)
    U1, U2, S1, S2, W = _mulstack(
        o, (X1, X2, t1, t2, Z12), (Z2Z2, Z1Z1, Z2Z2, Z1Z1, Z12)
    )
    H = o.sub(U2, U1)
    H2 = o.double(H)
    r = o.double(o.sub(S2, S1))
    I, r2 = _mulstack(o, (H2, r), (H2, r))
    J, V, Z3 = _mulstack(
        o, (H, U1, o.sub(W, o.add(Z1Z1, Z2Z2))), (I, I, H)
    )
    X3 = o.sub(r2, o.add(J, o.double(V)))
    rVX, S1J = _mulstack(o, (r, S1), (o.sub(V, X3), J))
    Y3 = o.sub(rVX, o.double(S1J))
    res = (X3, Y3, Z3)
    res = select_point(spec, o.is_zero(Z1), Q, res)
    res = select_point(spec, o.is_zero(Z2), P, res)
    return res


@functools.partial(jax.jit, static_argnums=0)
def scalar_mul(spec: CurveSpec, P, scalar_std):
    """P * scalar, scalar as standard-form (non-Montgomery) limb array.

    Data-dependent bits -> fori_loop over the full bit width with selects
    (used for the few per-proof scalar muls, e.g. [r]*delta_g1,
    groth16.rs:224; MSMs use the Pippenger path instead).
    """
    f = spec.scalar_field
    nbits = f.nlimbs * LIMB_BITS

    def body(i, acc):
        k = nbits - 1 - i  # traced loop index
        limb = jnp.take(scalar_std, k // LIMB_BITS, axis=-1)
        bit = (limb >> (k % LIMB_BITS).astype(jnp.uint32)) & np.uint32(1)
        acc = double(spec, acc)
        added = add(spec, acc, P)
        return select_point(spec, bit.astype(bool), added, acc)

    shape = P[0].shape[: -spec.ops.coord_ndim]
    return jax.lax.fori_loop(0, nbits, body, point_inf(spec, shape))


def to_affine(spec: CurveSpec, P):
    """Batch-normalize Jacobian points to affine-or-infinity form
    (Z in {0, 1}): x = X/Z^2, y = Y/Z^3. Vectorized field inversion;
    points at infinity keep Z = 0 (the canonical form `msm` requires)."""
    o = spec.ops
    X, Y, Z = P
    inf = o.is_zero(Z)
    zsafe = o.select(inf, o.one_like(Z), Z)
    zi = o.inv(zsafe)
    zi2 = o.mul(zi, zi)
    x = o.mul(X, zi2)
    y = o.mul(Y, o.mul(zi2, zi))
    one = o.one_like(Z)
    return (x, y, o.select(inf, o.zeros_like(Z), one))


# --------------------------------------------------------------------------
# host <-> device
# --------------------------------------------------------------------------

def encode_points(spec: CurveSpec, affine_points):
    """Host affine points [(x, y) | None(=inf)] -> device Jacobian arrays."""
    o = spec.ops
    n = len(affine_points)
    zero_c = (0, 0) if o.coord_ndim == 2 else 0
    one_c = (1, 0) if o.coord_ndim == 2 else 1
    xs, ys, zs = [], [], []
    for pt in affine_points:
        if pt is None:
            xs.append(one_c)
            ys.append(one_c)
            zs.append(zero_c)
        else:
            xs.append(pt[0])
            ys.append(pt[1])
            zs.append(one_c)
    return (o.encode(xs), o.encode(ys), o.encode(zs))


def decode_points(spec: CurveSpec, P):
    """Device Jacobian points -> host affine [(x, y) | None]; host-side inv."""
    o = spec.ops
    xs = o.decode(P[0])
    ys = o.decode(P[1])
    zs = o.decode(P[2])
    from . import host

    hc = host.host_curve(spec)
    return [hc.jac_to_affine((x, y, z)) for x, y, z in zip(xs, ys, zs)]
