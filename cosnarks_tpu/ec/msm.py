"""Multi-scalar multiplication (Pippenger) as TPU-friendly vector kernels.

Replaces arkworks' rayon-parallel `msm_unchecked` used in all reference
provers (co-groth16/src/groth16.rs:221-288, co-groth16/src/mpc/rep3.rs
msm_public_points_hs). Algorithm, mapped to static-shape SPMD:

 1. signed c-bit window digits (buckets halved: |d| <= 2^(c-1), point
    negation absorbs the sign — negating y is one field sub)
 2. per window, sort point indices by bucket id (one XLA sort per window)
    and compute per-bucket segment starts/lengths (searchsorted)
 3. bucket accumulation by *segment offset*: iterate t = 0..max_seg_len,
    each step gathers the t-th point of every (window, bucket) segment and
    performs one fused complete mixed-add (`pallas madd`, Jacobian +=
    affine) across all nwin*B lanes. Total work is ~nwin*N mixed adds —
    the O(N log N) complete-add scans of the naive formulation are gone —
    and every step is one Pallas custom call over a wide batch.
 4. weighted bucket reduction  sum_b b*S_b  via two log-depth
    associative scans over the bucket axis (complete Jacobian adds)
 5. window Horner combine (c doublings per window) in one jitted scan

Multi-chip: shard the point axis, run steps 1-3 per device on its slice,
tree-add the (nwin, B) bucket accumulators over the mesh axis, then run
4-5 replicated (see __graft_entry__.dryrun_multichip).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..ff.bigint import LIMB_BITS
from . import curve as ec
from .curve import CurveSpec


def _raw_digits(spec: CurveSpec, scalars_std, c: int):
    """(N, nlimbs) standard-form scalars -> (nwin, N) uint32 raw c-bit
    digits, LSB window first. c <= LIMB_BITS (digits span <= 2 limbs)."""
    if c > LIMB_BITS:
        raise ValueError("window size must be <= limb width")
    f = spec.scalar_field
    nbits = f.nlimbs * LIMB_BITS
    nwin = -(-f.bits // c)
    mask = np.uint32((1 << c) - 1)
    outs = []
    for w in range(nwin):
        bit0 = w * c
        limb = bit0 // LIMB_BITS
        shift = bit0 % LIMB_BITS
        d = scalars_std[..., limb] >> np.uint32(shift)
        if shift + c > LIMB_BITS and limb + 1 < f.nlimbs:
            d = d | (scalars_std[..., limb + 1] << np.uint32(LIMB_BITS - shift))
        outs.append(d & mask)
    return jnp.stack(outs)


def signed_digits(spec: CurveSpec, scalars_std, c: int):
    """Signed digit recoding: returns (nwin, N) int32 digits in
    [-(2^(c-1)-1), 2^(c-1)] so that sum_w d_w 2^(cw) = scalar.

    Requires scalar < 2^field.bits with the top window unable to overflow:
    field.bits - (nwin-1)*c < c (holds for both curves for 8 <= c <= 16).
    """
    f = spec.scalar_field
    nwin = -(-f.bits // c)
    top_max = (1 << (f.bits - (nwin - 1) * c)) - 1 + 1  # raw + carry
    if top_max > (1 << (c - 1)):
        raise ValueError(f"window {c} would overflow the top signed digit")
    raw = _raw_digits(spec, scalars_std, c).astype(jnp.int32)
    half = np.int32(1 << (c - 1))
    full = np.int32(1 << c)
    outs = []
    carry = jnp.zeros_like(raw[0])
    for w in range(nwin):
        v = raw[w] + carry
        over = v > half
        outs.append(jnp.where(over, v - full, v))
        carry = over.astype(jnp.int32)
    return jnp.stack(outs)


@functools.partial(jax.jit, static_argnums=(0, 3))
def _pippenger_signed(spec: CurveSpec, pts, scalars_std, c: int):
    """Full MSM: signed digits -> sorted buckets -> offset accumulation ->
    weighted reduction -> Horner. One jit per (N, c) signature."""
    o = spec.ops
    X, Y, Z = pts
    N = X.shape[0]
    B = (1 << (c - 1)) + 1  # buckets 0..2^(c-1); bucket 0 is dropped
    inf_in = o.is_zero(Z)  # (N,) input points at infinity contribute 0

    digits = signed_digits(spec, scalars_std, c)  # (nwin, N)
    nwin = digits.shape[0]
    bucket = jnp.abs(digits).astype(jnp.uint32)
    sign = digits < 0

    order = jnp.argsort(bucket, axis=1)  # (nwin, N) stable
    sortedb = jnp.take_along_axis(bucket, order, axis=1)
    sorted_sign = jnp.take_along_axis(sign, order, axis=1)

    boundaries = jax.vmap(
        lambda sb: jnp.searchsorted(sb, jnp.arange(B + 1, dtype=jnp.uint32))
    )(sortedb)  # (nwin, B+1)
    starts = boundaries[:, :B]
    lens = boundaries[:, 1:] - starts
    max_len = jnp.max(lens[:, 1:])  # longest non-zero bucket segment

    lane_live = jnp.arange(B, dtype=jnp.uint32)[None, :] > 0  # drop bucket 0

    def body(state):
        t, acc = state
        pos = jnp.minimum(starts + t, N - 1)
        valid = (t < lens) & lane_live
        pidx = jnp.take_along_axis(order, pos, axis=1)  # (nwin, B)
        flat = pidx.reshape(-1)
        qx = jnp.take(X, flat, axis=0).reshape((nwin, B) + X.shape[1:])
        qy = jnp.take(Y, flat, axis=0).reshape((nwin, B) + Y.shape[1:])
        sgn = jnp.take_along_axis(sorted_sign, pos, axis=1)
        qy = o.select(sgn, o.neg(qy), qy)
        valid = valid & ~inf_in[flat].reshape(nwin, B)
        acc = ec.madd(spec, acc, (qx, qy), valid)
        return t + np.uint32(1), acc

    init = (jnp.uint32(0), ec.point_inf(spec, (nwin, B)))
    _, acc = jax.lax.while_loop(lambda s: s[0] < max_len, body, init)

    # weighted reduction sum_{b>=1} b*S_b via suffix-sum of suffix-sums
    rev = tuple(x[:, 1:][:, ::-1] for x in acc)
    suffix = jax.lax.associative_scan(
        lambda a, b: ec.add(spec, a, b), rev, axis=1
    )
    total = jax.lax.associative_scan(
        lambda a, b: ec.add(spec, a, b), suffix, axis=1
    )
    wsums = tuple(x[:, -1] for x in total)  # (nwin,)
    return _horner_combine(spec, wsums, c)


@functools.partial(jax.jit, static_argnums=(0, 2))
def _horner_combine(spec: CurveSpec, window_sums, c: int):
    """sum_w 2^(c*w) W_w, scanning from the top window down."""
    rev = tuple(x[::-1] for x in window_sums)

    def body(acc, w):
        acc = jax.lax.fori_loop(0, c, lambda _, a: ec.double(spec, a), acc)
        return ec.add(spec, acc, w), None

    top = tuple(x[0] for x in rev)
    rest = tuple(x[1:] for x in rev)
    out, _ = jax.lax.scan(body, top, rest)
    return out


@functools.partial(jax.jit, static_argnums=0)
def _msm_small(spec: CurveSpec, points, scalars_std):
    """Direct MSM for tiny N: batched double-and-add + log-depth tree sum.

    Avoids the Pippenger machinery whose per-window graphs dominate compile
    time when N is small (e.g. the handful-of-points query MSMs in Groth16
    test circuits)."""
    acc = ec.scalar_mul(spec, points, scalars_std)
    n = points[0].shape[0]
    while n > 1:
        half = (n + 1) // 2
        lo = tuple(x[:half] for x in acc)
        hi = tuple(x[half : 2 * half] for x in acc)
        if hi[0].shape[0] < half:
            pad = half - hi[0].shape[0]
            inf = ec.point_inf(spec, (pad,))
            hi = tuple(
                jnp.concatenate([h, jnp.broadcast_to(i, (pad,) + h.shape[1:])])
                for h, i in zip(hi, inf)
            )
        acc = ec.add(spec, lo, hi)
        n = half
    return tuple(x[0] for x in acc)


def default_window(n: int) -> int:
    """Balance accumulation (nwin*N*imbalance) vs reduction (nwin*B*log B):
    keep average segment length >= ~32 so gather lanes stay busy."""
    if n >= 1 << 19:
        return 13
    if n >= 1 << 16:
        return 12
    if n >= 1 << 13:
        return 10
    return 8


def msm(spec: CurveSpec, points, scalars_std, c: int | None = None,
        chunk: int | None = None):
    """MSM of device Jacobian `points` (leading axis N, affine-or-infinity:
    Z in {0, 1}) with standard-form scalar limb arrays (N, nlimbs).
    Returns a single Jacobian point. `chunk` is accepted for backward
    compatibility and ignored."""
    N = points[0].shape[0]
    if N <= 64:
        return _msm_small(spec, points, scalars_std)
    if c is None:
        c = default_window(N)
    return _pippenger_signed(spec, points, scalars_std, c)
