"""Multi-scalar multiplication (Pippenger) as TPU-friendly vector kernels.

Replaces arkworks' rayon-parallel `msm_unchecked` used in all reference
provers (co-groth16/src/groth16.rs:221-288, co-groth16/src/mpc/rep3.rs
msm_public_points_hs). Algorithm, mapped to static-shape SPMD:

 1. window digits per scalar (c-bit, limb-aligned shifts — pure uint32 ops)
 2. per window, in chunks of K points:
    sort (digit, point) by digit (XLA sort), then a *segmented*
    jax.lax.associative_scan with the complete Jacobian add as the combine
    -> per-bucket partial sums in log depth, full-width vector ops
    (a scatter-add does not exist for the EC group law; sorting + log-depth
    scan is the data-oblivious equivalent)
 3. bucket-weighted reduction  sum_b b*S_b  via two more associative scans
 4. window Horner combine (c doublings per window) in one jitted scan

Everything is batch-parallel over full arrays -> maps onto the VPU and
shards over a mesh along the point axis (bucket partials then psum).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..ff.bigint import LIMB_BITS
from . import curve as ec
from .curve import CurveSpec


def window_digits(spec: CurveSpec, scalars_std, c: int):
    """(N, nlimbs) standard-form scalars -> (nwin, N) uint32 digits."""
    if LIMB_BITS % c != 0 and c % LIMB_BITS != 0:
        raise ValueError("window size must be limb-aligned")
    nbits = spec.scalar_field.nlimbs * LIMB_BITS
    nwin = -(-nbits // c)
    mask = np.uint32((1 << c) - 1)
    outs = []
    for w in range(nwin):
        bit0 = w * c
        limb = bit0 // LIMB_BITS
        shift = bit0 % LIMB_BITS
        d = (scalars_std[..., limb] >> np.uint32(shift)) & mask
        if shift + c > LIMB_BITS and limb + 1 < scalars_std.shape[-1]:
            # digit spans limb boundary (c > 16 only)
            hi = scalars_std[..., limb + 1] << np.uint32(LIMB_BITS - shift)
            d = (d | hi) & mask
        outs.append(d)
    return jnp.stack(outs)


def _bucket_accumulate_chunk(spec: CurveSpec, bucket_sums, digits, pts, c: int):
    """Add one chunk's points into per-bucket sums (the sorted-scan step)."""
    K = digits.shape[0]
    order = jnp.argsort(digits)
    sd = digits[order]
    sp = tuple(x[order] for x in pts)
    first = jnp.concatenate(
        [jnp.ones((1,), bool), sd[1:] != sd[:-1]]
    )  # segment starts

    def combine(a, b):
        pa, fa = a[:-1], a[-1]
        pb, fb = b[:-1], b[-1]
        merged = ec.add(spec, pa, pb)
        pt = ec.select_point(spec, fb, pb, merged)
        return pt + (fa | fb,)

    scanned = jax.lax.associative_scan(combine, sp + (first,))
    seg_sum = scanned[:-1]
    is_last = jnp.concatenate([sd[1:] != sd[:-1], jnp.ones((1,), bool)])
    # digit 0 contributes nothing; drop it together with non-last positions
    target = jnp.where(is_last & (sd != 0), sd, np.uint32(1 << c))
    staged = ec.point_inf(spec, (1 << c,))
    staged = tuple(
        st.at[target].set(v, mode="drop") for st, v in zip(staged, seg_sum)
    )
    return ec.add(spec, bucket_sums, staged)


@functools.partial(jax.jit, static_argnums=(0, 3, 4))
def _window_msm(spec: CurveSpec, digits, pts, c: int, chunk: int):
    """One window: bucket sums over all chunks, then sum_b b*S_b."""
    N = digits.shape[0]
    nchunks = N // chunk
    xs = (
        digits.reshape(nchunks, chunk),
        tuple(x.reshape((nchunks, chunk) + x.shape[1:]) for x in pts),
    )

    def body(carry, x):
        d, p = x
        return _bucket_accumulate_chunk(spec, carry, d, p, c), None

    bucket_sums, _ = jax.lax.scan(body, ec.point_inf(spec, (1 << c,)), xs)
    # weighted reduction: sum_{b>=1} b*S_b = sum_j (suffix sums T_j)
    rev = tuple(x[1:][::-1] for x in bucket_sums)
    suffix = jax.lax.associative_scan(lambda a, b: ec.add(spec, a, b), rev)
    total = jax.lax.associative_scan(lambda a, b: ec.add(spec, a, b), suffix)
    return tuple(x[-1] for x in total)


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
    if n >= 1 << 15:
        return 16
    if n >= 1 << 8:
        return 8
    return 4


def msm(spec: CurveSpec, points, scalars_std, c: int | None = None,
        chunk: int = 1 << 16):
    """MSM of device Jacobian `points` (leading axis N) with standard-form
    scalar limb arrays (N, nlimbs). Returns a single Jacobian point.

    Digits/windows are processed with a per-window jitted kernel (compiled
    once per (N, c, chunk) signature) plus one jitted Horner combine.
    """
    N = points[0].shape[0]
    if N <= 64:
        return _msm_small(spec, points, scalars_std)
    if c is None:
        c = default_window(N)
    chunk = min(chunk, max(32, 1 << max(0, N - 1).bit_length()))
    if N % chunk != 0:
        pad = -N % chunk if N > chunk else chunk - N
        zpad = lambda x: jnp.concatenate(
            [x, jnp.zeros((pad,) + x.shape[1:], x.dtype)]
        )
        scalars_std = zpad(scalars_std)
        inf = ec.point_inf(spec, (pad,))
        points = tuple(
            jnp.concatenate([x, jnp.broadcast_to(i, (pad,) + x.shape[1:])])
            for x, i in zip(points, inf)
        )
        N = points[0].shape[0]
    digits = window_digits(spec, scalars_std, c)
    wsums = [
        _window_msm(spec, digits[w], points, c, min(chunk, N))
        for w in range(digits.shape[0])
    ]
    stacked = tuple(jnp.stack([w[i] for w in wsums]) for i in range(3))
    return _horner_combine(spec, stacked, c)
