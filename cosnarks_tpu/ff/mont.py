"""Vectorized Montgomery arithmetic on 16-bit limb arrays (uint32 lanes).

This is the TPU-native replacement for arkworks' `ark-ff` field backend that
the whole reference stack sits on (SURVEY.md L0). Field elements are
little-endian 16-bit limbs held in uint32 lanes, shape (..., nlimbs), kept in
Montgomery form with R = 2**(16*nlimbs) and always canonical (< p).

Design notes (why this maps well to the TPU VPU):
 - limbs are 16-bit so a limb product fits exactly in a uint32 lane
   (no 32x32->64 widening, which TPUs lack);
 - the schoolbook product is one broadcasted (B, n, n) uint32 multiply plus a
   static antidiagonal gather -> big fused elementwise work, no scalar loops;
 - the Montgomery reduction is n short vectorized steps (the m_i chain is
   inherently sequential, everything inside a step is a vector op);
 - all shapes static, no data-dependent control flow -> friendly to jit/vmap
   and to sharding the batch dimension over a mesh.

Every public op is differentiable-free pure jnp and works identically on CPU
(tests) and TPU (bench).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .bigint import LIMB_BITS, LIMB_MASK, int_to_limbs, ints_to_limbs, limbs_to_ints
from .spec import Field

MASK = np.uint32(LIMB_MASK)
U32 = jnp.uint32


@functools.lru_cache(maxsize=None)
def _consts(field: Field):
    """Host numpy constants for a field (converted to jnp lazily by closure)."""
    n = field.nlimbs
    w = 2 * n
    # Antidiagonal gather indices: padded row i (width w, right-half zeros)
    # contributes padded[i, (k - i) % w] to product column k (lo parts) and
    # padded[i, (k - 1 - i) % w] (hi parts).
    k = np.arange(w)[None, :]
    i = np.arange(n)[:, None]
    idx_lo = ((k - i) % w).astype(np.int32)
    idx_hi = ((k - 1 - i) % w).astype(np.int32)
    return {
        "p": field.p_limbs,
        "n0inv": np.uint32(field.n0inv),
        "one_mont": field.one_mont,
        "r2": field.r2_limbs,
        "idx_lo": idx_lo,
        "idx_hi": idx_hi,
    }


def _pad_to(x, length):
    deficit = length - x.shape[-1]
    if deficit <= 0:
        return x
    widths = [(0, 0)] * (x.ndim - 1) + [(0, deficit)]
    return jnp.pad(x, widths)


def _shift_right_cols(x, k, width):
    """Place x (..., m) at column offset k inside a width-`width` array."""
    widths = [(0, 0)] * (x.ndim - 1) + [(k, width - k - x.shape[-1])]
    return jnp.pad(x, widths)


def _product_columns(field: Field, a, b):
    """Full product of a*b as 2n columns, column values < 2*n*2**16 < 2**22.

    Schoolbook row scan as a fori_loop (graph stays ~10 ops regardless of
    limb count — unrolled versions made downstream EC/MSM graphs so large
    that XLA compiles took minutes). Working set is O(batch * 2n) uint32.
    """
    n = field.nlimbs
    w = 2 * n
    zcol = jnp.zeros(a.shape[:-1] + (1,), dtype=U32)

    def body(i, cols):
        ai = jax.lax.dynamic_slice_in_dim(a, i, 1, axis=-1)  # (..., 1)
        pi = ai * b  # (..., n) uint32, exact (16x16-bit)
        lo = pi & MASK
        hi = pi >> LIMB_BITS
        seg = jax.lax.dynamic_slice_in_dim(cols, i, n + 1, axis=-1)
        seg = (
            seg
            + jnp.concatenate([lo, zcol], axis=-1)
            + jnp.concatenate([zcol, hi], axis=-1)
        )
        return jax.lax.dynamic_update_slice_in_dim(cols, seg, i, axis=-1)

    cols = jnp.zeros(a.shape[:-1] + (w,), dtype=U32)
    return jax.lax.fori_loop(0, n, body, cols)


def _propagate(cols, out_len):
    """Carry-propagate columns (< 2**32 each) to `out_len` 16-bit limbs.

    Caller must guarantee the represented value fits in out_len limbs.
    """
    lo = cols & MASK
    hi = cols >> LIMB_BITS
    # value = sum lo_k 2^(16k) + sum hi_k 2^(16(k+1)); re-add shifted (all <2^17)
    t = _pad_to(lo, out_len)[..., :out_len]
    hi_shift = _pad_to(jnp.concatenate([jnp.zeros_like(hi[..., :1]), hi], axis=-1),
                       out_len)[..., :out_len]
    t = t + hi_shift  # < 2**18

    def step(carry, x):
        s = x + carry
        return s >> LIMB_BITS, s & MASK

    _, out = jax.lax.scan(step, jnp.zeros_like(t[..., 0]), jnp.moveaxis(t, -1, 0))
    return jnp.moveaxis(out, 0, -1)


def _borrow_chain(t, u):
    """Limb-wise t - u with borrow chain; returns (diff, final_borrow).

    u is a (n,) constant-like array broadcast against t's batch dims.
    """

    def step(borrow, xs):
        x, uj = xs
        s = x + np.uint32(1 << LIMB_BITS) - uj - borrow
        return np.uint32(1) - (s >> LIMB_BITS), s & MASK

    borrow, d = jax.lax.scan(
        step, jnp.zeros_like(t[..., 0]), (jnp.moveaxis(t, -1, 0), u)
    )
    return jnp.moveaxis(d, 0, -1), borrow


def _cond_sub_p(field: Field, t):
    """t (canonical-width limbs, value < 2p) -> t mod p."""
    p = jnp.asarray(_consts(field)["p"])
    d, borrow = _borrow_chain(t, p)
    return jnp.where((borrow == 0)[..., None], d, t)


def _mont_reduce_columns(field: Field, cols):
    """Montgomery-reduce 2n columns (values < ~2**22) -> canonical V*R^-1 mod p.

    Requires represented value V < p*R (true for products of canonical
    elements and for carry-propagated accumulations).
    """
    c = _consts(field)
    n = field.nlimbs
    p = jnp.asarray(c["p"])
    n0inv = c["n0inv"]
    zcol = jnp.zeros(cols.shape[:-1] + (1,), dtype=U32)

    def body(i, t):
        ti = jax.lax.dynamic_slice_in_dim(t, i, 1, axis=-1)  # (..., 1)
        m = (ti * n0inv) & MASK
        mp = m * p  # (..., n) uint32 exact
        lo = mp & MASK
        hi = mp >> LIMB_BITS
        seg = jax.lax.dynamic_slice_in_dim(t, i, n + 1, axis=-1)
        seg = (
            seg
            + jnp.concatenate([lo, zcol], axis=-1)
            + jnp.concatenate([zcol, hi], axis=-1)
        )
        # seg[0] = 0 mod 2^16 by construction; fold its carry into seg[1]
        carry = seg[..., 0:1] >> LIMB_BITS
        seg = jnp.concatenate(
            [seg[..., 0:1] & MASK, seg[..., 1:2] + carry, seg[..., 2:]], axis=-1
        )
        return jax.lax.dynamic_update_slice_in_dim(t, seg, i, axis=-1)

    t = jax.lax.fori_loop(0, n, body, cols)[..., n:]
    t = _propagate(t, n)
    return _cond_sub_p(field, t)


# --------------------------------------------------------------------------
# public ops — all inputs/outputs canonical Montgomery-form limb arrays
# --------------------------------------------------------------------------

# Above this many elements, a fused mul is split into sequential chunks so
# the O(batch * 2n) uint32 working set stays well inside HBM.
_MUL_CHUNK = 1 << 18


def _use_pallas(batch: int) -> bool:
    try:
        return batch >= 4096 and jax.default_backend() != "cpu"
    except Exception:  # pragma: no cover
        return False


@functools.partial(jax.jit, static_argnums=0)
def mul(field: Field, a, b):
    """Montgomery product: a*b*R^-1 mod p.

    Dispatches to the Pallas TPU kernel (pallas_mont.py) for large batches
    on accelerator backends; the jnp path below is the CPU/test fallback
    (bit-identical)."""
    if a.shape != b.shape:
        a, b = jnp.broadcast_arrays(a, b)
    batch = int(np.prod(a.shape[:-1], dtype=np.int64))
    if _use_pallas(batch):
        from . import pallas_mont

        return pallas_mont.mul(field, a, b)
    if batch > _MUL_CHUNK:
        flat_a = a.reshape(batch, field.nlimbs)
        flat_b = b.reshape(batch, field.nlimbs)
        out = jax.lax.map(
            lambda ab: _mont_reduce_columns(
                field, _product_columns(field, ab[0], ab[1])
            ),
            (flat_a, flat_b),
            batch_size=_MUL_CHUNK,
        )
        return out.reshape(a.shape)
    return _mont_reduce_columns(field, _product_columns(field, a, b))


@functools.partial(jax.jit, static_argnums=0)
def sqr(field: Field, a):
    return mul(field, a, a)


@functools.partial(jax.jit, static_argnums=0)
def add(field: Field, a, b):
    t = _propagate((a + b).astype(U32), field.nlimbs + 1)
    # sum < 2p < 2**(16n) for all supported fields, so top limb is 0
    return _cond_sub_p(field, t[..., : field.nlimbs])


@functools.partial(jax.jit, static_argnums=0)
def sub(field: Field, a, b):
    p = jnp.asarray(_consts(field)["p"])
    if a.shape != b.shape:
        a, b = jnp.broadcast_arrays(a, b)
    d, borrow = _borrow_chain(a, jnp.moveaxis(b, -1, 0))
    underflow = (borrow != 0)[..., None]

    # if a < b: result = a - b + p (carry-chain add of p)
    def step(carry, xs):
        x, pj = xs
        s = x + pj + carry
        return s >> LIMB_BITS, s & MASK

    _, dp = jax.lax.scan(
        step, jnp.zeros_like(d[..., 0]), (jnp.moveaxis(d, -1, 0), p)
    )
    return jnp.where(underflow, jnp.moveaxis(dp, 0, -1), d)


@functools.partial(jax.jit, static_argnums=0)
def neg(field: Field, a):
    return sub(field, zeros(field, a.shape[:-1]), a)


@functools.partial(jax.jit, static_argnums=0)
def double(field: Field, a):
    return add(field, a, a)


@functools.partial(jax.jit, static_argnums=0)
def from_mont(field: Field, a):
    """Montgomery form -> standard form (a * R^-1 mod p)."""
    return _mont_reduce_columns(field, _pad_to(a, 2 * field.nlimbs))


@functools.partial(jax.jit, static_argnums=0)
def to_mont(field: Field, a):
    """Standard form -> Montgomery form."""
    c = _consts(field)
    return mul(field, a, jnp.asarray(c["r2"]))


@functools.partial(jax.jit, static_argnums=0)
def reduce_columns(field: Field, cols):
    """Reduce accumulated columns (each < 2**32, any length <= 2n-2) mod p,
    staying in the same (Montgomery) domain as the summands.

    Used after lazy limb-wise accumulation (e.g. sparse matvec segment sums).
    """
    n = field.nlimbs
    m = cols.shape[-1]
    # carry-propagate into at most m+2 limbs, then fold through Montgomery:
    # mont_reduce gives V*R^-1; multiply back by R^2 to recover V mod p.
    t = _propagate(cols.astype(U32), min(m + 2, 2 * n))
    v = _mont_reduce_columns(field, _pad_to(t, 2 * n))
    return to_mont(field, v)


@functools.partial(jax.jit, static_argnums=(0, 2))
def pow_static(field: Field, a, e: int):
    """a**e (Montgomery in/out) for a static python-int exponent, via a
    fori_loop square-and-multiply so the traced graph stays small."""
    if e == 0:
        return broadcast_one(field, a.shape[:-1])
    bits = [int(x) for x in bin(e)[2:]]
    bits_arr = jnp.asarray(np.array(bits, dtype=np.uint32))

    def body(i, acc):
        acc = sqr(field, acc)
        mul_res = mul(field, acc, a)
        take = bits_arr[i].astype(jnp.bool_)
        return jnp.where(take, mul_res, acc)

    acc = broadcast_one(field, a.shape[:-1])
    return jax.lax.fori_loop(0, len(bits), body, acc)


@functools.partial(jax.jit, static_argnums=0)
def inv(field: Field, a):
    """Batched modular inverse via Fermat (a^(p-2)); inv(0) = 0."""
    return pow_static(field, a, field.p - 2)


@functools.partial(jax.jit, static_argnums=0)
def is_zero(field: Field, a):
    return jnp.all(a == 0, axis=-1)


@functools.partial(jax.jit, static_argnums=0)
def eq(field: Field, a, b):
    return jnp.all(a == b, axis=-1)


def select(mask, a, b):
    """where(mask, a, b) with mask broadcast over the limb axis."""
    return jnp.where(mask[..., None], a, b)


def zeros(field: Field, shape=()):
    return jnp.zeros(tuple(shape) + (field.nlimbs,), dtype=U32)


def broadcast_one(field: Field, shape=()):
    one = jnp.asarray(_consts(field)["one_mont"])
    return jnp.broadcast_to(one, tuple(shape) + (field.nlimbs,))


def constant(field: Field, value: int, shape=()):
    """Embed a python int as a (broadcast) Montgomery-form device constant."""
    m = field.to_mont_int(value % field.p)
    limbs = jnp.asarray(int_to_limbs(m, field.nlimbs))
    return jnp.broadcast_to(limbs, tuple(shape) + (field.nlimbs,))


# --------------------------------------------------------------------------
# host conversions
# --------------------------------------------------------------------------

def encode(field: Field, values, mont: bool = True):
    """List of python ints -> device limb array (Montgomery form by default)."""
    vals = [v % field.p for v in values]
    if mont:
        vals = [field.to_mont_int(v) for v in vals]
    return jnp.asarray(ints_to_limbs(vals, field.nlimbs))


def decode(field: Field, arr, mont: bool = True) -> list[int]:
    """Device limb array -> python ints (converting out of Montgomery form)."""
    ints = limbs_to_ints(np.asarray(jax.device_get(arr)))
    if mont:
        ints = [field.from_mont_int(v) for v in ints]
    return ints
