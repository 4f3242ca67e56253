"""Pallas TPU kernel for batched Montgomery multiplication.

The XLA elementwise formulation (mont.py) round-trips HBM between fused
sub-chains; this kernel keeps all 2n product columns of a batch tile in
VMEM/vector registers for the whole multiply -> reduction -> carry ->
conditional-subtract pipeline, processing a (TILE, n) block per grid cell
with limb vectors transposed to lane-major inside the kernel.

Used automatically by mont.mul on TPU backends for large batches; the jnp
path remains the CPU/test fallback (bit-identical results).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .bigint import LIMB_BITS, LIMB_MASK
from .spec import Field

MASK = np.uint32(LIMB_MASK)


def cond_sub_p_lanes(field: Field, out: list):
    """Lane-vector limbs (value < 2p) -> canonical, via borrow-chain select."""
    n = field.nlimbs
    p_limbs = [np.uint32(x) for x in field.p_limbs]
    borrow = jnp.zeros_like(out[0])
    diffs = []
    for k in range(n):
        s = out[k] + np.uint32(1 << LIMB_BITS) - p_limbs[k] - borrow
        diffs.append(s & MASK)
        borrow = np.uint32(1) - (s >> LIMB_BITS)
    ge = borrow == 0
    return [jnp.where(ge, d, o) for d, o in zip(diffs, out)]


def mont_mul_lanes(field: Field, a: list, b: list) -> list:
    """Montgomery multiply on lists of lane vectors, loop-based.

    The building block of every Pallas field/EC kernel: inputs and all 2n
    product columns live in VMEM for the whole pipeline. The limb loops are
    `fori_loop`s over a stacked (n, TILE) array — an unrolled formulation
    emits ~2 MB of Mosaic IR *per kernel call site* (16x16 schoolbook x
    ~5 ops), which made every enclosing XLA graph megabytes big and pushed
    whole-prover compile times into minutes.
    """
    n = field.nlimbs
    p_limbs = [np.uint32(x) for x in field.p_limbs]
    n0inv = np.uint32(field.n0inv)
    A = jnp.stack(a)  # (n,) + lane shape (1-D (TILE,) or 2-D tiles)
    B = jnp.stack(b)
    s = A.shape[1:]
    zrow = jnp.zeros((1,) + s, jnp.uint32)
    t0 = jnp.zeros((n + 1,) + s, jnp.uint32)
    # p limbs as a broadcast matrix, built ONCE from scalar constants via
    # iota selects (array constants can't be captured; a per-step stack of
    # n narrow (TILE,) muls wastes ~n/16 of the VPU)
    row = jax.lax.broadcasted_iota(jnp.int32, (n,) + s, 0)
    p_mat = jnp.zeros((n,) + s, jnp.uint32)
    for j, pj in enumerate(p_limbs):
        p_mat = jnp.where(row == j, pj, p_mat)

    def step(i, t):
        # CIOS iteration, all offsets static (Mosaic has no dynamic value
        # slicing): fold in a_i*B, cancel column 0 with m*p, shift down.
        sel = jax.lax.broadcasted_iota(
            jnp.int32, (n,) + (1,) * len(s), 0) == i
        # limbs are 16-bit: int32 reduce is exact (mosaic lacks u32 reduce)
        ai = jnp.sum(
            jnp.where(sel, A.astype(jnp.int32), 0), axis=0, keepdims=True
        ).astype(jnp.uint32)  # (1, TILE)
        prod = ai * B
        # static-slice adds only (mosaic values support neither scatter-add
        # nor dynamic slicing)
        t = jnp.concatenate([t[:n] + (prod & MASK), t[n:]], axis=0)
        t = jnp.concatenate([t[:1], t[1:] + (prod >> LIMB_BITS)], axis=0)
        m = (t[0] * n0inv) & MASK
        mp = m[None] * p_mat  # (n,) + lane shape
        t = jnp.concatenate([t[:n] + (mp & MASK), t[n:]], axis=0)
        t = jnp.concatenate([t[:1], t[1:] + (mp >> LIMB_BITS)], axis=0)
        row1 = t[1] + (t[0] >> LIMB_BITS)  # column 0 is now 0 mod 2^16
        return jnp.concatenate([row1[None], t[2:], zrow], axis=0)

    t = jax.lax.fori_loop(0, n, step, t0)

    # carry propagate the n result columns (cheap vs the n^2 product work)
    out = []
    carry = jnp.zeros_like(a[0])
    for k in range(n):
        v = t[k] + carry
        out.append(v & MASK)
        carry = v >> LIMB_BITS
    return cond_sub_p_lanes(field, out)


def add_lanes(field: Field, a: list, b: list) -> list:
    n = field.nlimbs
    out = []
    carry = jnp.zeros_like(a[0])
    for i in range(n):
        v = a[i] + b[i] + carry
        out.append(v & MASK)
        carry = v >> LIMB_BITS
    return cond_sub_p_lanes(field, out)


def sub_lanes(field: Field, a: list, b: list) -> list:
    n = field.nlimbs
    p_limbs = [np.uint32(x) for x in field.p_limbs]
    borrow = jnp.zeros_like(a[0])
    d = []
    for i in range(n):
        s = a[i] + np.uint32(1 << LIMB_BITS) - b[i] - borrow
        d.append(s & MASK)
        borrow = np.uint32(1) - (s >> LIMB_BITS)
    underflow = borrow != 0
    carry = jnp.zeros_like(a[0])
    dp = []
    for i in range(n):
        s = d[i] + p_limbs[i] + carry
        dp.append(s & MASK)
        carry = s >> LIMB_BITS
    return [jnp.where(underflow, x, y) for x, y in zip(dp, d)]


def _make_kernel(field: Field):
    n = field.nlimbs

    def kernel(a_ref, b_ref, o_ref):
        at = a_ref[:].T  # (n, TILE) lane-major limb vectors
        bt = b_ref[:].T
        a = [at[i] for i in range(n)]
        b = [bt[j] for j in range(n)]
        res = mont_mul_lanes(field, a, b)
        o_ref[:] = jnp.stack(res, axis=0).T  # back to (TILE, n)

    return kernel


@functools.lru_cache(maxsize=None)
def _mul_call(field: Field, total: int, tile: int):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n = field.nlimbs
    kernel = _make_kernel(field)
    grid = (total // tile,)
    spec = pl.BlockSpec((tile, n), lambda i: (i, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((total, n), jnp.uint32),
        cost_estimate=pl.CostEstimate(
            flops=total * (4 * n * n + 10 * n), bytes_accessed=3 * total * n * 4,
            transcendentals=0,
        ),
    )


def available() -> bool:
    try:
        return jax.default_backend() != "cpu"
    except Exception:  # pragma: no cover
        return False


DEFAULT_TILE = 1024

# Limb-major lane geometry: limbs live as (R, C) 2-D vector shapes with
# full sublane utilization. 1-D (tile,) limb vectors occupy 1 of 8
# sublanes per vreg, wasting 7/8 of the VPU — measured 6.6x slower than
# (128, 512) lanes on v5e (scripts/ubench_lm2.py: 278 vs 1849 M mul/s).
LM_C = 512
LM_R = 128


@functools.lru_cache(maxsize=None)
def _mul_call_lm(field: Field, rows_total: int, R: int, C: int):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n = field.nlimbs

    def kernel(a_ref, b_ref, o_ref):
        a = [a_ref[i] for i in range(n)]
        b = [b_ref[i] for i in range(n)]
        res = mont_mul_lanes(field, a, b)
        for i in range(n):
            o_ref[i] = res[i]

    spec = pl.BlockSpec((n, R, C), lambda i: (0, i, 0),
                        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(rows_total // R,),
        in_specs=[spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((n, rows_total, C), jnp.uint32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=rows_total * C * (4 * n * n + 10 * n),
            bytes_accessed=3 * rows_total * C * n * 4,
            transcendentals=0,
        ),
    )


def _lm_geometry(total: int) -> tuple[int, int]:
    """(R, C) lane block for a batch of `total` elements."""
    C = LM_C if total >= LM_C else 128
    rows = -(-total // C)
    R = min(LM_R, max(8, 1 << (rows - 1).bit_length()))
    return R, C


def mul_lm(field: Field, flat_a, flat_b):
    """Montgomery product of (total, n) batch-last arrays via the
    limb-major kernel (transposes at the boundary; the transpose is two
    HBM passes, ~10% of kernel time at 2^19)."""
    n = field.nlimbs
    total = flat_a.shape[0]
    R, C = _lm_geometry(total)
    pad = -total % (R * C)
    if pad:
        z = jnp.zeros((pad, n), jnp.uint32)
        flat_a = jnp.concatenate([flat_a, z])
        flat_b = jnp.concatenate([flat_b, z])
    rows = (total + pad) // C
    alm = flat_a.T.reshape(n, rows, C)
    blm = flat_b.T.reshape(n, rows, C)
    out = _mul_call_lm(field, rows, R, C)(alm, blm)
    res = out.reshape(n, rows * C).T
    if pad:
        res = res[:total]
    return res


def mul(field: Field, a, b, tile: int = DEFAULT_TILE):
    """Batched Montgomery product via the Pallas kernel.

    a, b: (..., nlimbs) canonical Montgomery limbs, identical shapes."""
    n = field.nlimbs
    shape = a.shape
    total = int(np.prod(shape[:-1], dtype=np.int64))
    flat_a = a.reshape(total, n)
    flat_b = b.reshape(total, n)
    if total >= 4096:
        return mul_lm(field, flat_a, flat_b).reshape(shape)
    t = min(tile, max(8, 1 << (total - 1).bit_length()))
    pad = -total % t
    if pad:
        flat_a = jnp.concatenate(
            [flat_a, jnp.zeros((pad, n), jnp.uint32)]
        )
        flat_b = jnp.concatenate(
            [flat_b, jnp.zeros((pad, n), jnp.uint32)]
        )
    out = _mul_call(field, total + pad, t)(flat_a, flat_b)
    if pad:
        out = out[:total]
    return out.reshape(shape)
