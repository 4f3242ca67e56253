"""Prototype: scratch-ref SOS Montgomery kernel vs current loop kernel.

Variants:
  cur    — pallas_mont.mul as committed (CIOS fori_loop, select/concat)
  scr    — SOS product+reduction fori_loops over a VMEM cols scratch with
           dynamic sublane windows (no selects, no concats)
  unr    — fully unrolled (round-1 kernel; IR-heavy but fastest known)
"""

import sys
import os
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/cosnarks_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cosnarks_tpu.ff import pallas_mont as pm
from cosnarks_tpu.ff import mont
from cosnarks_tpu.ff.bigint import LIMB_BITS
from cosnarks_tpu.ff.spec import BN254_FQ as F

MASK = np.uint32((1 << LIMB_BITS) - 1)
n = F.nlimbs


def timeit(fn, *args, iters=20):
    r = fn(*args)
    r = jax.tree.map(lambda x: np.asarray(x), r)
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn(*args)
    jax.tree.map(lambda x: np.asarray(jax.device_get(x)), r)
    return (time.perf_counter() - t0) / iters


def scr_kernel(a_ref, b_ref, o_ref, at_ref, cols_ref):
    p_limbs = [np.uint32(x) for x in F.p_limbs]
    n0inv = np.uint32(F.n0inv)
    tile = a_ref.shape[0]

    at_ref[:] = a_ref[:].T
    B = b_ref[:].T  # (n, TILE) registers
    row = jax.lax.broadcasted_iota(jnp.int32, (n, tile), 0)
    p_mat = jnp.zeros((n, tile), jnp.uint32)
    for j, pj in enumerate(p_limbs):
        p_mat = jnp.where(row == j, pj, p_mat)
    cols_ref[:] = jnp.zeros((2 * n, tile), jnp.uint32)

    def pstep(i, _):
        ai = at_ref[pl.ds(i, 1), :]  # (1, TILE)
        prod = ai * B
        lo = prod & MASK
        hi = prod >> LIMB_BITS
        cols_ref[pl.ds(i, n), :] = cols_ref[pl.ds(i, n), :] + lo
        cols_ref[pl.ds(i + 1, n), :] = cols_ref[pl.ds(i + 1, n), :] + hi
        return 0

    jax.lax.fori_loop(0, n, pstep, 0, unroll=True)

    def rstep(s, _):
        c_s = cols_ref[pl.ds(s, 1), :]
        m = (c_s * n0inv) & MASK
        mp = m * p_mat
        lo = mp & MASK
        hi = mp >> LIMB_BITS
        winL = cols_ref[pl.ds(s, n), :] + lo
        cols_ref[pl.ds(s, n), :] = winL
        carry = winL[0:1] >> LIMB_BITS
        winH = cols_ref[pl.ds(s + 1, n), :] + hi
        winH = jnp.concatenate([winH[0:1] + carry, winH[1:]], axis=0)
        cols_ref[pl.ds(s + 1, n), :] = winH
        return 0

    jax.lax.fori_loop(0, n, rstep, 0, unroll=True)

    t = cols_ref[pl.ds(n, n), :]
    out = []
    carry = jnp.zeros((tile,), jnp.uint32)
    for k in range(n):
        v = t[k] + carry
        out.append(v & MASK)
        carry = v >> LIMB_BITS
    res = pm.cond_sub_p_lanes(F, out)
    o_ref[:] = jnp.stack(res, axis=0).T


def make_scr(total, tile):
    spec = pl.BlockSpec((tile, n), lambda i: (i, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        scr_kernel,
        grid=(total // tile,),
        in_specs=[spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((total, n), jnp.uint32),
        scratch_shapes=[
            pltpu.VMEM((n, tile), jnp.uint32),
            pltpu.VMEM((2 * n, tile), jnp.uint32),
        ],
    )


# ---- fully unrolled (round-1) ------------------------------------------
def unr_lanes(a, b):
    p_limbs = [np.uint32(x) for x in F.p_limbs]
    n0inv = np.uint32(F.n0inv)
    zero = jnp.zeros_like(a[0])
    cols = [zero] * (2 * n)
    for i in range(n):
        ai = a[i]
        for j in range(n):
            prod = ai * b[j]
            cols[i + j] = cols[i + j] + (prod & MASK)
            cols[i + j + 1] = cols[i + j + 1] + (prod >> LIMB_BITS)
    for s in range(n):
        m = (cols[s] * n0inv) & MASK
        for j in range(n):
            mp = m * p_limbs[j]
            cols[s + j] = cols[s + j] + (mp & MASK)
            cols[s + j + 1] = cols[s + j + 1] + (mp >> LIMB_BITS)
        cols[s + 1] = cols[s + 1] + (cols[s] >> LIMB_BITS)
    out = []
    carry = zero
    for k in range(n, 2 * n):
        v = cols[k] + carry
        out.append(v & MASK)
        carry = v >> LIMB_BITS
    return pm.cond_sub_p_lanes(F, out)


def unr_kernel(a_ref, b_ref, o_ref):
    at = a_ref[:].T
    bt = b_ref[:].T
    res = unr_lanes([at[i] for i in range(n)], [bt[j] for j in range(n)])
    o_ref[:] = jnp.stack(res, axis=0).T


def make_unr(total, tile):
    spec = pl.BlockSpec((tile, n), lambda i: (i, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        unr_kernel,
        grid=(total // tile,),
        in_specs=[spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((total, n), jnp.uint32),
    )


def main():
    total = 1 << 20
    rng = np.random.default_rng(0)
    # canonical field elements (any <p value works for correctness check)
    xs = rng.integers(0, 1 << 16, size=(total, n)).astype(np.uint32)
    xs[:, -1] &= 0x3FFF
    ys = rng.integers(0, 1 << 16, size=(total, n)).astype(np.uint32)
    ys[:, -1] &= 0x3FFF
    a = jnp.asarray(xs)
    b = jnp.asarray(ys)

    ref = np.asarray(pm.mul(F, a, b))

    for name, mk in [("scr", make_scr), ("unr", make_unr)]:
        for tile in (512, 1024, 2048):
            try:
                call = mk(total, tile)
                f = jax.jit(lambda a, b, c=call: c(a, b))
                t0 = time.perf_counter()
                out = np.asarray(f(a, b))
                comp = time.perf_counter() - t0
                ok = np.array_equal(out, ref)
                dt = timeit(f, a, b)
                print(f"{name} tile={tile}: {total/dt/1e6:.1f} Mmul/s "
                      f"(compile {comp:.1f}s, correct={ok})", flush=True)
            except Exception as e:
                print(f"{name} tile={tile} FAILED: {str(e)[:200]}", flush=True)

    f = jax.jit(lambda a, b: pm.mul(F, a, b))
    dt = timeit(f, a, b)
    print(f"cur: {total/dt/1e6:.1f} Mmul/s", flush=True)


if __name__ == "__main__":
    main()
