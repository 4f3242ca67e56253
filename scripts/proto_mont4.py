"""In-kernel Montgomery-mul throughput: chained muls inside one Pallas call
(removes dispatch/HBM effects), current CIOS vs a low-copy variant.

Variant B restructures the CIOS step to one shifted add:
  S = lo(a_i*B) + lo(m*p), H = hi(a_i*B) + hi(m*p)
  t' = shift_down(t + S) + H  computed as t'[k] = t[k+1] + S[k+1] + H[k]
plus a carry fix for column 0, and extracts a_i by rolling A instead of an
iota-mask-reduce.
"""

import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", "/tmp/cosnarks_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
from jax.experimental import pallas as pl

from cosnarks_tpu.ff import pallas_mont
from cosnarks_tpu.ff.bigint import LIMB_BITS, LIMB_MASK
from cosnarks_tpu.ff.spec import BN254_FQ as F

MASK = np.uint32(LIMB_MASK)
CHAIN = 8


def mont_mul_lanes_v2(field, a: list, b: list) -> list:
    n = field.nlimbs
    p_limbs = [np.uint32(x) for x in field.p_limbs]
    n0inv = np.uint32(field.n0inv)
    A = jnp.stack(a)  # (n, TILE)
    B = jnp.stack(b)
    tile = A.shape[1]
    zrow = jnp.zeros((1, tile), jnp.uint32)
    t0 = jnp.zeros((n, tile), jnp.uint32)
    row = jax.lax.broadcasted_iota(jnp.int32, (n, tile), 0)
    p_mat = jnp.zeros((n, tile), jnp.uint32)
    for j, pj in enumerate(p_limbs):
        p_mat = jnp.where(row == j, pj, p_mat)

    def step(i, carry):
        t, A = carry
        sel = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0) == i
        ai = jnp.sum(
            jnp.where(sel, A.astype(jnp.int32), 0), axis=0, keepdims=True
        ).astype(jnp.uint32)
        prod = ai * B  # (n, TILE)
        u = t[0] + (prod[0] & MASK)
        m = (u * n0inv) & MASK
        mp = m[None, :] * p_mat
        S = (prod & MASK) + (mp & MASK)          # (n, TILE) lo columns
        H = (prod >> LIMB_BITS) + (mp >> LIMB_BITS)  # (n, TILE) hi columns
        c0 = (u + (mp[0] & MASK)) >> LIMB_BITS   # carry out of column 0
        # t'[k] = t[k+1] + S[k+1] + H[k], k = 0..n-1 (t[n] = 0)
        tS = t + S
        t = jnp.concatenate([tS[1:], zrow], axis=0) + H
        t = jnp.concatenate([(t[0] + c0)[None], t[1:]], axis=0)
        return t, A

    (t, _) = jax.lax.fori_loop(0, n, step, (t0, A))
    out = []
    carry = jnp.zeros_like(a[0])
    for k in range(n):
        v = t[k] + carry
        out.append(v & MASK)
        carry = v >> LIMB_BITS
    return pallas_mont.cond_sub_p_lanes(field, out)


def chain_kernel(mul_fn):
    n = F.nlimbs

    def kernel(a_ref, b_ref, o_ref):
        a = [a_ref[:, k] for k in range(n)]
        b = [b_ref[:, k] for k in range(n)]
        for _ in range(CHAIN):
            a = mul_fn(F, a, b)
        for k in range(n):
            o_ref[:, k] = a[k]
    return kernel


def bench(mul_fn, name, total=1 << 16, tile=512):
    n = F.nlimbs
    rng = np.random.default_rng(5)
    a = jnp.asarray(rng.integers(0, 1 << 16, size=(total, n)).astype(np.uint32))
    b = jnp.asarray((rng.integers(0, 1 << 13, size=(total, n))).astype(np.uint32))
    call = pl.pallas_call(
        chain_kernel(mul_fn),
        out_shape=jax.ShapeDtypeStruct((total, n), jnp.uint32),
        grid=(total // tile,),
        in_specs=[pl.BlockSpec((tile, n), lambda i: (i, 0))] * 2,
        out_specs=pl.BlockSpec((tile, n), lambda i: (i, 0)),
    )
    f = jax.jit(call)
    r = f(a, b); np.asarray(r)
    t0 = time.perf_counter()
    iters = 20
    for _ in range(iters):
        r = f(a, b)
    np.asarray(jax.device_get(r))
    dt = (time.perf_counter() - t0) / iters
    rate = total * CHAIN / dt
    print(f"{name}: {rate/1e6:.1f} M muls/s  ({dt*1e3:.2f} ms for {total}x{CHAIN})")
    return np.asarray(r)


if __name__ == "__main__":
    r1 = bench(pallas_mont.mont_mul_lanes, "CIOS current")
    r2 = bench(mont_mul_lanes_v2, "CIOS low-copy")
    print("results match:", np.array_equal(r1, r2))
