"""Microbenchmarks for the Montgomery-mul substrate on real TPU.

Measures (1) raw u32 elementwise multiply rate, (2) the current
mont_mul_lanes fori_loop kernel, (3) an unrolled static-list CIOS variant,
to locate how far the field-mul kernel sits from the VPU ceiling.
Run directly on the axon TPU: python scripts/ubench_mont.py
"""

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/tmp/cosnarks_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from cosnarks_tpu.ff import pallas_mont as pm
from cosnarks_tpu.ff.bigint import LIMB_BITS, LIMB_MASK
from cosnarks_tpu.ff.spec import Field
from cosnarks_tpu.ec.curves import BN254_G1

F = BN254_G1.ops.field  # Fq, 16 limbs
MASK = np.uint32(LIMB_MASK)


def _force(r):
    # fetch ONE element per output: forces completion without shipping
    # the whole array over the axon tunnel (block_until_ready does not
    # block there; full-array device_get costs ~100ms/64MB)
    jax.tree_util.tree_map(
        lambda x: np.asarray(jax.device_get(x.ravel()[0])), r)


def timeit(fn, *args, reps=5):
    _force(fn(*args))
    ts = []
    for _ in range(reps):
        t0 = time.time()
        _force(fn(*args))
        ts.append(time.time() - t0)
    return min(ts)


# ---- 1. raw u32 multiply rate ------------------------------------------
def raw_mul_bench(M=4096, N=1024, iters=64):
    def kernel(a, b, o):
        x = a[:]
        y = b[:]
        acc = jnp.zeros_like(x)
        for _ in range(iters):
            acc = acc + x * y
            x = x + jnp.uint32(1)
        o[:] = acc

    spec = pl.BlockSpec((256, N), lambda i: (i, 0), memory_space=pltpu.VMEM)
    call = pl.pallas_call(
        kernel, grid=(M // 256,), in_specs=[spec, spec], out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((M, N), jnp.uint32))
    a = jnp.ones((M, N), jnp.uint32)
    b = jnp.ones((M, N), jnp.uint32) * 3
    dt = timeit(lambda: call(a, b))
    ops = M * N * iters * 2  # mul + add
    print(f"raw u32 mul+add: {ops/dt/1e9:.1f} Gop/s  ({dt*1e3:.2f} ms)")


# ---- 2. current mont kernel --------------------------------------------
def current_mont_bench(total=1 << 20):
    a = jnp.ones((total, F.nlimbs), jnp.uint32)
    b = jnp.ones((total, F.nlimbs), jnp.uint32) * 2
    dt = timeit(lambda: pm.mul(F, a, b))
    print(f"mont.mul current: {total/dt/1e6:.1f} M mul/s ({dt*1e3:.2f} ms)")


# ---- 3. unrolled static-list CIOS --------------------------------------
def mont_mul_unrolled(field: Field, a: list, b: list) -> list:
    """CIOS fully unrolled with limbs as separate values: no concats, no
    iota-select row extraction; everything static at trace time."""
    n = field.nlimbs
    p_limbs = [np.uint32(x) for x in field.p_limbs]
    n0inv = np.uint32(field.n0inv)
    t = [jnp.zeros_like(a[0]) for _ in range(n + 1)]
    for i in range(n):
        ai = a[i]
        # t += ai * B
        for j in range(n):
            prod = ai * b[j]
            t[j] = t[j] + (prod & MASK)
            t[j + 1] = t[j + 1] + (prod >> LIMB_BITS)
        m = (t[0] * n0inv) & MASK
        for j in range(n):
            prod = m * p_limbs[j]
            t[j] = t[j] + (prod & MASK)
            t[j + 1] = t[j + 1] + (prod >> LIMB_BITS)
        # shift down (t[0] now = 0 mod 2^16)
        carry0 = t[0] >> LIMB_BITS
        t = t[1:] + [jnp.zeros_like(a[0])]
        t[0] = t[0] + carry0
    out = []
    carry = jnp.zeros_like(a[0])
    for k in range(n):
        v = t[k] + carry
        out.append(v & MASK)
        carry = v >> LIMB_BITS
    return pm.cond_sub_p_lanes(field, out)


def unrolled_bench(total=1 << 20, tile=1024):
    n = F.nlimbs

    def kernel(a_ref, b_ref, o_ref):
        at = a_ref[:].T
        bt = b_ref[:].T
        a = [at[i] for i in range(n)]
        b = [bt[j] for j in range(n)]
        res = mont_mul_unrolled(F, a, b)
        o_ref[:] = jnp.stack(res, axis=0).T

    spec = pl.BlockSpec((tile, n), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)
    call = pl.pallas_call(
        kernel, grid=(total // tile,), in_specs=[spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((total, n), jnp.uint32))
    a = jnp.ones((total, n), jnp.uint32)
    b = jnp.ones((total, n), jnp.uint32) * 2
    t0 = time.time()
    dt = timeit(lambda: call(a, b))
    print(f"mont unrolled:   {total/dt/1e6:.1f} M mul/s ({dt*1e3:.2f} ms; "
          f"compile+run1 {time.time()-t0-4*dt:.1f}s)")


def correctness_check(total=8192, tile=1024):
    n = F.nlimbs
    from cosnarks_tpu.ff import mont
    rng = np.random.default_rng(2)
    av = [int(rng.integers(0, 1 << 62)) for _ in range(total)]
    bv = [int(rng.integers(0, 1 << 62)) for _ in range(total)]
    A = mont.encode(F, av)
    B = mont.encode(F, bv)

    def kernel(a_ref, b_ref, o_ref):
        at = a_ref[:].T
        bt = b_ref[:].T
        a = [at[i] for i in range(n)]
        b = [bt[j] for j in range(n)]
        res = mont_mul_unrolled(F, a, b)
        o_ref[:] = jnp.stack(res, axis=0).T

    spec = pl.BlockSpec((tile, n), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)
    call = pl.pallas_call(
        kernel, grid=(total // tile,), in_specs=[spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((total, n), jnp.uint32))
    got = mont.decode(F, call(A, B))
    exp = [(x * y) % F.p for x, y in zip(av, bv)]
    assert got == exp, "unrolled CIOS mismatch"
    print("unrolled CIOS correct vs python-int oracle")


if __name__ == "__main__":
    print(jax.devices())
    raw_mul_bench()
    current_mont_bench()
    correctness_check()
    unrolled_bench()
