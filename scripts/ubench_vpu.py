"""Microbenchmarks grounding the field-mul kernel design.

Measures on the real TPU:
  1. device kind
  2. VPU int32 multiply throughput (Pallas, unrolled mult chain)
  3. MXU int8 -> int32 matmul throughput (XLA level)
  4. MXU bf16 matmul throughput
  5. current pallas_mont.mul throughput (reference point)
"""

import os
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/cosnarks_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


def timeit(fn, *args, iters=20):
    r = fn(*args)  # compile
    r = jax.tree.map(lambda x: np.asarray(x), r)  # force fetch (axon quirk)
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn(*args)
    jax.tree.map(lambda x: np.asarray(jax.device_get(x)), r)
    return (time.perf_counter() - t0) / iters


def main():
    dev = jax.devices()[0]
    print("device:", dev.device_kind, dev.platform)

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    # --- 1. VPU int32 multiply chain --------------------------------------
    TILE, DEPTH = 512, 64

    def mulchain_kernel(a_ref, b_ref, o_ref):
        a = a_ref[:]
        b = b_ref[:]
        acc = a
        for _ in range(DEPTH):
            acc = acc * b + a
        o_ref[:] = acc

    N = 1 << 20
    a = jnp.arange(N, dtype=jnp.uint32).reshape(N // 128, 128)
    call = pl.pallas_call(
        mulchain_kernel,
        grid=(N // 128 // TILE,),
        in_specs=[pl.BlockSpec((TILE, 128), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec((TILE, 128), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N // 128, 128), jnp.uint32),
    )
    f = jax.jit(lambda a, b: call(a, b))
    dt = timeit(f, a, a)
    print(f"VPU u32 mul+add chain: {N * DEPTH / dt / 1e9:.1f} Gmul/s "
          f"({dt*1e3:.2f} ms)")

    # u16-domain mults (operands < 2^16)
    a16 = a & jnp.uint32(0xFFFF)
    dt = timeit(f, a16, a16)
    print(f"VPU u32 mul+add chain (16-bit operands): "
          f"{N * DEPTH / dt / 1e9:.1f} Gmul/s")

    # --- 2. int8 matmul (XLA) ---------------------------------------------
    B, K, M = 1 << 16, 64, 128
    x8 = jnp.ones((B, K), jnp.int8)
    w8 = jnp.ones((K, M), jnp.int8)

    @jax.jit
    def mm8(x, w):
        return jax.lax.dot_general(
            x, w, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)

    dt = timeit(mm8, x8, w8)
    print(f"XLA int8 matmul ({B}x{K}x{M}): {B*K*M/dt/1e12:.2f} Tmac/s")

    # --- 2b. int8 matmul inside Pallas ------------------------------------
    TB = 512
    try:
        def mm8k(x_ref, w_ref, o_ref):
            o_ref[:] = jax.lax.dot_general(
                x_ref[:], w_ref[:], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)

        call8 = pl.pallas_call(
            mm8k,
            grid=(B // TB,),
            in_specs=[
                pl.BlockSpec((TB, K), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((K, M), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((TB, M), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, M), jnp.int32),
        )
        f8 = jax.jit(lambda x, w: call8(x, w))
        dt = timeit(f8, x8, w8)
        print(f"Pallas int8 matmul: {B*K*M/dt/1e12:.2f} Tmac/s")
    except Exception as e:
        print("Pallas int8 matmul FAILED:", str(e)[:200])

    # --- 2c. fp32 matmul inside Pallas (exact for <2^24 ints) -------------
    try:
        xf = jnp.ones((B, K), jnp.float32)
        wf = jnp.ones((K, M), jnp.float32)

        def mmfk(x_ref, w_ref, o_ref):
            o_ref[:] = jax.lax.dot_general(
                x_ref[:], w_ref[:], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)

        callf = pl.pallas_call(
            mmfk,
            grid=(B // TB,),
            in_specs=[
                pl.BlockSpec((TB, K), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((K, M), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((TB, M), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, M), jnp.float32),
        )
        ff = jax.jit(lambda x, w: callf(x, w))
        dt = timeit(ff, xf, wf)
        print(f"Pallas fp32 matmul: {B*K*M/dt/1e12:.2f} Tmac/s")
    except Exception as e:
        print("Pallas fp32 matmul FAILED:", str(e)[:200])

    # --- 3. current pallas_mont.mul ----------------------------------------
    from cosnarks_tpu.ff import pallas_mont, spec as fspec

    F = fspec.BN254_FQ
    rng = np.random.default_rng(0)
    xs = jnp.asarray(
        rng.integers(0, 1 << 16, size=(1 << 20, F.nlimbs)).astype(np.uint32))

    g = jax.jit(lambda a, b: pallas_mont.mul(F, a, b))
    dt = timeit(g, xs, xs)
    print(f"pallas_mont.mul (2^20): {(1 << 20) / dt / 1e6:.1f} Mmul/s")


if __name__ == "__main__":
    main()
