"""VPU dtype-throughput microbench: which multiply is fast on this TPU?

Measures elementwise mul+add chain throughput for u32/i32/u16/f32/bf16,
plus fp32 FMA, plus the repo's current pallas_mont.mul and ec madd rates.
Grounds the choice of limb representation for the field kernels.
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


def timeit(fn, *args, iters=20):
    r = fn(*args)
    r = jax.tree.map(lambda x: np.asarray(x), r)
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn(*args)
    jax.tree.map(lambda x: np.asarray(jax.device_get(x)), r)
    return (time.perf_counter() - t0) / iters


def chain(dtype, depth=64, tile=512, n=1 << 20, fma=False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(a_ref, b_ref, o_ref):
        a = a_ref[:]
        b = b_ref[:]
        acc = a
        for _ in range(depth):
            if fma:
                acc = acc * b + a
            else:
                acc = acc * b
        o_ref[:] = acc

    if dtype == jnp.bfloat16 or dtype == jnp.float32:
        a = jnp.full((n // 128, 128), 1.0001, dtype)
    else:
        a = (jnp.arange(n, dtype=jnp.uint32) | jnp.uint32(1)).reshape(
            n // 128, 128).astype(dtype)
    call = pl.pallas_call(
        kernel,
        grid=(n // 128 // tile,),
        in_specs=[pl.BlockSpec((tile, 128), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec((tile, 128), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n // 128, 128), dtype),
    )
    f = jax.jit(lambda a, b: call(a, b))
    dt = timeit(f, a, a)
    return n * depth / dt / 1e9


def main():
    dev = jax.devices()[0]
    print("device:", dev.device_kind, dev.platform, flush=True)

    for name, dt_, fma in [
        ("u32 mul", jnp.uint32, False),
        ("i32 mul", jnp.int32, False),
        ("u16 mul", jnp.uint16, False),
        ("f32 mul", jnp.float32, False),
        ("f32 fma", jnp.float32, True),
        ("bf16 mul", jnp.bfloat16, False),
    ]:
        try:
            print(f"VPU {name} chain: {chain(dt_, fma=fma):.1f} Gop/s",
                  flush=True)
        except Exception as e:
            print(f"VPU {name} chain FAILED: {str(e)[:160]}", flush=True)

    # current field mul kernel
    from cosnarks_tpu.ff import pallas_mont, spec as fspec
    F = fspec.BN254_FQ
    rng = np.random.default_rng(0)
    xs = jnp.asarray(
        rng.integers(0, 1 << 16, size=(1 << 20, F.nlimbs)).astype(np.uint32))
    g = jax.jit(lambda a, b: pallas_mont.mul(F, a, b))
    dt = timeit(g, xs, xs)
    print(f"pallas_mont.mul (2^20): {(1 << 20) / dt / 1e6:.1f} Mmul/s",
          flush=True)

    # current EC madd kernel
    from cosnarks_tpu.ec import curves, pallas_ec
    spec = curves.BN254_G1
    N = 1 << 18
    from cosnarks_tpu.ec import curve as ec
    G = ec.encode_points(spec, [spec.generator])
    P = tuple(jnp.broadcast_to(x, (N,) + x.shape[1:]).copy() for x in G)
    Q = (P[0], P[1])
    f = jax.jit(lambda P, Q: pallas_ec.madd(spec, P, Q))
    dt = timeit(f, P, Q, iters=10)
    print(f"pallas_ec.madd (2^18): {N / dt / 1e6:.2f} Madd/s", flush=True)
    f2 = jax.jit(lambda P, Q: pallas_ec.add(spec, P, Q))
    dt = timeit(f2, P, P, iters=10)
    print(f"pallas_ec.add  (2^18): {N / dt / 1e6:.2f} Madd/s", flush=True)


if __name__ == "__main__":
    main()
