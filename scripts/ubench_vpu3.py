"""ILP-aware VPU throughput bench: 8 independent accumulator chains per
lane so latency can't hide throughput. Grounds the limb-dtype decision."""

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


def timeit(fn, *args, iters=20):
    r = fn(*args)
    r = jax.tree.map(lambda x: np.asarray(x), r)
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn(*args)
    jax.tree.map(lambda x: np.asarray(jax.device_get(x)), r)
    return (time.perf_counter() - t0) / iters


def bench(name, dtype, op, depth=32, width=8, tile=256, n=1 << 18):
    """width independent accumulators, each a depth-long serial chain."""

    def kernel(a_ref, b_ref, o_ref):
        a = a_ref[:]
        b = b_ref[:]
        accs = [a + jnp.asarray(i, dtype) for i in range(width)]
        for _ in range(depth):
            accs = [op(acc, b, a) for acc in accs]
        out = accs[0]
        for acc in accs[1:]:
            out = out + acc
        o_ref[:] = out

    if jnp.issubdtype(dtype, jnp.floating):
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
    try:
        dt = timeit(f, a, a)
        print(f"{name}: {n * depth * width / dt / 1e9:.1f} Gop/s", flush=True)
    except Exception as e:
        print(f"{name} FAILED: {str(e)[:160]}", flush=True)


def main():
    dev = jax.devices()[0]
    print("device:", dev.device_kind, dev.platform, flush=True)

    bench("f32 fma (ILP8)", jnp.float32, lambda acc, b, a: acc * b + a)
    bench("f32 mul (ILP8)", jnp.float32, lambda acc, b, a: acc * b)
    bench("f32 add (ILP8)", jnp.float32, lambda acc, b, a: acc + b)
    bench("bf16 fma (ILP8)", jnp.bfloat16, lambda acc, b, a: acc * b + a)
    bench("u32 mul (ILP8)", jnp.uint32, lambda acc, b, a: acc * b)
    bench("i32 mul (ILP8)", jnp.int32, lambda acc, b, a: acc * b)
    bench("u32 add (ILP8)", jnp.uint32, lambda acc, b, a: acc + b)
    bench("u32 and (ILP8)", jnp.uint32, lambda acc, b, a: acc & b)
    bench("u32 shr (ILP8)", jnp.uint32,
          lambda acc, b, a: acc >> jnp.uint32(3))
    # mixed: f32 -> u32 -> f32 round trip cost
    bench("f32 cvt u32 cvt (ILP8)", jnp.float32,
          lambda acc, b, a: acc.astype(jnp.uint32).astype(jnp.float32) + a)
    # f32 floor-div emulation pieces used for float carry propagation
    bench("f32 fma+floor (ILP8)", jnp.float32,
          lambda acc, b, a: jnp.floor(acc * b) + a)


if __name__ == "__main__":
    main()
