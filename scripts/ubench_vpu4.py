"""In-kernel VPU/MXU throughput: a fori_loop chain of heavy bodies inside
ONE pallas call, so dispatch latency through the axon tunnel is amortized
to nothing. Each body does WIDTH independent op chains of DEPTH ops on a
(ROWS, 512) block; total ops = ROWS*512*WIDTH*DEPTH*STEPS."""

import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/cosnarks_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ROWS, COLS, WIDTH, DEPTH, STEPS = 64, 512, 4, 16, int(__import__('os').environ.get('STEPS', '64'))


def bench(name, dtype, op, rows=ROWS):
    def kernel(a_ref, o_ref):
        a = a_ref[:]

        def body(t, accs):
            out = []
            for w, acc in enumerate(accs):
                for _ in range(DEPTH):
                    acc = op(acc, a)
                out.append(acc)
            return tuple(out)

        accs = tuple(a + jnp.asarray(w + 1, dtype) for w in range(WIDTH))
        accs = jax.lax.fori_loop(0, STEPS, body, accs)
        out = accs[0]
        for acc in accs[1:]:
            out = out + acc
        o_ref[:] = out

    a = jnp.asarray(
        (np.random.default_rng(0).integers(1, 100, size=(rows, COLS)))
        .astype(np.float32 if jnp.issubdtype(dtype, jnp.floating) else np.uint32)
        .astype(dtype))
    call = pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows, COLS), dtype),
    )
    f = jax.jit(lambda a: call(a))
    try:
        np.asarray(jax.device_get(f(a)))
        t0 = time.perf_counter()
        for _ in range(3):
            r = f(a)
        np.asarray(jax.device_get(r))
        dt = (time.perf_counter() - t0) / 3
        total = rows * COLS * WIDTH * DEPTH * STEPS
        print(f"{name}: {total/dt/1e9:.1f} Gop/s  ({dt*1e3:.2f} ms)", flush=True)
    except Exception as e:
        print(f"{name} FAILED: {str(e)[:200]}", flush=True)


def bench_matmul(name, M, K, N, dtype=jnp.float32):
    def kernel(a_ref, b_ref, o_ref):
        a = a_ref[:]
        b = b_ref[:]

        def body(t, acc):
            return jnp.dot(a + acc[:, :1].astype(dtype) * 0, b,
                           preferred_element_type=jnp.float32) * 0.5 + acc * 0.5

        o_ref[:] = jax.lax.fori_loop(
            0, STEPS, body, jnp.zeros((M, N), jnp.float32))

    a = jnp.asarray(np.random.default_rng(0).random((M, K)), dtype)
    b = jnp.asarray(np.random.default_rng(1).random((K, N)), dtype)
    call = pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, N), jnp.float32),
    )
    f = jax.jit(lambda a, b: call(a, b))
    try:
        np.asarray(jax.device_get(f(a, b)))
        t0 = time.perf_counter()
        for _ in range(3):
            r = f(a, b)
        np.asarray(jax.device_get(r))
        dt = (time.perf_counter() - t0) / 3
        per = 2 * M * K * N * STEPS
        print(f"{name}: {per/dt/1e12:.2f} TFLOP/s ({dt*1e3:.2f} ms, "
              f"{dt/STEPS*1e6:.1f} us/mm)", flush=True)
    except Exception as e:
        print(f"{name} FAILED: {str(e)[:200]}", flush=True)


print("device:", jax.devices()[0].device_kind, flush=True)
import os
which = os.environ.get("WHICH", "all")
if which in ("all", "1"):
    bench("u32 mul", jnp.uint32, lambda acc, a: acc * a)
    bench("u32 add", jnp.uint32, lambda acc, a: acc + a)
    bench("f32 fma", jnp.float32, lambda acc, a: acc * a + a)
if which in ("all", "2"):
    bench("u32 mul+add", jnp.uint32, lambda acc, a: acc * a + a)
    bench("u32 shr16", jnp.uint32, lambda acc, a: (acc >> 16) + a)
    bench("u16->u32 widen mul", jnp.uint32, lambda acc, a: (acc & 0xFFFF) * a)
if which in ("all", "3"):
    bench_matmul("f32 mm 512x96x32", 512, 96, 32)
    bench_matmul("f32 mm 1024x128x128", 1024, 128, 128)
