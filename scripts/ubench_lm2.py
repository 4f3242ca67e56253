"""Tunnel-latency-immune rates: chain K dependent kernel applications in
one jit, compare against K' > K to get the marginal per-call time."""

import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/tmp/cosnarks_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from cosnarks_tpu.ec.curves import BN254_G1
from cosnarks_tpu.ff import mont, pallas_mont as pm

F = BN254_G1.ops.field
n = F.nlimbs


def _force(r):
    jax.tree_util.tree_map(
        lambda x: np.asarray(jax.device_get(x.ravel()[0])), r)


def timeit(fn, *args, reps=3):
    _force(fn(*args))
    ts = []
    for _ in range(reps):
        t0 = time.time()
        _force(fn(*args))
        ts.append(time.time() - t0)
    return min(ts)


def marginal(make_chain, k1=2, k2=12):
    f1 = make_chain(k1)
    f2 = make_chain(k2)
    t1 = timeit(f1)
    t2 = timeit(f2)
    return (t2 - t1) / (k2 - k1)


def lm_call(R, C, G):
    def kernel(a_ref, b_ref, o_ref):
        a = [a_ref[i] for i in range(n)]
        b = [b_ref[i] for i in range(n)]
        res = pm.mont_mul_lanes(F, a, b)
        for i in range(n):
            o_ref[i] = res[i]

    spec = pl.BlockSpec((n, R, C), lambda i: (0, i, 0),
                        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel, grid=(G,), in_specs=[spec, spec], out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((n, G * R, C), jnp.uint32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024))


def bench_lm(R, C, G):
    total = R * C * G
    call = lm_call(R, C, G)
    b = jnp.full((n, G * R, C), 2, jnp.uint32)

    def make_chain(k):
        @jax.jit
        def f(x):
            for _ in range(k):
                x = call(x, b)
            return x
        x0 = jnp.ones((n, G * R, C), jnp.uint32)
        return lambda: f(x0)

    dt = marginal(make_chain)
    print(f"limb-major ({R},{C})x{G} [{total>>10}K]: "
          f"{total/dt/1e6:8.1f} M mul/s ({dt*1e3:.3f} ms/call)")


def bench_current(total=1 << 19):
    b = jnp.full((total, n), 2, jnp.uint32)

    def make_chain(k):
        @jax.jit
        def f(x):
            for _ in range(k):
                x = pm.mul(F, x, b)
            return x
        x0 = jnp.ones((total, n), jnp.uint32)
        return lambda: f(x0)

    dt = marginal(make_chain)
    print(f"current 1-D (tile=1024) [{total>>10}K]: "
          f"{total/dt/1e6:8.1f} M mul/s ({dt*1e3:.3f} ms/call)")


if __name__ == "__main__":
    print(jax.devices())
    bench_current()
    bench_lm(64, 512, 16)
    bench_lm(64, 1024, 8)
    bench_lm(128, 1024, 4)
    bench_lm(64, 1024, 16)
    bench_lm(128, 512, 8)
