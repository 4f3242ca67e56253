"""Find the VPU ALU ceiling vs working-set size: same op count, varying
live-value footprint. If rate rises sharply with smaller tiles, kernels
are spill/VMEM-bound, not multiplier-bound."""

import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/tmp/cosnarks_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


def _force(r):
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


def rate(dtype, rows, cols, iters, grid=64):
    """One block (rows, cols) per grid cell; iters dependent-free FMA pairs."""
    def kernel(a, b, o):
        x = a[:]
        y = b[:]
        a0 = x
        a1 = y
        a2 = x + y
        a3 = x - y
        for t in range(iters):
            a0 = a0 * y + x
            a1 = a1 * x + y
            a2 = a2 * y + x
            a3 = a3 * x + y
        o[:] = a0 + a1 + a2 + a3

    spec = pl.BlockSpec((rows, cols), lambda i: (0, 0),
                        memory_space=pltpu.VMEM)
    call = pl.pallas_call(
        kernel, grid=(grid,), in_specs=[spec, spec], out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((rows, cols), dtype))
    a = jnp.ones((rows, cols), dtype)
    b = jnp.full((rows, cols), 3, dtype)
    dt = timeit(lambda: call(a, b))
    ops = rows * cols * iters * 4 * 2 * grid
    print(f"{np.dtype(dtype).name:8s} block=({rows:4d},{cols}) "
          f"live={(rows*cols*4*6)//1024:5d}KB : {ops/dt/1e9:8.1f} Gop/s")


if __name__ == "__main__":
    print(jax.devices())
    for dt in (jnp.float32, jnp.uint32):
        rate(dt, 8, 128, 512)
        rate(dt, 64, 128, 256)
        rate(dt, 256, 128, 128)
        rate(dt, 512, 512, 32)
        rate(dt, 1024, 1024, 16)
