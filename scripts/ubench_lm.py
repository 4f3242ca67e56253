"""Limb-major (n, R, C) Montgomery-mul kernel prototype: limbs as 2-D
full-sublane lane shapes instead of 1-D (tile,) vectors (which use 1/8
sublanes per vreg). Target >= 3x over the current 32M mul/s."""

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


def timeit(fn, *args, reps=5):
    _force(fn(*args))
    ts = []
    for _ in range(reps):
        t0 = time.time()
        _force(fn(*args))
        ts.append(time.time() - t0)
    return min(ts)


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


def bench(R, C, G):
    total = R * C * G
    a = jnp.ones((n, G * R, C), jnp.uint32)
    b = jnp.full((n, G * R, C), 2, jnp.uint32)
    call = lm_call(R, C, G)
    dt = timeit(lambda: call(a, b))
    print(f"limb-major mont ({R:4d},{C:4d})x{G:3d} [{total>>10}K elems]: "
          f"{total/dt/1e6:7.1f} M mul/s ({dt*1e3:.2f} ms)")
    return call


def correctness(R=64, C=256, G=2):
    total = R * C * G
    rng = np.random.default_rng(5)
    av = [int.from_bytes(rng.bytes(31), "little") % F.p
          for _ in range(total)]
    bv = [int.from_bytes(rng.bytes(31), "little") % F.p
          for _ in range(total)]
    A = mont.encode(F, av)  # (total, n) Montgomery
    B = mont.encode(F, bv)
    Alm = jnp.asarray(np.asarray(A).T.reshape(n, G * R, C))
    Blm = jnp.asarray(np.asarray(B).T.reshape(n, G * R, C))
    out = lm_call(R, C, G)(Alm, Blm)
    flat = np.asarray(jax.device_get(out)).reshape(n, total).T
    got = mont.decode(F, jnp.asarray(flat))
    exp = [(x * y) % F.p for x, y in zip(av, bv)]
    assert got == exp, "limb-major mont mismatch"
    print("limb-major mont correct vs python-int oracle")


if __name__ == "__main__":
    print(jax.devices())
    correctness()
    bench(8, 512, 32)
    bench(32, 512, 16)
    bench(64, 512, 8)
    bench(128, 512, 4)
    bench(64, 1024, 8)
