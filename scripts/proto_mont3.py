"""Isolate the mont-kernel bottleneck: transposes? IO? compute?

  passthru   — load (TILE,n), transpose, transpose back, store
  passthru_lm— limb-major blocks (n,TILE), no transpose, +1 per limb
  comba_lm   — comba16 on limb-major blocks (no transposes)
  unr_lm     — unrolled operand-scanning on limb-major blocks
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
from cosnarks_tpu.ff.spec import BN254_FQ as F
from scripts.proto_mont2 import comba16_lanes

n = F.nlimbs


def timeit(fn, *args, iters=20):
    r = fn(*args)
    r = jax.tree.map(lambda x: np.asarray(x), r)
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn(*args)
    jax.tree.map(lambda x: np.asarray(jax.device_get(x)), r)
    return (time.perf_counter() - t0) / iters


def passthru_kernel(a_ref, b_ref, o_ref):
    at = a_ref[:].T
    bt = b_ref[:].T
    o_ref[:] = (at + bt).T


def make_rowmajor(kernel, total, tile):
    spec = pl.BlockSpec((tile, n), lambda i: (i, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel, grid=(total // tile,),
        in_specs=[spec, spec], out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((total, n), jnp.uint32),
    )


def make_limbmajor(kernel, total, tile):
    spec = pl.BlockSpec((n, tile), lambda i: (0, i), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel, grid=(total // tile,),
        in_specs=[spec, spec], out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((n, total), jnp.uint32),
    )


def passthru_lm_kernel(a_ref, b_ref, o_ref):
    o_ref[:] = a_ref[:] + b_ref[:]


def comba_lm_kernel(a_ref, b_ref, o_ref):
    at = a_ref[:]
    bt = b_ref[:]
    res = comba16_lanes([at[i] for i in range(n)], [bt[j] for j in range(n)])
    o_ref[:] = jnp.stack(res, axis=0)


def unr_lm_kernel(a_ref, b_ref, o_ref):
    at = a_ref[:]
    bt = b_ref[:]
    res = pm.mont_mul_lanes.__wrapped__(F, [at[i] for i in range(n)],
                                        [bt[j] for j in range(n)]) \
        if hasattr(pm.mont_mul_lanes, "__wrapped__") else None
    o_ref[:] = jnp.stack(res, axis=0)


# unrolled (round-1 style) on limb-major
def unr_lanes(a, b):
    MASK16 = np.uint32(0xFFFF)
    p_limbs = [np.uint32(x) for x in F.p_limbs]
    n0inv = np.uint32(F.n0inv)
    zero = jnp.zeros_like(a[0])
    cols = [zero] * (2 * n)
    for i in range(n):
        ai = a[i]
        for j in range(n):
            prod = ai * b[j]
            cols[i + j] = cols[i + j] + (prod & MASK16)
            cols[i + j + 1] = cols[i + j + 1] + (prod >> 16)
    for s in range(n):
        m = (cols[s] * n0inv) & MASK16
        for j in range(n):
            mp = m * p_limbs[j]
            cols[s + j] = cols[s + j] + (mp & MASK16)
            cols[s + j + 1] = cols[s + j + 1] + (mp >> 16)
        cols[s + 1] = cols[s + 1] + (cols[s] >> 16)
    out = []
    carry = zero
    for k in range(n, 2 * n):
        v = cols[k] + carry
        out.append(v & MASK16)
        carry = v >> 16
    return pm.cond_sub_p_lanes(F, out)


def unr_lm_kernel2(a_ref, b_ref, o_ref):
    at = a_ref[:]
    bt = b_ref[:]
    res = unr_lanes([at[i] for i in range(n)], [bt[j] for j in range(n)])
    o_ref[:] = jnp.stack(res, axis=0)


def main():
    total = 1 << 20
    rng = np.random.default_rng(0)
    xs = rng.integers(0, 1 << 16, size=(total, n)).astype(np.uint32)
    xs[:, -1] &= 0x3FFF
    ys = rng.integers(0, 1 << 16, size=(total, n)).astype(np.uint32)
    ys[:, -1] &= 0x3FFF
    a = jnp.asarray(xs)
    b = jnp.asarray(ys)
    ref = np.asarray(pm.mul(F, a, b))
    alm = jnp.asarray(np.ascontiguousarray(xs.T))
    blm = jnp.asarray(np.ascontiguousarray(ys.T))

    call = make_rowmajor(passthru_kernel, total, 1024)
    f = jax.jit(lambda a, b, c=call: c(a, b))
    dt = timeit(f, a, b)
    print(f"passthru rowmajor+T: {total/dt/1e6:.1f} Mel/s", flush=True)

    call = make_limbmajor(passthru_lm_kernel, total, 1024)
    f = jax.jit(lambda a, b, c=call: c(a, b))
    dt = timeit(f, alm, blm)
    print(f"passthru limbmajor : {total/dt/1e6:.1f} Mel/s", flush=True)

    for name, kern in [("comba_lm", comba_lm_kernel),
                       ("unr_lm", unr_lm_kernel2)]:
        for tile in (1024, 4096):
            try:
                call = make_limbmajor(kern, total, tile)
                f = jax.jit(lambda a, b, c=call: c(a, b))
                t0 = time.perf_counter()
                out = np.asarray(f(alm, blm)).T
                comp = time.perf_counter() - t0
                ok = np.array_equal(np.ascontiguousarray(out), ref)
                dt = timeit(f, alm, blm)
                print(f"{name} tile={tile}: {total/dt/1e6:.1f} Mmul/s "
                      f"(compile {comp:.1f}s, correct={ok})", flush=True)
            except Exception as e:
                print(f"{name} tile={tile} FAILED: {str(e)[:160]}", flush=True)


if __name__ == "__main__":
    main()
