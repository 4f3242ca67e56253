"""Substrate rate comparison: u32 mul vs f32 FMA vs int8 MXU, plus an
f32 base-2^8 CIOS Montgomery-mul prototype (no in-loop carries: column
sums bounded by 2*32*255^2 < 2^24, exact in f32).

python scripts/ubench_f32.py  (axon TPU; PYTHONPATH must include repo)
"""

import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/tmp/cosnarks_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from cosnarks_tpu.ec.curves import BN254_G1
from cosnarks_tpu.ff import mont

F = BN254_G1.ops.field  # Fq: 16x16-bit limbs, R = 2^256


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


def raw_rate(dtype, iters=64, M=2048, N=1024, acc_n=8):
    """mul+add rate with acc_n independent chains (not latency-bound)."""
    def kernel(a, b, o):
        x = a[:]
        y = b[:]
        accs = [x * jnp.array(i + 1, dtype) for i in range(acc_n)]
        for t in range(iters // acc_n):
            for k in range(acc_n):
                accs[k] = accs[k] + x * y
                x = x + accs[k - 1] * jnp.array(1, dtype)  # keep live
        acc = accs[0]
        for k in range(1, acc_n):
            acc = acc + accs[k]
        o[:] = acc

    spec = pl.BlockSpec((256, N), lambda i: (i, 0), memory_space=pltpu.VMEM)
    call = pl.pallas_call(
        kernel, grid=(M // 256,), in_specs=[spec, spec], out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((M, N), dtype))
    a = jnp.ones((M, N), dtype)
    b = jnp.full((M, N), 3, dtype)
    dt = timeit(lambda: call(a, b))
    ops = M * N * (iters // acc_n) * acc_n * 3  # mul,add,add
    print(f"raw {np.dtype(dtype).name} mul/add x3: {ops/dt/1e9:7.1f} Gop/s"
          f"  ({dt*1e3:.2f} ms)")


def mxu_rate(M=2048, K=256, N=256, iters=32):
    def kernel(a, b, o):
        x32 = a[:].astype(jnp.int32)
        acc = jnp.zeros((a.shape[0], N), jnp.int32)
        for t in range(iters):
            x = (x32 + t).astype(jnp.int8)  # defeat CSE across iters
            acc = acc + jax.lax.dot_general(
                x, b[:], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
        o[:] = acc

    aspec = pl.BlockSpec((256, K), lambda i: (i, 0), memory_space=pltpu.VMEM)
    bspec = pl.BlockSpec((K, N), lambda i: (0, 0), memory_space=pltpu.VMEM)
    ospec = pl.BlockSpec((256, N), lambda i: (i, 0), memory_space=pltpu.VMEM)
    call = pl.pallas_call(
        kernel, grid=(M // 256,), in_specs=[aspec, bspec], out_specs=ospec,
        out_shape=jax.ShapeDtypeStruct((M, N), jnp.int32))
    a = jnp.ones((M, K), jnp.int8)
    b = jnp.ones((K, N), jnp.int8)
    dt = timeit(lambda: call(a, b))
    macs = M * K * N * iters
    print(f"MXU s8xs8->s32 matmul: {macs/dt/1e12:7.2f} TMAC/s ({dt*1e3:.2f} ms)")


# ---------- f32 base-2^8 Montgomery prototype ----------------------------
D = 32          # digits
BASE = 256.0
N0INV8 = float(F.n0inv & 0xFF)   # -p^{-1} mod 2^8 (low byte of 2^16 inv)
P_BYTES = []
_p = F.p
for i in range(D):
    P_BYTES.append(float(_p & 0xFF))
    _p >>= 8


def mont_mul_f32(a, b):
    """a, b: lists of D f32 digit vectors (Montgomery form, R=2^256).
    Returns D f32 digit vectors, canonical (< p)."""
    t = [jnp.zeros_like(a[0]) for _ in range(D + 2)]
    inv_base = np.float32(1.0 / BASE)
    for i in range(D):
        ai = a[i]
        for j in range(D):
            t[j] = t[j] + ai * b[j]
        # m = (t0 mod 256) * n0inv mod 256
        t0 = t[0]
        t0m = t0 - BASE * jnp.floor(t0 * inv_base)
        mm = t0m * np.float32(N0INV8)
        m = mm - BASE * jnp.floor(mm * inv_base)
        for j in range(D):
            if P_BYTES[j]:
                t[j] = t[j] + m * np.float32(P_BYTES[j])
        carry = t[0] * inv_base  # exact: t[0] ≡ 0 (mod 256)
        t = t[1:] + [jnp.zeros_like(a[0])]
        t[0] = t[0] + carry
    # final carry propagation
    out = []
    carry = jnp.zeros_like(a[0])
    for k in range(D):
        v = t[k] + carry
        c = jnp.floor(v * inv_base)
        out.append(v - BASE * c)
        carry = c
    # conditional subtract p (result < 2p)
    borrow = jnp.zeros_like(a[0])
    diffs = []
    for k in range(D):
        s = out[k] + (BASE - np.float32(P_BYTES[k])) - borrow
        c = jnp.floor(s * inv_base)      # 1 if no borrow else 0
        diffs.append(s - BASE * c)
        borrow = 1.0 - c
    ge = borrow == 0.0
    return [jnp.where(ge, d, o) for d, o in zip(diffs, out)]


def f32_mont_bench(total=1 << 20, tile=512):
    def kernel(a_ref, b_ref, o_ref):
        at = a_ref[:].T
        bt = b_ref[:].T
        a = [at[i] for i in range(D)]
        b = [bt[j] for j in range(D)]
        res = mont_mul_f32(a, b)
        o_ref[:] = jnp.stack(res, axis=0).T

    spec = pl.BlockSpec((tile, D), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)
    call = pl.pallas_call(
        kernel, grid=(total // tile,), in_specs=[spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((total, D), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024))

    # correctness first, on a small slice
    rng = np.random.default_rng(3)
    small = tile
    av = [int(rng.integers(0, 1 << 62)) * int(rng.integers(0, 1 << 62))
          % F.p for _ in range(small)]
    bv = [int(rng.integers(0, 1 << 62)) * int(rng.integers(0, 1 << 62))
          % F.p for _ in range(small)]
    R = 1 << 256

    def to_digits(vals):
        ms = [(v * R) % F.p for v in vals]
        arr = np.zeros((len(vals), D), np.float32)
        for r, mv in enumerate(ms):
            for i in range(D):
                arr[r, i] = float(mv & 0xFF)
                mv >>= 8
        return jnp.asarray(arr)

    got = np.asarray(jax.device_get(call(to_digits(av), to_digits(bv))))
    import math
    ok = 0
    for r in range(small):
        g = sum(int(got[r, i]) << (8 * i) for i in range(D))
        exp = (av[r] * bv[r] * R) % F.p   # (aR * bR) R^-1 = abR
        if g == exp:
            ok += 1
    print(f"f32 mont correctness: {ok}/{small}")
    assert ok == small

    a = jnp.ones((total, D), jnp.float32)
    b = jnp.full((total, D), 2.0, jnp.float32)
    dt = timeit(lambda: call(a, b))
    print(f"f32 mont (base 2^8): {total/dt/1e6:7.1f} M mul/s ({dt*1e3:.2f} ms)")


if __name__ == "__main__":
    print(jax.devices())
    raw_rate(jnp.uint32)
    raw_rate(jnp.float32)
    raw_rate(jnp.int32)
    mxu_rate()
    f32_mont_bench()
