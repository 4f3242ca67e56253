"""Round-4 MSM profiling: where does the time go on the real chip?

Times, at MSM-realistic shapes:
  1. mont mul throughput (pure kernel) at several batch sizes
  2. madd throughput (fused mixed add) at the level-0 lane shape
  3. the gather (jnp.take of random rows) alone
  4. one level-0 fori_loop step-equivalent composite
  5. the full MSM at 2^16 / 2^20
"""
import os, sys, time
import jax, jax.numpy as jnp, numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/cosnarks_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
sys.path.insert(0, "/root/repo")

from cosnarks_tpu.ec import curve as ec, msm, pallas_ec
from cosnarks_tpu.ec.curves import BN254_G1 as spec
from cosnarks_tpu.ff import mont, pallas_mont

F = spec.ops.field
print("backend:", jax.default_backend(), jax.devices())
rng = np.random.default_rng(1)


def fetch(x):
    return np.asarray(jax.device_get(x))


def timeit(name, fn, iters=3, unit_n=None):
    fn()  # warm
    ts = []
    for _ in range(iters):
        t0 = time.time()
        fn()
        ts.append(time.time() - t0)
    best = min(ts)
    rate = (unit_n / best) if unit_n else None
    print(f"{name}: {best*1e3:.2f} ms" + (f"  ({rate/1e6:.2f} M/s)" if rate else ""))
    return best


# 1. mont mul
for logn in (16, 20, 22):
    n = 1 << logn
    a = jnp.asarray(rng.integers(0, 1 << 16, size=(n, F.nlimbs), dtype=np.uint32))
    b = jnp.asarray(rng.integers(0, 1 << 16, size=(n, F.nlimbs), dtype=np.uint32))
    f = jax.jit(lambda a, b: pallas_mont.mul(F, a, b))
    timeit(f"mont.mul 2^{logn}", lambda: fetch(f(a, b)), unit_n=n)

# 2. madd at level-0 lane shapes: nwin x C lanes
for (nwin, C) in ((20, 2048), (20, 32768), (1, 65536)):
    lanes = nwin * C
    X = jnp.asarray(rng.integers(0, 1 << 16, size=(lanes, F.nlimbs), dtype=np.uint32))
    Y = jnp.asarray(rng.integers(0, 1 << 16, size=(lanes, F.nlimbs), dtype=np.uint32))
    Z = jnp.asarray(rng.integers(0, 1 << 16, size=(lanes, F.nlimbs), dtype=np.uint32))
    f = jax.jit(lambda X, Y, Z: pallas_ec.madd(spec, (X, Y, Z), (X, Y), valid=None))
    timeit(f"madd {nwin}x{C} lanes", lambda: fetch(f(X, Y, Z)[0]), unit_n=lanes)

# 2b. madd as a 32-step fori_loop (the level-0 shape: K sequential steps)
nwin, C, K = 20, 2048, 32
lanes = nwin * C
X = jnp.asarray(rng.integers(0, 1 << 16, size=(lanes, F.nlimbs), dtype=np.uint32))
Y = jnp.asarray(rng.integers(0, 1 << 16, size=(lanes, F.nlimbs), dtype=np.uint32))
Z = jnp.asarray(rng.integers(0, 1 << 16, size=(lanes, F.nlimbs), dtype=np.uint32))

@jax.jit
def loop_madd(X, Y, Z):
    def step(t, P):
        return pallas_ec.madd(spec, P, (X, Y), valid=None)
    return jax.lax.fori_loop(0, K, step, (X, Y, Z))

timeit(f"madd loop {K}x {nwin}x{C}", lambda: fetch(loop_madd(X, Y, Z)[0]),
       unit_n=lanes * K)

# 3. gather of random rows (the per-step point fetch)
N = 1 << 16
Xbig = jnp.asarray(rng.integers(0, 1 << 16, size=(N, F.nlimbs), dtype=np.uint32))
idx = jnp.asarray(rng.integers(0, N, size=(lanes,), dtype=np.int32))

@jax.jit
def gather_loop(Xbig, idx):
    def step(t, acc):
        g = jnp.take(Xbig, (idx + t) % N, axis=0)
        return acc + g
    return jax.lax.fori_loop(0, K, step, jnp.zeros((lanes, F.nlimbs), jnp.uint32))

timeit(f"gather loop {K}x 2x{lanes} rows", lambda: fetch(gather_loop(Xbig, idx)),
       unit_n=lanes * K)

# 5. full MSM
for logn, c in ((16, 13), (20, 13)):
    n = 1 << logn
    ks = rng.integers(0, 1 << 16, size=(n, F.nlimbs)).astype(np.uint32)
    ks[:, -1] &= (1 << 13) - 1
    ksj = jnp.asarray(ks)
    pts = tuple(
        jnp.asarray(rng.integers(0, 1 << 16, size=(n, F.nlimbs), dtype=np.uint32))
        for _ in range(2)
    ) + (jnp.asarray(np.tile(np.array([F.one_mont], np.uint32), (n, 1))),)
    # NOTE: garbage points — arithmetic cost identical, result meaningless
    t0 = time.time()
    r = fetch(msm.msm(spec, pts, ksj, c=c)[0])
    print(f"msm 2^{logn} c={c} compile+run: {time.time()-t0:.1f} s")
    timeit(f"msm 2^{logn} c={c}", lambda: fetch(msm.msm(spec, pts, ksj, c=c)[0]),
           unit_n=n)
