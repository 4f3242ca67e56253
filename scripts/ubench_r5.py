"""Round-5 kernel gap analysis, tunnel-latency-immune (marginal chaining).

Questions:
 1. raw mont mul rate at (R, C) = (128, 512) vs (16, 512)  [geometry]
 2. chained madd (complete mixed add) rate in a lane kernel at both
    geometries                                              [formula cost]
 3. the actual level0 megakernel marginal rate              [plumbing cost]
 4. lax.sort marginal rate at the MSM shape                 [sort cost]
"""
import sys, time
import jax, jax.numpy as jnp, numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/tmp/cosnarks_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
sys.path.insert(0, "/root/repo")

from cosnarks_tpu.ec import curve as ec, pallas_ec
from cosnarks_tpu.ec.curves import BN254_G1 as spec
from cosnarks_tpu.ff import pallas_mont as pm

F = spec.ops.field
n = F.nlimbs
kspec = pallas_ec._lane_spec(spec)
print("backend:", jax.default_backend())
rng = np.random.default_rng(3)


def fetch_small(x):
    return np.asarray(jax.device_get(x.ravel()[0:1]))


def timeit(fn, reps=3):
    fetch_small(fn())
    ts = []
    for _ in range(reps):
        t0 = time.time()
        fetch_small(fn())
        ts.append(time.time() - t0)
    return min(ts)


def marginal(make, k1=1, k2=6):
    f1, f2 = make(k1), make(k2)
    return (timeit(f2) - timeit(f1)) / (k2 - k1)


def randu(shape):
    return jnp.asarray(rng.integers(0, 1 << 16, size=shape, dtype=np.uint32))


# --- 1. mont mul chained inside ONE kernel (K sequential dependent muls)
def mont_chain_call(R, C, G, K):
    def kernel(a_ref, b_ref, o_ref):
        a = [a_ref[i] for i in range(n)]
        b = [b_ref[i] for i in range(n)]
        def body(_, a):
            return tuple(pm.mont_mul_lanes(F, list(a), b))
        a = jax.lax.fori_loop(0, K, body, tuple(a))
        for i in range(n):
            o_ref[i] = a[i]

    bspec = pl.BlockSpec((n, R, C), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel, grid=(G,), in_specs=[bspec, bspec], out_specs=bspec,
        out_shape=jax.ShapeDtypeStruct((n, G * R, C), jnp.uint32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024))


for (R, C, G) in ():
    a = randu((n, G * R, C))
    b = randu((n, G * R, C))
    lanes = G * R * C

    def make(K, R=R, C=C, G=G, a=a, b=b):
        call = mont_chain_call(R, C, G, K)
        f = jax.jit(lambda a, b: call(a, b))
        return lambda: f(a, b)

    dt = marginal(make)
    print(f"mont chain R={R} C={C} G={G}: {lanes/dt/1e6:.0f} M mul/s "
          f"({dt*1e3:.2f} ms / {lanes} lanes)")

# --- 2. madd chained inside one kernel
def madd_chain_call(R, C, G, K):
    def kernel(x_ref, y_ref, z_ref, qx_ref, qy_ref, ox, oy, oz):
        P = tuple(tuple(r[i] for i in range(n)) for r in (x_ref, y_ref, z_ref))
        Q = (tuple(qx_ref[i] for i in range(n)),
             tuple(qy_ref[i] for i in range(n)))
        def body(_, P):
            return ec.madd(kspec, P, Q, None)
        P = jax.lax.fori_loop(0, K, body, P)
        for r, c in zip((ox, oy, oz), P):
            for i in range(n):
                r[i] = c[i]

    bspec = pl.BlockSpec((n, R, C), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel, grid=(G,), in_specs=[bspec] * 5, out_specs=(bspec,) * 3,
        out_shape=tuple(jax.ShapeDtypeStruct((n, G * R, C), jnp.uint32)
                        for _ in range(3)),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024))


for (R, C, G) in ((16, 512, 8), (32, 512, 4)):
    args = [randu((n, G * R, C)) for _ in range(5)]
    lanes = G * R * C

    def make(K, R=R, C=C, G=G, args=args):
        call = madd_chain_call(R, C, G, K)
        f = jax.jit(lambda *a: call(*a)[0])
        return lambda: f(*args)

    dt = marginal(make, 1, 4)
    print(f"madd chain R={R} C={C} G={G}: {lanes/dt/1e6:.1f} M adds/s "
          f"({dt*1e3:.2f} ms)")

# --- 3. actual level0 megakernel marginal (vary K)
L = 40960  # nwin=20, C=2048 (the 2^16 shape)
Kfold = 32
qx = randu((n, Kfold, L))
qy = randu((n, Kfold, L))
flags = jnp.asarray(
    rng.integers(0, 8, size=(Kfold, L), dtype=np.uint32) | 2)


def make_l0(K):
    def f(qx, qy, flags):
        return pallas_ec.level0_fold(
            spec, qx[:, :K], qy[:, :K], flags[:K], K)[1][0][0]
    jf = jax.jit(f)
    return lambda: jf(qx, qy, flags)


dt = marginal(make_l0, 8, 32)
print(f"level0 megakernel marginal: {L/dt/1e6:.1f} M adds/s per step "
      f"({dt*1e3:.2f} ms / {L} lanes)")

# --- 4. sort marginal at MSM shape
nwin, N = 20, 1 << 16
keys0 = jnp.asarray(rng.integers(0, 1 << 30, size=(nwin, N), dtype=np.uint32))


def make_sort(K):
    @jax.jit
    def f(x):
        def body(_, x):
            return jax.lax.sort(x ^ 1, dimension=1, is_stable=False)
        return jax.lax.fori_loop(0, K, body, x)
    return lambda: f(keys0)


dt = marginal(make_sort, 1, 4)
print(f"lax.sort (20x65536 u32): {dt*1e3:.2f} ms per sort")

# 4b. take_along_axis gather at sort shape (the sign gather)
vals = jnp.asarray(rng.integers(0, 2, size=(nwin, N), dtype=np.uint32))
idx = jnp.asarray(rng.integers(0, N, size=(nwin, N), dtype=np.int32))


def make_gather(K):
    @jax.jit
    def f(v, idx):
        def body(_, v):
            return jnp.take_along_axis(v, idx, axis=1) ^ 1
        return jax.lax.fori_loop(0, K, body, v)
    return lambda: f(vals, idx)


dt = marginal(make_gather, 1, 8)
print(f"take_along_axis (20x65536): {dt*1e3:.2f} ms")

# 4c. the big point gather (jnp.take of (N,16) by 1.3M indices)
X = randu((N, n))
flat = jnp.asarray(rng.integers(0, N, size=(Kfold * L,), dtype=np.int32))


def make_ptg(K):
    @jax.jit
    def f(X, flat):
        def body(_, acc):
            g = jnp.take(X.T, flat, axis=1)
            return acc + g[:, 0].astype(jnp.uint32)
        return jax.lax.fori_loop(0, K, body,
                                 jnp.zeros((n,), jnp.uint32))
    return lambda: f(X, flat)


dt = marginal(make_ptg, 1, 3)
print(f"point gather X.T[:, 1.3M]: {dt*1e3:.2f} ms")
