"""Round-5 MSM phase profiling with tunnel-latency-immune marginal timing.

Times each phase of _pippenger_signed separately by chaining K dependent
applications in one jit (marginal = (t_k2 - t_k1) / (k2 - k1)), plus a
jax.profiler trace of one full MSM if the platform supports it.
"""
import sys, time, os
import jax, jax.numpy as jnp, numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/cosnarks_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
sys.path.insert(0, "/root/repo")

from cosnarks_tpu.ec import curve as ec, msm, pallas_ec
from cosnarks_tpu.ec.curves import BN254_G1 as spec
from cosnarks_tpu.ff import pallas_mont as pm

F = spec.ops.field
n = F.nlimbs
print("backend:", jax.default_backend(), jax.devices())
rng = np.random.default_rng(7)

LOGN = int(os.environ.get("LOGN", "16"))
N = 1 << LOGN
C_WIN = 13


def fetch(x):
    return np.asarray(jax.device_get(x))


def timeit(name, fn, iters=3):
    fn()
    ts = []
    for _ in range(iters):
        t0 = time.time()
        fn()
        ts.append(time.time() - t0)
    best = min(ts)
    print(f"{name}: {best*1e3:.2f} ms")
    return best


def randu(shape):
    return jnp.asarray(
        rng.integers(0, 1 << 16, size=shape, dtype=np.uint32))


# ---- inputs mirroring _pippenger_signed internals at N, c=13
ks = rng.integers(0, 1 << 16, size=(N, F.nlimbs)).astype(np.uint32)
ks[:, -1] &= (1 << 13) - 1
scalars = jnp.asarray(ks)
X, Y = randu((N, n)), randu((N, n))
Z = jnp.asarray(np.tile(np.array([F.one_mont], np.uint32), (N, 1)))
pts = (X, Y, Z)

B = (1 << (C_WIN - 1)) + 1

# phase A: digits + sort + gather prep (everything before the megakernel)
@jax.jit
def phase_sort(scalars):
    digits = msm.signed_digits(spec, scalars, C_WIN)
    bucket = jnp.abs(digits).astype(jnp.int32)
    sign = digits < 0
    return msm._sort_by_bucket(bucket, sign, C_WIN, N)

order, sortedb, sorted_sign = jax.block_until_ready(phase_sort(scalars))
timeit("A digits+sort", lambda: fetch(phase_sort(scalars)[0][0, :1]))

inf_in = spec.ops.is_zero(Z)
nwin = order.shape[0]

# phase B: full bucket accumulate (gathers + megakernel + later levels)
@jax.jit
def phase_accum(order, sortedb, sorted_sign, X, Y, inf_in):
    return msm._bucket_accumulate(
        spec, order, sortedb, sorted_sign, X, Y, inf_in, B, nwin)

acc = jax.block_until_ready(phase_accum(order, sortedb, sorted_sign, X, Y, inf_in))
timeit("B accumulate(all)", lambda: fetch(
    phase_accum(order, sortedb, sorted_sign, X, Y, inf_in)[0][0, 0]))

# phase B0: level-0 only
@jax.jit
def phase_l0(order, sortedb, sorted_sign, X, Y, inf_in):
    st = msm._level0_accumulate(
        spec, order, sortedb, sorted_sign, X, Y, inf_in, B, nwin)
    return st["keys"], st["buckets"]

jax.block_until_ready(phase_l0(order, sortedb, sorted_sign, X, Y, inf_in))
timeit("B0 level0 only", lambda: fetch(
    phase_l0(order, sortedb, sorted_sign, X, Y, inf_in)[1][0][0, 0]))

# phase C: weighted bucket sum
buckets = tuple(x[:, 1:] for x in acc)
@jax.jit
def phase_wsum(buckets):
    return msm._weighted_bucket_sum(spec, buckets)

wsums = jax.block_until_ready(phase_wsum(buckets))
timeit("C wsum(xla)", lambda: fetch(phase_wsum(buckets)[0]))

@jax.jit
def phase_wsum_pallas(buckets):
    return pallas_ec.weighted_bucket_sum(spec, buckets)

try:
    jax.block_until_ready(phase_wsum_pallas(buckets))
    timeit("C wsum(pallas)", lambda: fetch(phase_wsum_pallas(buckets)[0]))
except Exception as e:
    print("wsum pallas failed:", repr(e)[:200])

# phase D: horner
@jax.jit
def phase_horner(wsums):
    return msm._horner_combine(spec, wsums, C_WIN)

jax.block_until_ready(phase_horner(wsums))
timeit("D horner", lambda: fetch(phase_horner(wsums)[0]))

# full
timeit("FULL msm", lambda: fetch(msm.msm(spec, pts, scalars, c=C_WIN)[0]))

# raw limb-major mont mul rate at the megakernel geometry for reference
tot = 1 << 19
a2, b2 = randu((tot, n)), randu((tot, n))
f = jax.jit(lambda a, b: pm.mul(F, a, b))
jax.block_until_ready(f(a2, b2))
t = timeit("mont mul 2^19 (lm)", lambda: fetch(f(a2, b2)[0]))
print(f"  -> {tot/t/1e6:.0f} M mul/s")
