"""Stage-level MSM profile at bench shape (2^16, c=13) on real TPU."""

import os
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/cosnarks_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
os.environ.setdefault("COSNARKS_MSM_L0", "mega")

from cosnarks_tpu.ec import curve as ec, msm, pallas_ec
from cosnarks_tpu.ec.curves import BN254_G1 as spec
from cosnarks_tpu.ff import mont

F = spec.scalar_field
N = 1 << 16
C_WIN = 13


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


data = np.load(f"/tmp/cosnarks_bench_affine_{N}.npz")
points = tuple(jnp.asarray(data[k]) for k in ("x", "y", "z"))
rng = np.random.default_rng(0xBE7C)
scalars = rng.integers(0, 1 << 16, size=(N, F.nlimbs)).astype(np.uint32)
scalars[:, -1] &= (1 << 13) - 1
scalars = jnp.asarray(scalars)

o = spec.ops
X, Y, Z = points
B = (1 << (C_WIN - 1)) + 1


@jax.jit
def stage_digits_sort(scalars_std):
    digits = msm.signed_digits(spec, scalars_std, C_WIN)
    bucket = jnp.abs(digits).astype(jnp.int32)
    sign = digits < 0
    order, sortedb = msm._sort_by_bucket(bucket, C_WIN, N)
    sorted_sign = jnp.take_along_axis(sign, order, axis=1)
    return order, sortedb, sorted_sign


@jax.jit
def stage_accumulate(order, sortedb, sorted_sign):
    inf_in = o.is_zero(Z)
    nwin = -(-F.bits // C_WIN)
    return msm._bucket_accumulate(
        spec, order, sortedb, sorted_sign, X, Y, inf_in, B, nwin)


@jax.jit
def stage_level0(order, sortedb, sorted_sign):
    inf_in = o.is_zero(Z)
    nwin = -(-F.bits // C_WIN)
    return msm._level0_accumulate(
        spec, order, sortedb, sorted_sign, X, Y, inf_in, B, nwin)


@jax.jit
def stage_wsum(acc):
    buckets = tuple(x[:, 1:] for x in acc)
    return msm._weighted_bucket_sum(spec, buckets)


def stage_horner(wsums):
    return msm._horner_combine(spec, wsums, C_WIN)


t = timeit(stage_digits_sort, scalars)
print(f"digits+sort      : {t*1e3:8.2f} ms")
order, sortedb, sorted_sign = jax.tree.map(
    lambda x: x, stage_digits_sort(scalars))

t = timeit(stage_level0, order, sortedb, sorted_sign)
print(f"level0 (incl tail): {t*1e3:8.2f} ms")

t = timeit(stage_accumulate, order, sortedb, sorted_sign)
print(f"full accumulate  : {t*1e3:8.2f} ms")
acc = stage_accumulate(order, sortedb, sorted_sign)

t = timeit(stage_wsum, acc)
print(f"weighted bucketsum: {t*1e3:8.2f} ms")
wsums = stage_wsum(acc)

t = timeit(stage_horner, wsums)
print(f"horner combine   : {t*1e3:8.2f} ms")

t = timeit(lambda s: msm.msm(spec, points, s, c=C_WIN), scalars)
print(f"TOTAL msm        : {t*1e3:8.2f} ms  ({N/t/1e3:.0f}K pts/s)")
