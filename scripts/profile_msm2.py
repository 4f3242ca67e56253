"""Cumulative-ablation MSM profile: each variant is ONE jit; differences
attribute time to stages. Subtracts the measured null-dispatch floor."""

import os
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/cosnarks_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
os.environ.setdefault("COSNARKS_MSM_L0", "mega")

from cosnarks_tpu.ec import curve as ec, msm
from cosnarks_tpu.ec.curves import BN254_G1 as spec

F = spec.scalar_field
N = 1 << 16
C_WIN = 13


def _force(r):
    jax.tree_util.tree_map(
        lambda x: np.asarray(jax.device_get(x.ravel()[0])), r)


def timeit(fn, *args, reps=7):
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
NWIN = -(-F.bits // C_WIN)


def upto(stage):
    @jax.jit
    def f(scalars_std):
        digits = msm.signed_digits(spec, scalars_std, C_WIN)
        bucket = jnp.abs(digits).astype(jnp.int32)
        sign = digits < 0
        if stage == "digits":
            return bucket, sign
        order, sortedb = msm._sort_by_bucket(bucket, C_WIN, N)
        sorted_sign = jnp.take_along_axis(sign, order, axis=1)
        if stage == "sort":
            return order, sortedb, sorted_sign
        inf_in = o.is_zero(Z)
        if stage == "level0":
            return msm._level0_accumulate(
                spec, order, sortedb, sorted_sign, X, Y, inf_in, B, NWIN)
        acc = msm._bucket_accumulate(
            spec, order, sortedb, sorted_sign, X, Y, inf_in, B, NWIN)
        if stage == "accumulate":
            return acc
        buckets = tuple(x[:, 1:] for x in acc)
        wsums = msm._weighted_bucket_sum(spec, buckets)
        if stage == "wsum":
            return wsums
        return msm._horner_combine(spec, wsums, C_WIN)

    return f


@jax.jit
def null(x):
    return x[0, 0] + 1


floor = timeit(null, scalars)
print(f"dispatch floor  : {floor*1e3:8.2f} ms")
prev = 0.0
for stage in ("digits", "sort", "level0", "accumulate", "wsum", "full"):
    t = timeit(upto(stage), scalars) - floor
    print(f"upto {stage:10s} : {t*1e3:8.2f} ms   (+{(t-prev)*1e3:7.2f})")
    prev = t
