"""Microbench: Pallas mont-mul and EC add throughput on the real TPU.
Forces device_get for timing (axon block_until_ready is a no-op)."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from cosnarks_tpu.ec import curve as ec
from cosnarks_tpu.ec.curves import BN254_G1
from cosnarks_tpu.ff import mont, pallas_mont
from cosnarks_tpu.ff.spec import BN254_FR

print("backend:", jax.default_backend(), jax.devices())

field = BN254_FR
N = 1 << 20
rng = np.random.default_rng(0)
a = jnp.asarray(rng.integers(0, 1 << 16, (N, field.nlimbs), dtype=np.uint32))
b = jnp.asarray(rng.integers(0, 1 << 16, (N, field.nlimbs), dtype=np.uint32))

for tile in (256, 1024, 4096):
    f = jax.jit(lambda x, y, t=tile: pallas_mont.mul(field, x, y, tile=t))
    np.asarray(jax.device_get(f(a, b)))  # compile+warm
    t0 = time.perf_counter()
    reps = 10
    for _ in range(reps):
        out = f(a, b)
    np.asarray(jax.device_get(out))
    dt = (time.perf_counter() - t0) / reps
    print(f"mont_mul tile={tile}: {N/dt/1e6:.1f} M muls/s  ({dt*1e3:.2f} ms)")

# chained muls (compute-bound: 8 dependent muls per element, amortize HBM)
for depth in (8,):
    def chain(x, y):
        for _ in range(depth):
            x = pallas_mont.mul(field, x, y, tile=1024)
        return x
    f = jax.jit(chain)
    np.asarray(jax.device_get(f(a, b)))
    t0 = time.perf_counter()
    reps = 5
    for _ in range(reps):
        out = f(a, b)
    np.asarray(jax.device_get(out))
    dt = (time.perf_counter() - t0) / reps
    print(f"mont_mul chain{depth}: {N*depth/dt/1e6:.1f} M muls/s ({dt*1e3:.2f} ms)")

# EC complete Jacobian add
spec = BN254_G1
M = 1 << 18
pts_aff = ec.encode_points(spec, [spec.generator])
# build M random-ish points by repeated doubling of broadcasted generator
P = tuple(jnp.broadcast_to(x[0], (M,) + x[0].shape) for x in pts_aff)
P = ec.double(spec, P)
Q = ec.double(spec, P)
f = jax.jit(lambda p, q: ec.add(spec, p, q))
np.asarray(jax.device_get(f(P, Q)[0]))
t0 = time.perf_counter()
reps = 10
for _ in range(reps):
    out = f(P, Q)
np.asarray(jax.device_get(out[0]))
dt = (time.perf_counter() - t0) / reps
print(f"ec_add: {M/dt/1e6:.2f} M adds/s ({dt*1e3:.2f} ms)")

f = jax.jit(lambda p: ec.double(spec, p))
np.asarray(jax.device_get(f(P)[0]))
t0 = time.perf_counter()
for _ in range(reps):
    out = f(P)
np.asarray(jax.device_get(out[0]))
dt = (time.perf_counter() - t0) / reps
print(f"ec_double: {M/dt/1e6:.2f} M dbls/s ({dt*1e3:.2f} ms)")
