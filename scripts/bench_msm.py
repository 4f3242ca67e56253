"""MSM throughput probe on the real TPU: sweeps window sizes at 2^16/2^20.
Times with forced device_get (axon block_until_ready is a no-op).
Usage: python scripts/bench_msm.py [log2N ...] (default 16 20)
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from cosnarks_tpu.ec import curve as ec, msm
from cosnarks_tpu.ec.curves import BN254_G1 as spec
from cosnarks_tpu.ff.bigint import limbs_to_int

F = spec.scalar_field
print("backend:", jax.default_backend())


def gen_points(N):
    cache = f"/tmp/cosnarks_bench_affine_{N}.npz"
    if os.path.exists(cache):
        d = np.load(cache)
        return tuple(jnp.asarray(d[k]) for k in ("x", "y", "z"))
    rng = np.random.default_rng(0xBE7C)
    gen = ec.encode_points(spec, [spec.generator])
    genN = tuple(jnp.broadcast_to(x[0], (N,) + x.shape[1:]) for x in gen)
    ks = rng.integers(0, 1 << 16, size=(N, F.nlimbs)).astype(np.uint32)
    pts = ec.scalar_mul(spec, genN, jnp.asarray(ks))
    pts = ec.to_affine(spec, pts)
    host = [np.asarray(jax.device_get(x)) for x in pts]
    np.savez(cache, x=host[0], y=host[1], z=host[2])
    return tuple(jnp.asarray(x) for x in host)


def oracle_check(points, scalars, result, k=None):
    """Spot-check vs host bigint curve on a small prefix."""
    from cosnarks_tpu.ec import host

    hc = host.host_curve(spec)
    aff = ec.decode_points(spec, tuple(x[:k] for x in points))
    sc = [limbs_to_int(np.asarray(s)) for s in np.asarray(scalars)[:k]]
    acc = None
    for pt, s in zip(aff, sc):
        if pt is None or s == 0:
            continue
        term = hc.scalar_mul(hc.lift_affine(pt), s)
        acc = term if acc is None else hc.add(acc, term)
    want = hc.jac_to_affine(acc)
    got = ec.decode_points(spec, tuple(x[None] for x in result))[0]
    assert got == want, f"MSM mismatch: {got} != {want}"


for log2n in [int(a) for a in (sys.argv[1:] or ["16", "20"])]:
    N = 1 << log2n
    pts = gen_points(N)
    rng = np.random.default_rng(7)
    sc = rng.integers(0, 1 << 16, size=(N, F.nlimbs)).astype(np.uint32)
    sc[:, -1] &= (1 << 13) - 1
    scalars = jnp.asarray(sc)
    for c in ([11, 12, 13] if log2n >= 16 else [10, 11]):
        t0 = time.perf_counter()
        r = msm.msm(spec, pts, scalars, c=c)
        rr = [np.asarray(jax.device_get(x)) for x in r]
        compile_s = time.perf_counter() - t0
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            r = msm.msm(spec, pts, scalars, c=c)
            rr = [np.asarray(jax.device_get(x)) for x in r]
            times.append(time.perf_counter() - t0)
        best = min(times)
        print(
            f"N=2^{log2n} c={c}: {N/best/1e6:.2f} M pts/s "
            f"({best*1e3:.1f} ms; compile+first {compile_s:.1f}s)"
        )
    if N <= (1 << 16):
        K = 256
        sub = tuple(x[:K] for x in pts)
        rp = msm.msm(spec, sub, scalars[:K], c=10)
        oracle_check(sub, scalars[:K], rp, k=K)
        print(f"oracle check vs host bigint on {K}-point prefix: OK")
