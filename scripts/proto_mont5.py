"""Layout experiment: CIOS Montgomery mul with (TILE, n) row-major blocks
(+ in-kernel transpose, the current production layout) vs (n, TILE)
limb-major blocks (full 128-lane occupancy, no transpose).

Chained muls inside one kernel: x = mul(x, b) CHAIN times, so per-call
overhead is amortized and the measured rate is the kernel's own.
"""

import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/cosnarks_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cosnarks_tpu.ff import pallas_mont
from cosnarks_tpu.ff.spec import BN254_FQ as F
from cosnarks_tpu.ff import mont

CHAIN = int(os.environ.get("CHAIN", "64"))
TOTAL = int(os.environ.get("TOTAL", str(1 << 16)))
TILE = int(os.environ.get("TILE", "512"))
n = F.nlimbs


def fetch(x):
    return np.asarray(jax.device_get(x))


def timeit(name, fn, unit_n):
    fn()
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    best = min(ts)
    print(f"{name}: {best*1e3:.2f} ms  ({unit_n/best/1e6:.2f} M mul/s)",
          flush=True)


# --- v0: current row-major + in-kernel transpose ---------------------------
def kernel_v0(a_ref, b_ref, o_ref):
    at = a_ref[:].T
    bt = b_ref[:].T
    a = [at[i] for i in range(n)]
    b = [bt[j] for j in range(n)]
    for _ in range(CHAIN):
        a = pallas_mont.mont_mul_lanes(F, a, b)
    o_ref[:] = jnp.stack(a, axis=0).T


def call_v0(a, b):
    spec = pl.BlockSpec((TILE, n), lambda i: (i, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel_v0, grid=(TOTAL // TILE,), in_specs=[spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((TOTAL, n), jnp.uint32))(a, b)


# --- v1: limb-major, stacked-2D CIOS ----------------------------------------
MASK = np.uint32(0xFFFF)


def mont_mul_stacked(A, B):
    """CIOS on (n, TILE) stacked arrays; same math as mont_mul_lanes but
    rows never leave the 2D array (no transpose, no per-row stacking)."""
    tile = A.shape[1]
    p_limbs = [np.uint32(x) for x in F.p_limbs]
    n0inv = np.uint32(F.n0inv)
    row = jax.lax.broadcasted_iota(jnp.int32, (n, tile), 0)
    p_mat = jnp.zeros((n, tile), jnp.uint32)
    for j, pj in enumerate(p_limbs):
        p_mat = jnp.where(row == j, pj, p_mat)
    zrow = jnp.zeros((1, tile), jnp.uint32)
    t = jnp.zeros((n + 1, tile), jnp.uint32)

    def step(i, t):
        sel = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0) == i
        ai = jnp.sum(jnp.where(sel, A.astype(jnp.int32), 0), axis=0,
                     keepdims=True).astype(jnp.uint32)
        prod = ai * B
        t = jnp.concatenate([t[:n] + (prod & MASK), t[n:]], axis=0)
        t = jnp.concatenate([t[:1], t[1:] + (prod >> 16)], axis=0)
        m = (t[0] * n0inv) & MASK
        mp = m[None, :] * p_mat
        t = jnp.concatenate([t[:n] + (mp & MASK), t[n:]], axis=0)
        t = jnp.concatenate([t[:1], t[1:] + (mp >> 16)], axis=0)
        row1 = t[1] + (t[0] >> 16)
        return jnp.concatenate([row1[None], t[2:], zrow], axis=0)

    t = jax.lax.fori_loop(0, n, step, t)
    # carry + cond-sub, row ops on the stacked array
    out = []
    carry = t[0] * 0
    for k in range(n):
        v = t[k] + carry
        out.append(v & MASK)
        carry = v >> 16
    out = jnp.stack(out, axis=0)
    # cond sub p
    borrow = out[0] * 0
    diffs = []
    for k in range(n):
        s = out[k] + np.uint32(1 << 16) - p_limbs[k] - borrow
        diffs.append(s & MASK)
        borrow = np.uint32(1) - (s >> 16)
    ge = borrow == 0
    return jnp.where(ge, jnp.stack(diffs, axis=0), out)


def kernel_v1(a_ref, b_ref, o_ref):
    A = a_ref[:]
    B = b_ref[:]
    for _ in range(CHAIN):
        A = mont_mul_stacked(A, B)
    o_ref[:] = A


def call_v1(a, b):
    spec = pl.BlockSpec((n, TILE), lambda i: (0, i), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel_v1, grid=(TOTAL // TILE,), in_specs=[spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((n, TOTAL), jnp.uint32))(a, b)


def main():
    rng = np.random.default_rng(7)
    av = [int.from_bytes(rng.bytes(31), "little") % F.p for _ in range(TOTAL)]
    bv = [int.from_bytes(rng.bytes(31), "little") % F.p for _ in range(TOTAL)]
    a_np = np.zeros((TOTAL, n), np.uint32)
    b_np = np.zeros((TOTAL, n), np.uint32)
    for i in range(TOTAL):
        ai, bi = int(av[i]), int(bv[i])
        for k in range(n):
            a_np[i, k] = (ai >> (16 * k)) & 0xFFFF
            b_np[i, k] = (bi >> (16 * k)) & 0xFFFF

    a = jnp.asarray(a_np)
    b = jnp.asarray(b_np)
    aT = jnp.asarray(a_np.T.copy())
    bT = jnp.asarray(b_np.T.copy())

    f0 = jax.jit(call_v0)
    f1 = jax.jit(call_v1)

    # correctness: CHAIN chained montmuls vs python ints
    r0 = fetch(f0(a, b))
    r1 = fetch(f1(aT, bT)).T
    Rinv = pow(1 << (16 * n), F.p - 2, F.p)
    ok0 = ok1 = True
    for i in range(0, TOTAL, TOTAL // 8):
        x = int(av[i])
        for _ in range(CHAIN):
            x = x * int(bv[i]) % F.p * Rinv % F.p
        got0 = sum(int(r0[i, k]) << (16 * k) for k in range(n))
        got1 = sum(int(r1[i, k]) << (16 * k) for k in range(n))
        ok0 &= got0 == x
        ok1 &= got1 == x
    print("correct v0:", ok0, " v1:", ok1, flush=True)

    timeit("v0 row-major+transpose", lambda: fetch(f0(a, b)),
           TOTAL * CHAIN)
    timeit("v1 limb-major stacked ", lambda: fetch(f1(aT, bT)),
           TOTAL * CHAIN)


if __name__ == "__main__":
    main()
