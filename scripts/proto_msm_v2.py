"""Prototype: scatter-free bucket accumulation for the Pippenger MSM.

Replaces the per-step bucket scatters of ec/msm.py:_bucket_accumulate with
a dense (K, nwin, C) run-dump + one gather: in sorted order, bucket b's
segment [start_b, end_b] is *interior* to chunk end_b//K iff it starts in
the same chunk at a non-chunk-start offset; the fold writes its completed
run at step (end_b % K) + 1, so its value can be fetched back by a single
gather at positions computed from searchsorted — no scatter at all.
"""

import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", "/tmp/cosnarks_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from cosnarks_tpu.ec import curve as ec, msm, pallas_ec
from cosnarks_tpu.ec.curves import BN254_G1 as spec

K = 32


def bucket_accumulate_v2(spec, order, sortedb, sorted_sign, X, Y, inf_in, B, nwin):
    o = spec.ops
    N = order.shape[1]
    assert N % K == 0
    C = N // K
    w_idx = jnp.arange(nwin, dtype=jnp.int32)[:, None]

    keys3 = sortedb.reshape(nwin, C, K)
    pos3 = order.reshape(nwin, C, K)
    sgn3 = sorted_sign.reshape(nwin, C, K)
    first_key = keys3[:, :, 0]

    # dense run dump: buf[t] = run value JUST BEFORE consuming step t
    buf = ec.point_inf(spec, (K, nwin, C))

    def fetch0(t):
        pos = jax.lax.dynamic_index_in_dim(pos3, t, axis=2, keepdims=False)
        flat = pos.reshape(-1)
        qx = jnp.take(X, flat, axis=0).reshape((nwin, C) + X.shape[1:])
        qy = jnp.take(Y, flat, axis=0).reshape((nwin, C) + Y.shape[1:])
        sgn = jax.lax.dynamic_index_in_dim(sgn3, t, axis=2, keepdims=False)
        qy = o.select(sgn, o.neg(qy), qy)
        valid = ~inf_in[flat].reshape(nwin, C)
        one = o.one_like(qx)
        zero = o.zeros_like(one)
        return (qx, qy), (qx, qy, o.select(valid, one, zero)), valid

    def step(t, state):
        run, cur_key, prefix, buf = state
        k = jax.lax.dynamic_index_in_dim(keys3, t, axis=2, keepdims=False)
        v_aff, v_jac, v_valid = fetch0(t)
        changed = k != cur_key
        is_first = cur_key == first_key
        prefix = ec.select_point(spec, changed & is_first, run, prefix)
        # dump the running sum at slot t (completed segments are read back
        # from slot end+1 by the gather below)
        buf = tuple(
            jax.lax.dynamic_update_index_in_dim(bc, rc, t, axis=0)
            for bc, rc in zip(buf, run))
        grown = ec.madd(spec, run, v_aff, ~changed & v_valid)
        run = ec.select_point(spec, changed, v_jac, grown)
        return run, k, prefix, buf

    init = (ec.point_inf(spec, (nwin, C)), first_key,
            ec.point_inf(spec, (nwin, C)), buf)
    run, cur_key, prefix, buf = jax.lax.fori_loop(0, K, step, init)
    single = cur_key == first_key
    prefix = ec.select_point(spec, single, run, prefix)

    # segment boundaries per bucket
    bids = jnp.arange(B, dtype=jnp.int32)
    starts = jax.vmap(lambda sb: jnp.searchsorted(sb, bids, side="left"))(sortedb)
    ends = jax.vmap(lambda sb: jnp.searchsorted(sb, bids, side="right"))(sortedb)
    nonempty = ends > starts
    end_idx = ends - 1
    interior = (nonempty & (starts // K == end_idx // K)
                & (starts % K != 0) & (end_idx % K != K - 1))
    # read back interior bucket sums: buf[(end%K)+1, w, end//K]
    t_idx = jnp.where(interior, end_idx % K + 1, 0)
    c_idx = jnp.where(interior, end_idx // K, 0)
    gathered = tuple(
        bc[t_idx, w_idx, c_idx] for bc in buf)  # (nwin, B) fancy gather
    inf_b = ec.point_inf(spec, (nwin, B))
    buckets = ec.select_point(spec, interior, gathered, inf_b)

    # next-level stream: per chunk (prefix, suffix)
    suf_key = jnp.where(single, first_key, cur_key)
    suffix = ec.select_point(spec, single, ec.point_inf(spec, (nwin, C)), run)
    keys = jnp.stack([first_key, suf_key], axis=2).reshape(nwin, 2 * C)
    vals = tuple(
        jnp.stack([p, s], axis=2).reshape((nwin, 2 * C) + p.shape[2:])
        for p, s in zip(prefix, suffix))

    # subsequent levels: small streams, reuse the original (scatter) path
    buckets = _fold_levels(spec, keys, vals, buckets, B, nwin)
    return buckets


def _fold_levels(spec, keys, vals, buckets, B, nwin):
    o = spec.ops
    w_idx = jnp.arange(nwin, dtype=jnp.int32)[:, None]
    while True:
        M = keys.shape[1]
        Mp = -(-M // K) * K
        if Mp != M:
            keys = jnp.concatenate(
                [keys, jnp.full((nwin, Mp - M), B, keys.dtype)], axis=1)
            inf = ec.point_inf(spec, (nwin, Mp - M))
            vals = tuple(jnp.concatenate([v, i], axis=1)
                         for v, i in zip(vals, inf))
        C = Mp // K
        keys3 = keys.reshape(nwin, C, K)
        vals3 = tuple(v.reshape((nwin, C, K) + v.shape[2:]) for v in vals)
        first_key = keys3[:, :, 0]

        def step(t, state):
            run, cur_key, prefix, buckets = state
            k = jax.lax.dynamic_index_in_dim(keys3, t, axis=2, keepdims=False)
            vj = tuple(jax.lax.dynamic_index_in_dim(x, t, axis=2, keepdims=False)
                       for x in vals3)
            v_valid = ~o.is_zero(vj[2])
            changed = k != cur_key
            is_first = cur_key == first_key
            prefix = ec.select_point(spec, changed & is_first, run, prefix)
            flush = changed & ~is_first
            widx = jnp.where(flush, cur_key, B)
            buckets = tuple(bc.at[w_idx, widx].set(rc, mode="drop")
                            for bc, rc in zip(buckets, run))
            addend = ec.select_point(spec, ~changed & v_valid, vj,
                                     ec.point_inf(spec, vj[0].shape[:2]))
            grown = ec.add(spec, run, addend)
            run = ec.select_point(spec, changed, vj, grown)
            return run, k, prefix, buckets

        init = (ec.point_inf(spec, (nwin, C)), first_key,
                ec.point_inf(spec, (nwin, C)), buckets)
        run, cur_key, prefix, buckets = jax.lax.fori_loop(0, K, step, init)
        single = cur_key == first_key
        prefix = ec.select_point(spec, single, run, prefix)
        if C == 1:
            pmask = first_key < B
            pidx = jnp.where(pmask, first_key, B)
            buckets = tuple(bc.at[w_idx, pidx].set(pc, mode="drop")
                            for bc, pc in zip(buckets, prefix))
            smask = ~single & (cur_key < B)
            sidx = jnp.where(smask, cur_key, B)
            buckets = tuple(bc.at[w_idx, sidx].set(rc, mode="drop")
                            for bc, rc in zip(buckets, run))
            return buckets
        suf_key = jnp.where(single, first_key, cur_key)
        suffix = ec.select_point(spec, single,
                                 ec.point_inf(spec, (nwin, C)), run)
        keys = jnp.stack([first_key, suf_key], axis=2).reshape(nwin, 2 * C)
        vals = tuple(jnp.stack([p, s], axis=2).reshape((nwin, 2 * C) + p.shape[2:])
                     for p, s in zip(prefix, suffix))


def msm_v2(spec, pts, scalars_std, c):
    o = spec.ops
    X, Y, Z = pts
    B = (1 << (c - 1)) + 1
    inf_in = o.is_zero(Z)
    digits = msm.signed_digits(spec, scalars_std, c)
    nwin = digits.shape[0]
    bucket = jnp.abs(digits).astype(jnp.int32)
    sign = digits < 0
    order = jnp.argsort(bucket, axis=1)
    sortedb = jnp.take_along_axis(bucket, order, axis=1)
    sorted_sign = jnp.take_along_axis(sign, order, axis=1)
    acc = bucket_accumulate_v2(spec, order, sortedb, sorted_sign, X, Y,
                               inf_in, B, nwin)
    buckets = tuple(x[:, 1:] for x in acc)
    wsums = msm._weighted_bucket_sum(spec, buckets)
    return msm._horner_combine(spec, wsums, c)


if __name__ == "__main__":
    N = 1 << 16
    c = 13
    data = np.load(f"/tmp/cosnarks_bench_affine_{N}.npz")
    pts = tuple(jnp.asarray(data[k]) for k in ("x", "y", "z"))
    rng = np.random.default_rng(0xBE7C)
    F = spec.scalar_field
    scalars = rng.integers(0, 1 << 16, size=(N, F.nlimbs)).astype(np.uint32)
    scalars[:, -1] &= (1 << 13) - 1
    scalars = jnp.asarray(scalars)

    f2 = jax.jit(lambda p, s: msm_v2(spec, p, s, c))
    f1 = jax.jit(lambda p, s: msm.msm(spec, p, s, c=c))

    def timeit(fn, iters=8):
        r = fn(pts, scalars); jax.tree.map(lambda x: np.asarray(x), r)
        t0 = time.perf_counter()
        for _ in range(iters):
            r = fn(pts, scalars)
        jax.tree.map(lambda x: np.asarray(jax.device_get(x)), r)
        return (time.perf_counter() - t0) / iters, r

    t1, r1 = timeit(f1)
    t2, r2 = timeit(f2)
    same = all(np.array_equal(np.asarray(a), np.asarray(b))
               for a, b in zip(jax.device_get(ec.to_affine(spec, r1)),
                               jax.device_get(ec.to_affine(spec, r2))))
    print(f"v1: {t1*1e3:.1f} ms ({N/t1/1e3:.0f} K pts/s)")
    print(f"v2: {t2*1e3:.1f} ms ({N/t2/1e3:.0f} K pts/s)  match={same}")
