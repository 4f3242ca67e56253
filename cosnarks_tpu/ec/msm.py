"""Multi-scalar multiplication (Pippenger) as TPU-friendly vector kernels.

Replaces arkworks' rayon-parallel `msm_unchecked` used in all reference
provers (co-groth16/src/groth16.rs:221-288, co-groth16/src/mpc/rep3.rs
msm_public_points_hs). Algorithm, mapped to static-shape SPMD:

 1. signed c-bit window digits (buckets halved: |d| <= 2^(c-1), point
    negation absorbs the sign — negating y is one field sub); the sign
    and infinity flags ride in the sort payload
 2. per window, one XLA unstable sort of packed (bucket|idx|flags) keys;
    per-bucket segment bounds from an exact one-hot x one-hot MXU matmul
    histogram + cumsum (a searchsorted binary search costs more than the
    whole fold kernel)
 3. bucket accumulation: the fold megakernel runs all K sequential
    steps per lane in VMEM with the COMPLETE projective RCB mixed add
    (11 muls, straight-line — eprint 2015/1060; valid for every input
    pair on odd-order curves), fed by limb-PACKED random point gathers
    (2 limbs/u32 — the gather is HBM-latency-bound, so bytes = time).
    Total work ~nwin*N mixed adds; boundary partials recurse through the
    same kernel with projective stream operands, shrinking by K/2 per
    level.
 4. weighted bucket reduction  sum_b b*S_b  via row/column tree sums +
    double suffix ladders (complete projective adds)
 5. window Horner combine (c doublings per window) in one jitted scan;
    one final projective -> Jacobian conversion

Multi-chip: shard the point axis, run steps 1-3 per device on its slice,
tree-add the (nwin, B) bucket accumulators over the mesh axis, then run
4-5 replicated (see __graft_entry__.dryrun_multichip).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..ff.bigint import LIMB_BITS
from . import curve as ec
from .curve import CurveSpec


def _raw_digits(spec: CurveSpec, scalars_std, c: int):
    """(N, nlimbs) standard-form scalars -> (nwin, N) uint32 raw c-bit
    digits, LSB window first. c <= LIMB_BITS (digits span <= 2 limbs)."""
    if c > LIMB_BITS:
        raise ValueError("window size must be <= limb width")
    f = spec.scalar_field
    nbits = f.nlimbs * LIMB_BITS
    nwin = -(-f.bits // c)
    mask = np.uint32((1 << c) - 1)
    outs = []
    for w in range(nwin):
        bit0 = w * c
        limb = bit0 // LIMB_BITS
        shift = bit0 % LIMB_BITS
        d = scalars_std[..., limb] >> np.uint32(shift)
        if shift + c > LIMB_BITS and limb + 1 < f.nlimbs:
            d = d | (scalars_std[..., limb + 1] << np.uint32(LIMB_BITS - shift))
        outs.append(d & mask)
    return jnp.stack(outs)


def signed_digits(spec: CurveSpec, scalars_std, c: int):
    """Signed digit recoding: returns (nwin, N) int32 digits in
    [-(2^(c-1)-1), 2^(c-1)] so that sum_w d_w 2^(cw) = scalar.

    Requires scalar < 2^field.bits with the top window unable to overflow:
    field.bits - (nwin-1)*c < c (holds for both curves for 8 <= c <= 16).
    """
    f = spec.scalar_field
    nwin = -(-f.bits // c)
    top_max = (1 << (f.bits - (nwin - 1) * c)) - 1 + 1  # raw + carry
    if top_max > (1 << (c - 1)):
        raise ValueError(f"window {c} would overflow the top signed digit")
    raw = _raw_digits(spec, scalars_std, c).astype(jnp.int32)
    half = np.int32(1 << (c - 1))
    full = np.int32(1 << c)
    outs = []
    carry = jnp.zeros_like(raw[0])
    for w in range(nwin):
        v = raw[w] + carry
        over = v > half
        outs.append(jnp.where(over, v - full, v))
        carry = over.astype(jnp.int32)
    return jnp.stack(outs)


CHUNK_K = 32  # points folded sequentially per lane per level


def _sort_by_bucket(bucket, sign, inf_in, c: int, N: int):
    """(nwin, N) bucket ids + per-window sign bits + per-point infinity
    bits -> (order, sortedb, sorted_sign, sorted_inf).

    The sign and infinity bits ride in the sort payload: a separate
    post-sort take_along_axis of the sign plane measured 13.6 ms at
    (20, 2^16) on v5e — ~60x the 0.21 ms sort itself — and even a u32
    fancy-gather of the validity plane costs 9 ms (1-D gathers do not
    vectorize across lanes the way the 2-D point-row gathers do).
    Single-key unstable sort packs (bucket | index | inf | sign) into one
    u32 when it fits; otherwise a key-value unstable sort."""
    idx_bits = max(1, (N - 1).bit_length())
    payload = ((jnp.arange(N, dtype=jnp.uint32)[None, :] << 2)
               | (inf_in.astype(jnp.uint32)[None, :] << 1)
               | sign.astype(jnp.uint32))
    if c + idx_bits + 2 <= 32:  # bucket id <= 2^(c-1) needs c bits
        keys = (bucket.astype(jnp.uint32) << (idx_bits + 2)) | payload
        skeys = jax.lax.sort(keys, dimension=1, is_stable=False)
        spay = skeys & jnp.uint32((1 << (idx_bits + 2)) - 1)
        sortedb = (skeys >> (idx_bits + 2)).astype(jnp.int32)
    else:
        sortedb, spay = jax.lax.sort(
            (bucket, jnp.broadcast_to(payload, bucket.shape)),
            dimension=1, is_stable=False, num_keys=1)
    order = (spay >> 2).astype(jnp.int32)
    sorted_sign = (spay & 1).astype(bool)
    sorted_inf = ((spay >> 1) & 1).astype(bool)
    return order, sortedb, sorted_sign, sorted_inf


@functools.partial(jax.jit, static_argnums=(0, 3))
def _pippenger_signed(spec: CurveSpec, pts, scalars_std, c: int):
    """Full MSM: signed digits -> sorted buckets -> chunked segmented
    reduction -> weighted reduction -> Horner. One jit per (N, c).

    Bucket accumulation is DISTRIBUTION-INDEPENDENT: sorted (bucket, point)
    pairs are folded in chunks of CHUNK_K per lane; segments fully inside a
    chunk are written to their bucket, chunk-boundary partials (prefix /
    suffix) recurse to the next level with 2/CHUNK_K the size. Work is
    ~nwin*N mixed adds + O(N/K) complete adds regardless of how skewed the
    digit histogram is — a per-bucket offset walk would degenerate to
    O(max segment) sequential steps (the top window of a field scalar puts
    half the points into bucket 1; equal-scalar MSMs put ALL of them there).
    """
    o = spec.ops
    X, Y, Z = pts
    N = X.shape[0]
    B = (1 << (c - 1)) + 1  # buckets 0..2^(c-1)
    inf_in = o.is_zero(Z)  # (N,) input points at infinity contribute 0

    digits = signed_digits(spec, scalars_std, c)  # (nwin, N)
    nwin = digits.shape[0]
    bucket = jnp.abs(digits).astype(jnp.int32)
    sign = digits < 0

    order, sortedb, sorted_sign, sorted_inf = _sort_by_bucket(
        bucket, sign, inf_in, c, N)

    acc = _bucket_accumulate(
        spec, order, sortedb, sorted_sign, sorted_inf, X, Y, B, nwin
    )

    buckets = tuple(x[:, 1:] for x in acc)
    wsums = _weighted_bucket_sum(spec, buckets)  # (nwin,) projective
    return ec.proj_to_jacobian(spec, _horner_combine(spec, wsums, c))


@functools.partial(jax.jit, static_argnums=(0, 3))
def _pippenger_wsums(spec: CurveSpec, pts, scalars_std, c: int):
    """Alternative split: device graph to per-window weighted bucket sums
    (bucket reduction as one Pallas launch), Horner on the host.

    MEASURED SLOWER than _pippenger_signed on v5e at 2^16/c=13 (the XLA
    scheduler overlaps the many small reduction dispatches with level-0
    compute, while the monolithic wreduce kernel serializes ~50K complete
    add-lanes per window); kept for profiling and as the building block
    for a future multi-chip reduction, not used by msm()."""
    from . import pallas_ec

    o = spec.ops
    X, Y, Z = pts
    N = X.shape[0]
    B = (1 << (c - 1)) + 1
    inf_in = o.is_zero(Z)
    digits = signed_digits(spec, scalars_std, c)
    nwin = digits.shape[0]
    bucket = jnp.abs(digits).astype(jnp.int32)
    sign = digits < 0
    order, sortedb, sorted_sign, sorted_inf = _sort_by_bucket(
        bucket, sign, inf_in, c, N)
    acc = _bucket_accumulate(
        spec, order, sortedb, sorted_sign, sorted_inf, X, Y, B, nwin)
    buckets = tuple(x[:, 1:] for x in acc)
    return pallas_ec.weighted_bucket_sum(spec, buckets)


def _host_horner(spec: CurveSpec, wsums, c: int):
    """sum_w 2^(c*w) W_w on the host: the window sums are a ~4 KB fetch,
    and the python-int ladder beats dispatching c*(nwin-1) sequential
    1-lane doubling kernels by ~50 ms per MSM. wsums are projective."""
    from . import host

    pts = ec.decode_points(spec, ec.proj_to_jacobian(spec, wsums))
    hc = host.host_curve(spec)
    acc = None
    for pt in reversed(pts):
        if acc is not None:
            for _ in range(c):
                acc = hc.double(acc)
        acc = hc.add(acc, hc.lift_affine(pt))
    single = ec.encode_points(spec, [hc.affine_ints(acc)])
    return tuple(x[0] for x in single)


def _weighted_bucket_sum(spec: CurveSpec, buckets):
    """sum_{j} (j+1) * buckets[:, j] per window (projective points).

    Weight-split decomposition: with j = H*hi + lo (buckets reshaped to
    (nwin, L, H) row-major? no: (nwin, L, H) with j = H*l + h):
      sum (H*l + h + 1) S[l,h] = H * sum_l l*R_l + sum_h (h+1)*C_h
    where R_l / C_h are row/column tree-sums. Cost ~2*B complete adds per
    window instead of the 2*B*log B of a direct double-suffix ladder.
    """
    nwin, W = buckets[0].shape[:2]
    if W & (W - 1):
        raise ValueError("bucket width must be a power of two")
    H = 1 << ((W - 1).bit_length() // 2)
    L = W // H
    s = tuple(x.reshape((nwin, L, H) + x.shape[2:]) for x in buckets)

    def tree_sum(pts, axis):
        m = pts[0].shape[axis]
        while m > 1:
            half = m // 2
            lo = tuple(jax.lax.slice_in_dim(x, 0, half, axis=axis)
                       for x in pts)
            hi = tuple(jax.lax.slice_in_dim(x, half, m, axis=axis)
                       for x in pts)
            pts = ec.proj_add(spec, lo, hi)
            m = half
        return tuple(jnp.squeeze(x, axis=axis) for x in pts)

    rows = tree_sum(s, 2)  # (nwin, L): R_l = sum_h S[l, h]
    cols = tree_sum(s, 1)  # (nwin, H): C_h = sum_l S[l, h]
    # sum_h (h+1) C_h : double suffix ladder on width H
    w2 = tuple(x[:, 0] for x in _suffix_sums(
        spec, _suffix_sums(spec, cols)))
    # sum_l l * R_l : drop l=0 then double suffix ladder
    rows1 = tuple(x[:, 1:] for x in rows)
    w1 = tuple(x[:, 0] for x in _suffix_sums(
        spec, _suffix_sums(spec, rows1)))
    for _ in range(H.bit_length() - 1):  # * H
        w1 = ec.proj_double(spec, w1)
    return ec.proj_add(spec, w1, w2)


def _level0_mode() -> str:
    """Level-0 implementation: "mega" (one pallas megakernel, the TPU
    default), "mega-interp" (megakernel in pallas interpret mode — CPU
    correctness tests), or "xla" (the K-dispatch fori_loop formulation,
    the CPU default)."""
    import os

    mode = os.environ.get("COSNARKS_MSM_L0", "auto")
    if mode != "auto":
        return mode
    try:
        return "mega" if jax.default_backend() != "cpu" else "xla"
    except Exception:  # pragma: no cover
        return "xla"


def _level0_accumulate(spec: CurveSpec, order, sortedb, sorted_sign,
                       sorted_inf, X, Y, B: int, nwin: int):
    """Scatter-free first level: fold K sorted points per chunk with the
    fused mixed-add, dumping the running sum densely per step; interior
    bucket sums are read back with one gather (positions from
    searchsorted). Returns the (prefix, suffix) boundary stream for the
    next level plus the partially-filled bucket array."""
    o = spec.ops
    K = CHUNK_K
    N = order.shape[1]
    pad = -N % K
    if pad:
        # padded entries carry bucket id B (beyond every real bucket, and
        # outside the searchsorted range) so they only ever form trailing
        # dropped segments
        sortedb = jnp.concatenate(
            [sortedb, jnp.full((nwin, pad), B, sortedb.dtype)], axis=1)
        order = jnp.concatenate(
            [order, jnp.zeros((nwin, pad), order.dtype)], axis=1)
        sorted_sign = jnp.concatenate(
            [sorted_sign, jnp.zeros((nwin, pad), bool)], axis=1)
        sorted_inf = jnp.concatenate(
            [sorted_inf, jnp.ones((nwin, pad), bool)], axis=1)
        N += pad
    C = N // K
    w_idx = jnp.arange(nwin, dtype=jnp.int32)[:, None]

    keys3 = sortedb.reshape(nwin, C, K)
    pos3 = order.reshape(nwin, C, K)
    sgn3 = sorted_sign.reshape(nwin, C, K)
    inf3 = sorted_inf.reshape(nwin, C, K)
    first_key = keys3[:, :, 0]

    mode = _level0_mode()
    if mode in ("mega", "mega-interp") and spec.ops.coord_ndim == 1:
        from . import pallas_ec

        L = nwin * C
        if pallas_ec.lm_geometry(L) is not None:
            ncoord = X.shape[-1]
            NP = X.shape[0]
            keysT = keys3.transpose(2, 0, 1).reshape(K, L)
            flat = pos3.transpose(2, 0, 1).reshape(-1)
            sgnT = sgn3.transpose(2, 0, 1).reshape(-1)
            # The random point gather is HBM-latency-bound (~150 ms/GB
            # at 2^20 regardless of layout — measured equal for row- and
            # limb-major), so HALVE its volume: pack two 16-bit limbs
            # per u32 before gathering; the megakernel unpacks on the
            # VPU. The sign select is folded into the gather: the source
            # holds [Y ; -Y] and negative digits index the second half.
            if ncoord % 2 == 0:
                def pack2(a):  # (N, n) -> (N, n//2)
                    return a[:, 0::2] | (a[:, 1::2] << 16)
            else:  # odd limb count: kernel expects unpacked slabs
                def pack2(a):
                    return a

            nc2 = -(-ncoord // 2) if ncoord % 2 == 0 else ncoord
            qx = jnp.take(pack2(X), flat, axis=0).T.reshape(nc2, K, L)
            ycat = jnp.concatenate([pack2(Y), pack2(o.neg(Y))], axis=0)
            qy = jnp.take(
                ycat, flat + sgnT * NP, axis=0).T.reshape(nc2, K, L)
            valid = ~inf3.transpose(2, 0, 1).reshape(K, L)
            changed = jnp.concatenate(
                [jnp.zeros((1, L), bool), keysT[1:] != keysT[:-1]], axis=0)
            # prefix saved when a segment that STARTED the chunk ends:
            # cur_key_{t-1} == first_key (t = 0 never fires: changed_0=F)
            isfirst = jnp.concatenate(
                [jnp.ones((1, L), bool), keysT[:-1] == keysT[0:1]], axis=0)
            flags = (changed.astype(jnp.uint32)
                     | (valid.astype(jnp.uint32) << 1)
                     | ((changed & isfirst).astype(jnp.uint32) << 2))
            buf, run, prefix = pallas_ec.level0_fold(
                spec, qx, qy, flags, K,
                interpret=(mode == "mega-interp"))
            buf = tuple(x.reshape(ncoord, K, nwin, C) for x in buf)
            run = tuple(
                x.reshape(ncoord, nwin, C).transpose(1, 2, 0)
                for x in run)
            prefix = tuple(
                x.reshape(ncoord, nwin, C).transpose(1, 2, 0)
                for x in prefix)
            cur_key = keysT[K - 1].reshape(nwin, C)
            return _level0_tail(spec, sortedb, buf, run, prefix,
                                first_key, cur_key, B, nwin, K, w_idx,
                                limb_major_buf=True)

    buf = ec.proj_point_inf(spec, (K, nwin, C))

    def step(t, state):
        run, cur_key, prefix, buf = state
        k = jax.lax.dynamic_index_in_dim(keys3, t, axis=2, keepdims=False)
        pos = jax.lax.dynamic_index_in_dim(pos3, t, axis=2, keepdims=False)
        flat = pos.reshape(-1)
        qx = jnp.take(X, flat, axis=0).reshape((nwin, C) + X.shape[1:])
        qy = jnp.take(Y, flat, axis=0).reshape((nwin, C) + Y.shape[1:])
        sgn = jax.lax.dynamic_index_in_dim(sgn3, t, axis=2, keepdims=False)
        qy = o.select(sgn, o.neg(qy), qy)
        v_valid = ~jax.lax.dynamic_index_in_dim(
            inf3, t, axis=2, keepdims=False)
        one = o.one_like(qx)
        zero = o.zeros_like(one)
        # fresh segment start: Q lifted to projective (x, y, 1), or the
        # identity (0, 1, 0) for infinity input points
        v_pt = (o.select(v_valid, qx, zero),
                o.select(v_valid, qy, one),
                o.select(v_valid, one, zero))
        changed = k != cur_key
        is_first = cur_key == first_key
        prefix = ec.select_point(spec, changed & is_first, run, prefix)
        # dump the running sum at slot t; a segment ending at sorted
        # position e is read back from slot ((e % K) + 1, e // K)
        buf = tuple(
            jax.lax.dynamic_update_index_in_dim(bc, rc, t, axis=0)
            for bc, rc in zip(buf, run))
        grown = ec.proj_madd(spec, run, (qx, qy), ~changed & v_valid)
        run = ec.select_point(spec, changed, v_pt, grown)
        return run, k, prefix, buf

    init = (ec.proj_point_inf(spec, (nwin, C)), first_key,
            ec.proj_point_inf(spec, (nwin, C)), buf)
    run, cur_key, prefix, buf = jax.lax.fori_loop(0, K, step, init)
    return _level0_tail(spec, sortedb, buf, run, prefix, first_key,
                        cur_key, B, nwin, K, w_idx)


_HIST_RADIX = 64


def _bucket_bounds(sortedb, B: int):
    """searchsorted(sortedb, arange(B), left/right) without binary search.

    The vmapped two-sided searchsorted on (nwin, N) keys measured ~54 ms
    per 2^16 MSM on v5e (binary-search while loops + per-probe gathers) —
    more than the entire level-0 fold kernel. Replacement: exact bucket
    histogram via a one-hot x one-hot MXU matmul (counts <= N < 2^24 are
    exact in f32), then starts = exclusive cumsum, ends = starts + counts.
    ~1 ms for the same shapes, and the only MXU use in the MSM.
    """
    nwin, N = sortedb.shape
    R = _HIST_RADIX
    nhi = -(-(B + 1) // R)  # ids 0..B (B = padding sentinel)
    hi = sortedb >> np.int32(R.bit_length() - 1)
    lo = sortedb & np.int32(R - 1)
    oh_hi = (hi[..., None] == jnp.arange(nhi, dtype=jnp.int32)).astype(
        jnp.bfloat16)
    oh_lo = (lo[..., None] == jnp.arange(R, dtype=jnp.int32)).astype(
        jnp.bfloat16)
    hist = jnp.einsum("wnh,wnl->whl", oh_hi, oh_lo,
                      preferred_element_type=jnp.float32)
    counts = hist.reshape(nwin, nhi * R)[:, :B].astype(jnp.int32)
    starts = jnp.cumsum(counts, axis=1) - counts
    return starts, starts + counts


def _level0_tail(spec: CurveSpec, sortedb, buf, run, prefix, first_key,
                 cur_key, B: int, nwin: int, K: int, w_idx,
                 limb_major_buf: bool = False, prev_buckets=None):
    """Shared fold-level epilogue: single-segment prefix fix, interior-
    segment readback from the dense buffer, boundary (prefix, suffix)
    stream. Interior segments are disjoint across levels (a segment fully
    inside one chunk never reaches the next level's stream), so later
    levels merge into `prev_buckets` by select.

    buf: (K, nwin, C, ncoord) batch-last, or (ncoord, K, nwin, C) when
    limb_major_buf (the megakernel's native layout)."""
    single = cur_key == first_key
    prefix = ec.select_point(spec, single, run, prefix)

    # interior-segment placement from the sorted keys
    starts, ends = _bucket_bounds(sortedb, B)
    end_idx = ends - 1
    interior = ((ends > starts) & (starts // K == end_idx // K)
                & (starts % K != 0) & (end_idx % K != K - 1))
    t_idx = jnp.where(interior, end_idx % K + 1, 0)
    c_idx = jnp.where(interior, end_idx // K, 0)
    if limb_major_buf:
        gathered = tuple(
            bc[:, t_idx, w_idx, c_idx].transpose(1, 2, 0) for bc in buf)
    else:
        gathered = tuple(bc[t_idx, w_idx, c_idx] for bc in buf)
    if prev_buckets is None:
        prev_buckets = ec.proj_point_inf(spec, (nwin, B))
    buckets = ec.select_point(spec, interior, gathered, prev_buckets)

    C = first_key.shape[1]
    suf_key = jnp.where(single, first_key, cur_key)
    suffix = ec.select_point(
        spec, single, ec.proj_point_inf(spec, (nwin, C)), run)
    keys = jnp.stack([first_key, suf_key], axis=2).reshape(nwin, 2 * C)
    vals = tuple(
        jnp.stack([p, s], axis=2).reshape((nwin, 2 * C) + p.shape[2:])
        for p, s in zip(prefix, suffix))
    return {"keys": keys, "vals": vals, "buckets": buckets}


def _bucket_accumulate(spec: CurveSpec, order, sortedb, sorted_sign,
                       sorted_inf, X, Y, B: int, nwin: int):
    """Chunked segmented reduction of sorted (bucket, point) streams into
    (nwin, B) Jacobian bucket sums. See _pippenger_signed docstring.

    Level 0 (the whole-input level) is scatter-free: the running sum is
    dumped densely into a (K, nwin, C) buffer each step, and interior
    segments — those fully inside one chunk, i.e. whose start is in the
    same chunk at a non-chunk-start offset and whose end is not the
    chunk's last slot — are read back with ONE gather at positions
    computed from searchsorted (the completed run for a segment ending at
    sorted position e sits in buffer slot ((e % K) + 1, e // K)). Per-step
    bucket scatters cost as much as the point additions themselves on TPU;
    the dense dump + gather replaces 32 scatters with cheap
    dynamic_update_slices.

    Later levels fold the 2-per-chunk (prefix, suffix) boundary streams —
    geometrically shrinking — through the same fold megakernel with
    projective stream values (TPU), falling back to a fori_loop with
    scatter-set writes (CPU / Fq2).
    """
    K = CHUNK_K
    state0 = _level0_accumulate(spec, order, sortedb, sorted_sign,
                                sorted_inf, X, Y, B, nwin)
    keys, vals, buckets = state0["keys"], state0["vals"], state0["buckets"]

    mode = _level0_mode()
    if mode in ("mega", "mega-interp") and spec.ops.coord_ndim == 1:
        from . import pallas_ec

        while True:
            C = -(-keys.shape[1] // K)
            if C == 1 or pallas_ec.lm_geometry(nwin * C) is None:
                break
            keys, vals, buckets = _fold_level_mega(
                spec, keys, vals, buckets, B, nwin, K,
                interpret=(mode == "mega-interp"))
    return _fold_levels_xla(spec, keys, vals, buckets, B, nwin)


def _fold_level_mega(spec: CurveSpec, keys, vals, buckets, B: int,
                     nwin: int, K: int, interpret: bool):
    """One boundary-stream fold level through the projective megakernel:
    pad to a K multiple, build step-major limb-major slabs, run the fused
    fold, merge interior segments into `buckets`, emit the next stream."""
    from . import pallas_ec

    n = spec.ops.field.nlimbs
    M = keys.shape[1]
    Mp = -(-M // K) * K
    if Mp != M:
        keys = jnp.concatenate(
            [keys, jnp.full((nwin, Mp - M), B, keys.dtype)], axis=1)
        inf = ec.proj_point_inf(spec, (nwin, Mp - M))
        vals = tuple(
            jnp.concatenate([v, i], axis=1) for v, i in zip(vals, inf))
    C = Mp // K
    L = nwin * C
    w_idx = jnp.arange(nwin, dtype=jnp.int32)[:, None]
    keys3 = keys.reshape(nwin, C, K)
    keysT = keys3.transpose(2, 0, 1).reshape(K, L)
    first_key = keys3[:, :, 0]
    # slabs (n, K, L): slab[:, t, w*C + c] = vals[w, c*K + t]
    slabs = tuple(
        v.reshape(nwin, C, K, n).transpose(3, 2, 0, 1).reshape(n, K, L)
        for v in vals)
    valid = jnp.any(vals[2] != 0, axis=-1)  # identity entries: Z == 0
    validT = valid.reshape(nwin, C, K).transpose(2, 0, 1).reshape(K, L)
    changed = jnp.concatenate(
        [jnp.zeros((1, L), bool), keysT[1:] != keysT[:-1]], axis=0)
    isfirst = jnp.concatenate(
        [jnp.ones((1, L), bool), keysT[:-1] == keysT[0:1]], axis=0)
    flags = (changed.astype(jnp.uint32)
             | (validT.astype(jnp.uint32) << 1)
             | ((changed & isfirst).astype(jnp.uint32) << 2))
    buf, run, prefix = pallas_ec.proj_fold(
        spec, slabs[0], slabs[1], slabs[2], flags, K, interpret=interpret)
    buf = tuple(x.reshape(n, K, nwin, C) for x in buf)
    run = tuple(x.reshape(n, nwin, C).transpose(1, 2, 0) for x in run)
    prefix = tuple(
        x.reshape(n, nwin, C).transpose(1, 2, 0) for x in prefix)
    cur_key = keysT[K - 1].reshape(nwin, C)
    st = _level0_tail(spec, keys, buf, run, prefix, first_key, cur_key,
                      B, nwin, K, w_idx, limb_major_buf=True,
                      prev_buckets=buckets)
    return st["keys"], st["vals"], st["buckets"]


def _fold_levels_xla(spec: CurveSpec, keys, vals, buckets, B: int,
                     nwin: int):
    """Boundary-stream folding to completion with fori_loop steps and
    scatter-set bucket writes (the non-megakernel path, and the final
    C == 1 level of the megakernel path)."""
    K = CHUNK_K
    w_idx = jnp.arange(nwin, dtype=jnp.int32)[:, None]

    while True:
        M = keys.shape[1]
        Mp = -(-M // K) * K
        if Mp != M:
            keys = jnp.concatenate(
                [keys, jnp.full((nwin, Mp - M), B, keys.dtype)], axis=1)
            inf = ec.proj_point_inf(spec, (nwin, Mp - M))
            vals = tuple(
                jnp.concatenate([v, i], axis=1)
                for v, i in zip(vals, inf)
            )
        C = Mp // K
        keys3 = keys.reshape(nwin, C, K)
        vals3 = tuple(v.reshape((nwin, C, K) + v.shape[2:]) for v in vals)
        first_key = keys3[:, :, 0]

        def step(t, state, keys3=keys3, vals3=vals3, first_key=first_key,
                 C=C):
            run, cur_key, prefix, buckets = state
            k = jax.lax.dynamic_index_in_dim(keys3, t, axis=2,
                                             keepdims=False)
            v_jac = tuple(
                jax.lax.dynamic_index_in_dim(x, t, axis=2, keepdims=False)
                for x in vals3)
            v_valid = ~spec.ops.is_zero(v_jac[2])
            changed = k != cur_key
            is_first = cur_key == first_key
            prefix = ec.select_point(spec, changed & is_first, run, prefix)
            flush = changed & ~is_first
            widx = jnp.where(flush, cur_key, B)  # B drops
            buckets = tuple(
                bc.at[w_idx, widx].set(rc, mode="drop")
                for bc, rc in zip(buckets, run)
            )
            addend = ec.select_point(
                spec, ~changed & v_valid, v_jac,
                ec.proj_point_inf(spec, v_jac[0].shape[:2]))
            grown = ec.proj_add(spec, run, addend)
            run = ec.select_point(spec, changed, v_jac, grown)
            return run, k, prefix, buckets

        init = (ec.proj_point_inf(spec, (nwin, C)), first_key,
                ec.proj_point_inf(spec, (nwin, C)), buckets)
        run, cur_key, prefix, buckets = jax.lax.fori_loop(
            0, K, step, init)

        single = cur_key == first_key
        prefix = ec.select_point(spec, single, run, prefix)
        if C == 1:
            # final: write the outermost prefix/suffix partials
            pmask = first_key < B
            pidx = jnp.where(pmask, first_key, B)
            buckets = tuple(
                bc.at[w_idx, pidx].set(pc, mode="drop")
                for bc, pc in zip(buckets, prefix)
            )
            smask = ~single & (cur_key < B)
            sidx = jnp.where(smask, cur_key, B)
            buckets = tuple(
                bc.at[w_idx, sidx].set(rc, mode="drop")
                for bc, rc in zip(buckets, run)
            )
            return buckets
        # emit (prefix, suffix) per chunk, ascending keys preserved;
        # single-segment chunks emit an identity suffix on the same key
        suf_key = jnp.where(single, first_key, cur_key)
        suffix = ec.select_point(
            spec, single, ec.proj_point_inf(spec, (nwin, C)), run)
        keys = jnp.stack([first_key, suf_key], axis=2).reshape(nwin, 2 * C)
        vals = tuple(
            jnp.stack([p, s], axis=2).reshape((nwin, 2 * C) + p.shape[2:])
            for p, s in zip(prefix, suffix)
        )


def _suffix_sums(spec: CurveSpec, pts):
    """suffix[i] = sum_{j >= i} pts[j] along axis 1, log-depth shift-adds
    (projective points, identity padding)."""
    width = pts[0].shape[1]
    inf = ec.proj_point_inf(spec, pts[0].shape[:1] + (width,))
    s = 1
    while s < width:
        shifted = tuple(
            jnp.concatenate([x[:, s:], i[:, :s]], axis=1)
            for x, i in zip(pts, inf)
        )
        pts = ec.proj_add(spec, pts, shifted)
        s *= 2
    return pts


@functools.partial(jax.jit, static_argnums=(0, 2))
def _horner_combine(spec: CurveSpec, window_sums, c: int):
    """sum_w 2^(c*w) W_w, scanning from the top window down (projective
    in, projective out). One fused [2^c]acc + W kernel launch per window
    on TPU (dispatch-bound at 1-lane shapes otherwise)."""
    rev = tuple(x[::-1] for x in window_sums)

    def body(acc, w):
        acc = jax.lax.fori_loop(
            0, c, lambda _, a: ec.proj_double(spec, a), acc)
        return ec.proj_add(spec, acc, w), None

    top = tuple(x[0] for x in rev)
    rest = tuple(x[1:] for x in rev)
    out, _ = jax.lax.scan(body, top, rest)
    return out


@functools.partial(jax.jit, static_argnums=0)
def _msm_small(spec: CurveSpec, points, scalars_std):
    """Direct MSM for tiny N: batched double-and-add + log-depth tree sum.

    Avoids the Pippenger machinery whose per-window graphs dominate compile
    time when N is small (e.g. the handful-of-points query MSMs in Groth16
    test circuits)."""
    acc = ec.scalar_mul(spec, points, scalars_std)
    n = points[0].shape[0]
    while n > 1:
        half = (n + 1) // 2
        lo = tuple(x[:half] for x in acc)
        hi = tuple(x[half : 2 * half] for x in acc)
        if hi[0].shape[0] < half:
            pad = half - hi[0].shape[0]
            inf = ec.point_inf(spec, (pad,))
            hi = tuple(
                jnp.concatenate([h, jnp.broadcast_to(i, (pad,) + h.shape[1:])])
                for h, i in zip(hi, inf)
            )
        acc = ec.add(spec, lo, hi)
        n = half
    return tuple(x[0] for x in acc)


def default_window(n: int) -> int:
    """Balance accumulation (nwin*N mixed adds + gather bytes) vs
    reduction (~2*nwin*B projective adds). Measured on v5e (projective
    pipeline): 2^20 prefers c=15 (1286 -> 845 ms vs c=13)."""
    if n >= 1 << 19:
        return 15
    if n >= 1 << 16:
        return 13
    if n >= 1 << 13:
        return 10
    return 8


def msm(spec: CurveSpec, points, scalars_std, c: int | None = None,
        chunk: int | None = None):
    """MSM of device Jacobian `points` (leading axis N, affine-or-infinity:
    Z in {0, 1}) with standard-form scalar limb arrays (N, nlimbs).
    Returns a single Jacobian point. `chunk` bounds the number of points
    per Pippenger dispatch: the level-0 accumulation's dense run buffers
    scale with N x windows x coords, which exhausts HBM for G2 (Fq2) at
    2^20 points — chunks split the sum and combine with complete adds."""
    N = points[0].shape[0]
    if N <= 64:
        return _msm_small(spec, points, scalars_std)
    if chunk is None and spec.ops.coord_ndim > 1:
        chunk = 1 << 18  # G2 default: bound the dense bucket buffers
    if chunk is not None and N > chunk:
        from . import curve as _ec

        acc = None
        for lo in range(0, N, chunk):
            part = msm(spec,
                       tuple(x[lo:lo + chunk] for x in points),
                       scalars_std[lo:lo + chunk], c=c, chunk=None)
            acc = part if acc is None else _ec.add(spec, acc, part)
        return acc
    if c is None:
        c = default_window(N)
    return _pippenger_signed(spec, points, scalars_std, c)
