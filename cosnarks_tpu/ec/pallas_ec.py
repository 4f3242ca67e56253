"""Fused Pallas kernels for Jacobian point add/double (G1 / prime-field
coordinates).

One kernel executes the complete add (12 Montgomery muls + edge handling)
with every intermediate held in vector registers/VMEM — versus ~12 separate
HBM-roundtripping kernels on the XLA path. The group-law code is the SAME
generic `curve.add`/`curve.double` used everywhere; it runs inside the
kernel over a lane-vector field-ops backend (`LaneOps`), so there is a
single source of truth for the formulas.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..ff import pallas_mont as pm
from ..ff.spec import Field
from . import curve as ec
from .curve import CurveSpec


class LaneOps:
    """Field ops on elements represented as tuples of (TILE,) lane vectors.

    Only valid inside a Pallas kernel body (or any trace where elements are
    per-limb vectors)."""

    coord_ndim = 1

    def __init__(self, field: Field):
        self.field = field

    def mul(self, a, b):
        return tuple(pm.mont_mul_lanes(self.field, list(a), list(b)))

    def mulstack(self, xs, ys):
        return tuple(self.mul(x, y) for x, y in zip(xs, ys))

    def sqr(self, a):
        return self.mul(a, a)

    def add(self, a, b):
        return tuple(pm.add_lanes(self.field, list(a), list(b)))

    def sub(self, a, b):
        return tuple(pm.sub_lanes(self.field, list(a), list(b)))

    def neg(self, a):
        zero = [jnp.zeros_like(x) for x in a]
        return tuple(pm.sub_lanes(self.field, zero, list(a)))

    def double(self, a):
        return self.add(a, a)

    def is_zero(self, a):
        z = a[0] == 0
        for limb in a[1:]:
            z = z & (limb == 0)
        return z

    def zeros_like(self, a):
        return tuple(jnp.zeros_like(x) for x in a)

    def one_like(self, a):
        return tuple(
            jnp.full_like(x, np.uint32(c))
            for x, c in zip(a, self.field.one_mont)
        )

    def select(self, mask, a, b):
        return tuple(jnp.where(mask, x, y) for x, y in zip(a, b))

    def __hash__(self):
        return hash(("lane", self.field))

    def __eq__(self, other):
        return type(other) is LaneOps and other.field == self.field


@functools.lru_cache(maxsize=None)
def _lane_spec(spec: CurveSpec) -> CurveSpec:
    return CurveSpec(
        spec.name + "_lanes", LaneOps(spec.ops.field), spec.scalar_field,
        spec.b, spec.generator,
    )


def _load(ref, n):
    t = ref[:].T
    return tuple(t[i] for i in range(n))


def _store(ref, limbs):
    ref[:] = jnp.stack(limbs, axis=0).T


@functools.lru_cache(maxsize=None)
def _add_call(spec: CurveSpec, total: int, tile: int):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n = spec.ops.field.nlimbs
    kspec = _lane_spec(spec)

    def kernel(x1, y1, z1, x2, y2, z2, ox, oy, oz):
        P = (_load(x1, n), _load(y1, n), _load(z1, n))
        Q = (_load(x2, n), _load(y2, n), _load(z2, n))
        X3, Y3, Z3 = ec.add(kspec, P, Q)
        _store(ox, X3)
        _store(oy, Y3)
        _store(oz, Z3)

    bspec = pl.BlockSpec((tile, n), lambda i: (i, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(total // tile,),
        in_specs=[bspec] * 6,
        out_specs=(bspec,) * 3,
        out_shape=tuple(
            jax.ShapeDtypeStruct((total, n), jnp.uint32) for _ in range(3)
        ),
    )


@functools.lru_cache(maxsize=None)
def _double_call(spec: CurveSpec, total: int, tile: int):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n = spec.ops.field.nlimbs
    kspec = _lane_spec(spec)

    def kernel(x1, y1, z1, ox, oy, oz):
        P = (_load(x1, n), _load(y1, n), _load(z1, n))
        X3, Y3, Z3 = ec.double(kspec, P)
        _store(ox, X3)
        _store(oy, Y3)
        _store(oz, Z3)

    bspec = pl.BlockSpec((tile, n), lambda i: (i, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(total // tile,),
        in_specs=[bspec] * 3,
        out_specs=(bspec,) * 3,
        out_shape=tuple(
            jax.ShapeDtypeStruct((total, n), jnp.uint32) for _ in range(3)
        ),
    )


@functools.lru_cache(maxsize=None)
def _madd_call(spec: CurveSpec, total: int, tile: int, masked: bool):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n = spec.ops.field.nlimbs
    kspec = _lane_spec(spec)

    def kernel(*refs):
        if masked:
            x1, y1, z1, x2, y2, vm, ox, oy, oz = refs
        else:
            x1, y1, z1, x2, y2, ox, oy, oz = refs
            vm = None
        P = (_load(x1, n), _load(y1, n), _load(z1, n))
        Q = (_load(x2, n), _load(y2, n))
        valid = None if vm is None else (vm[:].T[0] != 0)
        X3, Y3, Z3 = ec.madd(kspec, P, Q, valid)
        _store(ox, X3)
        _store(oy, Y3)
        _store(oz, Z3)

    bspec = pl.BlockSpec((tile, n), lambda i: (i, 0), memory_space=pltpu.VMEM)
    n_in = 6 if masked else 5
    return pl.pallas_call(
        kernel,
        grid=(total // tile,),
        in_specs=[bspec] * n_in,
        out_specs=(bspec,) * 3,
        out_shape=tuple(
            jax.ShapeDtypeStruct((total, n), jnp.uint32) for _ in range(3)
        ),
    )


@functools.lru_cache(maxsize=None)
def _wreduce_call(spec: CurveSpec, nwin: int, W: int):
    """One grid cell per window: load that window's W bucket points as
    (8, W/8) limb tiles, compute  sum_j (j+1) * S_j  entirely in VMEM,
    store one Jacobian point (padded to an (8, n) block).

    Replaces the XLA-level msm._weighted_bucket_sum whose ~70 shrinking
    batched-add dispatches are dominated by per-dispatch latency, not by
    the ~2B complete adds of math. Weight-split identity with j = H*l + h:
      sum_j (j+1) S_j = H * sum_l l*R_l + sum_h (h+1)*C_h
    and both weighted sums come from DOUBLE SUFFIX ladders
    (sum_h (h+1) C_h = U_0,  sum_l l*R_l = U_1,  U = suffix(suffix(.))),
    implemented as fori_loops over dynamic-shift rolls so the kernel has
    ~10 group-op callsites regardless of W (unrolled trees took Mosaic
    minutes per callsite to compile).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n = spec.ops.field.nlimbs
    kspec = _lane_spec(spec)
    L = 8
    H = W // L

    def ladder(pts, width, shape):
        """suffix[j] = sum_{j' >= j} pts[j'] along the lane axis.

        Wide (lane-aligned) ladders run as a fori_loop over dynamic-shift
        rolls — one add callsite for all log2(width) levels (Mosaic takes
        minutes per unrolled complete-add callsite). Narrow ladders
        (tpu.dynamic_rotate rejects lane dims not multiple of 128) unroll
        with static rolls."""
        idx = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
        zero = tuple(jnp.zeros(shape, jnp.uint32) for _ in range(n))
        # projective identity (0 : 1 : 0)
        inf = (zero, kspec.ops.one_like(zero), zero)
        nlev = max(1, (width - 1).bit_length())

        def shifted_add(pts, s, amount):
            keep = idx < (jnp.int32(width) - s)
            shifted = tuple(
                tuple(jnp.where(keep, pltpu.roll(x, amount, 1), i)
                      for x, i in zip(c, ic))
                for c, ic in zip(pts, inf))
            return ec.proj_add(kspec, pts, shifted)

        if shape[1] % 128 == 0:
            def body(t, pts):
                s = jnp.left_shift(jnp.int32(1), t)
                return shifted_add(pts, s, jnp.int32(width) - s)

            return jax.lax.fori_loop(0, nlev, body, pts)
        for t in range(nlev):
            pts = shifted_add(pts, jnp.int32(1 << t), width - (1 << t))
        return pts

    def kernel(bx, by, bz, ox, oy, oz):
        s = tuple(
            tuple(ref[0][i] for i in range(n)) for ref in (bx, by, bz))
        # C_h = sum_l S[l, h]: 3 static sublane-halving adds -> (1, H)
        cols = s
        m = L
        while m > 1:
            half = m // 2
            cols = ec.proj_add(
                kspec,
                tuple(tuple(x[:half] for x in c) for c in cols),
                tuple(tuple(x[half:m] for x in c) for c in cols))
            m = half
        # w2 = sum_h (h+1) C_h = U[0], U = suffix(suffix(C))
        u = ladder(ladder(cols, H, (1, H)), H, (1, H))
        w2 = tuple(tuple(x[0:1, 0:1] for x in c) for c in u)
        # R_l = sum_h S[l, h]: lane suffix ladder, first lane of each row
        rows = ladder(s, H, (L, H))
        rows = tuple(
            tuple(x[:, 0:1].reshape(1, L) for x in c) for c in rows)
        # w1 = sum_l l*R_l = U[1], U = suffix(suffix(R))
        u = ladder(ladder(rows, L, (1, L)), L, (1, L))
        w1 = tuple(tuple(x[0:1, 1:2] for x in c) for c in u)
        w1 = jax.lax.fori_loop(
            0, H.bit_length() - 1, lambda _, a: ec.proj_double(kspec, a),
            w1)
        X3, Y3, Z3 = ec.proj_add(kspec, w1, w2)
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, n), 1)
        for ref, limbs in ((ox, X3), (oy, Y3), (oz, Z3)):
            # (8, n) block: rows are sublane padding (Mosaic wants the
            # second-to-last block dim % 8); limbs placed via iota select
            # (concat of offset-mismatched tiny vectors doesn't lower),
            # lane broadcast first, sublane broadcast second
            acc = jnp.zeros((1, n), jnp.uint32)
            for i, limb in enumerate(limbs):
                acc = jnp.where(lane == i, jnp.broadcast_to(limb, (1, n)),
                                acc)
            ref[:] = jnp.broadcast_to(acc, (8, n))[None]

    bspec = pl.BlockSpec((1, n, L, H), lambda w: (w, 0, 0, 0),
                         memory_space=pltpu.VMEM)
    ospec = pl.BlockSpec((1, 8, n), lambda w: (w, 0, 0),
                         memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(nwin,),
        in_specs=[bspec] * 3,
        out_specs=(ospec,) * 3,
        out_shape=tuple(
            jax.ShapeDtypeStruct((nwin, 8, n), jnp.uint32)
            for _ in range(3)),
    )


def weighted_bucket_sum(spec: CurveSpec, buckets):
    """sum_j (j+1) * buckets[:, j] per window as ONE fused kernel launch.

    buckets: 3-tuple of (nwin, W, n) with W a power of two >= 64."""
    n = spec.ops.field.nlimbs
    nwin, W = buckets[0].shape[:2]
    blocks = tuple(
        x.reshape(nwin, 8, W // 8, n).transpose(0, 3, 1, 2)
        for x in buckets)
    out = _wreduce_call(spec, nwin, W)(*blocks)
    return tuple(x[:, 0, :] for x in out)  # 3-tuple of (nwin, n)


LM_LANES_MAX = 8192  # lanes per level-0 grid cell (VMEM-bounded)


def lm_geometry(L: int) -> tuple[int, int] | None:
    """(R, C) 2-D lane-block geometry for L lanes, or None if L does not
    tile cleanly (callers fall back to the XLA path). Limbs live as
    (R, C) full-sublane shapes: 1-D (tile,) limb vectors use 1 of 8
    sublanes per vreg, measured 6.6x slower (scripts/ubench_lm2.py)."""
    for C in (512, 256, 128):
        if L % C:
            continue
        rows = L // C
        if rows * C <= LM_LANES_MAX:
            # whole rows-dim in one block: legal for ANY rows value
            # (block dim == array dim satisfies the (8, 128) rule)
            return rows, C
        best = 0
        for R in range(8, LM_LANES_MAX // C + 1, 8):
            if rows % R == 0:
                best = R
        if best:
            return best, C
    return None


@functools.lru_cache(maxsize=None)
def _level0_call(spec: CurveSpec, L: int, K: int, R: int, C: int,
                 interpret: bool, proj_q: bool = False):
    """The MSM bucket-accumulation fold megakernel, limb-major.

    One pallas_call runs ALL K sequential fold steps for every lane: grid
    (cells, K) with t innermost, the running sum and prefix carried in
    VMEM scratch across the t-steps of a cell. Replaces K dispatched
    rounds of {gather, madd kernel, dense-buffer dynamic_update} whose
    per-dispatch overhead dominated level-0 (~60% of MSM wall time at
    2^16): operands arrive as pre-gathered limb-major slabs the pipeline
    DMA-streams, and the only compute is the fused complete add.

    Level 0 (proj_q=False): qx, qy affine slabs (n, 1, R, C), fused RCB
    complete mixed add. Later levels (proj_q=True): qx, qy, qz projective
    boundary-stream slabs, fused RCB complete general add (the stream
    carries identities for single-segment chunks, which the complete
    formulas absorb with no masking).

    Flags (1, R, C) uint32: bit0 = changed (new segment starts at t),
    bit1 = point valid, bit2 = save-prefix (segment that started the
    chunk ended). Outputs: buf (n, K, rows, C) running-sum dump
    (pre-update, slot t), run/prefix (n, rows, C) final per-lane states.
    rows = L // C.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n = spec.ops.field.nlimbs
    kspec = _lane_spec(spec)
    rows = L // C
    nq = 3 if proj_q else 2
    packed = not proj_q and n % 2 == 0  # level-0 q slabs: 2 limbs / u32

    def kernel(*refs):
        qrefs = refs[:nq]
        fl = refs[nq]
        bufx, bufy, bufz = refs[nq + 1: nq + 4]
        runo = refs[nq + 4: nq + 7]
        preo = refs[nq + 7: nq + 10]
        rx, ry, rz, px, py, pz = refs[nq + 10:]
        t = pl.program_id(1)

        @pl.when(t == 0)
        def _init():
            # projective identity = (0, 1, 0) in Montgomery form; the one()
            # constant is built limb-row-wise (array constants don't lower)
            zero_l = tuple(jnp.zeros((R, C), jnp.uint32)
                           for _ in range(n))
            one_l = kspec.ops.one_like(zero_l)
            for ref in (ry, py):
                _store_lm(ref, one_l)
            for ref in (rx, rz, px, pz):
                _store_lm(ref, zero_l)

        flags = fl[0]  # (R, C)
        changed = (flags & 1) != 0
        valid = (flags & 2) != 0
        save_prefix = (flags & 4) != 0

        run = (_load_lm(rx, n), _load_lm(ry, n), _load_lm(rz, n))
        if packed:
            # q slabs arrive 2 limbs per u32 (halves the dominant HBM
            # random-gather volume feeding this kernel); unpack on the VPU
            Q = []
            for q in qrefs:
                limbs = []
                for i in range(n // 2):
                    w = q[i, 0]
                    limbs.append(w & np.uint32(0xFFFF))
                    limbs.append(w >> 16)
                Q.append(tuple(limbs))
            Q = tuple(Q)
        else:
            Q = tuple(tuple(q[i, 0] for i in range(n)) for q in qrefs)

        # prefix capture (run BEFORE this step's fold)
        pre = (_load_lm(px, n), _load_lm(py, n), _load_lm(pz, n))
        pre = ec.select_point(kspec, save_prefix, run, pre)

        # dense dump of the pre-update running sum at slot t
        for ref, limbs in zip((bufx, bufy, bufz), run):
            for i in range(n):
                ref[i, 0] = limbs[i]

        one_l = kspec.ops.one_like(Q[0])
        zero_l = kspec.ops.zeros_like(one_l)
        if proj_q:
            # Q already projective (identities included); adding the
            # identity is a no-op under the complete formulas, so the
            # addend only needs masking on `changed` lanes
            addend = ec.select_point(
                kspec, ~changed & valid, Q, (zero_l, one_l, zero_l))
            grown = ec.proj_add(kspec, run, addend)
            v_pt = Q
        else:
            grown = ec.proj_madd(kspec, run, Q, ~changed & valid)
            # fresh segment start: run := Q lifted to projective
            # (x, y, 1), or the identity if the lane's point is infinity
            v_pt = (kspec.ops.select(valid, Q[0], zero_l),
                    kspec.ops.select(valid, Q[1], one_l),
                    kspec.ops.select(valid, one_l, zero_l))
        run = ec.select_point(kspec, changed, v_pt, grown)

        for ref, limbs in zip((rx, ry, rz), run):
            _store_lm(ref, limbs)
        for ref, limbs in zip((px, py, pz), pre):
            _store_lm(ref, limbs)
        for ref, limbs in zip(runo, run):
            _store_lm(ref, limbs)
        for ref, limbs in zip(preo, pre):
            _store_lm(ref, limbs)

    nqrow = n // 2 if packed else n
    qspec = pl.BlockSpec((nqrow, 1, R, C), lambda c, t: (0, t, c, 0),
                         memory_space=pltpu.VMEM)
    fspec = pl.BlockSpec((1, R, C), lambda c, t: (t, c, 0),
                         memory_space=pltpu.VMEM)
    bufspec = pl.BlockSpec((n, 1, R, C), lambda c, t: (0, t, c, 0),
                           memory_space=pltpu.VMEM)
    lanespec = pl.BlockSpec((n, R, C), lambda c, t: (0, c, 0),
                            memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(rows // R, K),
        in_specs=[qspec] * nq + [fspec],
        out_specs=(bufspec,) * 3 + (lanespec,) * 6,
        out_shape=tuple(
            jax.ShapeDtypeStruct((n, K, rows, C), jnp.uint32)
            for _ in range(3)
        ) + tuple(
            jax.ShapeDtypeStruct((n, rows, C), jnp.uint32)
            for _ in range(6)
        ),
        scratch_shapes=[pltpu.VMEM((n, R, C), jnp.uint32)
                        for _ in range(6)],
        # the fused complete-add body holds ~2n product columns of the
        # Montgomery pipeline live per mul — far over the 16 MB default
        # scoped-vmem limit at 8K lanes (v5e VMEM is 128 MB)
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )


def _load_lm(ref, n):
    return tuple(ref[i] for i in range(n))


def _store_lm(ref, limbs):
    for i, limb in enumerate(limbs):
        ref[i] = limb


def level0_fold(spec: CurveSpec, qx, qy, flags, K: int,
                interpret: bool = False):
    """Run the level-0 megakernel.

    qx, qy: (n2, K, L) limb-major pre-gathered, sign-applied point
    coords in step-major order, PACKED 2 limbs per u32 when the field's
    limb count is even (n2 = n//2, limb 2i in the low half); flags:
    (K, L) uint32 (bit0 changed, bit1 valid, bit2 save-prefix). Returns
    (buf (n, K, L) x3, run (n, L) x3, prefix (n, L) x3). Caller must
    check lm_geometry(L) is not None."""
    n = spec.ops.field.nlimbs
    n2, _, L = qx.shape
    R, C = lm_geometry(L)
    rows = L // C
    out = _level0_call(spec, L, K, R, C, interpret)(
        qx.reshape(n2, K, rows, C), qy.reshape(n2, K, rows, C),
        flags.reshape(K, rows, C))
    buf = tuple(x.reshape(n, K, L) for x in out[0:3])
    run = tuple(x.reshape(n, L) for x in out[3:6])
    prefix = tuple(x.reshape(n, L) for x in out[6:9])
    return buf, run, prefix


def proj_fold(spec: CurveSpec, qx, qy, qz, flags, K: int,
              interpret: bool = False):
    """Run the boundary-stream fold megakernel (later MSM levels).

    qx, qy, qz: (n, K, L) limb-major projective stream values in
    step-major order; flags as in level0_fold. Returns (buf, run, prefix)
    like level0_fold. Caller must check lm_geometry(L) is not None."""
    n, _, L = qx.shape
    R, C = lm_geometry(L)
    rows = L // C
    out = _level0_call(spec, L, K, R, C, interpret, proj_q=True)(
        qx.reshape(n, K, rows, C), qy.reshape(n, K, rows, C),
        qz.reshape(n, K, rows, C), flags.reshape(K, rows, C))
    buf = tuple(x.reshape(n, K, L) for x in out[0:3])
    run = tuple(x.reshape(n, L) for x in out[3:6])
    prefix = tuple(x.reshape(n, L) for x in out[6:9])
    return buf, run, prefix


@functools.lru_cache(maxsize=None)
def _proj_op_call(spec: CurveSpec, op: str, rows: int, R: int, C: int,
                  masked: bool):
    """Fused limb-major RCB projective point op over a flat lane batch.

    op: "add" (6 coord inputs), "madd" (5), "double" (3); masked appends
    one (rows, C) uint32 validity plane (madd only). Outputs 3 coords.
    Limb-major (n, rows, C) slabs: 1-D row-major tiles measured 6.6x
    slower (ff/pallas_mont.py geometry notes)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n = spec.ops.field.nlimbs
    kspec = _lane_spec(spec)
    n_coord = {"add": 6, "madd": 5, "double": 3}[op]

    def kernel(*refs):
        coords = [tuple(r[i] for i in range(n)) for r in refs[:n_coord]]
        extra = refs[n_coord:-3]
        ox, oy, oz = refs[-3:]
        if op == "add":
            res = ec.proj_add(kspec, tuple(coords[:3]), tuple(coords[3:]))
        elif op == "madd":
            valid = (extra[0][:] != 0) if masked else None
            res = ec.proj_madd(kspec, tuple(coords[:3]),
                               tuple(coords[3:5]), valid)
        else:
            res = ec.proj_double(kspec, tuple(coords[:3]))
        for r, limbs in zip((ox, oy, oz), res):
            for i in range(n):
                r[i] = limbs[i]

    cspec = pl.BlockSpec((n, R, C), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM)
    mspec = pl.BlockSpec((R, C), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)
    in_specs = [cspec] * n_coord + ([mspec] if masked else [])
    return pl.pallas_call(
        kernel,
        grid=(rows // R,),
        in_specs=in_specs,
        out_specs=(cspec,) * 3,
        out_shape=tuple(
            jax.ShapeDtypeStruct((n, rows, C), jnp.uint32)
            for _ in range(3)),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )


def _lm_pack(coords, n):
    """(batch..., n) coord arrays -> limb-major (n, rows, C) + geometry."""
    shape = coords[0].shape[:-1]
    total = max(1, int(np.prod(shape, dtype=np.int64)))
    C = 512 if total >= 512 else 128
    rows = -(-total // C)
    R = min(16, max(8, 1 << (rows - 1).bit_length()))
    pad = rows * C - total
    rpad = -rows % R
    flat = []
    for c in coords:
        f = c.reshape(total, n)
        if pad:
            f = jnp.concatenate([f, jnp.zeros((pad, n), jnp.uint32)])
        f = f.T.reshape(n, rows, C)
        if rpad:
            f = jnp.concatenate(
                [f, jnp.zeros((n, rpad, C), jnp.uint32)], axis=1)
        flat.append(f)
    return flat, shape, total, R, C, rows + rpad


def _lm_unpack(out, shape, total, n):
    return tuple(
        o.reshape(n, -1).T[:total].reshape(shape + (n,)) for o in out)


def proj_add(spec: CurveSpec, P, Q):
    n = spec.ops.field.nlimbs
    flat, shape, total, R, C, rows = _lm_pack(list(P) + list(Q), n)
    out = _proj_op_call(spec, "add", rows, R, C, False)(*flat)
    return _lm_unpack(out, shape, total, n)


def proj_madd(spec: CurveSpec, P, Q_affine, valid=None):
    n = spec.ops.field.nlimbs
    flat, shape, total, R, C, rows = _lm_pack(
        list(P) + list(Q_affine), n)
    masked = valid is not None
    if masked:
        v = valid.astype(jnp.uint32).reshape(total)
        pad = rows * C - total
        if pad:
            v = jnp.concatenate([v, jnp.zeros((pad,), jnp.uint32)])
        flat.append(v.reshape(rows, C))
    out = _proj_op_call(spec, "madd", rows, R, C, masked)(*flat)
    return _lm_unpack(out, shape, total, n)


def proj_double(spec: CurveSpec, P):
    n = spec.ops.field.nlimbs
    flat, shape, total, R, C, rows = _lm_pack(list(P), n)
    out = _proj_op_call(spec, "double", rows, R, C, False)(*flat)
    return _lm_unpack(out, shape, total, n)


DEFAULT_TILE = 512


def _flatten_pad(coords, n, tile):
    shape = coords[0].shape[:-1]
    total = max(1, int(np.prod(shape, dtype=np.int64)))
    t = min(tile, max(8, 1 << (total - 1).bit_length()))
    pad = -total % t
    flat = [c.reshape(total, n) for c in coords]
    if pad:
        flat = [
            jnp.concatenate([c, jnp.zeros((pad, n), jnp.uint32)]) for c in flat
        ]
    return flat, shape, total, t, pad


def add(spec: CurveSpec, P, Q, tile: int = DEFAULT_TILE):
    n = spec.ops.field.nlimbs
    flat, shape, total, t, pad = _flatten_pad(list(P) + list(Q), n, tile)
    out = _add_call(spec, total + pad, t)(*flat)
    return tuple(o[:total].reshape(shape + (n,)) for o in out)


def double(spec: CurveSpec, P, tile: int = DEFAULT_TILE):
    n = spec.ops.field.nlimbs
    flat, shape, total, t, pad = _flatten_pad(list(P), n, tile)
    out = _double_call(spec, total + pad, t)(*flat)
    return tuple(o[:total].reshape(shape + (n,)) for o in out)


def madd(spec: CurveSpec, P, Q_affine, valid=None, tile: int = DEFAULT_TILE):
    """Fused complete mixed add (Jacobian P + affine Q); `valid` lanes=False
    pass P through. The MSM bucket-accumulation hot kernel."""
    n = spec.ops.field.nlimbs
    coords = list(P) + list(Q_affine)
    masked = valid is not None
    if masked:
        vm = jnp.broadcast_to(
            valid.astype(jnp.uint32)[..., None], valid.shape + (n,)
        )
        coords.append(vm)
    flat, shape, total, t, pad = _flatten_pad(coords, n, tile)
    out = _madd_call(spec, total + pad, t, masked)(*flat)
    return tuple(o[:total].reshape(shape + (n,)) for o in out)
