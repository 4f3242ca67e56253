"""Protocol unit tests for the host-side Rep3 scalar kernel
(mpc/rep3_scalar.py) — the pattern of the reference's tests/tests/mpc/rep3.rs:
share random values, run the op on 3 LocalNetwork threads, combine, compare
against plain python-int arithmetic."""

import random

import pytest

from cosnarks_tpu.ff.spec import BN254_FR
from cosnarks_tpu.mpc.net.local import run_parties
from cosnarks_tpu.mpc.rep3_scalar import AShare, BShare, HostRng, Rep3Scalar

P = BN254_FR.p
R = random.Random(0xBEEF)


def _keys():
    ks = [R.randbytes(32) for _ in range(3)]
    # party i holds (k_i, k_{i+1})
    return [HostRng(ks[i], ks[(i + 1) % 3]) for i in range(3)]


def _run(fn, values=()):
    """Share `values`, run fn(proto, shares) per party, return results."""
    rngs = _keys()
    shared = [Rep3Scalar.share(v, P) for v in values]

    def party(i):
        def go(net):
            proto = Rep3Scalar(net, rngs[i], P)
            return fn(proto, [s[i] for s in shared])

        return go

    return run_parties([party(0), party(1), party(2)])


def _combine(results, idx=0):
    return Rep3Scalar.combine([r[idx] for r in results], P)


def _combine_bin(results, idx=0):
    shares = [r[idx] for r in results]
    for i in range(3):
        assert shares[i].b == shares[(i + 1) % 3].a
    return shares[0].a ^ shares[1].a ^ shares[2].a


def test_share_combine():
    v = R.randrange(P)
    s = Rep3Scalar.share(v, P)
    assert Rep3Scalar.combine(s, P) == v


def test_rng_pairwise_consistency():
    rngs = _keys()
    for i in range(3):
        mine = rngs[(i + 1) % 3]._draw(rngs[(i + 1) % 3]._km, b"t", 0)
        nxt = rngs[i]._draw(rngs[i]._kn, b"t", 0)
        assert mine == nxt
    # zero shares really sum to zero
    adds = [r.zero_add(P) for r in rngs]
    assert sum(adds) % P == 0
    xors = [r.zero_xor(254) for r in rngs]
    assert xors[0] ^ xors[1] ^ xors[2] == 0


def test_arithmetic_linear_and_mul():
    x, y = R.randrange(P), R.randrange(P)

    def fn(pr, sh):
        sx, sy = sh
        return (
            pr.add(sx, sy),
            pr.sub(sx, sy),
            pr.mul(sx, sy),
            pr.add_public(sx, 42),
            pr.mul_public(sy, 7),
            pr.promote(99),
        )

    res = _run(fn, [x, y])
    assert _combine(res, 0) == (x + y) % P
    assert _combine(res, 1) == (x - y) % P
    assert _combine(res, 2) == x * y % P
    assert _combine(res, 3) == (x + 42) % P
    assert _combine(res, 4) == y * 7 % P
    assert _combine(res, 5) == 99


def test_open_and_mul_open():
    x, y = R.randrange(P), R.randrange(P)

    def fn(pr, sh):
        sx, sy = sh
        return pr.open(sx), pr.mul_open_many([sx], [sy])[0]

    res = _run(fn, [x, y])
    for r in res:
        assert r[0] == x
        assert r[1] == x * y % P


def test_inv_pow_sqrt_cmux():
    x = R.randrange(1, P)
    c = R.randrange(2)
    t, f = R.randrange(P), R.randrange(P)
    sq = R.randrange(P)
    sq = sq * sq % P

    def fn(pr, sh):
        sx, sc, st, sf, ssq = sh
        out_inv = pr.inv(sx)
        out_pow = pr.pow_public(sx, 5)
        out_cmux = pr.cmux(sc, st, sf)
        out_sqrt = pr.sqrt(ssq)
        return out_inv, out_pow, out_cmux, out_sqrt

    res = _run(fn, [x, c, t, f, sq])
    assert _combine(res, 0) == pow(x, -1, P)
    assert _combine(res, 1) == pow(x, 5, P)
    assert _combine(res, 2) == (t if c else f)
    assert _combine(res, 3) * _combine(res, 3) % P == sq


def test_a2b_roundtrip_and_open_bit():
    vals = [0, 1, P - 1, R.randrange(P), R.randrange(P)]

    def fn(pr, sh):
        bits = pr.a2b_many(sh)
        opened = pr.open_bit_many(bits)
        back = pr.b2a_many(bits)
        return opened, back

    res = _run(fn, vals)
    for i, v in enumerate(vals):
        assert res[0][0][i] == v  # same opened value on every party
        assert res[1][0][i] == res[0][0][i]
        comb = Rep3Scalar.combine([r[1][i] for r in res], P)
        assert comb == v


def test_binary_ops_and_cmux():
    x, y = R.randrange(P), R.randrange(P)

    def fn(pr, sh):
        bx, by = pr.a2b_many(sh)
        return (
            pr.open_bit(pr.bxor(bx, by)),
            pr.open_bit(pr.band(bx, by)),
            pr.open_bit(pr.bor(bx, by)),
            pr.open_bit(pr.bxor_public(bx, 0xFF)),
            pr.open_bit(pr.band_public(bx, 0xFFFF)),
        )

    res = _run(fn, [x, y])
    assert res[0] == (x ^ y, x & y, x | y, x ^ 0xFF, x & 0xFFFF)


def test_bit_inject():
    # random nontrivial XOR sharings of bits 1 and 0
    vals = []
    for v in (1, 0):
        y0, y1 = R.randrange(2), R.randrange(2)
        y2 = v ^ y0 ^ y1
        ys = [y0, y1, y2]
        vals.append([BShare(ys[i], ys[(i + 1) % 3]) for i in range(3)])

    rngs = _keys()

    def party(i):
        def go(net):
            pr = Rep3Scalar(net, rngs[i], P)
            return pr.bit_inject_many([vals[0][i], vals[1][i]])

        return go

    res = run_parties([party(0), party(1), party(2)])
    assert Rep3Scalar.combine([r[0] for r in res], P) == 1
    assert Rep3Scalar.combine([r[1] for r in res], P) == 0


@pytest.mark.parametrize(
    "x,y",
    [
        (5, 9),
        (9, 5),
        (7, 7),
        (0, 1),
        (P - 1, 1),
        (P - 2, P - 1),
        (R.randrange(P), R.randrange(P)),
    ],
)
def test_comparisons(x, y):
    def fn(pr, sh):
        sx, sy = sh
        return (
            pr.ge(sx, sy),
            pr.lt(sx, sy),
            pr.le(sx, sy),
            pr.gt(sx, sy),
            pr.eq(sx, sy),
            pr.neq(sx, sy),
            pr.ge_public(sx, y),
            pr.le_public(sx, y),
            pr.lt_public(sx, y),
            pr.gt_public(sx, y),
        )

    res = _run(fn, [x, y])
    exp = [
        int(x >= y), int(x < y), int(x <= y), int(x > y),
        int(x == y), int(x != y),
        int(x >= y), int(x <= y), int(x < y), int(x > y),
    ]
    for i, e in enumerate(exp):
        assert _combine(res, i) == e, f"op {i}"


def test_is_zero_open():
    def fn(pr, sh):
        return pr.is_zero_open(sh[0]), pr.is_zero_open(sh[1])

    res = _run(fn, [0, 17])
    for r in res:
        assert r == (True, False)


def test_fork_independence():
    rngs = _keys()
    f0 = [r.fork(1) for r in rngs]
    f1 = [r.fork(2) for r in rngs]
    # forked streams stay pairwise-consistent
    assert f0[0]._kn == f0[1]._km
    assert f0[0]._kn != f1[0]._kn
    a = [r.zero_add(P) for r in f0]
    assert sum(a) % P == 0
