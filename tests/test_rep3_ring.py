"""rep3_ring protocol + gadget tests: Z_2^k share arithmetic and
conversions, the packed one-hot-vector gadget, oblivious LUT
read/write, and the radix sort — 3 party threads over LocalNetwork,
checked against cleartext oracles (mirrors the reference's rep3_ring
test suite, mpc-core/src/protocols/rep3_ring tests)."""

import random

import pytest

from cosnarks_tpu.ff.spec import BN254_FR
from cosnarks_tpu.mpc import rep3_ring as rr
from cosnarks_tpu.mpc.net.local import run_parties
from cosnarks_tpu.mpc.rep3_scalar import BShare, HostRng, Rep3Scalar

P = BN254_FR.p


def _protos(net, k=32):
    keys = [bytes([55 + j]) * 32 for j in range(3)]
    i = net.id
    rng = HostRng(keys[i], keys[(i + 1) % 3])
    return Rep3Scalar(net, rng, P), rr.Rep3Ring(net, rng, k)


def _run3(fn):
    return run_parties([lambda net, k=k: fn(net, k) for k in range(3)],
                       timeout=600.0)


def test_ring_arithmetic_and_conversions():
    rnd = random.Random(7)
    vals = [rnd.getrandbits(32) for _ in range(6)]
    shr = [rr.Rep3Ring.share(v, 32) for v in vals]

    def go(net, k):
        fp, ring = _protos(net)
        xs = [s[k] for s in shr]
        prods = ring.mul_many(xs, xs)
        bs = ring.a2b_many(xs)
        back = ring.b2a_many(bs)
        inj = ring.bit_inject_many(
            [BShare((b.a >> 3) & 1, (b.b >> 3) & 1, 1) for b in bs])
        return (ring.open_many(prods), ring.open_many(back),
                ring.open_many(inj))

    res = _run3(go)
    m = (1 << 32) - 1
    assert res[0][0] == [v * v & m for v in vals]
    assert res[0][1] == vals
    assert res[0][2] == [(v >> 3) & 1 for v in vals]
    assert res[0] == res[1] == res[2]


def test_rand_ohv():
    def go(net, k):
        fp, ring = _protos(net)
        out = []
        for kk in (1, 2, 4, 6):
            r, e = rr.rand_ohv(ring, kk)
            mask = (1 << kk) - 1
            ro = ring.open_bits(BShare(r.a & mask, r.b & mask))
            other = net.reshare_backward([e.b])
            out.append((ro, e.a ^ e.b ^ other[0]))
        return out

    res = _run3(go)
    for ro, eo in res[0]:
        assert eo == 1 << ro


def test_lut_read_write():
    rnd = random.Random(11)
    table = [rnd.randrange(P) for _ in range(11)]
    idx = 7
    idx_shr = rr.Rep3Ring.share(idx, 32)
    val_new = rnd.randrange(P)
    tbl_shr = [Rep3Scalar.share(v, P) for v in table]
    new_shr = Rep3Scalar.share(val_new, P)

    def go(net, k):
        fp, ring = _protos(net)
        ib = ring.a2b_many([idx_shr[k]])[0]
        got_pub = rr.read_public_lut(ring, fp, table, ib)
        lut = [t[k] for t in tbl_shr]
        got_sh = rr.read_shared_lut(ring, fp, lut, ib)
        lut2 = rr.write_lut(ring, fp, new_shr[k], lut, ib)
        return fp.open_many([got_pub, got_sh]), fp.open_many(lut2)

    res = _run3(go)
    assert res[0][0] == [table[idx], table[idx]]
    exp = list(table)
    exp[idx] = val_new
    assert res[0][1] == exp


@pytest.mark.parametrize("n_priv,n_pub,bits", [(9, 4, 16), (8, 0, 10)])
def test_radix_sort(n_priv, n_pub, bits):
    rnd = random.Random(13 + n_priv)
    priv = [rnd.getrandbits(bits) for _ in range(n_priv)]
    pub = [rnd.getrandbits(bits) for _ in range(n_pub)]
    priv_shr = [Rep3Scalar.share(v, P) for v in priv]

    def go(net, k):
        fp, ring = _protos(net)
        out = rr.radix_sort_fields(fp, ring, [s[k] for s in priv_shr],
                                   pub, bits)
        return fp.open_many(out)

    res = _run3(go)
    assert res[0] == sorted(priv + pub)
    assert res[0] == res[1] == res[2]


def test_lut_provider_in_solver_path():
    """Rep3 driver exposes the provider; a mixed public/shared table
    round-trips reads and writes through it."""
    idx_shr = Rep3Scalar.share(2, P)
    val_shr = Rep3Scalar.share(999, P)

    def go(net, k):
        from cosnarks_tpu.mpc.lut import Rep3LookupTableProvider

        fp, _ = _protos(net)
        prov = Rep3LookupTableProvider(fp)
        lut = prov.init_public([10, 20, 30, 40])
        r1 = prov.read(idx_shr[k], lut)
        lut2 = prov.write(idx_shr[k], val_shr[k], lut)
        r2 = prov.read(idx_shr[k], lut2)
        return fp.open_many([r1, r2])

    res = _run3(go)
    assert res[0] == [30, 999]
