"""Shamir protocol tests over LocalNetwork (mirrors the reference's shamir
suite, tests/tests/mpc/shamir.rs) + the rep3->shamir bridge + Shamir
co-Groth16 e2e."""

import pytest

from cosnarks_tpu.ff import mont
from cosnarks_tpu.ff.bigint import limbs_to_int
from cosnarks_tpu.ff.spec import BN254_FR
from cosnarks_tpu.mpc import bridges, rep3, shamir
from cosnarks_tpu.mpc.net.local import run_parties

F = BN254_FR


def test_share_combine(rng):
    vals = [rng.randrange(F.p) for _ in range(6)]
    shares = shamir.share_values(F, vals, n=3, t=1, rng=rng)
    got = shamir.combine_values(F, [shares[0], shares[2]], [0, 2])
    assert got == vals
    got = shamir.combine_values(F, shares, [0, 1, 2])
    assert got == vals


def test_mul_open_3party(rng):
    n, t, k = 3, 1, 5
    xs = [rng.randrange(F.p) for _ in range(k)]
    ys = [rng.randrange(F.p) for _ in range(k)]
    sx = shamir.share_values(F, xs, n, t, rng)
    sy = shamir.share_values(F, ys, n, t, rng)

    def party(net):
        st = shamir.ShamirState.setup(net, F, t, pairs=16,
                                      seed=bytes([net.id + 1]) * 8)
        prod = shamir.mul(F, sx[net.id], sy[net.id], net, st)
        opened = shamir.open(F, prod, net, st)
        r = shamir.rand(F, st, (2,))
        return opened, r

    outs = run_parties([party] * 3)
    exp = [x * y % F.p for x, y in zip(xs, ys)]
    for o, _ in outs:
        assert mont.decode(F, o) == exp
    # rand shares must recombine consistently across parties
    rands = [o[1] for o in outs]
    v01 = shamir.combine_values(F, [rands[0], rands[1]], [0, 1])
    v12 = shamir.combine_values(F, [rands[1], rands[2]], [1, 2])
    assert v01 == v12


def test_mul_open_5party_t2(rng):
    n, t = 5, 2
    x, y = rng.randrange(F.p), rng.randrange(F.p)
    sx = shamir.share_values(F, [x], n, t, rng)
    sy = shamir.share_values(F, [y], n, t, rng)

    def party(net):
        st = shamir.ShamirState.setup(net, F, t, pairs=8,
                                      seed=bytes([net.id + 5]) * 8)
        prod = shamir.mul(F, sx[net.id], sy[net.id], net, st)
        return shamir.open(F, prod, net, st)

    outs = run_parties([party] * n)
    for o in outs:
        assert mont.decode(F, o) == [x * y % F.p]


def test_point_share_ops(rng):
    from cosnarks_tpu.ec import curve as ec, host
    from cosnarks_tpu.ec.curves import BN254_G1 as spec
    import jax

    hc = host.host_curve(spec)
    n, t = 3, 1
    secret = rng.randrange(1, F.p)
    base = hc.affine_ints(hc.mul(hc.generator, secret))
    # point sharing: [f(alpha_i)]G with f(0) = secret scaling... share the
    # SCALAR then lift to points
    sshares = shamir.share_values(F, [secret], n, t, rng)

    def party(net):
        st = shamir.ShamirState.setup(net, F, t, pairs=8,
                                      seed=bytes([net.id + 9]) * 8)
        gen = tuple(x[0] for x in ec.encode_points(spec, [spec.generator]))
        pt_share = shamir._scalar_points(spec, gen, sshares[net.id][0])
        opened = shamir.open_point(spec, pt_share, net, st)
        reduced = shamir.degree_reduce_point(spec, pt_share, net, st)
        opened2 = shamir.open_point(spec, reduced, net, st)
        return opened, opened2

    outs = run_parties([party] * 3)
    for opened, opened2 in outs:
        g1 = ec.decode_points(spec, jax.tree.map(lambda x: x[None], opened))[0]
        g2 = ec.decode_points(spec, jax.tree.map(lambda x: x[None], opened2))[0]
        assert g1 == base
        assert g2 == base


def test_rep3_to_shamir_bridge(rng):
    vals = [rng.randrange(F.p) for _ in range(4)]
    r3 = rep3.share_field_elements(F, vals, rng)

    def party(net):
        st = shamir.ShamirState.setup(net, F, 1, pairs=16,
                                      seed=bytes([net.id + 3]) * 8)
        sh = bridges.translate_rep3_to_shamir(F, r3[net.id], net, st)
        return shamir.open(F, sh, net, st)

    outs = run_parties([party] * 3)
    for o in outs:
        assert mont.decode(F, o) == vals


def test_shamir_groth16_e2e(rng):
    from cosnarks_tpu.groth16 import drivers, prove
    from cosnarks_tpu.groth16.verify import verify_bn254
    from cosnarks_tpu.io import jsonio, wtns, zkey

    BASE = "/root/reference/test_vectors/Groth16/bn254/multiplier2/"
    zk = zkey.load_groth16_zkey(BASE + "circuit.zkey")
    _, w = wtns.load_wtns(BASE + "witness.wtns")
    wit = [limbs_to_int(x) for x in w]
    n_inst = zk.n_public + 1
    shares = shamir.share_values(zk.fr, wit[n_inst:], 3, 1, rng)

    def party(net):
        st = shamir.ShamirState.setup(net, zk.fr, 1, pairs=32,
                                      seed=bytes([net.id + 77]) * 8)
        d = drivers.ShamirDriver(net, st)
        return prove.prove(
            d, zk, prove.SharedWitness(wit[:n_inst], shares[net.id])
        )

    proofs = run_parties([party] * 3)
    assert proofs[0] == proofs[1] == proofs[2]
    vk = jsonio.vkey_from_json(open(BASE + "verification_key.json").read())
    pub = jsonio.public_from_json(open(BASE + "public.json").read())
    assert verify_bn254(vk, proofs[0], pub)
