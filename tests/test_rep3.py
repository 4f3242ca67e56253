"""Rep3 protocol tests over LocalNetwork threads — the pattern of the
reference's protocol suite (share -> run on 3 threads -> combine -> compare
vs plain arithmetic, tests/tests/mpc/rep3.rs)."""

import random

import pytest

from cosnarks_tpu.ff import mont
from cosnarks_tpu.ff.spec import BN254_FR
from cosnarks_tpu.mpc import rep3
from cosnarks_tpu.mpc.net.local import run_parties
from cosnarks_tpu.ec import curve as ec, host, msm
from cosnarks_tpu.ec.curves import BN254_G1

F = BN254_FR


def setup_states(nets, seeds=(b"party0..", b"party1..", b"party2..")):
    return [rep3.Rep3State.setup(n, seeds[n.id]) for n in nets]


def test_share_combine_roundtrip(rng):
    vals = [rng.randrange(F.p) for _ in range(10)]
    shares = rep3.share_field_elements(F, vals, rng)
    assert rep3.combine_field_elements(F, shares) == vals


def test_linear_ops(rng):
    xs = [rng.randrange(F.p) for _ in range(8)]
    ys = [rng.randrange(F.p) for _ in range(8)]
    k = rng.randrange(F.p)
    sx = rep3.share_field_elements(F, xs, rng)
    sy = rep3.share_field_elements(F, ys, rng)
    km = mont.encode(F, [k] * 8)

    sums = [rep3.add(F, a, b) for a, b in zip(sx, sy)]
    assert rep3.combine_field_elements(F, sums) == [
        (x + y) % F.p for x, y in zip(xs, ys)
    ]
    prods = [rep3.mul_public(F, a, km) for a in sx]
    assert rep3.combine_field_elements(F, prods) == [x * k % F.p for x in xs]
    pubs = [rep3.add_public(F, a, km, i) for i, a in enumerate(sx)]
    assert rep3.combine_field_elements(F, pubs) == [(x + k) % F.p for x in xs]


def test_mul_open_over_network(rng):
    n = 16
    xs = [rng.randrange(F.p) for _ in range(n)]
    ys = [rng.randrange(F.p) for _ in range(n)]
    sx = rep3.share_field_elements(F, xs, rng)
    sy = rep3.share_field_elements(F, ys, rng)

    def party(net):
        st = rep3.Rep3State.setup(net, bytes([net.id]) * 8)
        z = rep3.mul(F, sx[net.id], sy[net.id], net, st)
        return rep3.open(F, z, net)

    outs = run_parties([party] * 3)
    exp = [x * y % F.p for x, y in zip(xs, ys)]
    for o in outs:
        assert mont.decode(F, o) == exp


def test_local_mul_additive_opens(rng):
    xs = [rng.randrange(F.p) for _ in range(4)]
    ys = [rng.randrange(F.p) for _ in range(4)]
    sx = rep3.share_field_elements(F, xs, rng)
    sy = rep3.share_field_elements(F, ys, rng)

    def party(net):
        st = rep3.Rep3State.setup(net, bytes([net.id]) * 8)
        half = rep3.local_mul(F, sx[net.id], sy[net.id], st)
        return rep3.open_additive(F, half, net)

    outs = run_parties([party] * 3)
    exp = [x * y % F.p for x, y in zip(xs, ys)]
    for o in outs:
        assert mont.decode(F, o) == exp


def test_rand_consistent_and_combines(rng):
    def party(net):
        st = rep3.Rep3State.setup(net, bytes([net.id + 7]) * 8)
        return rep3.rand(F, st, (5,))

    shares = run_parties([party] * 3)
    vals = rep3.combine_field_elements(F, shares)  # checks consistency
    assert len(set(vals)) == 5  # all distinct with overwhelming probability


def test_inv_and_cmux(rng):
    xs = [rng.randrange(1, F.p) for _ in range(4)]
    bits = [1, 0, 1, 0]
    a_vals = [rng.randrange(F.p) for _ in range(4)]
    b_vals = [rng.randrange(F.p) for _ in range(4)]
    sx = rep3.share_field_elements(F, xs, rng)
    sbit = rep3.share_field_elements(F, bits, rng)
    sa = rep3.share_field_elements(F, a_vals, rng)
    sb = rep3.share_field_elements(F, b_vals, rng)

    def party(net):
        st = rep3.Rep3State.setup(net, bytes([net.id + 3]) * 8)
        iv = rep3.inv(F, sx[net.id], net, st)
        cm = rep3.cmux(F, sbit[net.id], sa[net.id], sb[net.id], net, st)
        return iv, cm

    outs = run_parties([party] * 3)
    invs = rep3.combine_field_elements(F, [o[0] for o in outs])
    assert invs == [pow(x, -1, F.p) for x in xs]
    cms = rep3.combine_field_elements(F, [o[1] for o in outs])
    assert cms == [
        a if c else b for c, a, b in zip(bits, a_vals, b_vals)
    ]


def test_point_share_open_and_scalar_mul(rng):
    spec = BN254_G1
    hc = host.host_curve(spec)
    s_val = rng.randrange(spec.scalar_field.p)
    base = hc.affine_ints(hc.mul(hc.generator, 12345))
    # additive point shares: P_i random-ish points summing to base
    k1, k2 = rng.randrange(1, 10**6), rng.randrange(1, 10**6)
    p1 = hc.mul(hc.generator, k1)
    p2 = hc.mul(hc.generator, k2)
    p0 = hc.add(hc.lift_affine(base), hc.neg(hc.add(p1, p2)))
    parts = [hc.affine_ints(p0), hc.affine_ints(p1), hc.affine_ints(p2)]
    devpts = [
        tuple(x[0] for x in ec.encode_points(spec, [p])) for p in parts
    ]
    s_shares = rep3.share_field_elements(F, [s_val], rng)

    def party(net):
        st = rep3.Rep3State.setup(net, bytes([net.id + 9]) * 8)
        opened = rep3.point_open_additive(spec, devpts[net.id], net)
        repl = rep3.point_reshare(spec, devpts[net.id], net)
        smul = rep3.point_scalar_mul_local(
            spec, repl, jax_tree_first(s_shares[net.id]), st
        )
        total = rep3.point_open_additive(spec, smul, net)
        return opened, total

    import jax

    def jax_tree_first(sh):
        return rep3.Share(sh.a[0], sh.b[0])

    outs = run_parties([party] * 3)
    for opened, total in outs:
        got = ec.decode_points(spec, jax.tree.map(lambda x: x[None], opened))
        assert got[0] == base
        got_s = ec.decode_points(spec, jax.tree.map(lambda x: x[None], total))
        exp = hc.affine_ints(hc.mul(hc.lift_affine(base), s_val))
        assert got_s[0] == exp
