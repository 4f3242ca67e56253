"""Gadget tests: Poseidon2 Merkle tree (plain vs Rep3), shared-poly eval,
rep3->shamir point bridge — the miniature of the reference's gadget suites
(mpc-core/src/gadgets/merkle_tree, rep3/poly.rs, bridges/rep3_to_shamir.rs).
"""

import random

import jax
import pytest

from cosnarks_tpu.ff import mont
from cosnarks_tpu.ff.spec import BN254_FR
from cosnarks_tpu.gadgets.merkle import (
    merkle_root,
    merkle_root_with_witness,
    verify_merkle_opening,
)
from cosnarks_tpu.gadgets.poseidon2 import Poseidon2
from cosnarks_tpu.mpc import bridges, rep3, shamir
from cosnarks_tpu.mpc.net.local import run_parties
from cosnarks_tpu.mpc.rep3_scalar import HostRng, Rep3Scalar
from cosnarks_tpu.vm.interp import PlainDriver
from cosnarks_tpu.vm.rep3_driver import Rep3Driver

F = BN254_FR


@pytest.fixture
def rng():
    return random.Random(0xD00D)


def test_merkle_plain_roots_and_witness(rng):
    perm = Poseidon2(3, F.p)
    d = PlainDriver(F)
    leaves = [rng.randrange(F.p) for _ in range(8)]
    root = merkle_root(perm, d, leaves, arity=2)
    for idx in (0, 3, 7):
        r2, wit = merkle_root_with_witness(perm, d, leaves, idx, arity=2)
        assert r2 == root
        assert len(wit) == 3
        assert verify_merkle_opening(perm, d, leaves[idx], wit) == root
    # tamper detection
    _, wit = merkle_root_with_witness(perm, d, leaves, 2, arity=2)
    assert verify_merkle_opening(perm, d, (leaves[2] + 1) % F.p, wit) != root


def test_merkle_arity3(rng):
    perm = Poseidon2(4, F.p)
    d = PlainDriver(F)
    leaves = [rng.randrange(F.p) for _ in range(27)]
    root = merkle_root(perm, d, leaves, arity=3)
    r2, wit = merkle_root_with_witness(perm, d, leaves, 13, arity=3)
    assert r2 == root
    assert verify_merkle_opening(perm, d, leaves[13], wit, arity=3) == root


def test_merkle_rep3_matches_plain(rng):
    perm = Poseidon2(3, F.p)
    leaves = [rng.randrange(F.p) for _ in range(8)]
    plain_root = merkle_root(perm, PlainDriver(F), leaves, arity=2)
    shares = [Rep3Scalar.share(v, F.p) for v in leaves]

    def party(k):
        def go(net):
            keys = [bytes([77 + j]) * 32 for j in range(3)]
            proto = Rep3Scalar(net, HostRng(keys[k], keys[(k + 1) % 3]), F.p)
            drv = Rep3Driver(proto, F)
            root = merkle_root(perm, drv, [s[k] for s in shares], arity=2)
            return proto.open(drv.to_share(root))

        return go

    outs = run_parties([party(0), party(1), party(2)])
    assert outs == [plain_root] * 3


def test_rep3_eval_poly_values(rng):
    deg = 5
    coeffs = [rng.randrange(F.p) for _ in range(deg + 1)]
    x = rng.randrange(F.p)
    want = 0
    for c in reversed(coeffs):
        want = (want * x + c) % F.p
    # coefficient share lists per party
    per_coeff = [rep3.share_field_elements(F, [c], rng) for c in coeffs]
    xm = mont.encode(F, [x])[0]

    def party(net):
        my = [pc[net.id] for pc in per_coeff]
        return rep3.eval_poly(F, my, xm)

    outs = run_parties([party] * 3)
    got = rep3.combine_field_elements(F, outs)[0]
    assert got == want


def test_shamir_eval_poly(rng):
    deg = 5
    coeffs = [rng.randrange(F.p) for _ in range(deg + 1)]
    x = rng.randrange(F.p)
    want = 0
    for c in reversed(coeffs):
        want = (want * x + c) % F.p
    per_coeff = [shamir.share_values(F, [c], 3, 1, rng) for c in coeffs]
    xm = mont.encode(F, [x])[0]
    shares = [
        shamir.eval_poly(F, [pc[k] for pc in per_coeff], xm)
        for k in range(3)
    ]
    got = shamir.combine_values(F, shares, [0, 1, 2])
    assert got == [want]


def test_rep3_point_to_shamir_bridge(rng):
    from cosnarks_tpu.ec import curve as ec, host
    from cosnarks_tpu.ec.curves import BN254_G1 as spec

    hc = host.host_curve(spec)
    k = rng.randrange(1, 1 << 30)
    want = hc.affine_ints(hc.mul(hc.generator, k))
    # additive rep3 point shares of [k]G
    k1, k2 = rng.randrange(1, 1 << 20), rng.randrange(1, 1 << 20)
    p1 = hc.mul(hc.generator, k1)
    p2 = hc.mul(hc.generator, k2)
    p0 = hc.add(hc.lift_affine(want), hc.neg(hc.add(p1, p2)))
    parts = [hc.affine_ints(p0), hc.affine_ints(p1), hc.affine_ints(p2)]
    devpts = [
        tuple(x[0] for x in ec.encode_points(spec, [p])) for p in parts
    ]

    def party(net):
        st = shamir.ShamirState.setup(net, spec.scalar_field, 1, pairs=4)
        repl = rep3.point_reshare(spec, devpts[net.id], net)
        sh = bridges.translate_rep3_point_to_shamir(spec, repl, net, st)
        return shamir.open_point(spec, sh, net, st)

    outs = run_parties([party] * 3)
    for o in outs:
        got = ec.decode_points(spec, jax.tree.map(lambda x: x[None], o))[0]
        assert got == want
