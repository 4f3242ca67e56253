"""PLONK prover/verifier tests against the reference test vectors
(test_vectors/Plonk/*) — mirrors the reference's deterministic round tests
(co-plonk/src/round4.rs test_round4_multiplier2, round5.rs) and the e2e
snarkjs-compat matrix (tests/tests/circom/e2e_tests)."""

import json

import numpy as np
import pytest

from cosnarks_tpu.ff.bigint import limbs_to_int
from cosnarks_tpu.ff.spec import BN254_FR
from cosnarks_tpu.io import wtns
from cosnarks_tpu.io.zkey import load_plonk_zkey

BASE = "/root/reference/test_vectors/Plonk/bn254/multiplier2"


@pytest.fixture(scope="module")
def zk():
    return load_plonk_zkey(BASE + "/circuit.zkey")


@pytest.fixture(scope="module")
def witness_vals(zk):
    _, w = wtns.load_wtns(BASE + "/witness.wtns")
    return [limbs_to_int(x) for x in w]


def test_plonk_zkey_parse(zk):
    assert zk.n_vars == 4
    assert zk.n_public == 2
    assert zk.domain_size == 8
    assert zk.n_constraints == 3
    assert zk.k1 == 2 and zk.k2 == 3
    assert zk.p_tau.shape[0] == zk.domain_size + 6


def test_plonk_plain_deterministic_evals(zk, witness_vals):
    """Deterministic blinding b_i = i reproduces the reference's round-4
    evaluation vector (co-plonk/src/round4.rs:180-240)."""
    from cosnarks_tpu.ff import mont
    from cosnarks_tpu.plonk import prove
    from cosnarks_tpu.plonk.drivers import PlainPlonkDriver

    fr = zk.fr
    publics = witness_vals[: zk.n_public + 1]
    priv = mont.encode(fr, witness_vals[zk.n_public + 1 :])
    drv = PlainPlonkDriver(fr)
    proof = prove.prove(zk, drv, publics, priv, deterministic_b=True)
    assert proof["eval_a"] == (
        "9577617118727487156038114503197927927393325100881782676071854181913228129519"
    )
    assert proof["eval_b"] == (
        "20597878711220885145139457487405665380092038394343281979206937623212519986448"
    )
    assert proof["eval_c"] == (
        "15265494263612694384441473331344570152140354050926476508657731330784430744915"
    )
    assert proof["eval_zw"] == (
        "13208748067365350181326696119359571057028048827339239951085850234164749233153"
    )
    assert proof["eval_s1"] == (
        "14333100636430622287126878289812189552775054994479690945797668457655414216377"
    )
    assert proof["eval_s2"] == (
        "5227675743165392606371559215386333900775466821923985579976650047914227054429"
    )
    # round-5 commitments (co-plonk/src/round5.rs:395-408)
    assert proof["Wxi"][0] == (
        "17714933343167283383757911844657193439824158284537335005582807825912982308761"
    )
    assert proof["Wxiw"][0] == (
        "11975595019949715918668172153793336705506375746143971491421022814159658028345"
    )


def test_plonk_verify_reference_proof():
    from cosnarks_tpu.plonk import verify

    proof = json.load(open(BASE + "/circom.proof"))
    vk = json.load(open(BASE + "/verification_key.json"))
    pub = json.load(open(BASE + "/public.json"))
    assert verify.verify(vk, proof, pub)
    bad = dict(proof, eval_a=str((int(proof["eval_a"]) + 1)))
    assert not verify.verify(vk, bad, pub)


def test_plonk_plain_prove_and_verify(zk, witness_vals):
    from cosnarks_tpu.ff import mont
    from cosnarks_tpu.plonk import prove, verify
    from cosnarks_tpu.plonk.drivers import PlainPlonkDriver

    fr = zk.fr
    publics = witness_vals[: zk.n_public + 1]
    priv = mont.encode(fr, witness_vals[zk.n_public + 1 :])
    proof = prove.prove(zk, PlainPlonkDriver(fr, seed=7), publics, priv)
    vk = json.load(open(BASE + "/verification_key.json"))
    assert verify.verify(vk, proof, publics[1:])


def test_plonk_rep3_prove_and_verify(zk, witness_vals):
    from cosnarks_tpu.ff import mont
    from cosnarks_tpu.mpc import rep3
    from cosnarks_tpu.mpc.net.local import run_parties
    from cosnarks_tpu.plonk import prove, verify
    from cosnarks_tpu.plonk.drivers import Rep3PlonkDriver

    fr = zk.fr
    publics = witness_vals[: zk.n_public + 1]
    priv_ints = witness_vals[zk.n_public + 1 :]
    import random

    shares = rep3.share_field_elements(fr, priv_ints, random.Random(11))

    def party(k):
        def go(net):
            state = rep3.Rep3State.setup(net, seed=bytes([k + 1]) * 32)
            drv = Rep3PlonkDriver(fr, net, state)
            return prove.prove(zk, drv, publics, shares[k])

        return go

    proofs = run_parties([party(0), party(1), party(2)])
    assert proofs[0] == proofs[1] == proofs[2]
    vk = json.load(open(BASE + "/verification_key.json"))
    assert verify.verify(vk, proofs[0], publics[1:])


def test_plonk_bls12_381_plain():
    base = "/root/reference/test_vectors/Plonk/bls12_381/multiplier2"
    from cosnarks_tpu.ff import mont
    from cosnarks_tpu.plonk import prove, verify
    from cosnarks_tpu.plonk.drivers import PlainPlonkDriver

    zkb = load_plonk_zkey(base + "/circuit.zkey")
    _, w = wtns.load_wtns(base + "/witness.wtns")
    vals = [limbs_to_int(x) for x in w]
    vk = json.load(open(base + "/verification_key.json"))
    ref = json.load(open(base + "/circom.proof"))
    pub = json.load(open(base + "/public.json"))
    assert verify.verify(vk, ref, pub)
    publics = vals[: zkb.n_public + 1]
    priv = mont.encode(zkb.fr, vals[zkb.n_public + 1 :])
    proof = prove.prove(zkb, PlainPlonkDriver(zkb.fr, seed=3), publics, priv)
    assert verify.verify(vk, proof, publics[1:])


def test_plonk_poseidon_verify():
    # no zkey shipped for this vector — verifier-side coverage only
    base = "/root/reference/test_vectors/Plonk/bn254/poseidon"
    from cosnarks_tpu.plonk import verify

    vk = json.load(open(base + "/verification_key.json"))
    assert verify.verify(vk, json.load(open(base + "/circom.proof")),
                         json.load(open(base + "/public.json")))


def test_plonk_shamir_prove_and_verify(zk, witness_vals):
    import random

    from cosnarks_tpu.ff import mont
    from cosnarks_tpu.mpc import shamir
    from cosnarks_tpu.mpc.net.local import run_parties
    from cosnarks_tpu.plonk import prove, verify
    from cosnarks_tpu.plonk.drivers import ShamirPlonkDriver

    fr = zk.fr
    publics = witness_vals[: zk.n_public + 1]
    priv_ints = witness_vals[zk.n_public + 1 :]
    shares = shamir.share_values(fr, priv_ints, 3, 1, random.Random(5))

    def party(k):
        def go(net):
            state = shamir.ShamirState.setup(
                net, fr, t=1, pairs=64, seed=bytes([k + 9]) * 32)
            drv = ShamirPlonkDriver(fr, net, state)
            return prove.prove(zk, drv, publics, shares[k])

        return go

    proofs = run_parties([party(0), party(1), party(2)])
    assert proofs[0] == proofs[1] == proofs[2]
    vk = json.load(open(BASE + "/verification_key.json"))
    assert verify.verify(vk, proofs[0], publics[1:])
