"""End-to-end Groth16: prove over the reference snarkjs test vectors and
verify against the shipped verification keys — the compatibility oracle
(mirrors tests/tests/circom/e2e_tests/rep3.rs)."""

import pytest

from cosnarks_tpu.ff.bigint import limbs_to_int
from cosnarks_tpu.groth16 import drivers, prove
from cosnarks_tpu.groth16.verify import verify_bn254
from cosnarks_tpu.io import jsonio, wtns, zkey
from cosnarks_tpu.mpc import rep3
from cosnarks_tpu.mpc.net.local import run_parties

BASE = "/root/reference/test_vectors/Groth16/bn254/multiplier2/"


@pytest.fixture(scope="module")
def artifacts():
    zk = zkey.load_groth16_zkey(BASE + "circuit.zkey")
    _, w = wtns.load_wtns(BASE + "witness.wtns")
    wit = [limbs_to_int(x) for x in w]
    vk = jsonio.vkey_from_json(open(BASE + "verification_key.json").read())
    pub = jsonio.public_from_json(open(BASE + "public.json").read())
    return zk, wit, vk, pub


def test_plain_prove_verifies(artifacts):
    zk, wit, vk, pub = artifacts
    from cosnarks_tpu.ff import mont

    n_inst = zk.n_public + 1
    witness = prove.SharedWitness(
        public_inputs=wit[:n_inst],
        witness=mont.encode(zk.fr, wit[n_inst:]),
    )
    driver = drivers.PlainDriver(seed=7)
    proof = prove.prove(driver, zk, witness)
    assert wit[1 : n_inst] == pub
    assert verify_bn254(vk, proof, pub), "plain proof must verify vs snarkjs vkey"
    # vk derived from zkey must equal the shipped verification key
    assert prove.vk_from_zkey(zk) == {**vk, "protocol": "groth16", "curve": "bn128"}


def test_rep3_prove_verifies(artifacts, rng):
    zk, wit, vk, pub = artifacts
    n_inst = zk.n_public + 1
    shares = rep3.share_field_elements(zk.fr, wit[n_inst:], rng)

    def party(net):
        st = rep3.Rep3State.setup(net, bytes([net.id + 42]) * 8)
        driver = drivers.Rep3Driver(net, st)
        witness = prove.SharedWitness(
            public_inputs=wit[:n_inst], witness=shares[net.id]
        )
        return prove.prove(driver, zk, witness)

    proofs = run_parties([party] * 3)
    # all parties must produce the identical proof
    assert proofs[0] == proofs[1] == proofs[2]
    assert verify_bn254(vk, proofs[0], pub), "rep3 proof must verify"
    # proofs are randomized: a second run with different rng differs but verifies
    assert proofs[0]["a"] is not None


BLS_BASE = "/root/reference/test_vectors/Groth16/bls12_381/multiplier2/"


def test_plain_prove_verifies_bls12_381():
    from cosnarks_tpu.ff import mont
    from cosnarks_tpu.groth16.verify import verify

    zk = zkey.load_groth16_zkey(BLS_BASE + "circuit.zkey")
    _, w = wtns.load_wtns(BLS_BASE + "witness.wtns")
    wit = [limbs_to_int(x) for x in w]
    vk = jsonio.vkey_from_json(open(BLS_BASE + "verification_key.json").read())
    pub = jsonio.public_from_json(open(BLS_BASE + "public.json").read())
    n_inst = zk.n_public + 1
    witness = prove.SharedWitness(
        public_inputs=wit[:n_inst],
        witness=mont.encode(zk.fr, wit[n_inst:]),
    )
    proof = prove.prove(drivers.PlainDriver(seed=9), zk, witness)
    assert verify(vk, proof, pub), "bls12-381 plain proof must verify"


def test_rep3_prove_verifies_bls12_381(rng):
    from cosnarks_tpu.groth16.verify import verify

    zk = zkey.load_groth16_zkey(BLS_BASE + "circuit.zkey")
    _, w = wtns.load_wtns(BLS_BASE + "witness.wtns")
    wit = [limbs_to_int(x) for x in w]
    vk = jsonio.vkey_from_json(open(BLS_BASE + "verification_key.json").read())
    pub = jsonio.public_from_json(open(BLS_BASE + "public.json").read())
    n_inst = zk.n_public + 1
    shares = rep3.share_field_elements(zk.fr, wit[n_inst:], rng)

    def party(net):
        st = rep3.Rep3State.setup(net, bytes([net.id + 21]) * 8)
        driver = drivers.Rep3Driver(net, st)
        return prove.prove(
            driver, zk, prove.SharedWitness(wit[:n_inst], shares[net.id])
        )

    proofs = run_parties([party] * 3)
    assert proofs[0] == proofs[1] == proofs[2]
    assert verify(vk, proofs[0], pub)


POSEIDON_BASE = "/root/reference/test_vectors/Groth16/bn254/poseidon/"


def test_rep3_poseidon_prove_verifies(rng):
    """Beyond-toy scale: the poseidon vector (domain 256, 215 wires) proven
    3-party Rep3 and checked against the shipped snarkjs verification key
    (mirrors the reference e2e matrix entry for poseidon,
    tests/tests/circom/e2e_tests/rep3.rs)."""
    zk = zkey.load_groth16_zkey(POSEIDON_BASE + "circuit.zkey")
    _, w = wtns.load_wtns(POSEIDON_BASE + "witness.wtns")
    wit = [limbs_to_int(x) for x in w]
    vk = jsonio.vkey_from_json(
        open(POSEIDON_BASE + "verification_key.json").read())
    pub = jsonio.public_from_json(open(POSEIDON_BASE + "public.json").read())
    n_inst = zk.n_public + 1
    assert wit[1:n_inst] == pub
    shares = rep3.share_field_elements(zk.fr, wit[n_inst:], rng)

    def party(net):
        st = rep3.Rep3State.setup(net, bytes([net.id + 77]) * 8)
        driver = drivers.Rep3Driver(net, st)
        witness = prove.SharedWitness(
            public_inputs=wit[:n_inst], witness=shares[net.id]
        )
        return prove.prove(driver, zk, witness)

    proofs = run_parties([party] * 3)
    assert proofs[0] == proofs[1] == proofs[2]
    assert verify_bn254(vk, proofs[0], pub), "rep3 poseidon proof must verify"
