"""circom witness-extension tests against the full reference KAT corpus
(test_vectors/WitnessExtension: 65 circuits x 3 inputs, outputs compared to
circom-generated witnesses — the reference's witness_extension_tests tier)."""

import glob
import json
import os

import pytest

from cosnarks_tpu.ff.bigint import limbs_to_int
from cosnarks_tpu.ff.spec import BN254_FR
from cosnarks_tpu.io import wtns
from cosnarks_tpu.vm import interp, lang, witness

TESTS = "/root/reference/test_vectors/WitnessExtension/tests/"
KATS = "/root/reference/test_vectors/WitnessExtension/kats/"

ALL_KATS = sorted(
    d.rstrip("/").split("/")[-1]
    for d in glob.glob(KATS + "*/")
    if os.path.exists(TESTS + d.rstrip("/").split("/")[-1] + ".circom")
)


@pytest.mark.parametrize("name", ALL_KATS)
def test_kat_outputs(name):
    """Outputs positionally + every expected wire value present with
    multiplicity. The KAT wtns files are circom -O2 artifacts (simplified
    wire selection/order differs from our O0 vector), so full positional
    comparison only holds for simplification-free circuits — those are
    asserted exactly in test_kat_full_witness below."""
    from collections import Counter

    prog = lang.load_program(
        TESTS + name + ".circom", search_paths=[TESTS, TESTS + "libs"]
    )
    ran = 0
    for i in range(3):
        path = KATS + name + f"/input{i}.json"
        if not os.path.exists(path):
            continue
        inp = json.loads(open(path).read())
        vm = interp.WitnessVM(prog, BN254_FR, allow_logs=False)
        main = vm.run(inp)
        outs = vm.main_outputs(main)
        _, w = wtns.load_wtns(KATS + name + f"/witness{i}.wtns")
        exp = [limbs_to_int(x) for x in w]
        assert exp[1 : 1 + len(outs)] == outs, f"{name} input{i} mismatch"
        ours = Counter(witness.witness_vector(vm, main))
        short = Counter(exp) - ours
        assert not short, (
            f"{name} input{i}: expected wire values missing from our "
            f"witness: {list(short.items())[:3]}"
        )
        ran += 1
    assert ran > 0


# circuits whose -O2 witness equals our O0 vector exactly (no signals
# eliminated): assert the full vector positionally, mirroring the
# reference's plain_vm witness_extension_tests.
FULL_MATCH_KATS = [
    "babyadd_tester", "babycheck_test", "edwards2montgomery", "iszero",
    "mimc_test", "montgomery2edwards", "montgomeryadd", "montgomerydouble",
    "sqrt_test",
]


@pytest.mark.parametrize("name", [k for k in FULL_MATCH_KATS
                                  if k in ALL_KATS])
def test_kat_full_witness(name):
    prog = lang.load_program(
        TESTS + name + ".circom", search_paths=[TESTS, TESTS + "libs"]
    )
    ran = 0
    for i in range(3):
        path = KATS + name + f"/input{i}.json"
        if not os.path.exists(path):
            continue
        inp = json.loads(open(path).read())
        vm = interp.WitnessVM(prog, BN254_FR, allow_logs=False)
        main = vm.run(inp)
        _, w = wtns.load_wtns(KATS + name + f"/witness{i}.wtns")
        exp = [limbs_to_int(x) for x in w]
        got = witness.witness_vector(vm, main)
        if got != exp:
            pytest.fail(f"{name} input{i}: full witness mismatch "
                        f"(len {len(got)} vs {len(exp)})")
        ran += 1
    assert ran > 0


def test_witness_vector_matches_snarkjs():
    src = TESTS + "multiplier2.circom"
    wit, n_inst = witness.generate_witness(src, {"a": 3, "b": 11}, BN254_FR)
    _, w = wtns.load_wtns(
        "/root/reference/test_vectors/Groth16/bn254/multiplier2/witness.wtns"
    )
    assert wit == [limbs_to_int(x) for x in w]
    assert n_inst == 2


def test_constraint_violation_detected():
    prog = lang.parse(
        """
        template T() { signal input a; signal output b;
            b <-- a + 1; b === a + 2; }
        component main = T();
        """
    )
    vm = interp.WitnessVM(prog, BN254_FR)
    with pytest.raises(interp.CircomError, match="constraint violated"):
        vm.run({"a": 5})


def test_logs_collected():
    prog = lang.parse(
        """
        template T() { signal input a; signal output b;
            log("value is", a * 2); b <== a; }
        component main = T();
        """
    )
    vm = interp.WitnessVM(prog, BN254_FR)
    vm.run({"a": 21})
    assert vm.logs == ["value is 42"]


def test_sym_wire_mapping():
    """O1/O2-style .sym reordering: eliminated signal dropped, wires
    renumbered (io/sym.py; reference inherits this mapping from its circom
    fork, circom-mpc-compiler/src/lib.rs)."""
    import tempfile

    from cosnarks_tpu.io import sym as sym_mod

    src = TESTS + "multiplier2.circom"
    with tempfile.NamedTemporaryFile("w", suffix=".sym", delete=False) as fh:
        # simplified artifact keeps c, a, b; swaps a/b wire order vs O0
        fh.write("1,1,0,main.c\n2,3,0,main.a\n3,2,0,main.b\n")
        path = fh.name
    wit, n_inst = witness.generate_witness(
        src, {"a": 3, "b": 11}, BN254_FR, sym_path=path
    )
    assert wit == [1, 33, 11, 3]

    # missing names fail loudly
    with tempfile.NamedTemporaryFile("w", suffix=".sym", delete=False) as fh:
        fh.write("1,1,0,main.nope\n")
        path = fh.name
    with pytest.raises(ValueError, match="not found"):
        witness.generate_witness(src, {"a": 3, "b": 11}, BN254_FR,
                                 sym_path=path)
