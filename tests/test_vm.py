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
