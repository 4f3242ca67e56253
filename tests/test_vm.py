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


# -- Rep3 MPC witness-extension tier (mirrors the reference's
# tests/tests/circom/witness_extension_tests/rep3.rs) -----------------------
#
# Each KAT runs as 3 party threads over LocalNetwork through the Rep3 VM
# driver; the recombined witness is compared against the circom wtns —
# positionally when the -O2 KAT keeps every wire, else on the stable
# [1, outputs] prefix (the KATs ship no .sym, so the eliminated-wire
# layout cannot be reconstructed for the remainder).
# A small-circuit subset runs by default; the full 65-circuit corpus is
# slow-marked (--runslow / COSNARKS_SLOW=1).

REP3_FAST_KATS = [
    "iszero", "multiplier2", "control_flow", "mimc_test", "sqrt_test",
    "babyadd_tester", "montgomeryadd", "winner",
]


def _run_rep3_kat(name):
    from cosnarks_tpu.mpc.net.local import run_parties
    from cosnarks_tpu.mpc.rep3_scalar import HostRng, Rep3Scalar
    from cosnarks_tpu.vm import mpc_run
    from cosnarks_tpu.vm.rep3_driver import Rep3Driver

    prog = lang.load_program(
        TESTS + name + ".circom", search_paths=[TESTS, TESTS + "libs"]
    )
    ran = 0
    for i in range(3):
        path = KATS + name + f"/input{i}.json"
        if not os.path.exists(path):
            continue
        inp = json.loads(open(path).read())
        shared = mpc_run.split_input_tree(inp, BN254_FR)

        def party(k):
            def go(net):
                keys = [bytes([7 + j]) * 32 for j in range(3)]
                rng = HostRng(keys[k], keys[(k + 1) % 3])
                proto = Rep3Scalar(net, rng, BN254_FR.p)
                driver = Rep3Driver(proto, BN254_FR)
                vm = interp.WitnessVM(prog, BN254_FR, driver=driver)
                main = vm.run(shared[k])
                return (witness.witness_vector(vm, main),
                        len(vm.main_outputs(main)))
            return go

        res = run_parties([party(0), party(1), party(2)], timeout=600.0)
        wit = mpc_run.combine_witnesses([r[0] for r in res], BN254_FR)
        _, w = wtns.load_wtns(KATS + name + f"/witness{i}.wtns")
        exp = [limbs_to_int(x) for x in w]
        if len(exp) == len(wit):
            assert exp == wit, f"{name} input{i}: full Rep3 witness mismatch"
        else:
            nout = res[0][1]
            assert wit[1:1 + nout] == exp[1:1 + nout], (
                f"{name} input{i}: Rep3 outputs mismatch (-O2 layout)")
        ran += 1
    assert ran > 0


@pytest.mark.parametrize("name", [k for k in REP3_FAST_KATS
                                  if k in ALL_KATS])
def test_kat_rep3_fast(name):
    _run_rep3_kat(name)


@pytest.mark.slow
@pytest.mark.parametrize("name", [k for k in ALL_KATS
                                  if k not in REP3_FAST_KATS])
def test_kat_rep3_corpus(name):
    _run_rep3_kat(name)


# -- batched Rep3 driver (B lanes per protocol round) ------------------------

BATCHED_KATS = ["mimc_test", "iszero", "sqrt_test", "control_flow",
                "babyadd_tester"]


@pytest.mark.parametrize("name", [k for k in BATCHED_KATS if k in ALL_KATS])
def test_kat_rep3_batched(name):
    """B-lane batched Rep3 witness extension vs the plain VM per lane
    (vm/rep3_batched.py; amortizes one network round across all lanes)."""
    from cosnarks_tpu.mpc.net.local import run_parties
    from cosnarks_tpu.vm.rep3_batched import (
        BatchedHostRng, BatchedRep3Driver, BatchedRep3Scalar,
        combine_witnesses_batch, split_input_batch)

    B = 5
    prog = lang.load_program(
        TESTS + name + ".circom", search_paths=[TESTS, TESTS + "libs"]
    )
    avail = []
    for i in range(8):
        path = KATS + name + f"/input{i}.json"
        if os.path.exists(path):
            avail.append(json.loads(open(path).read()))
    lane_inputs = [avail[L % len(avail)] for L in range(B)]

    plain_wits = []
    for inp in lane_inputs:
        vm = interp.WitnessVM(prog, BN254_FR)
        plain_wits.append(witness.witness_vector(vm, vm.run(inp)))

    shared = split_input_batch(lane_inputs, BN254_FR)

    def party(k):
        def go(net):
            keys = [bytes([7 + j]) * 32 for j in range(3)]
            rng = BatchedHostRng(keys[k], keys[(k + 1) % 3], B)
            proto = BatchedRep3Scalar(net, rng, BN254_FR.p)
            driver = BatchedRep3Driver(proto, BN254_FR)
            vm = interp.WitnessVM(prog, BN254_FR, driver=driver)
            return witness.witness_vector(vm, vm.run(shared[k]))

        return go

    res = run_parties([party(0), party(1), party(2)], timeout=600.0)
    wits = combine_witnesses_batch(res, BN254_FR, B)
    for L in range(B):
        assert wits[L] == plain_wits[L], f"lane {L} mismatch"


# -- Shamir VM driver (arithmetic circuits; 3 parties, t=1) -------------------

SHAMIR_KATS = ["multiplier2", "mimc_test", "control_flow"]


@pytest.mark.parametrize("name", [k for k in SHAMIR_KATS if k in ALL_KATS])
def test_kat_shamir(name):
    """Shamir witness extension on arithmetic circuits vs the circom wtns
    (vm/shamir_driver.py; reference circom-mpc-vm mpc/shamir.rs — bit ops
    are out of domain there too and raise)."""
    from cosnarks_tpu.mpc.net.local import run_parties
    from cosnarks_tpu.vm import shamir_driver as sd

    prog = lang.load_program(
        TESTS + name + ".circom", search_paths=[TESTS, TESTS + "libs"]
    )
    ran = 0
    for i in range(3):
        path = KATS + name + f"/input{i}.json"
        if not os.path.exists(path):
            continue
        inp = json.loads(open(path).read())

        def share_tree(v):
            if isinstance(v, (list, tuple)):
                parts = [share_tree(x) for x in v]
                return [[q[k] for q in parts] for k in range(3)]
            return sd.share_value(BN254_FR, int(v), 3, 1)

        shared = [{}, {}, {}]
        for key, v in inp.items():
            r = share_tree(v)
            for k in range(3):
                shared[k][key] = r[k]

        def party(k):
            def go(net):
                drv = sd.setup_shamir_vm(net, BN254_FR, t=1,
                                         seed=bytes([3]) * 32)
                vm = interp.WitnessVM(prog, BN254_FR, driver=drv)
                main = vm.run(shared[k])
                return witness.witness_vector(vm, main)

            return go

        res = run_parties([party(0), party(1), party(2)], timeout=600.0)
        _, w = wtns.load_wtns(KATS + name + f"/witness{i}.wtns")
        exp = [limbs_to_int(x) for x in w]
        n = len(res[0])
        got = []
        for j in range(n):
            vals = [r[j] for r in res]
            if all(not isinstance(v, sd.SShare) for v in vals):
                got.append(int(vals[0]) % BN254_FR.p)
            else:
                shs = [v if isinstance(v, sd.SShare)
                       else sd.SShare(int(v) % BN254_FR.p) for v in vals]
                got.append(sd.combine_shares(BN254_FR, shs, [0, 1, 2]))
        if len(exp) == len(got):
            assert got == exp, f"{name} input{i}: Shamir witness mismatch"
        ran += 1
    assert ran > 0
