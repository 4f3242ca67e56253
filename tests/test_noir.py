"""co-ACVM witness-extension tests against the Noir KAT corpus
(test_vectors/noir/*) — mirrors the reference's
tests/tests/noir/witness_extension_tests: solve each program plain and
3-party Rep3, compare the (recombined) witness map against the
nargo-generated witness stack."""

import tomllib

import pytest

from cosnarks_tpu.ff.spec import BN254_FR
from cosnarks_tpu.noir import acir, solver
from cosnarks_tpu.vm.interp import PlainDriver

BASE = "/root/reference/test_vectors/noir"

PROGRAMS = [
    "add3u64",
    "addition_multiplication",
    "approx_sigmoid",
    "assert",
    "blackbox_and",
    "blackbox_poseidon2",
    "blackbox_xor",
    "get_bytes",
    "if_then",
    "negative",
    "poseidon",
    "poseidon2",
    "poseidon_assert",
    "poseidon_input2",
    "poseidon_stdlib",
    "quantized",
    "random_access",
    "recursion",
    "bb_sha256_compression",
    "blake2s",
    "blake3",
    "aes128",
    "embedded_curve_add",
    "pedersen_commitment",
    "pedersen_hash",
    pytest.param("recursion_zk", marks=pytest.mark.xfail(
        reason="shipped Prover.toml is stale vs its KAT witness stack "
               "(raw input values differ)")),
    "slice",
    "to_radix32",
    "unconstrained_fn",
    "unconstrained_fn_field",
    "unconstrained_fn_not",
    "write_access",
]

PLAIN_ONLY = []


def _load(name):
    art = acir.load_artifact(f"{BASE}/{name}/kat/{name}.json")
    prover = tomllib.load(open(f"{BASE}/{name}/Prover.toml", "rb"))
    inputs = acir.encode_inputs(art.abi, prover, BN254_FR.p)
    expected = acir.load_witness_stack(f"{BASE}/{name}/kat/{name}.gz")
    return art, inputs, expected


@pytest.mark.parametrize("name", PROGRAMS + PLAIN_ONLY)
def test_noir_plain(name):
    art, inputs, expected = _load(name)
    wit = solver.solve_program(art, PlainDriver(BN254_FR), BN254_FR.p,
                               inputs)
    for k, v in expected.items():
        assert k in wit, f"witness {k} unsolved"
        assert int(wit[k]) == v, f"witness {k}: {wit[k]} != {v}"


@pytest.mark.parametrize("name", PROGRAMS)
def test_noir_rep3(name):
    from cosnarks_tpu.mpc.net.local import run_parties
    from cosnarks_tpu.mpc.rep3_scalar import AShare, HostRng, Rep3Scalar
    from cosnarks_tpu.vm.rep3_driver import Rep3Driver

    art, inputs, expected = _load(name)
    shares = [Rep3Scalar.share(v, BN254_FR.p) for v in inputs]

    def party(k):
        def go(net):
            keys = [bytes([31 + j]) * 32 for j in range(3)]
            rng = HostRng(keys[k], keys[(k + 1) % 3])
            proto = Rep3Scalar(net, rng, BN254_FR.p)
            drv = Rep3Driver(proto, BN254_FR)
            wit = solver.solve_program(
                art, drv, BN254_FR.p, [s[k] for s in shares])
            return {i: v for i, v in wit.items()}

        return go

    res = run_parties([party(0), party(1), party(2)])
    for k, v in expected.items():
        vals = [r[k] for r in res]
        if all(not isinstance(x, AShare) for x in vals):
            got = int(vals[0])
        else:
            shs = []
            for i, x in enumerate(vals):
                if isinstance(x, AShare):
                    shs.append(x)
                else:
                    from cosnarks_tpu.vm.mpc_run import promote_trivial

                    shs.append(promote_trivial(x, i, BN254_FR.p))
            got = Rep3Scalar.combine(shs, BN254_FR.p)
        assert got == v, f"witness {k}: {got} != {v}"


def test_conoir_cli_pipeline(tmp_path):
    """co-noir CLI: split-input -> 3-party generate-witness over TCP ->
    recombine and compare vs the nargo witness stack (co-noir.rs pipeline
    in miniature, program `poseidon`)."""
    import json
    import threading

    from cosnarks_tpu.noir import cli as ncli

    name = "poseidon"
    circuit = f"{BASE}/{name}/kat/{name}.json"
    expected = acir.load_witness_stack(f"{BASE}/{name}/kat/{name}.gz")

    ncli.main(["split-input", "--circuit", circuit,
               "--input", f"{BASE}/{name}/Prover.toml",
               "--out-dir", str(tmp_path)])
    base = "Prover.toml"
    for k in range(3):
        assert (tmp_path / f"{base}.{k}.shared").exists()

    # 3 localhost parties, one thread each
    ports = [18750, 18751, 18752]
    for k in range(3):
        lines = [f"my_id = {k}", "insecure_plaintext = true"]
        for j in range(3):
            lines += ["", "[[parties]]", f"id = {j}",
                      f'dns_name = "127.0.0.1:{ports[j]}"']
        (tmp_path / f"party{k}.toml").write_text("\n".join(lines))

    errs = []

    def party(k):
        try:
            ncli.main([
                "generate-witness", "--circuit", circuit,
                "--input", str(tmp_path / f"{base}.{k}.shared"),
                "--protocol", "REP3",
                "--config", str(tmp_path / f"party{k}.toml"),
                "--out", str(tmp_path / f"witness.{k}.shared")])
        except Exception as e:
            errs.append((k, e))

    ts = [threading.Thread(target=party, args=(k,)) for k in range(3)]
    for t in ts:
        t.start()
    for t in ts:
        t.join(120)
    assert not errs, errs

    parts = [json.load(open(tmp_path / f"witness.{k}.shared"))["entries"]
             for k in range(3)]
    p = BN254_FR.p
    for k_idx, v in expected.items():
        key = str(k_idx)
        a0 = parts[0][key][0]
        a1 = parts[1][key][0]
        a2 = parts[2][key][0]
        assert (a0 + a1 + a2) % p == v, f"witness {k_idx} mismatch"
