"""Probe: run every WitnessExtension KAT through the 3-party Rep3 VM path
and compare the recombined full witness against the reference wtns.
Writes incremental results to scripts/probe_rep3.log."""
import glob
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

from cosnarks_tpu.ff.bigint import limbs_to_int
from cosnarks_tpu.ff.spec import BN254_FR
from cosnarks_tpu.io import wtns
from cosnarks_tpu.mpc.net.local import run_parties
from cosnarks_tpu.mpc.rep3_scalar import HostRng, Rep3Scalar
from cosnarks_tpu.vm import interp, lang, mpc_run, witness
from cosnarks_tpu.vm.rep3_driver import Rep3Driver

TESTS = "/root/reference/test_vectors/WitnessExtension/tests/"
KATS = "/root/reference/test_vectors/WitnessExtension/kats/"
LOG = os.path.join(os.path.dirname(os.path.abspath(__file__)), "probe_rep3.log")
PER_KAT_TIMEOUT = float(os.environ.get("KAT_TIMEOUT", "90"))

names = sorted(
    (
        d.rstrip("/").split("/")[-1]
        for d in glob.glob(KATS + "*/")
        if os.path.exists(TESTS + d.rstrip("/").split("/")[-1] + ".circom")
    ),
    key=lambda n: os.path.getsize(TESTS + n + ".circom"),
)
if len(sys.argv) > 1:
    names = [n for n in names if n in sys.argv[1:]]

log = open(LOG, "a", buffering=1)
log.write(f"=== probe start {time.strftime('%H:%M:%S')} ===\n")

ok, fail = [], []
for name in names:
    t0 = time.time()
    try:
        prog = lang.load_program(
            TESTS + name + ".circom", search_paths=[TESTS, TESTS + "libs"]
        )
        ran = False
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
                    return (
                        witness.witness_vector(vm, main),
                        len(vm.main_outputs(main)),
                    )

                return go

            res = run_parties(
                [party(0), party(1), party(2)], timeout=PER_KAT_TIMEOUT
            )
            prog_nout = res[0][1]
            wit = mpc_run.combine_witnesses([r[0] for r in res], BN254_FR)
            _, w = wtns.load_wtns(KATS + name + f"/witness{i}.wtns")
            exp = [limbs_to_int(x) for x in w]
            if len(exp) == len(wit):
                bad = [j for j in range(len(exp)) if exp[j] != wit[j]]
                if bad:
                    raise AssertionError(
                        f"input{i}: {len(bad)} wires differ, first {bad[:5]}"
                    )
            else:
                # KAT witness is O1/O2-simplified (fewer wires); compare the
                # stable prefix [1, outputs] like the plain KAT tests
                got = wit[1 : 1 + prog_nout]
                want = exp[1 : 1 + prog_nout]
                if got != want:
                    raise AssertionError(
                        f"input{i}: outputs differ (O1 layout, "
                        f"{len(wit)}/{len(exp)} wires)"
                    )
            ran = True
        if not ran:
            raise AssertionError("no inputs")
        ok.append(name)
        log.write(f"OK   {name} ({time.time()-t0:.1f}s)\n")
    except Exception as e:
        fail.append((name, repr(e)[:200]))
        log.write(f"FAIL {name} ({time.time()-t0:.1f}s): {repr(e)[:200]}\n")

log.write(f"=== {len(ok)} ok / {len(fail)} fail ===\n")
