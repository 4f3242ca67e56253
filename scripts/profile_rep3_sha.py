"""Profile one party's Rep3 witness extension on a SHA KAT (cProfile in
party-0 thread; others run normally)."""
import cProfile
import io
import json
import os
import pstats
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

from cosnarks_tpu.ff.spec import BN254_FR
from cosnarks_tpu.mpc.net.local import run_parties
from cosnarks_tpu.mpc.rep3_scalar import HostRng, Rep3Scalar
from cosnarks_tpu.vm import interp, lang, mpc_run
from cosnarks_tpu.vm.rep3_driver import Rep3Driver

NAME = sys.argv[1] if len(sys.argv) > 1 else "sha256_test512"
TESTS = "/root/reference/test_vectors/WitnessExtension/tests/"
KATS = "/root/reference/test_vectors/WitnessExtension/kats/"

prog = lang.load_program(TESTS + NAME + ".circom",
                         search_paths=[TESTS, TESTS + "libs"])
inp = json.loads(open(KATS + NAME + "/input0.json").read())
shared = mpc_run.split_input_tree(inp, BN254_FR)


def party(k):
    def go(net):
        keys = [bytes([7 + j]) * 32 for j in range(3)]
        rng = HostRng(keys[k], keys[(k + 1) % 3])
        proto = Rep3Scalar(net, rng, BN254_FR.p)
        driver = Rep3Driver(proto, BN254_FR)
        vm = interp.WitnessVM(prog, BN254_FR, driver=driver)

        def run():
            return vm.run(shared[k])

        if k == 0:
            pr = cProfile.Profile()
            pr.enable()
            main = run()
            pr.disable()
            s = io.StringIO()
            pstats.Stats(pr, stream=s).sort_stats("cumulative").print_stats(25)
            print(s.getvalue())
        else:
            main = run()
        return 1

    return go


run_parties([party(0), party(1), party(2)], timeout=1200)
print("done")
