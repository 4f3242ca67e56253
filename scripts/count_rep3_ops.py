"""Count Rep3Scalar op invocations + wall time per op during a time-boxed
SHA KAT run (party 0 only instruments; raises _Stop after BUDGET seconds)."""
import collections
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

from cosnarks_tpu.ff.spec import BN254_FR
from cosnarks_tpu.mpc.net.local import run_parties
from cosnarks_tpu.mpc.rep3_scalar import HostRng, Rep3Scalar
from cosnarks_tpu.vm import interp, lang, mpc_run
from cosnarks_tpu.vm.rep3_driver import Rep3Driver

NAME = sys.argv[1] if len(sys.argv) > 1 else "sha256_test512"
BUDGET = float(os.environ.get("BUDGET", "90"))
TESTS = "/root/reference/test_vectors/WitnessExtension/tests/"
KATS = "/root/reference/test_vectors/WitnessExtension/kats/"

prog = lang.load_program(TESTS + NAME + ".circom",
                         search_paths=[TESTS, TESTS + "libs"])
inp = json.loads(open(KATS + NAME + "/input0.json").read())
shared = mpc_run.split_input_tree(inp, BN254_FR)

counts = collections.Counter()
times = collections.Counter()
t_start = [None]


class _Stop(Exception):
    pass


def instrument(proto):
    for name in ("mul_many", "open_many", "mul_open_many", "a2b_many",
                 "b2a_many", "bit_inject_many", "band_many", "open_bit_many",
                 "_kogge_stone_many", "binary_add_many", "bcmux_many",
                 "_and_twice_many"):
        orig = getattr(proto, name)

        def wrap(*a, _o=orig, _n=name, **kw):
            if time.time() - t_start[0] > BUDGET:
                raise _Stop()
            t0 = time.time()
            r = _o(*a, **kw)
            counts[_n] += 1
            sz = len(a[1]) if len(a) > 1 and isinstance(a[1], list) else 1
            counts[_n + "_elems"] += sz
            times[_n] += time.time() - t0
            return r

        setattr(proto, name, wrap)
    return proto


def party(k):
    def go(net):
        keys = [bytes([7 + j]) * 32 for j in range(3)]
        rng = HostRng(keys[k], keys[(k + 1) % 3])
        proto = Rep3Scalar(net, rng, BN254_FR.p)
        if k == 0:
            instrument(proto)
        driver = Rep3Driver(proto, BN254_FR)
        vm = interp.WitnessVM(prog, BN254_FR, driver=driver)
        try:
            vm.run(shared[k])
        except _Stop:
            pass
        except Exception as e:
            if k == 0:
                print("party0 err:", repr(e)[:120])
        return 1

    return go


t_start[0] = time.time()
try:
    run_parties([party(0), party(1), party(2)], timeout=BUDGET + 60)
except Exception as e:
    print("harness:", repr(e)[:100])
total = time.time() - t_start[0]
print(f"wall {total:.1f}s")
for name, c in counts.most_common(20):
    print(f"  {name}: {c}  ({times.get(name.replace('_elems',''), 0):.1f}s)")
