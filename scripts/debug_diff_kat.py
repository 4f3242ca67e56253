"""Differential debug: run one KAT through the plain VM and the 3-party
Rep3 VM, recombine, and report the first wires that diverge (with signal
names). Usage: python scripts/debug_diff_kat.py <kat_name>"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

from cosnarks_tpu.ff.spec import BN254_FR
from cosnarks_tpu.mpc.net.local import run_parties
from cosnarks_tpu.mpc.rep3_scalar import HostRng, Rep3Scalar
from cosnarks_tpu.vm import interp, lang, mpc_run, witness
from cosnarks_tpu.vm.rep3_driver import Rep3Driver

TESTS = "/root/reference/test_vectors/WitnessExtension/tests/"
KATS = "/root/reference/test_vectors/WitnessExtension/kats/"

# collect constraint violations instead of raising so we can diff wires
_viol = []


def _soft_assert_eq(self, l, r, ctx=""):
    if not self.is_shared(l) and not self.is_shared(r):
        if l != r:
            _viol.append(ctx)
        return
    diff = self.sub(l, r)
    if not self.pr.is_zero_open(diff):
        _viol.append(ctx)


Rep3Driver.assert_eq = _soft_assert_eq

name = sys.argv[1]
inp_idx = int(sys.argv[2]) if len(sys.argv) > 2 else 0
prog = lang.load_program(
    TESTS + name + ".circom", search_paths=[TESTS, TESTS + "libs"]
)
inp = json.loads(open(KATS + name + f"/input{inp_idx}.json").read())

# plain run
vm_plain = interp.WitnessVM(prog, BN254_FR)
main_plain = vm_plain.run(inp)
wit_plain = witness.witness_vector(vm_plain, main_plain)

# labels per wire index
labels = {}
try:
    order = witness.witness_labels(vm_plain, main_plain)
    labels = dict(enumerate(order))
except AttributeError:
    pass

shared = mpc_run.split_input_tree(inp, BN254_FR)


def party(k):
    def go(net):
        keys = [bytes([7 + j]) * 32 for j in range(3)]
        rng = HostRng(keys[k], keys[(k + 1) % 3])
        proto = Rep3Scalar(net, rng, BN254_FR.p)
        driver = Rep3Driver(proto, BN254_FR)
        vm = interp.WitnessVM(prog, BN254_FR, driver=driver)
        main = vm.run(shared[k])
        return witness.witness_vector(vm, main)

    return go


res = run_parties([party(0), party(1), party(2)], timeout=600)
wit_mpc = mpc_run.combine_witnesses(res, BN254_FR)

assert len(wit_plain) == len(wit_mpc), (len(wit_plain), len(wit_mpc))
bad = [i for i in range(len(wit_plain)) if wit_plain[i] != wit_mpc[i]]
print(f"{len(bad)} / {len(wit_plain)} wires differ")
for i in bad[:20]:
    print(f"  wire {i} ({labels.get(i, '?')}): plain={wit_plain[i]} "
          f"mpc={wit_mpc[i]}")
