import random, jax
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
print("devices:", jax.devices())
from cosnarks_tpu.ff import mont
from cosnarks_tpu.ff.spec import BN254_FR as F
from cosnarks_tpu.mpc import bridges, rep3, shamir
from cosnarks_tpu.mpc.net.local import run_parties
from cosnarks_tpu.ec import curve as ec, host
from cosnarks_tpu.ec.curves import BN254_G1 as spec

rng = random.Random(42)
# --- shared-poly eval (rep3) vs int oracle ---
coeffs = [rng.randrange(F.p) for _ in range(7)]
x = rng.randrange(F.p)
want = 0
for c in reversed(coeffs):
    want = (want * x + c) % F.p
per_coeff = [rep3.share_field_elements(F, [c], rng) for c in coeffs]
xm = mont.encode(F, [x])[0]
def party(net):
    return rep3.eval_poly(F, [pc[net.id] for pc in per_coeff], xm)
outs = run_parties([party] * 3)
got = rep3.combine_field_elements(F, outs)[0]
assert got == want, (got, want)
print("rep3 eval_poly on TPU: OK")

# --- rep3->shamir point bridge vs host-int EC oracle ---
hc = host.host_curve(spec)
k = rng.randrange(1, 1 << 30)
want_pt = hc.affine_ints(hc.mul(hc.generator, k))
k1, k2 = rng.randrange(1, 1 << 20), rng.randrange(1, 1 << 20)
p1, p2 = hc.mul(hc.generator, k1), hc.mul(hc.generator, k2)
p0 = hc.add(hc.lift_affine(want_pt), hc.neg(hc.add(p1, p2)))
parts = [hc.affine_ints(p0), hc.affine_ints(p1), hc.affine_ints(p2)]
devpts = [tuple(xx[0] for xx in ec.encode_points(spec, [p])) for p in parts]
def party2(net):
    st = shamir.ShamirState.setup(net, spec.scalar_field, 1, pairs=4)
    repl = rep3.point_reshare(spec, devpts[net.id], net)
    sh = bridges.translate_rep3_point_to_shamir(spec, repl, net, st)
    return shamir.open_point(spec, sh, net, st)
outs2 = run_parties([party2] * 3)
for o in outs2:
    got2 = ec.decode_points(spec, jax.tree.map(lambda t: t[None], o))[0]
    assert got2 == want_pt, (got2, want_pt)
print("rep3->shamir point bridge on TPU: OK")
