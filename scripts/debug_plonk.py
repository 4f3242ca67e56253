"""Pure-python-int PLONK round 1-5 oracle on multiplier2 (domain 8) with
deterministic blinding b_i = i; checks against the reference's round-4
eval vector, then against prove.py stage by stage."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np

from cosnarks_tpu.ff.bigint import limbs_to_int
from cosnarks_tpu.io import wtns
from cosnarks_tpu.io.zkey import load_plonk_zkey
from cosnarks_tpu.plonk.prove import Transcript

BASE = "/root/reference/test_vectors/Plonk/bn254/multiplier2"
zk = load_plonk_zkey(BASE + "/circuit.zkey")
fr, fq = zk.fr, zk.fq
p = fr.p
n = zk.domain_size

_, w = wtns.load_wtns(BASE + "/witness.wtns")
wit = [limbs_to_int(x) for x in w]
publics = [0] + wit[1 : zk.n_public + 1]
private = wit[zk.n_public + 1 :]

roots = fr.groth16_roots()
pw = n.bit_length() - 1
w_n = roots[pw]
w_4n = roots[pw + 2]


def fft(coeffs, root, size):
    return [
        sum(c * pow(root, i * j, p) for j, c in enumerate(coeffs)) % p
        for i in range(size)
    ]


def ifft(evals, root, size):
    ninv = pow(size, -1, p)
    rinv = pow(root, -1, p)
    return [
        sum(e * pow(rinv, i * j, p) for j, e in enumerate(evals)) * ninv % p
        for i in range(size)
    ]


def get_witness(i):
    if i <= zk.n_public:
        return publics[i]
    return private[i - zk.n_public - 1]


def decm(l):
    return fr.from_mont_int(limbs_to_int(l))


b = list(range(11))

# round 1
bufs = {}
polys = {}
ev4 = {}
for name, m, (b0, b1) in (("a", zk.map_a, (0, 1)), ("b", zk.map_b, (2, 3)),
                          ("c", zk.map_c, (4, 5))):
    buf = [get_witness(int(i)) for i in m] + [0] * (n - len(m))
    poly = ifft(buf, w_n, n)
    e4 = fft(poly, w_4n, 4 * n)
    pb = list(poly)
    pb[0] = (pb[0] - b[b1]) % p
    pb[1] = (pb[1] - b[b0]) % p
    pb += [b[b1], b[b0]]
    bufs[name], polys[name], ev4[name] = buf, pb, e4

from cosnarks_tpu.ec import host
from cosnarks_tpu.ec.curves import BN254_G1 as spec
from cosnarks_tpu.io.zkey import g1_to_ints

hc = host.host_curve(spec)


def commit(poly):
    acc = None
    for i, coef in enumerate(poly):
        if coef == 0:
            continue
        pt = g1_to_ints(fq, zk.p_tau[i])
        if pt is None:
            continue
        t = hc.mul(tuple(hc._lift(x) for x in pt), coef)
        acc = hc.add(acc, t) if acc is not None else t
    return hc._lower(acc) if acc is not None else None


A = commit(polys["a"])
Bc = commit(polys["b"])
C = commit(polys["c"])

ts = Transcript(fr, fq)
for cm in (zk.qm_c, zk.ql_c, zk.qr_c, zk.qo_c, zk.qc_c, zk.s1_c, zk.s2_c,
           zk.s3_c):
    ts.add_point(g1_to_ints(fq, cm))
for v in publics[1:]:
    ts.add_scalar(v)
ts.add_point(A)
ts.add_point(Bc)
ts.add_point(C)
beta = ts.challenge()
t2 = Transcript(fr, fq)
t2.add_scalar(beta)
gamma = t2.challenge()
print("beta", beta)
print("gamma", gamma)

# round 2: z
k1, k2 = zk.k1, zk.k2
s1e = [decm(x) for x in zk.s1[1]]
s2e = [decm(x) for x in zk.s2[1]]
s3e = [decm(x) for x in zk.s3[1]]
num, den = [], []
wv = 1
for i in range(n):
    a_, b_, c_ = bufs["a"][i], bufs["b"][i], bufs["c"][i]
    bw = beta * wv % p
    num.append((a_ + bw + gamma) * (b_ + k1 * bw + gamma) % p
               * (c_ + k2 * bw + gamma) % p)
    den.append((a_ + beta * s1e[4 * i] + gamma) % p
               * (b_ + beta * s2e[4 * i] + gamma) % p
               * (c_ + beta * s3e[4 * i] + gamma) % p)
    wv = wv * w_n % p
z = [1]
for i in range(1, n):
    z.append(z[-1] * num[i - 1] % p * pow(den[i - 1], -1, p) % p)
# snarkjs buffer_z: prefix products incl i then rotate? reference:
# arr[i] = prod_{j<=i}; rotate_right(1) -> z[0] = prod_all, z[i] = prod_{j<i}
prodall = z[-1] * num[n - 1] % p * pow(den[n - 1], -1, p) % p
print("z[0] after rotate should be prod_all:", prodall)
buffer_z = [prodall] + z[1:]
# hmm: rotate_right on [p0..p7] (p_i = prod_{j<=i}) gives [p7, p0...p6]
# = [prod_all, prod_{<=0}, ...]; PLONK wants z(w^0)=1... check both
buffer_z_v2 = [prodall] + z[1:]  # same
zpoly = ifft([1] + z[1:], w_n, n)  # variant A: z[0] = 1
zpoly_v2 = ifft(buffer_z, w_n, n)  # variant B: rotated prefix-incl
ez4 = fft(zpoly, w_4n, 4 * n)
zb = list(zpoly)
zb[0] = (zb[0] - b[8]) % p
zb[1] = (zb[1] - b[7]) % p
zb[2] = (zb[2] - b[6]) % p
zb += [b[8], b[7], b[6]]
Zc = commit(zb)
ts = Transcript(fr, fq)
ts.add_scalar(beta)
ts.add_scalar(gamma)
ts.add_point(Zc)
alpha = ts.challenge()
print("alpha", alpha)
print("A", A)
print("Z", Zc)
