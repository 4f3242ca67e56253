"""Synthetic Groth16 trusted setup (snarkjs zkey conventions) for
benchmarks and stress tests.

Builds a Groth16Zkey for a squaring-chain circuit (w_{i+1} = w_i^2) of any
constraint count, with the snarkjs setup conventions the prover/verifier
already implement against real zkeys (io/zkey.py, groth16/witness_map.py):

- public-input binding rows appended to the A matrix
  (A[n_constraints + i, i] = 1 for each instance signal i),
- domain = next power of two of n_constraints + n_public + 1, snarkjs
  root-of-unity convention (ntt.groth16_domain),
- h_query in the odd-coset Lagrange basis matching the CircomReduction
  witness map: H[j] = [ L~_j(tau) * Z(tau) / (delta * (rho^N - 1)) ]_1
  where rho is the 2N-th root used for the coset shift and L~_j is the
  Lagrange basis over the shifted points rho*omega^j — so that
  sum_j (AB-C)(rho omega^j) * H[j] = [ h(tau) Z(tau) / delta ]_1.

The toxic waste is derived from a seed and immediately discarded; this is
for self-verified benchmarking only (the resulting proofs verify under
the emitted vk with the real pairing check). Query points are produced
with the batched device scalar-mul (ec.scalar_mul) — ~N fixed-base muls
per query array — and the whole zkey can be cached to disk.
"""

from __future__ import annotations

import functools
import hashlib
import os

import jax
import jax.numpy as jnp
import numpy as np

from ..ec import curve as ec
from ..ec import curves
from ..ff import mont
from ..ff.bigint import ints_to_limbs
from ..ff.spec import BN254_FQ, BN254_FR
from ..io.zkey import Groth16Zkey
from ..poly import ntt


def _batch_inv(vals, p):
    n = len(vals)
    prefix = [1] * (n + 1)
    for i, v in enumerate(vals):
        prefix[i + 1] = prefix[i] * v % p
    inv = pow(prefix[n], -1, p)
    out = [0] * n
    for i in range(n - 1, -1, -1):
        out[i] = prefix[i] * inv % p
        inv = inv * vals[i] % p
    return out


_FB_W = 8  # fixed-base window width (bits); 16-bit limbs split evenly


_fb_tables: dict = {}


def _fixed_base_table(spec):
    """Windowed fixed-base table T[j][d] = [d * 2^(8j)] G (Jacobian, on
    device): one batched 256-bit double-and-add over nwin*255 lanes, then
    every later [s]G costs nwin-1 complete adds instead of a full
    double-and-add chain. d = 0 rows are the point at infinity (Z = 0),
    which the complete `add` absorbs."""
    key = id(spec)
    if key in _fb_tables:
        return _fb_tables[key]
    F = spec.scalar_field
    nwin = F.nlimbs * 16 // _FB_W
    ds = [(d << (_FB_W * j)) % F.p
          for j in range(nwin) for d in range(1, 1 << _FB_W)]
    ks = jnp.asarray(ints_to_limbs(ds, F.nlimbs))
    gen = ec.encode_points(spec, [spec.generator])
    g = tuple(jnp.broadcast_to(x[0], (ks.shape[0],) + x.shape[1:])
              for x in gen)
    pts = ec.scalar_mul(spec, g, ks)
    # prepend the infinity row per window: table shape (nwin, 256, ...)
    full = []
    for c, x in enumerate(pts):
        arr = np.asarray(jax.device_get(x)).reshape(
            (nwin, (1 << _FB_W) - 1) + x.shape[1:])
        z = np.zeros((nwin, 1) + x.shape[1:], arr.dtype)  # (0,0,0) = inf
        full.append(jnp.asarray(np.concatenate([z, arr], axis=1)))
    table = tuple(full)
    _fb_tables[key] = table
    return table


@functools.partial(jax.jit, static_argnums=0)
def _fb_chunk(spec, table, digits):
    """Sum of table windows selected by per-scalar digits: (n, nwin)
    uint32 -> n Jacobian points, nwin-1 complete adds."""
    nwin = digits.shape[1]
    acc = tuple(x[0][digits[:, 0]] for x in table)
    for j in range(1, nwin):
        q = tuple(x[j][digits[:, j]] for x in table)
        acc = ec.add(spec, acc, q)
    return ec.to_affine(spec, acc)


def _fixed_base_g1(spec, scalars: list[int], chunk: int | None = None):
    """[s]G for a list of standard-form scalars, batched on device via the
    windowed table. Chunked to bound HBM (G2's Fq2 coordinates double the
    footprint)."""
    F = spec.scalar_field
    if chunk is None:
        chunk = (1 << 17) if spec.ops.coord_ndim == 1 else (1 << 15)
    if len(scalars) <= 2048 and id(spec) not in _fb_tables:
        # below the table's amortization point: direct double-and-add
        gen = ec.encode_points(spec, [spec.generator])
        ks = jnp.asarray(ints_to_limbs([s % F.p for s in scalars],
                                       F.nlimbs))
        g = tuple(jnp.broadcast_to(x[0], (ks.shape[0],) + x.shape[1:])
                  for x in gen)
        pts = ec.to_affine(spec, ec.scalar_mul(spec, g, ks))
        return tuple(np.asarray(jax.device_get(x)) for x in pts)
    table = _fixed_base_table(spec)
    outs = []
    for lo in range(0, len(scalars), chunk):
        limbs = np.asarray(ints_to_limbs(
            [s % F.p for s in scalars[lo:lo + chunk]], F.nlimbs))
        digits = np.stack([limbs & 255, limbs >> 8], axis=-1).reshape(
            limbs.shape[0], -1).astype(np.uint32)
        pts = _fb_chunk(spec, table, jnp.asarray(digits))
        outs.append(tuple(np.asarray(jax.device_get(x)) for x in pts))
    return tuple(np.concatenate([o[i] for o in outs]) for i in range(3))


def _to_zkey_g1(pts) -> np.ndarray:
    """Device affine (X, Y, Z) -> zkey (N, 2, nl) layout; Z==0 rows become
    all-zero (snarkjs infinity encoding)."""
    X, Y, Z = pts
    fin = ~np.all(Z == 0, axis=-1)
    arr = np.stack([X, Y], axis=1)
    arr[~fin] = 0
    return arr


def _to_zkey_g2(pts) -> np.ndarray:
    X, Y, Z = pts
    fin = ~np.all(Z.reshape(Z.shape[0], -1) == 0, axis=-1)
    arr = np.stack([X, Y], axis=1)
    arr[~fin] = 0
    return arr


def synthetic_zkey(n_constraints: int, seed: bytes = b"cosnarks-bench",
                   n_public: int = 1) -> tuple[Groth16Zkey, list[int]]:
    """Returns (zkey, witness) for the squaring chain with x = 3."""
    fr, fq = BN254_FR, BN254_FQ
    p = fr.p
    ncon, npub = n_constraints, n_public
    n_vars = ncon + 2
    N = 1
    while N < ncon + npub + 1:
        N *= 2

    def draw(tag):
        h = hashlib.blake2b(seed + tag, digest_size=32).digest()
        return int.from_bytes(h, "big") % p

    tau, alpha, beta, gamma, delta = (draw(t) for t in
                                      (b"tau", b"alpha", b"beta", b"gamma",
                                       b"delta"))
    dom = ntt.groth16_domain(fr, N)
    omega = dom.group_gen
    rho = ntt.groth16_shift_root(fr, dom)

    # Lagrange values over the base domain: L_j(tau) = Z(tau) w^j / (N (tau - w^j))
    pow_w = [1] * N
    for j in range(1, N):
        pow_w[j] = pow_w[j - 1] * omega % p
    z_tau = (pow(tau, N, p) - 1) % p
    denoms = [(tau - wj) % p for wj in pow_w]
    dinv = _batch_inv(denoms, p)
    n_inv = pow(N, -1, p)
    L = [z_tau * wj % p * di % p * n_inv % p for wj, di in zip(pow_w, dinv)]

    # QAP values per signal (squaring chain + snarkjs public binding rows)
    A = [0] * n_vars
    B = [0] * n_vars
    Cv = [0] * n_vars
    for j in range(ncon):
        A[j + 1] = (A[j + 1] + L[j]) % p
        B[j + 1] = (B[j + 1] + L[j]) % p
        Cv[j + 2] = (Cv[j + 2] + L[j]) % p
    for i in range(npub + 1):
        A[i] = (A[i] + L[ncon + i]) % p

    g1 = curves.BN254_G1
    g2 = curves.BN254_G2
    dinv_delta = pow(delta, -1, p)
    dinv_gamma = pow(gamma, -1, p)

    a_q = _fixed_base_g1(g1, A)
    b1_q = _fixed_base_g1(g1, B)
    lc = [(beta * A[i] + alpha * B[i] + Cv[i]) % p for i in range(n_vars)]
    ic_scalars = [v * dinv_gamma % p for v in lc[:npub + 1]]
    l_scalars = [v * dinv_delta % p for v in lc[npub + 1:]]
    ic_q = _fixed_base_g1(g1, ic_scalars)
    l_q = _fixed_base_g1(g1, l_scalars)

    # h_query over the shifted (odd-coset) Lagrange basis
    rhoN = pow(rho, N, p)
    zshift_tau = (pow(tau, N, p) - rhoN) % p
    pts = [rho * wj % p for wj in pow_w]
    hden = [(tau - pt) % p for pt in pts]
    hinv = _batch_inv(hden, p)
    # L~_j(tau) = Zshift(tau) * p_j / (N * (tau - p_j) * p_j^N), with
    # p_j^N = rho^N; and sum_j (AB-C)(p_j) L~_j(tau) = (rho^N - 1) h(tau)
    scale = (z_tau * dinv_delta % p * pow((rhoN - 1) % p, -1, p)
             % p * n_inv % p * zshift_tau % p * pow(rhoN, -1, p) % p)
    h_scalars = [scale * pt % p * hi % p for pt, hi in zip(pts, hinv)]
    h_q = _fixed_base_g1(g1, h_scalars)

    b2_q = tuple(
        np.asarray(x) for x in _fixed_base_g1(g2, B))

    onesies = _fixed_base_g1(g1, [alpha, beta, delta])
    alpha_g1 = _to_zkey_g1(tuple(x[:1] for x in onesies))[0]
    beta_g1 = _to_zkey_g1(tuple(x[1:2] for x in onesies))[0]
    delta_g1 = _to_zkey_g1(tuple(x[2:3] for x in onesies))[0]
    twos = _fixed_base_g1(g2, [beta, gamma, delta])
    beta_g2 = _to_zkey_g2(tuple(x[:1] for x in twos))[0]
    gamma_g2 = _to_zkey_g2(tuple(x[1:2] for x in twos))[0]
    delta_g2 = _to_zkey_g2(tuple(x[2:3] for x in twos))[0]

    # COO coefficient matrices (zkey stores A and B), values in the zkey's
    # double-Montgomery form: witness_map applies one Montgomery reduction
    one_zkey = ints_to_limbs(
        [fr.to_mont_int(fr.to_mont_int(1))], fr.nlimbs)[0]
    rows_a = list(range(ncon)) + list(range(ncon, ncon + npub + 1))
    cols_a = list(range(1, ncon + 1)) + list(range(npub + 1))
    rows_b = list(range(ncon))
    cols_b = list(range(1, ncon + 1))
    nco = len(rows_a) + len(rows_b)
    coeff_matrix = np.array([0] * len(rows_a) + [1] * len(rows_b),
                            dtype=np.uint32)
    coeff_row = np.array(rows_a + rows_b, dtype=np.uint32)
    coeff_col = np.array(cols_a + cols_b, dtype=np.uint32)
    coeff_val = np.broadcast_to(one_zkey, (nco, fr.nlimbs)).copy()

    zkey = Groth16Zkey(
        fq=fq, fr=fr, n_vars=n_vars, n_public=npub, domain_size=N,
        alpha_g1=alpha_g1, beta_g1=beta_g1, beta_g2=beta_g2,
        gamma_g2=gamma_g2, delta_g1=delta_g1, delta_g2=delta_g2,
        ic=_to_zkey_g1(ic_q),
        coeff_matrix=coeff_matrix, coeff_row=coeff_row,
        coeff_col=coeff_col, coeff_val=coeff_val,
        a_query=_to_zkey_g1(a_q), b_g1_query=_to_zkey_g1(b1_q),
        b_g2_query=_to_zkey_g2(b2_q), c_query=_to_zkey_g1(l_q),
        h_query=_to_zkey_g1(h_q),
    )

    # witness: squaring chain from x = 3
    w = [1, 3]
    for _ in range(ncon):
        w.append(w[-1] * w[-1] % p)
    return zkey, w[:n_vars]


def cached_synthetic_zkey(n_constraints: int, cache_dir: str | None = None):
    if cache_dir is None:
        cache_dir = os.environ.get("COSNARKS_ZKEY_CACHE")
    if cache_dir is None:
        # user-scoped 0700 cache: a fixed world-writable /tmp path would
        # let another local user pre-seed a poisoned zkey
        from ..honk.crs import cache_home

        cache_dir = cache_home("zkeys")
    else:
        os.makedirs(cache_dir, exist_ok=True)
    path = os.path.join(cache_dir, f"synthetic_{n_constraints}.npz")
    if os.path.exists(path):
        data = np.load(path)
        fr, fq = BN254_FR, BN254_FQ
        zkey = Groth16Zkey(
            fq=fq, fr=fr, n_vars=int(data["n_vars"]),
            n_public=int(data["n_public"]),
            domain_size=int(data["domain_size"]),
            alpha_g1=data["alpha_g1"], beta_g1=data["beta_g1"],
            beta_g2=data["beta_g2"], gamma_g2=data["gamma_g2"],
            delta_g1=data["delta_g1"], delta_g2=data["delta_g2"],
            ic=data["ic"], coeff_matrix=data["coeff_matrix"],
            coeff_row=data["coeff_row"], coeff_col=data["coeff_col"],
            coeff_val=data["coeff_val"], a_query=data["a_query"],
            b_g1_query=data["b_g1_query"], b_g2_query=data["b_g2_query"],
            c_query=data["c_query"], h_query=data["h_query"],
        )
        return zkey, [int(x) for x in data["witness"]]
    zkey, w = synthetic_zkey(n_constraints)
    np.savez(path, n_vars=zkey.n_vars, n_public=zkey.n_public,
             domain_size=zkey.domain_size, alpha_g1=zkey.alpha_g1,
             beta_g1=zkey.beta_g1, beta_g2=zkey.beta_g2,
             gamma_g2=zkey.gamma_g2, delta_g1=zkey.delta_g1,
             delta_g2=zkey.delta_g2, ic=zkey.ic,
             coeff_matrix=zkey.coeff_matrix, coeff_row=zkey.coeff_row,
             coeff_col=zkey.coeff_col, coeff_val=zkey.coeff_val,
             a_query=zkey.a_query, b_g1_query=zkey.b_g1_query,
             b_g2_query=zkey.b_g2_query, c_query=zkey.c_query,
             h_query=zkey.h_query,
             witness=np.array([str(x) for x in w]))
    return zkey, w
