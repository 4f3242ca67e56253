"""Dense polynomial / multilinear helpers over BN254 Fr (python ints).

Counterparts of co-noir-common/src/polynomials/polynomial.rs (shifted,
factor_roots, eval_poly, evaluate_mle, add_scaled) and
co-noir-common/src/barycentric.rs (univariate extension over 0..len-1),
plus batch inversion (utils.rs Utils::batch_invert) and the host-side
KZG commitment (Pippenger MSM over the CRS monomials).
"""

from __future__ import annotations

from ..ec import curves
from ..ec.host import host_curve
from ..ff.spec import BN254_FR

R = BN254_FR.p


def batch_invert(vals: list[int], p: int = R) -> list[int]:
    """Montgomery batch inversion; zeros stay zero (utils.rs)."""
    n = len(vals)
    out = [0] * n
    prefix = [1] * (n + 1)
    for i, v in enumerate(vals):
        prefix[i + 1] = prefix[i] * (v if v else 1) % p
    inv = pow(prefix[n], -1, p)
    for i in range(n - 1, -1, -1):
        if vals[i]:
            out[i] = prefix[i] * inv % p
            inv = inv * vals[i] % p
    return out


def eval_poly(coeffs: list[int], x: int, p: int = R) -> int:
    acc = 0
    for c in reversed(coeffs):
        acc = (acc * x + c) % p
    return acc


def factor_roots(coeffs: list[int], root: int, p: int = R) -> list[int]:
    """Divide p(X) by (X - root) in place semantics (polynomial.rs:183)."""
    if root % p == 0:
        return coeffs[1:]
    out = [0] * (len(coeffs) - 1)
    ninv = pow(-root % p, -1, p)
    prev = 0
    for i in range(len(coeffs) - 1):
        prev = (coeffs[i] - prev) * ninv % p
        out[i] = prev
    return out


def evaluate_mle(coeffs: list[int], points: list[int], p: int = R) -> int:
    """Multilinear evaluation: coeffs are evaluations over the hypercube."""
    n = len(points)
    assert len(coeffs) == 1 << n
    cur = list(coeffs)
    for u in points:
        cur = [(cur[2 * i] + u * (cur[2 * i + 1] - cur[2 * i])) % p
               for i in range(len(cur) // 2)]
    return cur[0]


def add_scaled(dst: list[int], src: list[int], scalar: int, p: int = R):
    for i, v in enumerate(src):
        if v:
            dst[i] = (dst[i] + scalar * v) % p


# -- barycentric extension over the domain {0, 1, ..., k-1} -----------------

_EXT_CACHE: dict[tuple[int, int], tuple] = {}


def _extension_consts(length: int, target: int, p: int = R):
    key = (length, target)
    if key not in _EXT_CACHE:
        # denominators d_i = prod_{j != i} (x_i - x_j) over 0..length-1
        denoms = []
        for i in range(length):
            d = 1
            for j in range(length):
                if j != i:
                    d = d * (i - j) % p
            denoms.append(d)
        dinv = batch_invert(denoms, p)
        # for each target point k in length..target-1:
        #   B(k) = prod_j (k - j); terms_i = B(k) / (d_i * (k - x_i))
        rows = []
        for k in range(length, target):
            bk = 1
            for j in range(length):
                bk = bk * (k - j) % p
            row = [bk * dinv[i] % p * pow(k - i, -1, p) % p
                   for i in range(length)]
            rows.append(row)
        _EXT_CACHE[key] = tuple(tuple(r) for r in rows)
    return _EXT_CACHE[key]


def extend_univariate(evals: list[int], target: int, p: int = R) -> list[int]:
    """Evaluations at 0..len-1 -> evaluations at 0..target-1
    (univariate.rs extend_from)."""
    length = len(evals)
    if length >= target:
        return list(evals[:target])
    rows = _extension_consts(length, target, p)
    out = list(evals)
    for row in rows:
        out.append(sum(e * c for e, c in zip(evals, row)) % p)
    return out


def evaluate_univariate(evals: list[int], u: int, p: int = R) -> int:
    """Evaluate a univariate given by evaluations at 0..len-1 at point u
    (univariate.rs evaluate)."""
    length = len(evals)
    u %= p
    if u < length:
        return evals[u]
    numer = 1
    for i in range(length):
        numer = numer * (u - i) % p
    denoms = []
    for i in range(length):
        d = 1
        for j in range(length):
            if j != i:
                d = d * (i - j) % p
        denoms.append(d * (u - i) % p)
    dinv = batch_invert(denoms, p)
    acc = 0
    for e, d in zip(evals, dinv):
        acc = (acc + e * d) % p
    return acc * numer % p


# -- KZG commitments --------------------------------------------------------

def commit(coeffs: list[int], crs) -> tuple | None:
    """MSM of coeffs over crs.monomials (utils.rs Utils::commit); returns
    an affine (x, y) int pair or None for the identity."""
    from ..ec import msm as msm_mod

    n = len(coeffs)
    if n > len(crs.monomials):
        raise ValueError("CRS too small")
    idx = [i for i, c in enumerate(coeffs) if c % R]
    if not idx:
        return None
    pts = [crs.monomials[i] for i in idx]
    scl = [coeffs[i] % R for i in idx]
    return _host_pippenger(pts, scl)


def _host_pippenger(pts: list, scalars: list[int], c: int = 6):
    """Windowed bucket MSM on the host curve (affine adds)."""
    g1 = host_curve(curves.BN254_G1)
    lifted = [g1.lift_affine(pt) for pt in pts]
    nbits = max(s.bit_length() for s in scalars)
    nwin = (nbits + c - 1) // c or 1
    acc = None
    for w in range(nwin - 1, -1, -1):
        if acc is not None:
            for _ in range(c):
                acc = g1.double(acc)
        buckets = [None] * (1 << c)
        for pt, s in zip(lifted, scalars):
            d = (s >> (w * c)) & ((1 << c) - 1)
            if d:
                buckets[d] = g1.add(buckets[d], pt)
        run = None
        tot = None
        for b in range((1 << c) - 1, 0, -1):
            run = g1.add(run, buckets[b])
            tot = g1.add(tot, run)
        acc = g1.add(acc, tot)
    return g1.affine_ints(acc) if acc is not None else None
