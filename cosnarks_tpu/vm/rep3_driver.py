"""Rep3 MPC driver for the circom witness-extension interpreter.

Counterpart of the reference's CircomRep3VmWitnessExtension
(co-circom/circom-mpc-vm/src/mpc/rep3.rs): VM values are either public
python ints or replicated AShare pairs; every op dispatches on the
public/shared split, calling into the host-side protocol kernel
(mpc/rep3_scalar.py). Comparisons apply circom's signed semantics by
shifting with p/2+1 before unsigned comparison (mpc/rep3.rs:89-101);
bit ops route through A2B Direct bit-decomposition (our default — the
TPU-fit path; the reference defaults to Yao, conversion.rs:27-35).
"""

from __future__ import annotations

from ..ff.spec import Field
from ..mpc.rep3_scalar import AShare, HostRng, Rep3Scalar
from .interp import CircomError, PlainDriver


class Rep3Driver:
    def __init__(self, proto: Rep3Scalar, field: Field,
                 allow_leaky_logs: bool = False):
        self.pr = proto
        self.p = proto.p
        self.field = field
        self._shift = proto.p // 2 + 1  # signed-compare offset
        self._plain = PlainDriver(field)
        self.allow_leaky_logs = allow_leaky_logs
        self._deferred: list = []  # (diff share, ctx) pending `===` checks

    # -- plumbing ------------------------------------------------------------
    def is_shared(self, x) -> bool:
        return isinstance(x, AShare)

    def norm(self, x):
        return x if isinstance(x, AShare) else int(x) % self.p

    def _val(self, x: AShare) -> AShare:
        """Signed-order shift: subtract p/2+1 (mpc/rep3.rs val())."""
        return self.pr.sub_shared_by_public(x, self._shift)

    def _valp(self, c: int) -> int:
        return (c - self._shift) % self.p

    def to_share(self, x) -> AShare:
        return x if isinstance(x, AShare) else self.pr.promote(int(x) % self.p)

    def open(self, x):
        return self.pr.open(x) if isinstance(x, AShare) else x

    # -- arithmetic ----------------------------------------------------------
    def add(self, a, b):
        sa, sb = self.is_shared(a), self.is_shared(b)
        if not sa and not sb:
            return self._plain.add(a, b)
        if sa and sb:
            return self.pr.add(a, b)
        return self.pr.add_public(a if sa else b, b if sa else a)

    def sub(self, a, b):
        sa, sb = self.is_shared(a), self.is_shared(b)
        if not sa and not sb:
            return self._plain.sub(a, b)
        if sa and sb:
            return self.pr.sub(a, b)
        if sa:
            return self.pr.sub_shared_by_public(a, b)
        return self.pr.sub_public_by_shared(a, b)

    def mul(self, a, b):
        sa, sb = self.is_shared(a), self.is_shared(b)
        if not sa and not sb:
            return self._plain.mul(a, b)
        if sa and sb:
            return self.pr.mul(a, b)
        return self.pr.mul_public(a if sa else b, (b if sa else a) % self.p)

    def neg(self, a):
        return self.pr.neg(a) if self.is_shared(a) else self._plain.neg(a)

    def div(self, a, b):
        sa, sb = self.is_shared(a), self.is_shared(b)
        if not sa and not sb:
            return self._plain.div(a, b)
        if not sb:
            if b % self.p == 0:
                raise CircomError("division by zero")
            return self.pr.mul_public(a, pow(b, -1, self.p))
        inv_b = self.pr.inv(b)
        if not sa:
            return self.pr.mul_public(inv_b, a % self.p)
        return self.pr.mul(a, inv_b)

    def idiv(self, a, b):
        sa, sb = self.is_shared(a), self.is_shared(b)
        if not sa and not sb:
            return self._plain.idiv(a, b)
        if not sb:
            if b == 0:
                raise CircomError("integer division by zero")
            if b & (b - 1) == 0:  # power of two -> binary shift
                return self.shr(a, b.bit_length() - 1)
            raise CircomError(
                "shared integer division by a non-power-of-2 public divisor "
                "is not implemented (reference uses the Yao path, "
                "circom-mpc-vm/src/mpc/rep3.rs:174)"
            )
        raise CircomError("shared-by-shared integer division unsupported")

    def mod(self, a, b):
        sa, sb = self.is_shared(a), self.is_shared(b)
        if not sa and not sb:
            return self._plain.mod(a, b)
        if not sb:
            if b == 0:
                raise CircomError("modulo by zero")
            if b & (b - 1) == 0:
                bits = self.pr.a2b(a)
                return self.pr.b2a(self.pr.band_public(bits, b - 1))
            raise CircomError(
                "shared modulo by a non-power-of-2 public divisor is not "
                "implemented"
            )
        raise CircomError("shared-by-shared modulo unsupported")

    def pow(self, a, b):
        sa, sb = self.is_shared(a), self.is_shared(b)
        if not sa and not sb:
            return self._plain.pow(a, b)
        if sb:
            raise CircomError("pow with shared exponent unsupported")
        if b == 0:
            return 1
        return self.pr.pow_public(a, b)

    def sqrt(self, a):
        if not self.is_shared(a):
            return self._plain.sqrt(a)
        s = self.pr.sqrt(a)
        # normalize to the root in [0, p/2]: 2*is_pos*s - s
        # (reference mpc/rep3.rs:243-258)
        is_pos = self.pr.bit_inject(
            self.pr.unsigned_ge_public_bit(self._val(s), self._valp(0))
        )
        m = self.pr.mul(s, is_pos)
        return self.pr.sub(self.pr.add(m, m), s)

    # -- accelerator ops (reference mpc/rep3.rs:599-650) ---------------------
    def num2bits(self, a, n):
        if not self.is_shared(a):
            return self._plain.num2bits(a, n)
        bits = self.pr.a2b(a)
        singles = [
            self.pr.band_public(self.pr.bshift_r(bits, i), 1)
            for i in range(n)
        ]
        return self.pr.bit_inject_many(singles)

    def addbits(self, a_bits, b_bits):
        if all(not self.is_shared(x) for x in a_bits + b_bits):
            return self._plain.addbits(a_bits, b_bits)
        n = len(a_bits)
        if n + 1 >= self.pr.k:
            raise CircomError("AddBits width exceeds field capacity")
        va = self.pr.promote(0)
        vb = self.pr.promote(0)
        for x in a_bits:
            va = self.add(self.add(va, va), x)
        for x in b_bits:
            vb = self.add(self.add(vb, vb), x)
        s = self.add(va, vb)
        bits = self.pr.a2b(self.to_share(s))
        singles = [
            self.pr.band_public(self.pr.bshift_r(bits, i), 1)
            for i in range(n + 1)
        ]
        arith = self.pr.bit_inject_many(singles)
        carry = arith[n]
        return list(reversed(arith[:n])), carry

    # -- comparisons (signed circom order) -----------------------------------
    def lt(self, a, b):
        sa, sb = self.is_shared(a), self.is_shared(b)
        if not sa and not sb:
            return self._plain.lt(a, b)
        one_minus = self.pr.sub_public_by_shared
        if sa and sb:
            return self.pr.lt(self._val(a), self._val(b))
        if sa:  # [a] < b  <=>  not([a] >= b)
            bit = self.pr.unsigned_ge_public_bit(self._val(a), self._valp(b))
            return one_minus(1, self.pr.bit_inject(bit))
        # a < [b]  <=>  not(a >= [b])
        bit = self.pr.unsigned_ge_const_lhs_bit(self._valp(a), self._val(b))
        return one_minus(1, self.pr.bit_inject(bit))

    def le(self, a, b):
        sa, sb = self.is_shared(a), self.is_shared(b)
        if not sa and not sb:
            return self._plain.le(a, b)
        if sa and sb:
            return self.pr.le(self._val(a), self._val(b))
        if sa:  # [a] <= b  <=>  b >= [a]
            bit = self.pr.unsigned_ge_const_lhs_bit(
                self._valp(b), self._val(a)
            )
            return self.pr.bit_inject(bit)
        # a <= [b]  <=>  [b] >= a
        bit = self.pr.unsigned_ge_public_bit(self._val(b), self._valp(a))
        return self.pr.bit_inject(bit)

    def eq(self, a, b):
        sa, sb = self.is_shared(a), self.is_shared(b)
        if not sa and not sb:
            return self._plain.eq(a, b)
        if sa and sb:
            return self.pr.eq(a, b)
        return self.pr.eq_public(a if sa else b, (b if sa else a) % self.p)

    def neq(self, a, b):
        r = self.eq(a, b)
        if self.is_shared(r):
            return self.pr.sub_public_by_shared(1, r)
        return 1 - r

    # -- bit ops (through A2B Direct) ----------------------------------------
    def _reduce_b(self, x):
        """Reduce a binary share with value < 2^k to value mod p."""
        return self.pr._sub_p_cmux_many([x], self.pr.k + 1)[0]

    def band(self, a, b):
        sa, sb = self.is_shared(a), self.is_shared(b)
        if not sa and not sb:
            return self._plain.band(a, b)
        if sa and sb:
            xb, yb = self.pr.a2b_many([a, b])
            return self.pr.b2a(self.pr.band(xb, yb))
        bits = self.pr.a2b(a if sa else b)
        return self.pr.b2a(self.pr.band_public(bits, (b if sa else a) % self.p))

    def bor(self, a, b):
        sa, sb = self.is_shared(a), self.is_shared(b)
        if not sa and not sb:
            return self._plain.bor(a, b)
        if sa and sb:
            xb, yb = self.pr.a2b_many([a, b])
            res = self.pr.bor(xb, yb)
        else:
            bits = self.pr.a2b(a if sa else b)
            res = self.pr.bor_public(bits, (b if sa else a) % self.p)
        return self.pr.b2a(self._reduce_b(res))

    def bxor(self, a, b):
        sa, sb = self.is_shared(a), self.is_shared(b)
        if not sa and not sb:
            return self._plain.bxor(a, b)
        if sa and sb:
            xb, yb = self.pr.a2b_many([a, b])
            res = self.pr.bxor(xb, yb)
        else:
            bits = self.pr.a2b(a if sa else b)
            res = self.pr.bxor_public(bits, (b if sa else a) % self.p)
        return self.pr.b2a(self._reduce_b(res))

    def bnot(self, a):
        if not self.is_shared(a):
            return self._plain.bnot(a)
        mask = (1 << self.p.bit_length()) - 1
        bits = self.pr.a2b(a)
        return self.pr.b2a(self._reduce_b(self.pr.bxor_public(bits, mask)))

    def shl(self, a, k):
        if self.is_shared(k):
            raise CircomError("shift by shared amount unsupported")
        if not self.is_shared(a):
            return self._plain.shl(a, k)
        if k >= 512:
            return 0
        return self.pr.mul_public(a, pow(2, k, self.p))

    def shr(self, a, k):
        if self.is_shared(k):
            raise CircomError("shift by shared amount unsupported")
        if not self.is_shared(a):
            return self._plain.shr(a, k)
        if k >= 512:
            return 0
        bits = self.pr.a2b(a)
        return self.pr.b2a(self.pr.bshift_r(bits, k))

    # -- booleans ------------------------------------------------------------
    def is_true(self, a):
        if self.is_shared(a):
            raise CircomError(
                "data-dependent control flow on a shared value (loop "
                "condition or array index); only if/ternary support shared "
                "predicates"
            )
        return a != 0

    def land(self, a, b):
        if not self.is_shared(a) and not self.is_shared(b):
            return self._plain.land(a, b)
        return self.mul(a, b)

    def lor(self, a, b):
        if not self.is_shared(a) and not self.is_shared(b):
            return self._plain.lor(a, b)
        s = self.add(a, b)
        return self.sub(s, self.mul(a, b))

    def lnot(self, a):
        if not self.is_shared(a):
            return self._plain.lnot(a)
        return self.pr.sub_public_by_shared(1, a)

    def cmux(self, c, t, f):
        if not self.is_shared(c):
            return t if self.is_true(c) else f
        return self.pr.cmux(c, self.to_share(t), self.to_share(f))

    # -- assertions (open only the predicate) --------------------------------
    # `===` checks on shared values are DEFERRED and batch-verified: each
    # diff d_i is masked with an independent shared random r_i and the
    # products are opened fused (one broadcast round for the whole batch).
    # d_i == 0 opens 0; d_i != 0 opens uniform garbage — the same leakage
    # profile as the reference's per-assert is_zero (rep3.rs:541) at a tiny
    # fraction of the rounds (each is_zero costs a full A2B).
    def assert_eq(self, l, r, ctx=""):
        if not self.is_shared(l) and not self.is_shared(r):
            return self._plain.assert_eq(l, r, ctx)
        self._deferred.append((self.pr.sub(self.to_share(l),
                                           self.to_share(r)), ctx))
        if len(self._deferred) >= 8192:
            self.flush_asserts()

    def flush_asserts(self):
        if not self._deferred:
            return
        diffs = [d for d, _ in self._deferred]
        ctxs = [c for _, c in self._deferred]
        self._deferred = []
        rs = [self.pr.rand() for _ in diffs]
        vals = self.pr.mul_open_many(diffs, rs)
        bad = [ctxs[i] for i, v in enumerate(vals) if v != 0]
        if bad:
            raise CircomError(
                f"constraint violated{bad[0]} (on shared values; "
                f"{len(bad)} of {len(vals)} checks in batch failed)"
            )

    def assert_true(self, c, ctx=""):
        if not self.is_shared(c):
            return self._plain.assert_true(c, ctx)
        if self.pr.is_zero_open(c):
            raise CircomError(f"assert failed{ctx} (on shared value)")


def setup_rep3_vm(net, field: Field, party_rng=None, seed: bytes | None = None):
    """Build a Rep3 VM driver over a network: 256-bit PRF key exchange (one
    round, rep3.rs:71-110) unless an existing device PartyRng is supplied —
    then the host streams derive from the same key material."""
    if party_rng is not None:
        rng = HostRng.from_party_rng(party_rng)
    else:
        import os

        if seed is None:
            seed = os.urandom(32)
        key_next = bytes(net.reshare_backward(seed))
        rng = HostRng(seed, key_next)
    proto = Rep3Scalar(net, rng, field.p)
    return Rep3Driver(proto, field)
