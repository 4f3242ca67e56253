"""co-ACVM: the ACIR opcode solver, generic over the witness-extension
driver seam (plain ints or Rep3 shares through the SAME driver the circom
VM uses — mirror of the reference's NoirWitnessExtensionProtocol,
co-noir/co-acvm/src/mpc.rs:22, solver loop solver.rs:347-383).

Supported opcodes: AssertZero (linear solve), BlackBoxFuncCall
{RANGE, AND, XOR, Poseidon2Permutation}, MemoryInit/MemoryOp with PUBLIC
indices. BrilligCall (unconstrained hints) and shared-index memory (LUT
gadgets) are staged next.
"""

from __future__ import annotations

from ..gadgets.poseidon2 import Poseidon2
from .acir import Expression, _finput


class UnsolvableError(Exception):
    pass


class CoSolver:
    def __init__(self, fn, driver, p: int):
        self.fn = fn
        self.d = driver
        self.p = p
        self.witness: dict[int, object] = {}
        self.memory: dict[int, list] = {}

    def set_inputs(self, values: list):
        for i, v in enumerate(values):
            self.witness[i] = self.d.norm(v)

    def _known(self, w: int) -> bool:
        return w in self.witness

    def solve(self):
        for kind, payload in self.fn.opcodes:
            getattr(self, "_op_" + kind, self._op_unknown)(payload)
        self.d.flush_asserts()
        return self.witness

    def _op_unknown(self, payload):
        raise UnsolvableError(f"unhandled opcode {payload!r:.80}")

    # -- AssertZero (assert_zero_solver.rs) ----------------------------------
    def _op_assert_zero(self, e: Expression):
        d = self.d
        acc = 0
        unknown = None
        ucoef = 0  # public int or share (mul term with one known shared)
        for c, w1, w2 in e.mul:
            k1, k2 = self._known(w1), self._known(w2)
            if k1 and k2:
                acc = d.add(acc, d.mul(c, d.mul(self.witness[w1],
                                                self.witness[w2])))
            elif k1 or k2:
                wk, wu = (w1, w2) if k1 else (w2, w1)
                if unknown is not None and unknown != wu:
                    raise UnsolvableError("two unknowns in expression")
                unknown = wu
                ucoef = d.add(ucoef, d.mul(c, self.witness[wk]))
            else:
                raise UnsolvableError("mul term with two unknowns")
        for c, w in e.lin:
            if self._known(w):
                acc = d.add(acc, d.mul(c, self.witness[w]))
            else:
                if unknown is not None and unknown != w:
                    raise UnsolvableError("two unknowns in expression")
                unknown = w
                ucoef = d.add(ucoef, c)
        acc = d.add(acc, e.qc)
        if unknown is None:
            d.assert_eq(acc, 0, " (AssertZero)")
            return
        if d.is_shared(ucoef):
            # shared coefficient: v = -acc / coef (one inversion round)
            self.witness[unknown] = d.norm(d.div(d.neg(acc), ucoef))
            return
        if ucoef % self.p == 0:
            raise UnsolvableError("unknown with zero coefficient")
        inv = pow(-ucoef % self.p, -1, self.p)
        self.witness[unknown] = d.norm(d.mul(acc, inv))

    # -- black boxes (blackbox_solver.rs:432-523) -----------------------------
    def _op_blackbox(self, payload):
        name, args = payload
        handler = getattr(self, "_bb_" + name.lower(), None)
        if handler is None:
            raise UnsolvableError(f"unhandled blackbox {name}")
        handler(args)

    def _in(self, v):
        kind, val = _finput(v)
        if kind == "c":
            return val % self.p
        if not self._known(val):
            raise UnsolvableError(f"blackbox input w{val} unknown")
        return self.witness[val]

    def _bb_range(self, args):
        value, num_bits = self._in(args[0]), int(args[1])
        if not self.d.is_shared(value):
            if int(value) >> num_bits:
                raise ValueError(
                    f"range check failed: {value} >= 2^{num_bits}")
        # shared values: the constraint system enforces the range at proof
        # time; witness extension needs no action (reference rep3 solver)

    def _bb_and(self, args):
        a, b, _nbits, out = (self._in(args[0]), self._in(args[1]),
                             int(args[2]), int(args[3]))
        self.witness[out] = self.d.norm(self.d.band(a, b))

    def _bb_xor(self, args):
        a, b, _nbits, out = (self._in(args[0]), self._in(args[1]),
                             int(args[2]), int(args[3]))
        self.witness[out] = self.d.norm(self.d.bxor(a, b))

    def _bb_poseidon2permutation(self, args):
        inputs = [self._in(v) for v in args[0]]
        outs = [int(w) for w in args[1]]
        perm = Poseidon2(len(inputs), self.p)
        res = perm.permutation(self.d, inputs)
        for w, v in zip(outs, res):
            self.witness[w] = self.d.norm(v)

    # -- memory (public indices; memory_solver.rs) ----------------------------
    def _op_memory_init(self, payload):
        block_id, witnesses, _type = payload
        self.memory[block_id] = [self.witness[w] for w in witnesses]

    def _eval_expr(self, e: Expression):
        d = self.d
        acc = e.qc
        for c, w1, w2 in e.mul:
            acc = d.add(acc, d.mul(c, d.mul(self.witness[w1],
                                            self.witness[w2])))
        for c, w in e.lin:
            acc = d.add(acc, d.mul(c, self.witness[w]))
        return acc

    def _op_memory_op(self, payload):
        block_id, operation, index, value = payload
        op = self._eval_expr(operation)
        if self.d.is_shared(op):
            raise UnsolvableError("shared memory operation flag")
        idx = self._eval_expr(index)
        if self.d.is_shared(idx):
            raise UnsolvableError(
                "shared memory index (LUT gadget not wired yet)")
        idx = int(idx)
        block = self.memory[block_id]
        if int(op) == 0:  # read: value expr is a single unknown witness
            if len(value.lin) == 1 and not value.mul and value.qc == 0:
                c, w = value.lin[0]
                if c != 1:
                    raise UnsolvableError("scaled memory read")
                self.witness[w] = block[idx]
                return
            raise UnsolvableError("complex memory read expression")
        block[idx] = self._eval_expr(value)  # write

    def _op_brillig_call(self, payload):
        raise UnsolvableError("BrilligCall (unconstrained fn) not wired yet")

    def _op_call(self, payload):
        raise UnsolvableError("acir Call not wired yet")


def solve_program(artifact, driver, p: int, input_values: list):
    """Solve the main function; returns the witness dict."""
    fn = artifact.functions[0]
    solver = CoSolver(fn, driver, p)
    solver.set_inputs(input_values)
    return solver.solve()
