"""circom witness-extension interpreter (plain/cleartext driver).

The role of the reference's circom-mpc-vm (stack VM over MpcOpCode bytecode,
circom-mpc-vm/src/mpc_vm.rs) — re-architected: instead of bytecode we
interpret the AST directly, with component bodies run lazily once all their
inputs are assigned (circom's execution model). The plain driver computes on
python ints; the MPC drivers will plug in at the same `Driver` seam
(mirroring VmCircomWitnessExtension, circom-mpc-vm/src/mpc.rs:14).

Constraint statements (===) are CHECKED during execution — a free sanity
oracle the reference only gets via assert opcodes.
"""

from __future__ import annotations

import dataclasses
from typing import Any

from ..ff.spec import Field
from . import lang


class CircomError(Exception):
    pass


class PlainDriver:
    """Cleartext ops (the reference's plain_vm driver)."""

    def __init__(self, field: Field):
        self.p = field.p
        self.half = field.p >> 1

    def lift(self, x):  # signed representative for comparisons
        return x - self.p if x > self.half else x

    def add(self, a, b):
        return (a + b) % self.p

    def sub(self, a, b):
        return (a - b) % self.p

    def mul(self, a, b):
        return (a * b) % self.p

    def div(self, a, b):
        if b == 0:
            raise CircomError("division by zero")
        return a * pow(b, -1, self.p) % self.p

    def idiv(self, a, b):
        if b == 0:
            raise CircomError("integer division by zero")
        return a // b

    def mod(self, a, b):
        return a % b

    def pow(self, a, b):
        return pow(a, b, self.p)

    def neg(self, a):
        return (-a) % self.p

    def lt(self, a, b):
        return int(self.lift(a) < self.lift(b))

    def le(self, a, b):
        return int(self.lift(a) <= self.lift(b))

    def eq(self, a, b):
        return int(a == b)

    def band(self, a, b):
        return (a & b) % self.p

    def bor(self, a, b):
        return (a | b) % self.p

    def bxor(self, a, b):
        return (a ^ b) % self.p

    def bnot(self, a):
        mask = (1 << self.p.bit_length()) - 1
        return (a ^ mask) % self.p

    def shl(self, a, k):
        return (a << k) % self.p if k < 512 else 0

    def shr(self, a, k):
        return a >> k if k < 512 else 0

    def is_true(self, a):
        return a != 0


def _make_storage(dims):
    if not dims:
        return {"_": None}
    return {}


@dataclasses.dataclass
class SignalInfo:
    kind: str
    dims: list  # evaluated int dims
    values: dict  # index tuple -> int (scalar key: ())


class Instance:
    """One instantiated template (component)."""

    def __init__(self, vm, template: lang.Template, args: list):
        self.vm = vm
        self.template = template
        self.params = dict(zip(template.params, args))
        self.vars: list[dict] = [dict(self.params)]
        self.signals: dict[str, SignalInfo] = {}
        self.components: dict[str, Any] = {}  # name -> Instance | dict idx->
        self.comp_dims: dict[str, list] = {}
        self.input_count = 0
        self.inputs_set = 0
        self.executed = False
        self.signal_order: list[str] = []
        # pre-scan declarations to know inputs (they may appear anywhere)
        self._pending = list(template.body)

    # signal helpers
    def decl_signal(self, name, kind, dims):
        self.signals[name] = SignalInfo(kind, dims, {})
        self.signal_order.append(name)
        if kind == "input":
            self.input_count += _count(dims)

    def set_signal(self, name, idx, value):
        info = self.signals[name]
        if idx in info.values:
            raise CircomError(f"signal {name}{idx} assigned twice")
        info.values[idx] = value
        if info.kind == "input":
            self.inputs_set += 1
            if self.inputs_set == self.input_count and not self.executed:
                self.vm.run_instance(self)

    def get_signal(self, name, idx):
        info = self.signals[name]
        if idx not in info.values:
            raise CircomError(f"signal {name}{list(idx)} read before assignment")
        return info.values[idx]


def _count(dims):
    n = 1
    for d in dims:
        n *= d
    return n


def _indices(dims):
    if not dims:
        yield ()
        return
    import itertools

    yield from itertools.product(*[range(d) for d in dims])


class _Return(Exception):
    def __init__(self, v):
        self.value = v


class WitnessVM:
    """Runs main with given inputs; collects the full signal assignment."""

    def __init__(self, program: lang.Program, field: Field, driver=None,
                 allow_logs: bool = True):
        self.prog = program
        self.field = field
        self.d = driver or PlainDriver(field)
        self.logs: list[str] = []
        self.allow_logs = allow_logs

    # -- public API ---------------------------------------------------------
    def run(self, inputs: dict) -> "Instance":
        """inputs: name -> int | nested lists. Returns the main Instance."""
        if self.prog.main is None:
            raise CircomError("no main component")
        call = self.prog.main
        args = [self._const_expr(a) for a in call.args]
        main = self.instantiate(call.name, args)
        self.main = main
        # assign inputs (this triggers execution once complete)
        input_names = [
            n for n in main.signal_order if main.signals[n].kind == "input"
        ]
        flat_mode = False
        if len(inputs) == 1:
            key = next(iter(inputs))
            flat_len = len(_as_flat(inputs[key]))
            total = sum(_count(main.signals[n].dims) for n in input_names)
            if key not in main.signals:
                flat_mode = True
            elif (
                flat_len == total
                and flat_len != _count(main.signals[key].dims)
            ):
                flat_mode = True
        if flat_mode:
            # KAT convention: one flat "in" list feeding all input signals
            # in declaration order
            flat = _as_flat(next(iter(inputs.values())))
            expected = sum(_count(main.signals[n].dims) for n in input_names)
            if len(flat) != expected:
                raise CircomError(
                    f"flat input length {len(flat)} != {expected}"
                )
            pos = 0
            for n in input_names:
                for idx in _indices(main.signals[n].dims):
                    main.set_signal(n, idx, int(flat[pos]) % self.field.p)
                    pos += 1
        else:
            for name, val in inputs.items():
                if name not in main.signals:
                    raise CircomError(f"unknown input {name}")
                info = main.signals[name]
                flat = _as_flat(val)
                if info.dims and len(flat) == _count(info.dims):
                    # accept flat row-major fill for array inputs
                    for pos, idx in enumerate(_indices(info.dims)):
                        main.set_signal(name, idx, int(flat[pos]) % self.field.p)
                    continue
                for idx, v in _flatten(val, info.dims, name):
                    main.set_signal(name, idx, int(v) % self.field.p)
        if not main.executed:
            missing = main.input_count - main.inputs_set
            raise CircomError(f"main not executed: {missing} inputs missing")
        return main

    def main_outputs(self, main: "Instance") -> list[int]:
        out = []
        for name in main.signal_order:
            info = main.signals[name]
            if info.kind == "output":
                for idx in _indices(info.dims):
                    out.append(info.values.get(idx, 0))
        return out

    # -- instantiation / execution ------------------------------------------
    def instantiate(self, tname: str, args: list) -> Instance:
        if tname not in self.prog.templates:
            raise CircomError(f"unknown template {tname}")
        inst = Instance(self, self.prog.templates[tname], args)
        # pre-pass: declare signals (they can be referenced before their
        # statement executes only via components; circom declares in order,
        # so we declare lazily during execution EXCEPT inputs, which must be
        # known up front to trigger execution.
        self._predeclare(inst, inst.template.body)
        if inst.input_count == 0:
            self.run_instance(inst)
        return inst

    def _predeclare(self, inst, stmts):
        for s in stmts:
            if isinstance(s, list):
                self._predeclare(inst, s)
            elif isinstance(s, lang.SignalDecl):
                try:
                    dims = [self._eval_in(inst, d) for d in s.dims]
                except CircomError:
                    continue  # dims not param-derivable; declared at exec
                if s.name not in inst.signals:
                    inst.decl_signal(s.name, s.kind, dims)
            elif isinstance(s, (lang.If,)):
                self._predeclare(inst, s.then)
                if s.els:
                    self._predeclare(inst, s.els)
            elif isinstance(s, (lang.For,)):
                self._predeclare(inst, s.body)
            elif isinstance(s, (lang.While,)):
                self._predeclare(inst, s.body)

    def run_instance(self, inst: Instance):
        inst.executed = True
        self._exec_block(inst, inst.template.body)

    # -- statement execution -------------------------------------------------
    def _exec_block(self, inst, stmts):
        for s in stmts:
            self._exec(inst, s)

    def _exec(self, inst, s):
        if isinstance(s, list):
            self._exec_block(inst, s)
        elif isinstance(s, lang.SignalDecl):
            if s.name not in inst.signals:  # dims were not param-derivable
                dims = [self._eval_in(inst, d) for d in s.dims]
                inst.decl_signal(s.name, s.kind, dims)
            if s.init is not None:
                v = self._eval_in(inst, s.init)
                inst.set_signal(s.name, (), v % self.d.p)
        elif isinstance(s, lang.VarDecl):
            dims = [self._eval_in(inst, d) for d in s.dims]
            if dims:
                store = _nested_zeros(dims)
                if s.init is not None:
                    val = self._eval_in(inst, s.init)
                    store = _fit_nested(val, dims)
                inst.vars[-1][s.name] = store
            else:
                inst.vars[-1][s.name] = (
                    self._eval_in(inst, s.init) if s.init is not None else 0
                )
        elif isinstance(s, lang.ComponentDecl):
            dims = [self._eval_in(inst, d) for d in s.dims]
            inst.comp_dims[s.name] = dims
            if dims:
                inst.components.setdefault(s.name, {})
            if s.init is not None:
                call = s.init
                args = [self._eval_in(inst, a) for a in call.args]
                inst.components[s.name] = self.instantiate(call.name, args)
        elif isinstance(s, lang.Assign):
            self._exec_assign(inst, s)
        elif isinstance(s, lang.ConstraintEq):
            l = self._eval_in(inst, s.l)
            r = self._eval_in(inst, s.r)
            if l != r:
                raise CircomError(
                    f"constraint violated in {inst.template.name}: {l} != {r}"
                )
        elif isinstance(s, lang.If):
            if self.d.is_true(self._eval_in(inst, s.cond)):
                self._exec_scoped(inst, s.then)
            elif s.els:
                self._exec_scoped(inst, s.els)
        elif isinstance(s, lang.For):
            inst.vars.append({})
            try:
                self._exec(inst, s.init)
                while self.d.is_true(self._eval_in(inst, s.cond)):
                    self._exec_scoped(inst, s.body)
                    self._exec(inst, s.step)
            finally:
                inst.vars.pop()
        elif isinstance(s, lang.While):
            while self.d.is_true(self._eval_in(inst, s.cond)):
                self._exec_scoped(inst, s.body)
        elif isinstance(s, lang.Assert):
            if not self.d.is_true(self._eval_in(inst, s.cond)):
                raise CircomError(f"assert failed in {inst.template.name}")
        elif isinstance(s, lang.Log):
            if self.allow_logs:
                parts = []
                for a in s.args:
                    parts.append(
                        a if isinstance(a, str) else str(self._eval_in(inst, a))
                    )
                self.logs.append(" ".join(parts))
        elif isinstance(s, lang.Return):
            raise _Return(self._eval_in(inst, s.value))
        else:
            raise CircomError(f"unhandled statement {s}")

    def _exec_scoped(self, inst, stmts):
        inst.vars.append({})
        try:
            self._exec_block(inst, stmts)
        finally:
            inst.vars.pop()

    def _exec_assign(self, inst, s: lang.Assign):
        if s.op == "expr":
            self._eval_in(inst, s.value)
            return
        tgt = s.target
        if s.op in ("++", "--"):
            cur = self._read_target(inst, tgt)
            v = self.d.add(cur, 1) if s.op == "++" else self.d.sub(cur, 1)
            self._write_target(inst, tgt, v, "=")
            return
        # component instantiation: comp[i] = Tpl(args)
        if (
            s.op == "="
            and isinstance(s.value, lang.Call)
            and s.value.name in self.prog.templates
        ):
            name = tgt.base
            idx = tuple(self._eval_in(inst, e) for _, e in tgt.path)
            args = [self._eval_in(inst, a) for a in s.value.args]
            child = self.instantiate(s.value.name, args)
            if idx:
                inst.components.setdefault(name, {})[idx] = child
            else:
                inst.components[name] = child
            return
        val = self._eval_in(inst, s.value)
        if s.op in ("+=", "-=", "*=", "/=", "\\=", "%=", "**=", "<<=", ">>=",
                    "&=", "|=", "^="):
            cur = self._read_target(inst, tgt)
            val = self._apply_bin(s.op[:-1], cur, val)
            self._write_target(inst, tgt, val, "=")
            return
        self._write_target(inst, tgt, val, s.op)

    # -- lvalue resolution ---------------------------------------------------
    def _resolve(self, inst, acc: lang.Access):
        """Returns ("var", scope, name, idx) | ("sig", inst2, name, idx)."""
        name = acc.base
        # component access: comp(.[i])*.sig[j]...
        if name in inst.components or name in inst.comp_dims:
            i = 0
            idx = []
            while i < len(acc.path) and acc.path[i][0] == "idx":
                idx.append(self._eval_in(inst, acc.path[i][1]))
                i += 1
            comp = inst.components.get(name)
            if isinstance(comp, dict):
                comp = comp.get(tuple(idx))
                if comp is None:
                    raise CircomError(f"component {name}{idx} not instantiated")
            if i < len(acc.path) and acc.path[i][0] == "field":
                signame = acc.path[i][1]
                i += 1
                sidx = tuple(
                    self._eval_in(inst, e) for kind, e in acc.path[i:]
                )
                return ("sig", comp, signame, sidx)
            return ("comp", comp, None, ())
        if name in inst.signals:
            sidx = tuple(self._eval_in(inst, e) for _, e in acc.path)
            return ("sig", inst, name, sidx)
        # variable
        for scope in reversed(inst.vars):
            if name in scope:
                idx = tuple(self._eval_in(inst, e) for _, e in acc.path)
                return ("var", scope, name, idx)
        raise CircomError(f"unknown identifier {name} in {inst.template.name}")

    def _read_target(self, inst, acc):
        kind, holder, name, idx = self._resolve(inst, acc)
        if kind == "sig":
            info = holder.signals[name]
            if len(idx) < len(info.dims):
                # bulk read: nested list over the remaining dimensions
                rem = info.dims[len(idx):]

                def rec(prefix, dims):
                    if not dims:
                        return holder.get_signal(name, tuple(prefix))
                    return [rec(prefix + [i], dims[1:]) for i in range(dims[0])]

                return rec(list(idx), rem)
            return holder.get_signal(name, idx)
        if kind == "var":
            v = holder[name]
            for i in idx:
                v = v[i]
            return v
        raise CircomError("cannot read component")

    def _write_target(self, inst, acc, val, op):
        kind, holder, name, idx = self._resolve(inst, acc)
        if kind == "sig":
            info = holder.signals[name]
            if len(idx) < len(info.dims):
                # bulk assignment of (possibly nested) array value
                rem = info.dims[len(idx):]
                flat = _as_flat(val)
                if len(flat) != _count(rem):
                    raise CircomError(
                        f"bulk assign to {name}: {len(flat)} values for "
                        f"{_count(rem)} slots"
                    )
                for pos, sub in enumerate(_indices(rem)):
                    holder.set_signal(name, idx + sub, flat[pos] % self.d.p)
                return
            holder.set_signal(name, idx, val % self.d.p if isinstance(val, int) else val)
            return
        if kind == "var":
            if not idx:
                holder[name] = val
            else:
                v = holder[name]
                for i in idx[:-1]:
                    v = v[i]
                v[idx[-1]] = val
            return
        # component assignment: comp[i] = Tpl(args) handled via Assign with
        # Call value
        if kind == "comp":
            raise CircomError("component reassignment unsupported here")

    # -- expression evaluation ----------------------------------------------
    def _const_expr(self, e):
        return self._eval(e, None)

    def _eval_in(self, inst, e):
        return self._eval(e, inst)

    def _eval(self, e, inst):
        d = self.d
        if isinstance(e, lang.Num):
            return e.v % d.p
        if isinstance(e, lang.Ident):
            return self._read_target(inst, lang.Access(e.name, []))
        if isinstance(e, lang.Access):
            return self._read_target(inst, e)
        if isinstance(e, lang.Bin):
            l = self._eval(e.l, inst)
            r = self._eval(e.r, inst)
            return self._apply_bin(e.op, l, r)
        if isinstance(e, lang.Un):
            v = self._eval(e.e, inst)
            if e.op == "-":
                return d.neg(v)
            if e.op == "!":
                return int(not d.is_true(v))
            if e.op == "~":
                return d.bnot(v)
        if isinstance(e, lang.Tern):
            return (
                self._eval(e.t, inst)
                if d.is_true(self._eval(e.c, inst))
                else self._eval(e.f, inst)
            )
        if isinstance(e, lang.ArrayLit):
            return [self._eval(x, inst) for x in e.items]
        if isinstance(e, lang.Call):
            return self._call_function(e, inst)
        raise CircomError(f"unhandled expression {e}")

    def _apply_bin(self, op, l, r):
        d = self.d
        if op == "+":
            return d.add(l, r)
        if op == "-":
            return d.sub(l, r)
        if op == "*":
            return d.mul(l, r)
        if op == "/":
            return d.div(l, r)
        if op == "\\":
            return d.idiv(l, r)
        if op == "%":
            return d.mod(l, r)
        if op == "**":
            return d.pow(l, r)
        if op == "<":
            return d.lt(l, r)
        if op == ">":
            return d.lt(r, l)
        if op == "<=":
            return d.le(l, r)
        if op == ">=":
            return d.le(r, l)
        if op == "==":
            return d.eq(l, r)
        if op == "!=":
            return 1 - d.eq(l, r)
        if op == "&&":
            return int(d.is_true(l) and d.is_true(r))
        if op == "||":
            return int(d.is_true(l) or d.is_true(r))
        if op == "&":
            return d.band(l, r)
        if op == "|":
            return d.bor(l, r)
        if op == "^":
            return d.bxor(l, r)
        if op == "<<":
            return d.shl(l, r)
        if op == ">>":
            return d.shr(l, r)
        raise CircomError(f"unhandled operator {op}")

    def _call_function(self, call: lang.Call, inst):
        if call.name not in self.prog.functions:
            raise CircomError(f"unknown function {call.name}")
        fn = self.prog.functions[call.name]
        args = [self._eval(a, inst) for a in call.args]
        finst = Instance(self, lang.Template(call.name, fn.params, fn.body),
                         args)
        finst.executed = True
        try:
            self._exec_block(finst, fn.body)
        except _Return as r:
            return r.value
        raise CircomError(f"function {call.name} did not return")


def _as_flat(v):
    if not isinstance(v, (list, tuple)):
        return [v]
    out = []
    for x in v:
        out.extend(_as_flat(x))
    return out


def _flatten(val, dims, name):
    """Nested input value -> [(index tuple, int)] validated against dims."""
    out = []

    def rec(v, idx, depth):
        if depth == len(dims):
            if isinstance(v, (list, tuple)):
                if len(v) == 1:  # snarkjs-style 1-element wrapper
                    v = v[0]
                else:
                    raise CircomError(f"input {name}: too many dimensions")
            out.append((tuple(idx), int(v)))
            return
        if not isinstance(v, (list, tuple)) or len(v) != dims[depth]:
            raise CircomError(f"input {name}: expected {dims[depth]} entries")
        for i, x in enumerate(v):
            rec(x, idx + [i], depth + 1)

    rec(val, [], 0)
    return out


def _nested_zeros(dims):
    if len(dims) == 1:
        return [0] * dims[0]
    return [_nested_zeros(dims[1:]) for _ in range(dims[0])]


def _fit_nested(val, dims):
    return val  # arrays from function returns are already nested lists
