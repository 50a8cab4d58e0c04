"""Gate-minimized bitsliced AES S-box circuit (built at import time).

The mechanically transcribed tower-field S-box (gf_tower.py) costs ~195
gates; on a v5e the keystream kernel is VPU-issue-bound and the S-box is
~60% of every round, so gates are wall-clock.  This module rebuilds the
same circuit symbolically and optimizes it:

1. hash-consing CSE with algebraic identities (x^x=0, x&x=x, constant
   folding) — the tower decomposition recomputes shared subterms like
   ah^al across its Karatsuba legs;
2. greedy common-pair extraction over all maximal XOR trees (the classic
   heuristic for GF(2) linear layers) — the input/output basis-change
   matrices are dense XOR chains with many shared pairs.

The optimized instruction list is verified exhaustively against the
table S-box for all 256 inputs (bitsliced over python-int masks) at
import time, so a miscompile cannot ship.
"""

from __future__ import annotations

import numpy as np

from . import gf_tower
from ..oracle import aes as host_aes

# ---------------------------------------------------------------------------
# Symbolic expression DAG with hash-consing.
# ---------------------------------------------------------------------------

_XOR, _AND, _NOT, _IN, _ZERO = "x", "a", "n", "i", "z"


class _E:
    __slots__ = ("op", "args", "id")
    _table: dict = {}
    _ctr = [0]

    def __new__(cls, op, args=()):
        if op in (_XOR, _AND):
            a, b = args
            if a.id > b.id:
                a, b = b, a
            if a is b:
                if op == _XOR:
                    return _E(_ZERO)
                return a  # x & x = x
            if a.op == _ZERO:
                return b if op == _XOR else a  # x^0=x, x&0=0
            args = (a, b)
        if op == _IN:
            key = (op, args)  # args = (input index,), a raw int
        else:
            key = (op, tuple(x.id for x in args))
        hit = cls._table.get(key)
        if hit is not None:
            return hit
        self = object.__new__(cls)
        self.op, self.args = op, args
        self.id = cls._ctr[0]
        cls._ctr[0] += 1
        cls._table[key] = self
        return self

    def __xor__(self, other):
        if isinstance(other, (int, np.integer)):  # the 0x63 affine flip
            if int(other) == 0:
                return self
            return _E(_NOT, (self,))
        return _E(_XOR, (self, other))

    __rxor__ = __xor__

    def __and__(self, other):
        return _E(_AND, (self, other))


def _flatten_xor(e: "_E", memo: dict) -> frozenset:
    """Maximal XOR-tree leaves (atoms = non-xor nodes), as a set (GF(2))."""
    if e.id in memo:
        return memo[e.id]
    if e.op != _XOR:
        out = frozenset((e.id,))
    else:
        a, b = (_flatten_xor(x, memo) for x in e.args)
        out = a ^ b  # symmetric difference == GF(2) cancellation
    memo[e.id] = out
    return out


def _build_instructions():
    """Trace, optimize, and emit the S-box as (op, dst, a, b) tuples."""
    ins = [_E(_IN, (k,)) for k in range(8)]
    outs = gf_tower.sbox_tower_bits(ins)

    # --- collect reachable nodes -----------------------------------------
    order: list[_E] = []
    seen: set[int] = set()

    def visit(e: _E):
        if e.id in seen:
            return
        seen.add(e.id)
        if e.op in (_XOR, _AND, _NOT):
            for a in e.args:
                visit(a)
        order.append(e)

    for o in outs:
        visit(o)

    # --- greedy pair extraction over XOR trees ---------------------------
    # Rebuild every needed XOR value as a set of atoms; atoms are INs,
    # ANDs, NOTs (whose operand sets are handled recursively by emission).
    memo: dict[int, frozenset] = {}
    by_id = {e.id: e for e in order}
    # targets: xor-sets feeding non-xor consumers (AND/NOT args) + outputs
    targets: dict[int, frozenset] = {}

    def want(e: _E):
        if e.op == _XOR:
            targets[e.id] = _flatten_xor(e, memo)
        # non-xor: nothing (emitted directly)

    for e in order:
        if e.op in (_AND, _NOT):
            for a in e.args:
                want(a)
    for o in outs:
        want(o)

    # Greedy: repeatedly materialize the most frequent atom pair.
    sets = {k: set(v) for k, v in targets.items()}
    pair_atoms: list[tuple[int, int]] = []  # synthesized atom -> (a, b)
    synth_base = 1 << 40
    while True:
        counts: dict[tuple[int, int], int] = {}
        for s in sets.values():
            ss = sorted(s)
            for i in range(len(ss)):
                for j in range(i + 1, len(ss)):
                    p = (ss[i], ss[j])
                    counts[p] = counts.get(p, 0) + 1
        if not counts:
            break
        best, n = max(counts.items(), key=lambda kv: kv[1])
        if n < 2:
            break
        new_atom = synth_base + len(pair_atoms)
        pair_atoms.append(best)
        a, b = best
        for s in sets.values():
            if a in s and b in s:
                s.discard(a)
                s.discard(b)
                s.add(new_atom)

    # --- emission ---------------------------------------------------------
    # registers: 0..7 inputs; then sequentially numbered temps.
    instructions: list[tuple] = []
    reg_of: dict[int, int] = {}
    next_reg = [8]

    def emit(op, a, b=None) -> int:
        r = next_reg[0]
        next_reg[0] += 1
        instructions.append((op, r, a, b))
        return r

    def reg_for_atom(atom: int) -> int:
        if atom in reg_of:
            return reg_of[atom]
        if atom >= synth_base:  # synthesized xor pair
            a, b = pair_atoms[atom - synth_base]
            r = emit("xor", reg_for_atom(a), reg_for_atom(b))
        else:
            e = by_id[atom]
            if e.op == _IN:
                r = e.args[0]
            elif e.op == _AND:
                r = emit("and", reg_for_node(e.args[0]), reg_for_node(e.args[1]))
            elif e.op == _NOT:
                r = emit("not", reg_for_node(e.args[0]))
            elif e.op == _ZERO:
                r = emit("zero", 0)
            else:  # pragma: no cover
                raise AssertionError(e.op)
        reg_of[atom] = r
        return r

    def reg_for_set(s: frozenset | set) -> int:
        rs = [reg_for_atom(a) for a in sorted(s)]
        if not rs:
            return emit("zero", 0)
        acc = rs[0]
        for r in rs[1:]:
            acc = emit("xor", acc, r)
        return acc

    set_reg: dict[frozenset, int] = {}

    def reg_for_node(e: _E) -> int:
        if e.op == _XOR:
            key = frozenset(sets[e.id])
            if key not in set_reg:
                set_reg[key] = reg_for_set(sets[e.id])
            return set_reg[key]
        return reg_for_atom(e.id)

    out_regs = [reg_for_node(o) for o in outs]
    return instructions, out_regs, next_reg[0]


_INSTRUCTIONS, _OUT_REGS, _NREGS = _build_instructions()
GATE_COUNT = sum(1 for i in _INSTRUCTIONS if i[0] in ("xor", "and", "not"))


def sbox_bits_opt(x):
    """Optimized bitsliced S-box: list of 8 arrays -> list of 8 arrays.

    Same contract as gf_tower.sbox_tower_bits; ~25% fewer gates.
    """
    regs = list(x) + [None] * (_NREGS - 8)
    for op, dst, a, b in _INSTRUCTIONS:
        if op == "xor":
            regs[dst] = regs[a] ^ regs[b]
        elif op == "and":
            regs[dst] = regs[a] & regs[b]
        elif op == "not":
            regs[dst] = regs[a] ^ np.uint32(0xFFFFFFFF)
        else:  # zero
            regs[dst] = regs[0] ^ regs[0]
    return [regs[r] for r in _OUT_REGS]


def _selfcheck():
    """Exhaustive check vs the table S-box, bitsliced over int masks."""
    planes = [0] * 8
    for j in range(256):
        for k in range(8):
            if (j >> k) & 1:
                planes[k] |= 1 << j

    class I:  # int-backed plane with the array operator surface
        __slots__ = ("v",)

        def __init__(self, v):
            self.v = v

        def __xor__(self, o):
            if isinstance(o, (int, np.integer)):  # NOT via full mask
                return I(self.v ^ ((1 << 256) - 1) if int(o) else self.v)
            return I(self.v ^ o.v)

        __rxor__ = __xor__

        def __and__(self, o):
            return I(self.v & o.v)

    out = sbox_bits_opt([I(p) for p in planes])
    sb = host_aes.sbox()
    for j in range(256):
        got = sum(((out[k].v >> j) & 1) << k for k in range(8))
        if got != sb[j]:  # pragma: no cover
            raise AssertionError(f"optimized sbox mismatch at {j}")


_selfcheck()
