"""In-circuit gadgets for the recursive verifier: quadratic-extension
arithmetic, the Fiat–Shamir challenger, and Merkle-path verification.

These are the building blocks of the verifier-as-circuit used by the
aggregator (the reference delegates to qp-plonky2's recursion module,
used at /root/reference/wormhole/aggregator/src/circuits/tree.rs:111-136).
Extension semantics match the host model ``host/gle.py`` (GF(p^2) =
GF(p)[x]/(x^2 - 7)); challenger semantics match ``hash/challenger.py``.
"""

from __future__ import annotations

from dataclasses import dataclass

from ..hash.constants import RATE, WIDTH
from ..iop.builder import CircuitBuilder, GeneratorOp
from ..iop.targets import BoolTarget, HashOutTarget

W = 7  # extension generator: x^2 = 7


@dataclass(frozen=True)
class ExtTarget:
    """A GF(p^2) element as two base-field targets."""

    c0: int
    c1: int


def ext_zero(b: CircuitBuilder) -> ExtTarget:
    return ExtTarget(b.zero(), b.zero())


def ext_one(b: CircuitBuilder) -> ExtTarget:
    return ExtTarget(b.one(), b.zero())


def ext_const(b: CircuitBuilder, c0: int, c1: int = 0) -> ExtTarget:
    return ExtTarget(b.constant(c0), b.constant(c1))


def ext_from_base(b: CircuitBuilder, t: int) -> ExtTarget:
    return ExtTarget(t, b.zero())


def ext_add(b: CircuitBuilder, x: ExtTarget, y: ExtTarget) -> ExtTarget:
    return ExtTarget(b.add(x.c0, y.c0), b.add(x.c1, y.c1))


def ext_sub(b: CircuitBuilder, x: ExtTarget, y: ExtTarget) -> ExtTarget:
    return ExtTarget(b.sub(x.c0, y.c0), b.sub(x.c1, y.c1))


def ext_neg(b: CircuitBuilder, x: ExtTarget) -> ExtTarget:
    return ExtTarget(b.neg(x.c0), b.neg(x.c1))


def ext_mul(b: CircuitBuilder, x: ExtTarget, y: ExtTarget) -> ExtTarget:
    """(x0 + x1 φ)(y0 + y1 φ) = (x0y0 + 7 x1y1) + (x0y1 + x1y0) φ."""
    x0y0 = b.mul(x.c0, y.c0)
    c0 = b.arithmetic(W, 1, x.c1, y.c1, x0y0)        # 7*x1*y1 + x0y0
    x1y0 = b.mul(x.c1, y.c0)
    c1 = b.mul_add(x.c0, y.c1, x1y0)                  # x0*y1 + x1*y0
    return ExtTarget(c0, c1)


def ext_mul_base(b: CircuitBuilder, x: ExtTarget, s: int) -> ExtTarget:
    """Multiply by a base-field *target* s."""
    return ExtTarget(b.mul(x.c0, s), b.mul(x.c1, s))


def ext_mul_const(b: CircuitBuilder, x: ExtTarget, c: int) -> ExtTarget:
    return ExtTarget(b.mul_const(c, x.c0), b.mul_const(c, x.c1))


def ext_square(b: CircuitBuilder, x: ExtTarget) -> ExtTarget:
    return ext_mul(b, x, x)


def ext_exp_power_of_2(b: CircuitBuilder, x: ExtTarget, k: int) -> ExtTarget:
    for _ in range(k):
        x = ext_square(b, x)
    return x


def ext_exp_u64(b: CircuitBuilder, x: ExtTarget, e: int) -> ExtTarget:
    result = ext_one(b)
    base = x
    while e > 0:
        if e & 1:
            result = ext_mul(b, result, base)
        if e > 1:
            base = ext_square(b, base)
        e >>= 1
    return result


def ext_select(b: CircuitBuilder, cond: BoolTarget, x: ExtTarget,
               y: ExtTarget) -> ExtTarget:
    return ExtTarget(b.select(cond, x.c0, y.c0), b.select(cond, x.c1, y.c1))


def ext_connect(b: CircuitBuilder, x: ExtTarget, y: ExtTarget) -> None:
    b.connect(x.c0, y.c0)
    b.connect(x.c1, y.c1)


def ext_inverse(b: CircuitBuilder, x: ExtTarget) -> ExtTarget:
    """Witnessed inverse: constrain x * inv == 1 (sound; x must be != 0)."""
    inv = ExtTarget(b.add_virtual_target(), b.add_virtual_target())
    b.generators.append(
        GeneratorOp("ext_inv", inputs=(x.c0, x.c1), outputs=(inv.c0, inv.c1))
    )
    prod = ext_mul(b, x, inv)
    ext_connect(b, prod, ext_one(b))
    return inv


def ext_div(b: CircuitBuilder, x: ExtTarget, y: ExtTarget) -> ExtTarget:
    return ext_mul(b, x, ext_inverse(b, y))


def reduce_with_powers(b: CircuitBuilder, terms: list[ExtTarget],
                       alpha: ExtTarget) -> ExtTarget:
    """Σ_i alpha^i terms[i] via Horner from the top."""
    acc = ext_zero(b)
    for t in reversed(terms):
        acc = ext_add(b, ext_mul(b, acc, alpha), t)
    return acc


# ---------------------------------------------------------------------------
# In-circuit Fiat–Shamir challenger (mirrors hash/challenger.py)
# ---------------------------------------------------------------------------


class RecursiveChallenger:
    """Duplex Poseidon sponge over targets.  The observe/squeeze sequence is
    static for a fixed CommonCircuitData, so the gate structure is fixed."""

    def __init__(self, builder: CircuitBuilder):
        self.b = builder
        zero = builder.zero()
        self.state: list[int] = [zero] * WIDTH
        self.input_buffer: list[int] = []
        self.output_buffer: list[int] = []

    def observe_element(self, t: int):
        self.output_buffer.clear()
        self.input_buffer.append(t)
        if len(self.input_buffer) == RATE:
            self._duplex()

    def observe_elements(self, ts):
        for t in ts:
            self.observe_element(t)

    def observe_hash(self, h: HashOutTarget):
        self.observe_elements(h.elements)

    def observe_cap(self, cap: list[HashOutTarget]):
        for d in cap:
            self.observe_hash(d)

    def observe_extension_element(self, e: ExtTarget):
        self.observe_element(e.c0)
        self.observe_element(e.c1)

    def observe_extension_elements(self, es):
        for e in es:
            self.observe_extension_element(e)

    def _duplex(self):
        for i, t in enumerate(self.input_buffer):
            self.state[i] = t
        self.input_buffer.clear()
        self.state = self.b.permute_poseidon(self.state)
        self.output_buffer = list(self.state[:RATE])

    def get_challenge(self) -> int:
        if self.input_buffer or not self.output_buffer:
            self._duplex()
        return self.output_buffer.pop()

    def get_n_challenges(self, n: int) -> list[int]:
        return [self.get_challenge() for _ in range(n)]

    def get_extension_challenge(self) -> ExtTarget:
        c = self.get_n_challenges(2)
        return ExtTarget(c[0], c[1])

    def get_hash(self) -> HashOutTarget:
        return HashOutTarget.from_list(self.get_n_challenges(4))


# ---------------------------------------------------------------------------
# In-circuit Merkle verification (hash/merkle.py semantics)
# ---------------------------------------------------------------------------


def hash_or_noop(b: CircuitBuilder, leaf: list[int]) -> HashOutTarget:
    if len(leaf) <= 4:
        zero = b.zero()
        padded = list(leaf) + [zero] * (4 - len(leaf))
        return HashOutTarget.from_list(padded)
    return b.hash_n_to_hash_no_pad(leaf)


def compress(b: CircuitBuilder, left: HashOutTarget,
             right: HashOutTarget) -> HashOutTarget:
    return b.hash_n_to_hash_no_pad(list(left.elements) + list(right.elements))


def verify_merkle_proof_with_cap_index(
    b: CircuitBuilder,
    leaf: list[int],
    index_bits: list[BoolTarget],
    cap: list[HashOutTarget],
    siblings: list[HashOutTarget],
) -> None:
    """Walk the path ordered by ``index_bits`` (LSB first, one per sibling),
    then connect to cap[index_bits[len(siblings):]] via select-mux."""
    current = hash_or_noop(b, leaf)
    for bit, sib in zip(index_bits, siblings):
        # bit == 1 -> current is the right child.
        left = HashOutTarget.from_list(
            [b.select(bit, sib.elements[k], current.elements[k]) for k in range(4)]
        )
        right = HashOutTarget.from_list(
            [b.select(bit, current.elements[k], sib.elements[k]) for k in range(4)]
        )
        current = compress(b, left, right)
    # Mux the cap entry addressed by the remaining bits.
    cap_bits = index_bits[len(siblings):]
    assert len(cap) == 1 << len(cap_bits)
    entries = cap
    for bit in cap_bits:
        entries = [
            HashOutTarget.from_list(
                [
                    b.select(bit, hi.elements[k], lo.elements[k])
                    for k in range(4)
                ]
            )
            for lo, hi in zip(entries[0::2], entries[1::2])
        ]
    b.connect_hashes(current, entries[0])
