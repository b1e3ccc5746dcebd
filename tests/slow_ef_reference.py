"""Slow, loop-based mirror of the reference SequenceEncoder semantics
(SequenceEncoder.java:143-225) used ONLY as a test oracle for the
vectorized encoder in terrier_ef_spark.ef. Written independently from
the NumPy implementation: explicit per-element state machine, bit lists.
"""

from __future__ import annotations

from terrier_ef_spark.ef import lower_bits, number_of_pointers, pointer_size


class SlowSequenceEncoder:
    def __init__(self, length, upper_bound, strict, index_zeroes, log2_quantum):
        self.strict = strict
        self.index_zeroes = index_zeroes
        self.log2q = log2_quantum
        self.quantum = 1 << log2_quantum
        self.length = length
        self.corrected_ub = upper_bound - (length if strict else 0)
        corrected_len = length + (1 if (not strict and index_zeroes) else 0)
        self.l = lower_bits(corrected_len, upper_bound, strict)
        self.pointer_size = pointer_size(corrected_len, upper_bound, strict, index_zeroes)
        self.expected_pointers = number_of_pointers(
            corrected_len, upper_bound, log2_quantum, strict, index_zeroes
        )
        self.cps = 0
        self.cur_len = 0
        self.last_one = -1
        self.pointer_bits: list[int] = []
        self.lower_bits_list: list[int] = []
        self.upper_bits_list: list[int] = []

    def _append_field(self, bits_list, value, width):
        for i in range(width):
            bits_list.append((value >> i) & 1)

    def add(self, x):
        if self.strict and x == 0:
            raise ValueError
        self.cps += x - (1 if self.strict else 0)
        assert self.cps <= self.corrected_ub
        if self.l != 0:
            self._append_field(self.lower_bits_list, self.cps & ((1 << self.l) - 1), self.l)
        one_position = (self.cps >> self.l) + self.cur_len
        # unary: gap zeros then a one
        for _ in range(one_position - self.last_one - 1):
            self.upper_bits_list.append(0)
        self.upper_bits_list.append(1)
        if self.index_zeroes:
            zeroes_before = self.last_one - self.cur_len + 1
            position = (
                self.last_one
                + (zeroes_before & -(1 << self.log2q))
                + self.quantum
                - zeroes_before
            )
            while position < one_position:
                self._append_field(self.pointer_bits, position + 1, self.pointer_size)
                position += self.quantum
        elif ((self.cur_len + 1) & (self.quantum - 1)) == 0:
            self._append_field(self.pointer_bits, one_position + 1, self.pointer_size)
        self.last_one = one_position
        self.cur_len += 1

    def dump_bits(self) -> list[int]:
        """Finalize (sentinel + pointer padding) and return the RAW
        unpadded bit list in stream order [pointers, lower, upper] —
        the per-sequence payload the reference's global bitfiles
        concatenate back-to-back without word alignment."""
        assert self.cur_len == self.length
        if not self.strict and self.index_zeroes:
            self.add(self.corrected_ub - self.cps)  # sentinel
        if self.index_zeroes and self.pointer_size != 0:
            actual = len(self.pointer_bits) // self.pointer_size
            while actual < self.expected_pointers:
                self._append_field(self.pointer_bits, 0, self.pointer_size)
                actual += 1
        return self.pointer_bits + self.lower_bits_list + self.upper_bits_list

    def dump(self) -> bytes:
        bits = self.dump_bits()
        # pack LSB-first into bytes, pad to 64-bit words
        nbytes = (len(bits) + 7) // 8
        nbytes += (-nbytes) % 8
        out = bytearray(nbytes)
        for i, b in enumerate(bits):
            if b:
                out[i // 8] |= 1 << (i % 8)
        return bytes(out)


def slow_encode(values, upper_bound, strict, index_zeroes, log2_quantum) -> bytes:
    enc = SlowSequenceEncoder(len(values), upper_bound, strict, index_zeroes, log2_quantum)
    for x in values:
        enc.add(int(x))
    return enc.dump()


def slow_encode_bits(values, upper_bound, strict, index_zeroes, log2_quantum) -> list[int]:
    enc = SlowSequenceEncoder(len(values), upper_bound, strict, index_zeroes, log2_quantum)
    for x in values:
        enc.add(int(x))
    return enc.dump_bits()
