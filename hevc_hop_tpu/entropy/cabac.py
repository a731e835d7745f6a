"""Pure-Python CABAC arithmetic engine (H.265 9.3.4), byte-exact with the
reference engine (TEncBinCoderCABAC.cpp:78-367 / TDecBinCoderCABAC.cpp:100-247).

This is the *reference implementation* used for tests and as fallback; the
production path is the C++ engine in native/cabac.cpp (same semantics, built
as a shared library driven through ctypes). CABAC is inherently serial per
substream — parallelism comes from coding many WPP/tile substreams at once,
not from vectorizing the engine.
"""
from __future__ import annotations

from hevc_hop_tpu.entropy import tables

_LPS = tables.LPS_TABLE
_NEXT_MPS = tables.NEXT_STATE_MPS
_NEXT_LPS = tables.NEXT_STATE_LPS
_RENORM = tables.RENORM_TABLE


class CabacEncoder:
    """Binary arithmetic encoder producing the CABAC payload bytes.

    Context states are plain ints (state<<1 | mps) owned by the caller via
    the `ctx` list passed to encode_bin.
    """

    def __init__(self, writer=None) -> None:
        from hevc_hop_tpu.bitstream.bits import BitWriter
        self.writer = writer if writer is not None else BitWriter()
        self.low = 0
        self.range = 510
        self.bits_left = 23
        self.num_buffered = 0
        self.buffered_byte = 0xFF

    @property
    def out(self) -> bytearray:
        return self.writer.out

    # -- engine -----------------------------------------------------------
    def encode_bin(self, ctx: list, idx: int, bin_val: int) -> None:
        s = ctx[idx]
        lps = int(_LPS[s >> 1, (self.range >> 6) & 3])
        self.range -= lps
        if bin_val != (s & 1):
            num_bits = int(_RENORM[lps >> 3])
            self.low = (self.low + self.range) << num_bits
            self.range = lps << num_bits
            ctx[idx] = int(_NEXT_LPS[s])
            self.bits_left -= num_bits
        else:
            ctx[idx] = int(_NEXT_MPS[s])
            if self.range >= 256:
                return
            self.low <<= 1
            self.range <<= 1
            self.bits_left -= 1
        if self.bits_left < 12:
            self._write_out()

    def encode_bypass(self, bin_val: int) -> None:
        self.low <<= 1
        if bin_val:
            self.low += self.range
        self.bits_left -= 1
        if self.bits_left < 12:
            self._write_out()

    def encode_bypass_bins(self, value: int, num_bins: int) -> None:
        while num_bins > 8:
            num_bins -= 8
            pattern = value >> num_bins
            self.low = (self.low << 8) + self.range * pattern
            value -= pattern << num_bins
            self.bits_left -= 8
            if self.bits_left < 12:
                self._write_out()
        self.low = (self.low << num_bins) + self.range * value
        self.bits_left -= num_bins
        if self.bits_left < 12:
            self._write_out()

    def encode_terminate(self, bin_val: int) -> None:
        self.range -= 2
        if bin_val:
            self.low = (self.low + self.range) << 7
            self.range = 2 << 7
            self.bits_left -= 7
        elif self.range >= 256:
            return
        else:
            self.low <<= 1
            self.range <<= 1
            self.bits_left -= 1
        if self.bits_left < 12:
            self._write_out()

    def finish(self) -> None:
        """Flush buffered bytes + tail bits into the writer. The caller then
        appends the rbsp stop bit via writer.write_byte_alignment()."""
        w = self.writer
        if self.low >> (32 - self.bits_left):
            w.write((self.buffered_byte + 1) & 0xFF, 8)
            while self.num_buffered > 1:
                w.write(0x00, 8)
                self.num_buffered -= 1
            self.low -= 1 << (32 - self.bits_left)
        else:
            if self.num_buffered > 0:
                w.write(self.buffered_byte, 8)
            while self.num_buffered > 1:
                w.write(0xFF, 8)
                self.num_buffered -= 1
        w.write(self.low >> 8, 24 - self.bits_left)

    def _write_out(self) -> None:
        lead_byte = self.low >> (24 - self.bits_left)
        self.bits_left += 8
        self.low &= (0xFFFFFFFF >> self.bits_left)
        if lead_byte == 0xFF:
            self.num_buffered += 1
        elif self.num_buffered > 0:
            carry = lead_byte >> 8
            self.writer.write((self.buffered_byte + carry) & 0xFF, 8)
            self.buffered_byte = lead_byte & 0xFF
            fill = (0xFF + carry) & 0xFF
            while self.num_buffered > 1:
                self.writer.write(fill, 8)
                self.num_buffered -= 1
        else:
            self.num_buffered = 1
            self.buffered_byte = lead_byte & 0xFF


class CabacDecoder:
    """Binary arithmetic decoder mirroring TDecBinCABAC (value scaled <<7)."""

    def __init__(self, data: bytes, pos: int = 0) -> None:
        self.data = data
        self.pos = pos
        self.range = 510
        self.value = (self._byte() << 8) | self._byte()
        self.bits_needed = -8

    def _byte(self) -> int:
        if self.pos < len(self.data):
            b = self.data[self.pos]
            self.pos += 1
            return b
        return 0

    def decode_bin(self, ctx: list, idx: int) -> int:
        s = ctx[idx]
        lps = int(_LPS[s >> 1, (self.range >> 6) & 3])
        self.range -= lps
        scaled = self.range << 7
        if self.value < scaled:
            bin_val = s & 1
            ctx[idx] = int(_NEXT_MPS[s])
            if scaled < (256 << 7):
                self.range = scaled >> 6
                self.value += self.value
                self.bits_needed += 1
                if self.bits_needed == 0:
                    self.bits_needed = -8
                    self.value += self._byte()
        else:
            num_bits = int(_RENORM[lps >> 3])
            self.value = (self.value - scaled) << num_bits
            self.range = lps << num_bits
            bin_val = 1 - (s & 1)
            ctx[idx] = int(_NEXT_LPS[s])
            self.bits_needed += num_bits
            if self.bits_needed >= 0:
                self.value += self._byte() << self.bits_needed
                self.bits_needed -= 8
        return bin_val

    def decode_bypass(self) -> int:
        self.value += self.value
        self.bits_needed += 1
        if self.bits_needed >= 0:
            self.bits_needed = -8
            self.value += self._byte()
        scaled = self.range << 7
        if self.value >= scaled:
            self.value -= scaled
            return 1
        return 0

    def decode_bypass_bins(self, num_bins: int) -> int:
        value = 0
        while num_bins > 8:
            self.value = (self.value << 8) + (self._byte() << (8 + self.bits_needed))
            scaled = self.range << 15
            for _ in range(8):
                value += value
                scaled >>= 1
                if self.value >= scaled:
                    value += 1
                    self.value -= scaled
            num_bins -= 8
        self.bits_needed += num_bins
        self.value <<= num_bins
        if self.bits_needed >= 0:
            self.value += self._byte() << self.bits_needed
            self.bits_needed -= 8
        scaled = self.range << (num_bins + 7)
        for _ in range(num_bins):
            value += value
            scaled >>= 1
            if self.value >= scaled:
                value += 1
                self.value -= scaled
        return value

    def decode_terminate(self) -> int:
        self.range -= 2
        scaled = self.range << 7
        if self.value >= scaled:
            return 1
        if scaled < (256 << 7):
            self.range = scaled >> 6
            self.value += self.value
            self.bits_needed += 1
            if self.bits_needed == 0:
                self.bits_needed = -8
                self.value += self._byte()
        return 0


def make_contexts(init_values, qp: int) -> list:
    """Initialize a context state list from an init-value row."""
    return [tables.init_state(qp, int(iv)) for iv in init_values]
