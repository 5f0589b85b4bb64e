"""Minimal FLAC *encoder* used as a test fixture for the native decoder.

Produces spec-valid FLAC streams exercising the decoder surface: constant /
verbatim / fixed(0-2) / LPC subframes, Rice residuals (method 0, including
escaped raw partitions), independent + left-side + right-side + mid-side
stereo, 8/16/24-bit depths, multi-frame streams with a short last frame.
Real CRC-8/CRC-16 are written so the files are valid for any decoder.
Test-only code; the framework itself never encodes FLAC.
"""

import numpy as np

__all__ = ["write_flac"]


def _crc8(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b
        for _ in range(8):
            crc = ((crc << 1) ^ 0x07) & 0xFF if crc & 0x80 else (crc << 1) & 0xFF
    return crc


def _crc16(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b << 8
        for _ in range(8):
            crc = ((crc << 1) ^ 0x8005) & 0xFFFF if crc & 0x8000 else (crc << 1) & 0xFFFF
    return crc


class BitWriter:
    def __init__(self):
        self.bytes = bytearray()
        self.cur = 0
        self.nbits = 0

    def write(self, value: int, bits: int):
        for i in range(bits - 1, -1, -1):
            self.cur = (self.cur << 1) | ((value >> i) & 1)
            self.nbits += 1
            if self.nbits == 8:
                self.bytes.append(self.cur)
                self.cur = 0
                self.nbits = 0

    def write_signed(self, value: int, bits: int):
        self.write(value & ((1 << bits) - 1), bits)

    def write_unary(self, q: int):
        for _ in range(q):
            self.write(0, 1)
        self.write(1, 1)

    def align(self):
        if self.nbits:
            self.cur <<= (8 - self.nbits)
            self.bytes.append(self.cur)
            self.cur = 0
            self.nbits = 0

    def getvalue(self) -> bytes:
        assert self.nbits == 0
        return bytes(self.bytes)


def _utf8_number(n: int) -> bytes:
    if n < 0x80:
        return bytes([n])
    out, bits = [], 6
    while n >= (1 << bits):
        bits += 5
    nbytes = (bits - 6) // 5 + 1
    lead = (0xFF << (7 - nbytes)) & 0xFF
    out.append(lead | (n >> (6 * nbytes)))
    for i in range(nbytes - 1, -1, -1):
        out.append(0x80 | ((n >> (6 * i)) & 0x3F))
    return bytes(out)


def _rice_encode(bw: BitWriter, residual, param: int, escape_rawbits=None):
    """Single-partition residual (partition order 0), method 0."""
    bw.write(0, 2)   # method 0 (4-bit params)
    bw.write(0, 4)   # partition order 0
    if escape_rawbits is not None:
        bw.write(0xF, 4)
        bw.write(escape_rawbits, 5)
        for r in residual:
            if escape_rawbits:
                bw.write_signed(int(r), escape_rawbits)
        return
    bw.write(param, 4)
    for r in residual:
        r = int(r)
        u = (abs(r) << 1) - (1 if r < 0 else 0)  # zigzag
        bw.write_unary(u >> param)
        if param:
            bw.write(u & ((1 << param) - 1), param)


def _write_subframe(bw: BitWriter, samples, bits: int, mode: str):
    samples = [int(s) for s in samples]
    bw.write(0, 1)  # padding
    if mode == "constant":
        assert all(s == samples[0] for s in samples)
        bw.write(0, 6)
        bw.write(0, 1)  # no wasted bits
        bw.write_signed(samples[0], bits)
    elif mode == "verbatim":
        bw.write(1, 6)
        bw.write(0, 1)
        for s in samples:
            bw.write_signed(s, bits)
    elif mode.startswith("fixed"):
        order = int(mode[5])  # "fixed<order>" or "fixed<order>escape"
        bw.write(8 + order, 6)
        bw.write(0, 1)
        for s in samples[:order]:
            bw.write_signed(s, bits)
        res = []
        for i in range(order, len(samples)):
            if order == 0:
                pred = 0
            elif order == 1:
                pred = samples[i - 1]
            else:
                pred = 2 * samples[i - 1] - samples[i - 2]
            res.append(samples[i] - pred)
        if mode.endswith("escape"):
            # escaped partition carrying raw residuals
            rawbits = max((abs(int(r)).bit_length() + 1 for r in res), default=1)
            _rice_encode(bw, res, 0, escape_rawbits=min(rawbits, 30))
        else:
            _rice_encode(bw, res, 6)
    elif mode == "lpc":
        order, shift = 2, 1
        coefs = [3, -1]  # pred = (3*x[i-1] - x[i-2]) >> 1
        bw.write(32 + order - 1, 6)
        bw.write(0, 1)
        for s in samples[:order]:
            bw.write_signed(s, bits)
        precision = 15
        bw.write(precision - 1, 4)
        bw.write_signed(shift, 5)
        for c in coefs:
            bw.write_signed(c, precision)
        res = []
        for i in range(order, len(samples)):
            pred = (coefs[0] * samples[i - 1] + coefs[1] * samples[i - 2]) >> shift
            res.append(samples[i] - pred)
        _rice_encode(bw, res, 8)
    else:
        raise ValueError(mode)


def _frame(frame_idx: int, chans, bits: int, assignment: int, modes) -> bytes:
    """chans: list of per-channel int sample arrays (already decorrelated for
    assignment 8/9/10 — chans[side_index] holds the side channel)."""
    block = len(chans[0])
    bw = BitWriter()
    bw.write(0x3FFE, 14)
    bw.write(0, 1)   # reserved
    bw.write(0, 1)   # fixed blocksize strategy
    bw.write(7, 4)   # blocksize: 16-bit at end
    bw.write(0, 4)   # sample rate: from STREAMINFO
    ch_code = assignment if assignment >= 8 else len(chans) - 1
    bw.write(ch_code, 4)
    ss = {8: 1, 12: 2, 16: 4, 20: 5, 24: 6, 32: 7}[bits]
    bw.write(ss, 3)
    bw.write(0, 1)   # reserved
    hdr = bw  # continue writing into same writer
    for b in _utf8_number(frame_idx):
        hdr.write(b, 8)
    hdr.write(block - 1, 16)
    hdr.align()
    header_bytes = hdr.getvalue()
    header_bytes += bytes([_crc8(header_bytes)])

    body = BitWriter()
    for c, samples in enumerate(chans):
        ch_bits = bits
        if (assignment == 8 and c == 1) or (assignment == 9 and c == 0) or \
           (assignment == 10 and c == 1):
            ch_bits += 1
        _write_subframe(body, samples, ch_bits, modes[c])
    body.align()
    payload = header_bytes + body.getvalue()
    return payload + _crc16(payload).to_bytes(2, "big")


def write_flac(path, data: np.ndarray, sample_rate: int, bits: int = 16,
               block_size: int = 256, modes="verbatim", assignment: int = 0):
    """data: int array [frames, channels] at the given bit depth.

    ``modes``: subframe mode (str for all channels, or per-channel list).
    ``assignment``: 0 independent, 8 left-side, 9 right-side, 10 mid-side
    (stereo only; decorrelation applied here)."""
    data = np.asarray(data, dtype=np.int64)
    if data.ndim == 1:
        data = data[:, None]
    frames_total, nch = data.shape
    if isinstance(modes, str):
        modes = [modes] * nch

    stream = bytearray(b"fLaC")
    si = bytearray()
    si += block_size.to_bytes(2, "big") * 2          # min/max blocksize
    si += (0).to_bytes(3, "big") * 2                 # min/max framesize unknown
    packed = (sample_rate << 44) | ((nch - 1) << 41) | ((bits - 1) << 36) \
        | frames_total
    si += packed.to_bytes(8, "big")
    si += bytes(16)                                  # md5 unset
    stream += bytes([0x80]) + len(si).to_bytes(3, "big") + si  # last block

    idx = 0
    for start in range(0, frames_total, block_size):
        chunk = data[start:start + block_size]
        chans = [chunk[:, c].tolist() for c in range(nch)]
        if assignment in (8, 9, 10):
            assert nch == 2
            left = chunk[:, 0].astype(np.int64)
            right = chunk[:, 1].astype(np.int64)
            side = (left - right).tolist()
            if assignment == 8:
                chans = [left.tolist(), side]      # left/side
            elif assignment == 9:
                chans = [side, right.tolist()]     # side/right
            else:
                mid = ((left + right) >> 1).tolist()
                chans = [mid, side]
        stream += _frame(idx, chans, bits, assignment, modes)
        idx += 1

    with open(path, "wb") as f:
        f.write(bytes(stream))
