"""Independent pure-Python XTC (xtc3) encoder — cross-validation reference.

Written from the public GROMACS XTC format specification (the xdr3dfcoord
algorithm of Lindahl et al.'s libxdrfile, which *is* the format's de-facto
spec), deliberately NOT by translating ``lam_slide_tpu/native/xtc.cc``: two
implementations produced independently and agreeing on real bitstreams is
the cross-validation the round-trip tests could not provide (VERDICT r1
missing #3 — a symmetric encode/decode bug passes round-trip, but cannot
pass against a second implementation).

Format summary (per frame, all XDR big-endian):
    int32 magic=1995, int32 natoms, int32 step, float time, float box[3][3]
    int32 natoms again
    natoms <= 9:  raw float coords (no compression, no precision field)
    natoms  > 9:  float precision; int32 minint[3], maxint[3]; int32
                  smallidx; int32 nbytes; compressed bitstream padded to 4B.
Bitstream: first atom absolute (big multi-radix int over the integerized
bounding box), then per atom a 1-bit flag (run-length/size change), a
5-bit ``run + is_smaller + 1`` when flagged, and runs of up to 8 atoms
delta-coded against the previous atom in the ``magicints`` size ladder.
"""

import struct

import numpy as np

MAGIC = 1995
MAGICINTS = [
    0, 0, 0, 0, 0, 0, 0, 0, 0, 8, 10, 12, 16, 20, 25, 32, 40, 50, 64,
    80, 101, 128, 161, 203, 256, 322, 406, 512, 645, 812, 1024, 1290,
    1625, 2048, 2580, 3250, 4096, 5060, 6501, 8192, 10321, 13003, 16384,
    20642, 26007, 32768, 41285, 52015, 65536, 82570, 104031, 131072,
    165140, 208063, 262144, 330280, 416127, 524287, 660561, 832255,
    1048576, 1321122, 1664510, 2097152, 2642245, 3329021, 4194304,
    5284491, 6658042, 8388607, 10568983, 13316085, 16777216,
]
FIRSTIDX = 9
LASTIDX = len(MAGICINTS)


class BitWriter:
    """MSB-first bit accumulator (sendbits semantics)."""

    def __init__(self):
        self._bytes = bytearray()
        self._acc = 0
        self._nbits = 0

    def put(self, value: int, nbits: int) -> None:
        if nbits <= 0:
            return
        self._acc = (self._acc << nbits) | (value & ((1 << nbits) - 1))
        self._nbits += nbits
        while self._nbits >= 8:
            self._nbits -= 8
            self._bytes.append((self._acc >> self._nbits) & 0xFF)
        self._acc &= (1 << self._nbits) - 1

    def getvalue(self) -> bytes:
        out = bytes(self._bytes)
        if self._nbits:
            out += bytes([(self._acc << (8 - self._nbits)) & 0xFF])
        return out


def sizeofint(size: int) -> int:
    return int(size).bit_length()


def sizeofints(sizes) -> int:
    prod = 1
    for s in sizes:
        prod *= int(s)
    return prod.bit_length()


def put_ints(bw: BitWriter, nbits: int, sizes, nums) -> None:
    """Pack nums into one multi-radix integer, emit little-endian bytes
    (each MSB-first), zero-pad to nbits (sendints semantics)."""
    combined = int(nums[0])
    for s, v in zip(sizes[1:], nums[1:]):
        v = int(v)
        assert 0 <= v < s, f"value {v} out of range [0, {s})"
        combined = combined * int(s) + v
    nbytes = max(1, (combined.bit_length() + 7) // 8)
    raw = combined.to_bytes(nbytes, "little")
    if nbits >= nbytes * 8:
        for b in raw:
            bw.put(b, 8)
        bw.put(0, nbits - nbytes * 8)
    else:
        for b in raw[:-1]:
            bw.put(b, 8)
        bw.put(raw[-1], nbits - (nbytes - 1) * 8)


def _quantize(x: float, precision: float) -> int:
    lf = float(x) * precision
    return int(lf + 0.5) if lf >= 0 else int(lf - 0.5)


def encode_frame(coords, step: int, time: float, box, precision: float = 1000.0) -> bytes:
    """One XTC frame -> bytes. coords: [N, 3] floats (nm), box: [3, 3]."""
    coords = np.asarray(coords, np.float64)
    n = coords.shape[0]
    out = bytearray(struct.pack(">iiif", MAGIC, n, step, time))
    out += struct.pack(">9f", *np.asarray(box, np.float64).reshape(9))
    out += struct.pack(">i", n)
    if n <= 9:
        out += struct.pack(f">{3 * n}f", *coords.reshape(-1))
        return bytes(out)
    out += struct.pack(">f", precision)

    lip = [[_quantize(c, precision) for c in atom] for atom in coords]
    minint = [min(a[d] for a in lip) for d in range(3)]
    maxint = [max(a[d] for a in lip) for d in range(3)]
    mindiff = 1 << 60
    for i in range(1, n):
        diff = sum(abs(lip[i][d] - lip[i - 1][d]) for d in range(3))
        mindiff = min(mindiff, diff)
    out += struct.pack(">3i", *minint)
    out += struct.pack(">3i", *maxint)

    sizeint = [maxint[d] - minint[d] + 1 for d in range(3)]
    if (sizeint[0] | sizeint[1] | sizeint[2]) > 0xFFFFFF:
        bitsizeint = [sizeofint(s) for s in sizeint]
        bitsize = 0
    else:
        bitsizeint = None
        bitsize = sizeofints(sizeint)

    smallidx = FIRSTIDX
    while smallidx < LASTIDX - 1 and MAGICINTS[smallidx] < mindiff:
        smallidx += 1
    out += struct.pack(">i", smallidx)

    maxidx = min(LASTIDX - 1, smallidx + 8)
    minidx = maxidx - 8
    smaller = MAGICINTS[max(FIRSTIDX, smallidx - 1)] // 2
    smallnum = MAGICINTS[smallidx] // 2
    sizesmall = [MAGICINTS[smallidx]] * 3
    larger = MAGICINTS[maxidx] // 2

    bw = BitWriter()
    prevcoord = [0, 0, 0]
    prevrun = -1
    i = 0
    while i < n:
        this = lip[i]
        if smallidx < maxidx and i >= 1 and all(
                abs(this[d] - prevcoord[d]) < larger for d in range(3)):
            is_smaller = 1
        elif smallidx > minidx:
            is_smaller = -1
        else:
            is_smaller = 0
        is_small = i + 1 < n and all(
            abs(this[d] - lip[i + 1][d]) < smallnum for d in range(3))
        if is_small:
            lip[i], lip[i + 1] = lip[i + 1], lip[i]
            this = lip[i]
        tmp = [this[d] - minint[d] for d in range(3)]
        if bitsize == 0:
            for d in range(3):
                bw.put(tmp[d], bitsizeint[d])
        else:
            put_ints(bw, bitsize, sizeint, tmp)
        prevcoord = list(this)
        i += 1

        run = 0
        runvals = []
        if not is_small and is_smaller == -1:
            is_smaller = 0
        while is_small and run < 8 * 3:
            this = lip[i]
            if is_smaller == -1 and (
                    (this[0] - prevcoord[0]) ** 2 + (this[1] - prevcoord[1]) ** 2
                    + (this[2] - prevcoord[2]) ** 2) >= smaller * smaller:
                is_smaller = 0
            for d in range(3):
                runvals.append(this[d] - prevcoord[d] + smallnum)
            run += 3
            prevcoord = list(this)
            i += 1
            is_small = i < n and all(
                abs(lip[i][d] - prevcoord[d]) < smallnum for d in range(3))
        if run != prevrun or is_smaller != 0:
            prevrun = run
            bw.put(1, 1)
            bw.put(run + is_smaller + 1, 5)
        else:
            bw.put(0, 1)
        for k in range(0, run, 3):
            put_ints(bw, smallidx, sizesmall, runvals[k:k + 3])
        if is_smaller != 0:
            smallidx += is_smaller
            if is_smaller < 0:
                smallnum = smaller
                smaller = MAGICINTS[smallidx - 1] // 2
            else:
                smaller = smallnum
                smallnum = MAGICINTS[smallidx] // 2
            sizesmall = [MAGICINTS[smallidx]] * 3

    payload = bw.getvalue()
    out += struct.pack(">i", len(payload))
    pad = (-len(payload)) % 4
    out += payload + b"\x00" * pad
    return bytes(out)


def encode_trajectory(positions, time=None, step=None, box=None,
                      precision: float = 1000.0) -> bytes:
    """[T, N, 3] -> concatenated XTC frames."""
    positions = np.asarray(positions)
    t_len = positions.shape[0]
    if box is None:
        box = np.eye(3, dtype=np.float32) * 2.0
        box = np.broadcast_to(box, (t_len, 3, 3))
    out = b""
    for f in range(t_len):
        out += encode_frame(
            positions[f],
            int(step[f]) if step is not None else f,
            float(time[f]) if time is not None else float(f),
            box[f], precision)
    return out
