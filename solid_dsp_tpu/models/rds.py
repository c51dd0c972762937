"""RDS (Radio Data System): the 57 kHz data subcarrier on broadcast FM.

Completes the broadcast stack (models/fm.py does mono/stereo MPX): RDS
rides at 3x the 19 kHz pilot, BPSK DSB-SC at 1187.5 bps (= 57000/48),
biphase (Manchester) symbols, differential data coding.  The block code
is a (26, 16) cyclic code — 16 info bits + 10-bit checkword XORed with a
per-position offset word (A, B, C, C', D) that provides block sync with
no extra framing bits (IEC 62106).

Implemented here: checkword/syndrome math (GF(2), host ints), group
encode/parse for PI + PS-name (type 0A) groups, an MPX-rate modulator,
and a receiver that derives the 57 kHz carrier from the stereo pilot
(pilot^3 phase), demodulates coherently, searches bit phase, and
block-syncs via the offset-word syndromes.  Sample-rate DSP (mixing,
filtering, integrate-and-dump) is device work; bit/block framing is
host-side like the other decoders.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from .fm import _filt_same
from ..design import firdes

__all__ = ["rds_checkword", "rds_syndrome", "OFFSET_WORDS",
           "encode_group", "make_ps_groups", "rds_modulate",
           "rds_demodulate_bits", "block_sync_decode", "parse_groups",
           "rds_receive"]

RDS_GEN = 0b10110111001        # g(x) = x^10+x^8+x^7+x^5+x^4+x^3+1
BITRATE_DIV = 48               # bit rate = 57 kHz / 48 = 1187.5 bps
OFFSET_WORDS = {"A": 0x0FC, "B": 0x198, "C": 0x168, "Cp": 0x350,
                "D": 0x1B4}
_OFFSET_SEQ = ("A", "B", "C", "D")


def _poly_rem(value: int, top_deg: int) -> int:
    r = int(value)
    for d in range(top_deg, 9, -1):
        if r >> d & 1:
            r ^= RDS_GEN << (d - 10)
    return r & 0x3FF


def rds_checkword(info16: int, offset: str) -> int:
    """10-bit checkword: rem(info * x^10) XOR the block's offset word."""
    return _poly_rem(int(info16) << 10, 25) ^ OFFSET_WORDS[offset]


def rds_syndrome(block26: int, offset: str) -> int:
    """Zero iff the 26-bit block is valid under the given offset word."""
    return _poly_rem(int(block26) ^ OFFSET_WORDS[offset], 25)


def encode_group(infos) -> np.ndarray:
    """Four 16-bit info words -> 104 group bits (offsets A, B, C, D)."""
    bits = []
    for info, off in zip(infos, _OFFSET_SEQ):
        block = (int(info) << 10) | rds_checkword(info, off)
        bits.extend((block >> (25 - i)) & 1 for i in range(26))
    return np.asarray(bits, np.int8)


def make_ps_groups(pi: int, ps_name: str) -> np.ndarray:
    """Type-0A groups carrying an 8-character programme-service name."""
    ps = f"{ps_name:<8.8s}"
    bits = []
    for seg in range(4):
        a = int(pi) & 0xFFFF
        b = (0 << 12) | (0 << 11) | (1 << 10) | (0 << 2) | seg  # 0A, TP=0
        c = 0x0000                                               # AF: none
        d = (ord(ps[2 * seg]) << 8) | ord(ps[2 * seg + 1])
        bits.append(encode_group([a, b, c, d]))
    return np.concatenate(bits)


def rds_modulate(bits, fs: float, phase_pilot: float = 0.0) -> np.ndarray:
    """Data bits -> MPX-rate RDS signal (add to the stereo multiplex).

    Differential encode, biphase (+half/-half) symbol shaping, DSB-SC on
    sin(3 * pilot phase) — the receiver's pilot-cubed reference.  ``fs``
    must give an even integer number of samples per 1187.5 Hz bit (any
    multiple of 228 kHz works).
    """
    spb = fs / 1187.5
    if abs(spb - round(spb)) > 1e-9:
        raise ValueError("fs must be an integer multiple of 1187.5 Hz")
    spb = int(round(spb))
    if spb % 2:
        raise ValueError("samples per bit must be even (biphase halves)")
    b = np.asarray(bits, np.int8)
    diff = np.zeros(len(b), np.int8)
    prev = 0
    for i, v in enumerate(b):                 # differential encode (host)
        prev ^= int(v)
        diff[i] = prev
    lvl = 1.0 - 2.0 * diff.astype(np.float64)  # bit -> +-1
    half = spb // 2
    sym = np.repeat(lvl, spb)
    sign = np.tile(np.r_[np.ones(half), -np.ones(half)], len(b))
    base = sym * sign
    n = np.arange(len(base))
    # the subcarrier is the pilot's third harmonic IN PHASE: sin(3 theta)
    # (a cos-phased carrier lands in the receiver's quadrature arm)
    carrier = np.sin(2.0 * np.pi * (57000.0 / fs) * n + 3.0 * phase_pilot)
    return (base * carrier).astype(np.float32)


def rds_demodulate_bits(mpx, fs: float) -> np.ndarray:
    """MPX -> hard data bits (carrier from pilot^3, coherent BPSK,
    biphase integrate + best bit-phase search, differential decode)."""
    x = jnp.asarray(mpx, jnp.float32)
    n = np.arange(x.shape[-1])
    # pilot extraction (as in fm_stereo_decode): complex 19k mix + LPF
    ph19 = jnp.asarray(np.exp(-2j * np.pi * (19000.0 / fs) * n))
    lp = firdes.firdes_kaiser(301, 2000.0 / fs, 60.0, 0.0)
    pz = _filt_same(x.astype(jnp.complex64) * ph19.astype(jnp.complex64),
                    jnp.asarray(lp, jnp.complex64))
    u = pz / jnp.maximum(jnp.abs(pz), 1e-20)          # unit pilot phasor
    # 57 kHz carrier = (pilot phasor)^3 * e^{j 3 w19 n}; demod = x * carr*
    carr = (u ** 3) * jnp.asarray(
        np.exp(2j * np.pi * (57000.0 / fs) * n)).astype(jnp.complex64)
    bb = _filt_same((x * 2.0).astype(jnp.complex64) * jnp.conj(carr),
                    jnp.asarray(firdes.firdes_kaiser(301, 2400.0 / fs,
                                                     60.0, 0.0),
                                jnp.complex64))
    d = np.asarray(jnp.real(bb))
    spb = int(round(fs / 1187.5))
    half = spb // 2
    nbits = len(d) // spb
    if nbits < 1:
        return np.zeros(0, np.int8)
    # biphase matched filter at EVERY offset in one correlation, then the
    # bit phase is the offset whose per-bit scores have maximal magnitude
    # (zero-pad the tail so every offset yields all nbits scores)
    kern = np.r_[np.ones(half), -np.ones(half)]
    mf = np.convolve(np.r_[d, np.zeros(spb)], kern[::-1], mode="valid")
    best = None
    for off in range(spb):
        score = mf[off::spb][:nbits]
        e = float(np.mean(np.abs(score)))
        if best is None or e > best[0]:
            best = (e, score)
    lvl = (best[1] < 0).astype(np.int8)               # +1 -> diff bit 0
    bits = lvl ^ np.concatenate([[0], lvl[:-1]])      # differential decode
    return bits.astype(np.int8)


def block_sync_decode(bits) -> list:
    """Slide over the bit stream; a position where four consecutive
    26-bit blocks have zero syndrome under offsets A,B,C,D is a group."""
    b = np.asarray(bits, np.int8)
    groups = []
    i = 0
    nmax = len(b) - 104
    while i <= nmax:
        ok = True
        infos = []
        for k, off in enumerate(_OFFSET_SEQ):
            blk = 0
            for j in range(26):
                blk = (blk << 1) | int(b[i + 26 * k + j])
            if rds_syndrome(blk, off):
                ok = False
                break
            infos.append(blk >> 10)
        if ok:
            groups.append(infos)
            i += 104
        else:
            i += 1
    return groups


def parse_groups(groups) -> dict:
    """Extract PI and PS name from type-0 groups."""
    out = {"pi": None, "ps": [" "] * 8}
    for a, bword, _c, dword in groups:
        out["pi"] = a
        gtype = bword >> 12
        if gtype == 0:
            seg = bword & 3
            out["ps"][2 * seg] = chr((dword >> 8) & 0x7F)
            out["ps"][2 * seg + 1] = chr(dword & 0x7F)
    out["ps"] = "".join(out["ps"]).rstrip()
    return out


def rds_receive(mpx, fs: float) -> dict:
    """MPX -> dict(pi, ps, n_groups).  block_sync_decode slides bit by
    bit, so it already covers every bit/biphase alignment."""
    groups = block_sync_decode(rds_demodulate_bits(mpx, fs))
    info = parse_groups(groups) if groups else {"pi": None, "ps": ""}
    info["n_groups"] = len(groups)
    return info
