"""AIS (marine automatic identification system) receiver: GMSK 9600 bd,
NRZI, HDLC framing, CRC-16/X-25 — built on the framework's GMSK modem.

Second real-world integration decoder (with models/adsb.py): exercises
the GMSK discriminator path, bit-level framing, and the GF(2) CRC
machinery end to end.  Physical layer per ITU-R M.1371: GMSK BT=0.4,
NRZI (a 0 toggles the line, a 1 holds it), HDLC flags 0x7E with zero
stuffing after five consecutive ones, 16-bit X-25 FCS (LSB-first).

Bit-level framing (stuff/destuff, flag search) is host-side numpy —
variable-length by nature; the sample-rate DSP (GMSK mod/demod) stays on
device.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..utils import bits as B
from . import gmsk

__all__ = ["crc16_x25_bits", "nrzi_encode", "nrzi_decode", "hdlc_stuff",
           "hdlc_destuff", "ais_build_frame", "ais_transmit",
           "ais_find_frames", "ais_receive", "build_type1_payload",
           "parse_type123"]

FLAG = np.array([0, 1, 1, 1, 1, 1, 1, 0], np.int8)
TRAINING = np.tile([0, 1], 12).astype(np.int8)


def crc16_x25_bits(payload_bits) -> np.ndarray:
    """X-25 FCS (poly 0x1021, init 0xFFFF, refin/refout, xorout 0xFFFF) of
    a wire-order (LSB-first-per-byte) bit array, returned as 16 bits
    LSB-first (HDLC transmission order).

    In terms of utils.bits.crc_compute's register convention, the
    reflected X-25 value is the bit-reversal of the reflected=False fold
    (pinned by the standard '123456789' -> 0x906E check value in tests),
    and bit i (LSB-first) of the reversed value is bit 15-i of the fold.
    """
    v = int(B.crc_compute(np.asarray(payload_bits, np.int8), poly=0x1021,
                          width=16, init=0xFFFF, xorout=0xFFFF,
                          reflected=False))
    return ((v >> (15 - np.arange(16))) & 1).astype(np.int8)


def nrzi_encode(bits, initial: int = 0) -> np.ndarray:
    """AIS NRZI: 0 toggles the level, 1 keeps it."""
    b = np.asarray(bits, np.int8)
    toggles = 1 - b
    levels = (initial + np.cumsum(toggles)) % 2
    return levels.astype(np.int8)


def nrzi_decode(levels, initial: int = 0) -> np.ndarray:
    """Inverse of nrzi_encode: 1 where the level held, 0 where it toggled."""
    lv = np.asarray(levels, np.int8)
    prev = np.concatenate([[initial], lv[:-1]])
    return (lv == prev).astype(np.int8)


def hdlc_stuff(bits) -> np.ndarray:
    """Insert a 0 after any run of five 1s (so payload never mimics the
    flag)."""
    out = []
    run = 0
    for b in np.asarray(bits, np.int8):
        out.append(int(b))
        run = run + 1 if b else 0
        if run == 5:
            out.append(0)
            run = 0
    return np.asarray(out, np.int8)


def hdlc_destuff(bits) -> np.ndarray:
    """Remove the stuffed 0 after each run of five 1s."""
    out = []
    run = 0
    skip = False
    for b in np.asarray(bits, np.int8):
        if skip:
            skip = False
            run = 0
            continue
        out.append(int(b))
        run = run + 1 if b else 0
        if run == 5:
            skip = True
    return np.asarray(out, np.int8)


def ais_build_frame(payload_bits) -> np.ndarray:
    """training ++ flag ++ stuff(payload ++ FCS) ++ flag (wire bits)."""
    p = np.asarray(payload_bits, np.int8)
    body = np.concatenate([p, crc16_x25_bits(p)])
    return np.concatenate([TRAINING, FLAG, hdlc_stuff(body), FLAG])


def ais_transmit(payload_bits, sps: int = 8, bt: float = 0.4):
    """Payload bits -> complex GMSK baseband burst (+ a settling tail)."""
    wire = ais_build_frame(payload_bits)
    levels = nrzi_encode(wire)
    # pad tail so the Gaussian shaping + rx delay flush through
    tx_bits = np.concatenate([levels, np.full(16, levels[-1], np.int8)])
    st = gmsk.gmsk_mod_init(bt, sps)
    iq, _ = gmsk.gmsk_modulate(st, jnp.asarray(tx_bits, jnp.int32), sps, bt)
    return np.asarray(iq)


def ais_find_frames(decoded_bits) -> list:
    """Extract destuffed frame bodies between HDLC flags; returns a list
    of (payload_bits, crc_ok)."""
    b = np.asarray(decoded_bits, np.int8)
    n = len(b)
    # flag match positions (sliding compare, vectorized)
    if n < 8:
        return []
    w = np.lib.stride_tricks.sliding_window_view(b, 8)
    flags = np.nonzero((w == FLAG).all(axis=1))[0]
    out = []
    for a, z in zip(flags[:-1], flags[1:]):
        body = b[a + 8: z]
        if len(body) < 24:            # shorter than an FCS: not a frame
            continue
        ds = hdlc_destuff(body)
        if len(ds) < 24:
            continue
        payload, fcs = ds[:-16], ds[-16:]
        ok = bool((crc16_x25_bits(payload) == fcs).all())
        out.append((payload, ok))
    return out


def ais_receive(iq, sps: int = 8, bt: float = 0.4) -> list:
    """Complex baseband -> list of (payload_bits, crc_ok).

    GMSK discriminator demod (device) -> NRZI decode -> flag search ->
    destuff -> FCS check (host framing).
    """
    st = gmsk.gmsk_demod_init(bt, sps)
    x = jnp.asarray(iq, jnp.complex64)
    T = (x.shape[-1] // sps) * sps
    levels, _ = gmsk.gmsk_demod_discriminator(st, x[:T], sps, bt)
    bits = nrzi_decode(np.asarray(levels))
    return ais_find_frames(bits)


# --------------------------------------------------- message content


def _put(bits, pos, width, value):
    v = int(value) & ((1 << width) - 1)
    bits[pos: pos + width] = [(v >> (width - 1 - i)) & 1
                              for i in range(width)]


def build_type1_payload(mmsi: int, lat_deg: float, lon_deg: float,
                        sog_knots: float = 0.0, cog_deg: float = 0.0
                        ) -> np.ndarray:
    """Minimal AIS type-1 position report (168 bits, ITU-R M.1371 §3.3)."""
    bits = np.zeros(168, np.int8)
    _put(bits, 0, 6, 1)                                  # message type
    _put(bits, 8, 30, mmsi)
    _put(bits, 50, 10, round(sog_knots * 10))
    _put(bits, 61, 28, round(lon_deg * 600000) & ((1 << 28) - 1))
    _put(bits, 89, 27, round(lat_deg * 600000) & ((1 << 27) - 1))
    _put(bits, 116, 12, round(cog_deg * 10))
    return bits


def _get(bits, pos, width, signed=False):
    v = 0
    for i in range(width):
        v = (v << 1) | int(bits[pos + i])
    if signed and v >> (width - 1):
        v -= 1 << width
    return v


def parse_type123(payload) -> dict:
    """Decode the common fields of AIS position reports (types 1-3)."""
    p = np.asarray(payload, np.int8)
    return {
        "type": _get(p, 0, 6),
        "mmsi": _get(p, 8, 30),
        "sog_knots": _get(p, 50, 10) / 10.0,
        "lon_deg": _get(p, 61, 28, signed=True) / 600000.0,
        "lat_deg": _get(p, 89, 27, signed=True) / 600000.0,
        "cog_deg": _get(p, 116, 12) / 10.0,
    }
