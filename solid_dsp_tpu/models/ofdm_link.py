"""OFDMModem — the byte-in / byte-out multicarrier packet link.

The multicarrier sibling of models/packet.py's single-carrier
PacketModem (the "WiFi-shaped" PHY):

    TX: bytes -> CRC-32 -> scramble -> conv FEC -> interleave -> gray
        M-QAM/M-PSK map -> comb pilots -> OFDM symbols (IFFT + CP)
        -> [Schmidl-Cox preamble | full-pilot symbol | data symbols]
    RX: S&C timing + fractional CFO -> derotate -> FFT grid -> one-shot
        LS channel estimate from the full-pilot symbol -> one-tap EQ ->
        per-symbol common-phase tracking from the comb pilots -> max-log
        LLRs -> deinterleave -> soft Viterbi -> descramble -> CRC check

Everything between sync and LLRs is batched grid math (one FFT over all
symbols, one matmul-shaped equalization) — no per-symbol Python.  The
frame layout is static at construction, so both directions jit cleanly.
Tested through multipath + CFO + AWGN in tests/test_ofdm_link.py.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..utils import bits as B
from ..utils import sequences as seq  # noqa: F401  (parity with packet.py)
from . import fec
from . import linear_mod as lm
from . import ofdm
from . import ofdm_pilots as op

__all__ = ["OFDMModem"]


class OFDMModem:
    """Fixed-size framed packet link over an OFDM burst."""

    def __init__(self, payload_bytes: int = 64, nfft: int = 64,
                 cp: int = 16, n_active: int = 48, scheme: str = "qam",
                 m: int = 16, pilot_spacing: int = 6,
                 fec_scheme: str = "conv", ldpc_iters: int = 30,
                 dtype=jnp.complex64):
        if fec_scheme not in ("conv", "ldpc"):
            raise ValueError(f"unknown fec_scheme {fec_scheme!r}")
        self.payload_bytes = int(payload_bytes)
        self.nfft, self.cp, self.n_active = int(nfft), int(cp), int(n_active)
        self.dtype = dtype
        self.points = np.asarray(lm.constellation(scheme, m))
        self.k = int(np.log2(m))

        # FEC framing (same conventions as PacketModem)
        self.n_info = 8 * self.payload_bytes + 32
        self.fec_scheme = fec_scheme
        self.ldpc_iters = int(ldpc_iters)
        if fec_scheme == "ldpc":
            from . import ldpc as ldpc_mod
            self.code = ldpc_mod.wifi_ldpc_648()
            self.n_frames = -(-self.n_info // self.code.k)
            self.n_coded = self.n_frames * self.code.n
            self.ileave = (1, self.n_coded)   # LDPC graph scatters bursts
        else:
            self.code = fec.ConvCode()
            self.n_coded = (self.n_info + self.code.K - 1) * 2
            r = int(np.sqrt(self.n_coded))
            while self.n_coded % r:
                r -= 1
            self.ileave = (r, self.n_coded // r)

        # pilot layout (comb in frequency order, edges pinned)
        coords = op.active_carrier_coords(nfft, n_active)
        self.pilot_idx, self.data_idx = op.comb_pilot_indices(
            n_active, pilot_spacing, coords=coords)
        self.pilots = op.pilot_values(len(self.pilot_idx))
        per_sym = len(self.data_idx)
        self.n_pad_bits = (-self.n_coded) % self.k
        n_data_syms = (self.n_coded + self.n_pad_bits) // self.k
        self.n_ofdm = -(-n_data_syms // per_sym)
        self.n_fill = self.n_ofdm * per_sym - n_data_syms
        self.n_data_syms = n_data_syms

        # full-pilot reference symbol (known QPSK PRBS on every carrier)
        pb = np.asarray(seq.m_sequence(11, seed=0x71)[: 2 * n_active])
        ps = np.asarray(lm.bits_to_symbols(pb.astype(np.int32), 2))
        self.ref_syms = np.asarray(lm.psk_constellation(4))[ps][:n_active]

        self.preamble = np.asarray(ofdm.schmidl_cox_preamble(nfft, cp))
        sym_len = nfft + cp
        self.frame_samples = (len(self.preamble)
                              + (1 + self.n_ofdm) * sym_len)

    # ------------------------------------------------------------- TX

    def _encode_bits(self, data: bytes) -> np.ndarray:
        if len(data) != self.payload_bytes:
            raise ValueError(
                f"payload must be exactly {self.payload_bytes} bytes")
        info = B._bytes_to_bits_msb_first(data)
        c = B.crc32(info.astype(np.int8))
        tail = ((c >> np.arange(32)) & 1).astype(np.int8)
        framed = np.concatenate([info, tail])
        scrambled = np.asarray(B.additive_scramble(framed))
        if self.fec_scheme == "ldpc":
            padded = np.zeros(self.n_frames * self.code.k, np.int32)
            padded[: self.n_info] = scrambled
            cw = np.asarray(self.code.encode(
                padded.reshape(self.n_frames, self.code.k)))
            return cw.reshape(-1)
        coded = np.asarray(self.code.encode(scrambled))
        return np.asarray(fec.interleave(coded, *self.ileave))

    def transmit(self, data: bytes) -> jnp.ndarray:
        """bytes -> one OFDM burst of ``frame_samples`` IQ samples."""
        bits = self._encode_bits(data)
        bits = np.concatenate([bits,
                               np.zeros(self.n_pad_bits, bits.dtype)])
        syms = np.asarray(lm.modulate_symbols(
            lm.bits_to_symbols(bits, self.k), self.points))
        # filler keeps every carrier modulated (constant envelope stats)
        fill = self.ref_syms[: self.n_fill]
        grid_data = np.concatenate([syms, fill]).reshape(
            self.n_ofdm, len(self.data_idx))
        grid = np.asarray(op.insert_pilots(
            jnp.asarray(grid_data, self.dtype),
            jnp.asarray(self.pilots, self.dtype),
            self.pilot_idx, self.data_idx, self.n_active))
        full = np.concatenate([self.ref_syms[None, :], grid], axis=0)
        body = np.asarray(ofdm.ofdm_modulate(
            jnp.asarray(full, self.dtype), self.nfft, self.cp,
            self.n_active))
        return jnp.concatenate([
            jnp.asarray(self.preamble, self.dtype),
            jnp.asarray(body, self.dtype)])

    # ------------------------------------------------------------- RX

    def receive(self, x):
        """IQ containing one burst -> (bytes, info dict).

        info: sync position, CFO estimate, SNR estimate, ``crc_ok``.
        """
        x = jnp.asarray(x, self.dtype)
        start, cfo = ofdm.schmidl_cox_sync(x, self.nfft, self.cp)
        n = x.shape[-1]
        derot = x * jnp.exp(-2j * jnp.pi * cfo
                            * jnp.arange(n)).astype(self.dtype)
        sym_len = self.nfft + self.cp
        frame0 = start + self.nfft - self.cp // 2
        need = (1 + self.n_ofdm) * sym_len
        seg = jnp.asarray(jnp.roll(derot, -frame0)[:need])
        Y = ofdm.ofdm_demodulate(seg, self.nfft, self.cp, self.n_active)
        H = ofdm.estimate_channel(
            Y[0], jnp.asarray(self.ref_syms, self.dtype))
        Z = ofdm.equalize(Y[1:], H)
        # per-symbol common phase from the comb pilots
        pil = jnp.asarray(self.pilots, self.dtype)
        rot = jnp.sum(Z[:, jnp.asarray(self.pilot_idx)]
                      * jnp.conj(pil)[None, :], axis=-1)
        rot = rot / jnp.maximum(jnp.abs(rot), 1e-12)
        Z = Z * jnp.conj(rot)[:, None]
        # noise estimate from the pilot residuals
        res = Z[:, jnp.asarray(self.pilot_idx)] - pil[None, :]
        nv = jnp.mean(jnp.real(res * jnp.conj(res))) + 1e-9
        y_data = Z[:, jnp.asarray(self.data_idx)].reshape(-1)
        y_data = y_data[: self.n_data_syms]
        llr = np.asarray(lm.demap_soft(y_data,
                                       jnp.asarray(self.points,
                                                   self.dtype), nv))
        llr = llr[: self.n_coded]
        if self.fec_scheme == "ldpc":
            frames = jnp.asarray(llr).reshape(self.n_frames, self.code.n)
            dec, _ok = self.code.decode(frames, n_iters=self.ldpc_iters)
            dec = np.asarray(dec).reshape(-1)[: self.n_info]
        else:
            llr = np.asarray(fec.deinterleave(jnp.asarray(llr),
                                              *self.ileave))
            dec = np.asarray(self.code.decode(jnp.asarray(llr),
                                              soft=True))[: self.n_info]
        plain = np.asarray(B.additive_scramble(dec))
        payload_bits, crc_bits = plain[:-32], plain[-32:]
        got = B.crc32(payload_bits.astype(np.int8))
        sent = int(np.sum(np.left_shift(crc_bits.astype(np.uint64),
                                        np.arange(32, dtype=np.uint64))))
        data = np.packbits(payload_bits.astype(np.uint8)).tobytes()
        info = {
            "start": int(start),
            "cfo": float(cfo),
            "snr_db": float(10 * np.log10(1.0 / float(nv))),
            "crc_ok": bool(got == sent),
        }
        return data, info

    def __repr__(self):
        return (f"OFDMModem [nfft={self.nfft}] [cp={self.cp}] "
                f"[active={self.n_active}] [M={len(self.points)}] "
                f"[{self.n_ofdm} symbols/frame]")

    # ------------------------------------------------------- RX stream

    def receive_stream(self, x, threshold: float = 0.5,
                       max_bursts: int = 64) -> list:
        """Decode EVERY burst in a long capture.

        One Schmidl-Cox metric pass over the whole stream (batched
        device math), then host peak-picking: plateau regions above
        ``threshold`` separated by at least a frame, each decoded by the
        single-burst path on a local slice (so per-burst CFO/channel
        estimates stay independent).  Returns a list of (bytes, info)
        with ``info["offset"]`` the slice position in x.
        """
        from . import framesync as fs

        x = jnp.asarray(x, self.dtype)
        M, _ = ofdm.schmidl_cox_metric(x, self.nfft)
        return fs.scan_bursts(
            np.asarray(M) > threshold, self.frame_samples,
            len(self.preamble), int(x.shape[-1]),
            lambda lo, hi: self.receive(x[lo:hi]), max_bursts)
