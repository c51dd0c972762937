"""Pure-Python sample-at-a-time simulators of the reference's semantics.

These re-derive the reference's per-sample behavior (documented in SURVEY.md
and the golden constants in BASELINE.md) so block kernels can be checked
against an independent streaming implementation on arbitrary inputs — not
just the handful of doctest constants.  NOT used by the library itself.
"""

from __future__ import annotations

import numpy as np


class RefFIR:
    """fir/mod.rs:208-212 — newest-first window, reversed-coef MAC, scale."""

    def __init__(self, coefs, scale=1.0):
        self.c_rev = np.asarray(coefs)[::-1].astype(np.complex128)
        self.window = np.zeros(len(self.c_rev), dtype=np.complex128)
        self.scale = scale

    def execute(self, x):
        self.window = np.concatenate([[x], self.window[:-1]])
        return np.sum(self.c_rev * self.window) * self.scale

    def execute_block(self, xs):
        return np.array([self.execute(x) for x in xs])


class RefDecimFIR(RefFIR):
    """fir/decim.rs — counter increments on push, emit when it wraps to 0."""

    def __init__(self, coefs, scale=1.0, decimation=2):
        super().__init__(coefs, scale)
        self.M = decimation
        self.counter = 0

    def execute_block(self, xs):
        out = []
        for x in xs:
            self.counter = (self.counter + 1) % self.M
            self.window = np.concatenate([[x], self.window[:-1]])
            if self.counter == 0:
                out.append(np.sum(self.c_rev * self.window) * self.scale)
        return np.array(out)


class RefInterpFIR:
    """fir/interp.rs + pfb.rs — zero-padded polyphase, all branches per input."""

    def __init__(self, coefs, interp):
        c = np.asarray(coefs, dtype=np.complex128)
        sub_len = int(np.ceil(len(c) / interp))
        eff = np.zeros(sub_len * interp, dtype=np.complex128)
        eff[: len(c)] = c
        self.interp = interp
        self.sub_len = sub_len
        # branch f: strided coefs eff[f + k*interp]; the reference stores the
        # reversed copy and MACs it against the newest-first window
        # (pfb.rs:34-42, 85-91): sum_k eff[f+(L-1-k)P] x[n-k]
        self.branches = [eff[f::interp].copy() for f in range(interp)]
        self.window = np.zeros(sub_len, dtype=np.complex128)

    def execute_block(self, xs):
        out = []
        for x in xs:
            self.window = np.concatenate([[x], self.window[:-1]])
            for br in self.branches:
                out.append(np.sum(br * self.window[::-1]))
        return np.array(out)


class RefSOS:
    """iir/sos.rs:55-114 — DF-II biquad with a0 normalization."""

    def __init__(self, ff, fb):
        a0 = fb[0]
        self.b = np.asarray(ff[:3], dtype=np.float64) / a0
        self.a = np.asarray(fb[:3], dtype=np.float64) / a0
        self.w = np.zeros(3, dtype=np.complex128)  # [w[n-1], w[n-2], w[n-3]]

    def execute(self, x):
        denom = self.a[1] * self.w[0] + self.a[2] * self.w[1]
        w_n = x - denom
        self.w = np.concatenate([[w_n], self.w[:-1]])
        return self.b[0] * self.w[0] + self.b[1] * self.w[1] + self.b[2] * self.w[2]

    def execute_block(self, xs):
        return np.array([self.execute(x) for x in xs])


class RefIIRNormal:
    """iir/mod.rs:270-289 — DF-II with window length max(nb, na)."""

    def __init__(self, ff, fb):
        a0 = fb[0]
        self.b = np.asarray(ff, dtype=np.float64) / a0
        self.a = np.asarray(fb, dtype=np.float64) / a0
        n = max(len(self.b), len(self.a))
        self.buf = np.zeros(n, dtype=np.complex128)

    def execute(self, x):
        denom = np.sum(self.a[1:] * self.buf[: len(self.a) - 1])
        mixed = x - denom
        self.buf = np.concatenate([[mixed], self.buf[:-1]])
        return np.sum(self.b * self.buf[: len(self.b)])

    def execute_block(self, xs):
        return np.array([self.execute(x) for x in xs])


class RefNCO:
    """nco/mod.rs — u32 phase accumulator + 1024-entry LUT."""

    def __init__(self):
        self.lut = np.sin(2.0 * np.pi * np.arange(1024) / 1024.0)
        self.theta = np.uint32(0)
        self.dtheta = np.uint32(0)

    def constrain(self, rad):
        frac = rad / (2 * np.pi)
        frac -= np.trunc(frac)
        if frac < 0:
            frac += 1.0
        return np.uint32(np.trunc(frac * 0xFFFFFFFF))

    def set_frequency(self, rad):
        self.dtheta = self.constrain(rad)

    def set_phase(self, rad):
        self.theta = self.constrain(rad)

    def index(self):
        # intended u32 wraparound (ref nco/mod.rs:100) without the numpy
        # overflow warning: wrap in python ints then mask
        return ((int(self.theta) + (1 << 21)) >> 22) & 0x3FF

    def sin(self):
        return self.lut[self.index()]

    def cos(self):
        return self.lut[(self.index() + 256) & 0x3FF]

    def step(self):
        self.theta = np.uint32(
            (int(self.theta) + int(self.dtheta)) & 0xFFFFFFFF)


class RefAGC:
    """auto_gain_control/mod.rs:214-246 + squelch FSM :631-677."""

    (UNKNOWN, ENABLED, RISE, SIGNALHI, FALL, SIGNALLO, TIMEOUT, DISABLED) = range(8)

    def __init__(self):
        self.gain = 1.0
        self.scale = 1.0
        self.alpha = 0.1
        self.energy = 1.0
        self.locked = False
        self.mode = self.DISABLED
        self.threshold = 0.0
        self.timeout = 100
        self.timer = 0

    def rssi(self):
        return np.log10(self.gain) * -20.0

    def update_squelch(self):
        thr = self.rssi() > self.threshold
        m = self.mode
        if m == self.ENABLED:
            self.mode = self.RISE if thr else self.ENABLED
        elif m == self.RISE:
            self.mode = self.SIGNALHI if thr else self.FALL
        elif m == self.SIGNALHI:
            self.mode = self.SIGNALHI if thr else self.FALL
        elif m == self.FALL:
            self.timer = self.timeout
            self.mode = self.SIGNALHI if thr else self.SIGNALLO
        elif m == self.SIGNALLO:
            self.timer -= 1
            if self.timer == 0:
                self.mode = self.TIMEOUT
            elif thr:
                self.mode = self.SIGNALHI
            else:
                self.mode = self.SIGNALLO
        elif m == self.TIMEOUT:
            self.mode = self.ENABLED
        else:
            self.mode = self.DISABLED

    def execute(self, x):
        out = x * self.gain
        ee = (out * np.conj(out)).real
        self.energy = (1 - self.alpha) * self.energy + ee * self.alpha
        if self.locked:
            return out
        if self.energy > 1e-6:
            self.gain *= np.exp(-0.5 * self.alpha * np.log(self.energy))
        self.gain = min(self.gain, 1e6)
        self.update_squelch()
        if self.mode == self.ENABLED:
            return x
        return out * self.scale

    def execute_block(self, xs):
        return np.array([self.execute(x) for x in xs])


class RefAutoCorrelator:
    """filter/auto_correlator/mod.rs — two windows + energy ring."""

    def __init__(self, window_size, delay):
        self.W = window_size
        self.D = delay
        self.win = np.zeros(window_size, dtype=np.complex128)
        # delayed window buffer: capacity + delay slots, only first
        # `capacity` ever written (Window::push shifts capacity-1)
        self.dbuf = np.zeros(window_size + delay, dtype=np.complex128)
        self.ebuf = np.zeros(window_size)
        self.esum = 0.0
        self.eidx = 0

    def push(self, x):
        self.win = np.concatenate([[x], self.win[:-1]])
        self.dbuf[1 : self.W] = self.dbuf[: self.W - 1]
        self.dbuf[0] = np.conj(x)
        e2 = (x * np.conj(x)).real
        self.esum -= self.ebuf[self.eidx]
        self.esum += e2
        self.ebuf[self.eidx] = e2
        self.eidx = (self.eidx + 1) % self.W

    def execute(self):
        dvec = self.dbuf[self.D : self.D + self.W]
        return np.sum(self.win * dvec)

    def execute_block(self, xs):
        out = []
        for x in xs:
            self.push(x)
            out.append(self.execute())
        return np.array(out)
