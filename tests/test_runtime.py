"""Native runtime tests: ring buffer parity, IQ IO round-trips, pump.

Reference parity targets: circular_buffer/mod.rs doctests (error codes on
full/empty — :424-432, :501-511, :535-546; push/pop/append/release
semantics).
"""

import os

import numpy as np
import pytest

from solid_dsp_tpu.runtime import (
    BufferError_,
    CircularBuffer,
    StreamPump,
    read_iq,
    write_iq,
)


class TestCircularBuffer:
    def test_push_pop_order(self):
        cb = CircularBuffer(8, dtype=np.float64)
        for v in [1.0, 2.0, 3.0]:
            cb.push(v)
        assert len(cb) == 3
        assert cb.pop() == 1.0
        assert cb.pop() == 2.0
        assert len(cb) == 1

    def test_full_error(self):
        cb = CircularBuffer(2, dtype=np.float32)
        cb.push(1.0)
        cb.push(2.0)
        with pytest.raises(BufferError_):
            cb.push(3.0)

    def test_empty_error(self):
        cb = CircularBuffer(2, dtype=np.float32)
        with pytest.raises(BufferError_):
            cb.pop()

    def test_append_overflow_error(self):
        cb = CircularBuffer(4, dtype=np.float32)
        cb.append([1, 2, 3])
        with pytest.raises(BufferError_):
            cb.append([4, 5])

    def test_read_release(self):
        cb = CircularBuffer(8, dtype=np.complex64)
        data = np.arange(5).astype(np.complex64)
        cb.append(data)
        view = cb.read(3)
        np.testing.assert_array_equal(view, data[:3])
        assert len(cb) == 5  # non-consuming
        cb.release(2)
        assert len(cb) == 3
        np.testing.assert_array_equal(cb.read(), data[2:])
        with pytest.raises(BufferError_):
            cb.release(10)

    def test_wraparound(self):
        cb = CircularBuffer(4, dtype=np.int32)
        for round_ in range(10):
            cb.append([round_, round_ + 1])
            got = cb.pop_block(2)
            np.testing.assert_array_equal(got, [round_, round_ + 1])

    def test_reset(self):
        cb = CircularBuffer(4, dtype=np.float32)
        cb.append([1, 2, 3])
        cb.reset()
        assert cb.is_empty()
        assert cb.space() == 4


class TestIQFiles:
    @pytest.mark.parametrize("fmt,tol", [
        ("cf32", 0.0), ("cf64", 1e-7), ("ci16", 3.2e-5), ("ci8", 8e-3),
        ("cu8", 8e-3),
    ])
    def test_roundtrip(self, tmp_path, fmt, tol):
        rng = np.random.default_rng(0)
        x = (0.5 * (rng.standard_normal(1000) + 1j * rng.standard_normal(1000))
             ).astype(np.complex64)
        x = np.clip(x.real, -0.99, 0.99) + 1j * np.clip(x.imag, -0.99, 0.99)
        x = x.astype(np.complex64)
        p = str(tmp_path / f"test.{fmt}")
        assert write_iq(p, x, fmt) == 1000
        y = read_iq(p, fmt)
        assert y.shape == x.shape
        np.testing.assert_allclose(y, x, atol=max(tol, 1e-9))

    def test_offset_count(self, tmp_path):
        x = np.arange(100).astype(np.complex64)
        p = str(tmp_path / "t.cf32")
        write_iq(p, x)
        y = read_iq(p, offset=10, count=20)
        np.testing.assert_array_equal(y, x[10:30])

    def test_append(self, tmp_path):
        p = str(tmp_path / "t.ci16")
        write_iq(p, np.ones(10, np.complex64) * 0.25, "ci16")
        write_iq(p, np.ones(5, np.complex64) * 0.5, "ci16", append=True)
        y = read_iq(p, "ci16")
        assert y.shape == (15,)
        np.testing.assert_allclose(y[:10].real, 0.25, atol=1e-4)
        np.testing.assert_allclose(y[10:].real, 0.5, atol=1e-4)

    def test_bad_format(self, tmp_path):
        with pytest.raises(ValueError, match="unknown IQ format"):
            write_iq(str(tmp_path / "x"), np.ones(4, np.complex64), "bogus")


class TestStreamPump:
    def test_stream_blocks(self, tmp_path):
        n = 100_000
        x = (np.exp(2j * np.pi * 0.01 * np.arange(n)) * 0.5).astype(
            np.complex64)
        p = str(tmp_path / "stream.ci16")
        write_iq(p, x, "ci16")

        got = []
        with StreamPump(p, fmt="ci16", block=16384) as pump:
            for blk in pump:
                got.append(blk)
        y = np.concatenate(got)
        assert y.shape == (n,)
        np.testing.assert_allclose(y, x, atol=2e-4)

    def test_pump_feeds_chain(self, tmp_path):
        """End-to-end: native pump -> JAX FIR chain."""
        import jax.numpy as jnp

        from solid_dsp_tpu.ops.fir import FIRFilter

        n = 32768
        x = (np.exp(2j * np.pi * 0.05 * np.arange(n)) * 0.5).astype(
            np.complex64)
        p = str(tmp_path / "s.cf32")
        write_iq(p, x)

        f_stream = FIRFilter(np.ones(16) / 16, dtype=jnp.complex64)
        outs = []
        with StreamPump(p, block=8192) as pump:
            for blk in pump:
                outs.append(np.asarray(f_stream.execute_block(blk)))
        y_stream = np.concatenate(outs)

        f_ref = FIRFilter(np.ones(16) / 16, dtype=jnp.complex64)
        y_ref = np.asarray(f_ref.execute_block(x))
        np.testing.assert_allclose(y_stream, y_ref, atol=1e-5)

    def test_missing_file(self):
        with pytest.raises(OSError):
            StreamPump("/nonexistent/file.iq")


class TestStdinStreaming:
    def test_pump_reads_from_pipe(self, tmp_path):
        """StreamPump on a FIFO (the CLI's '-' /dev/stdin path)."""
        import subprocess
        import threading

        fifo = str(tmp_path / "fifo")
        os.mkfifo(fifo)
        x = (0.25 * np.exp(2j * np.pi * 0.01 * np.arange(50_000))).astype(
            np.complex64)

        def feeder():
            with open(fifo, "wb") as f:
                f.write(x.tobytes())

        t = threading.Thread(target=feeder)
        t.start()
        got = []
        with StreamPump(fifo, fmt="cf32", block=8192) as pump:
            for blk in pump:
                got.append(blk)
        t.join()
        y = np.concatenate(got)
        np.testing.assert_array_equal(y, x)


class TestUdpSource:
    """Live UDP IQ ingest: loopback datagrams -> converted ring."""

    def _free_port(self):
        import socket

        s = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
        s.close()
        return port

    def test_ci16_datagrams_roundtrip(self):
        import socket
        import time

        from solid_dsp_tpu.runtime import UdpSource

        port = self._free_port()
        rng = np.random.default_rng(0)
        raw = rng.integers(-30000, 30000, size=4096 * 2, dtype=np.int16)
        want = (raw[0::2] + 1j * raw[1::2]).astype(np.complex64) / 32767.0

        with UdpSource(port=port, fmt="ci16",
                       bind_addr="127.0.0.1") as src:
            tx = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
            payload = raw.tobytes()
            # 4 datagrams of 1024 samples each
            for i in range(4):
                tx.sendto(payload[i * 4096:(i + 1) * 4096],
                          ("127.0.0.1", port))
            tx.close()
            # wait for the receiver thread to drain the socket
            deadline = time.time() + 5.0
            got = np.empty(0, np.complex64)
            while len(got) < 4096 and time.time() < deadline:
                got = np.concatenate([got, src.read(8192)])
                time.sleep(0.01)
            assert src.dropped == 0
        np.testing.assert_allclose(got, want, atol=1e-6)

    def test_nonblocking_empty_read(self):
        from solid_dsp_tpu.runtime import UdpSource

        port = self._free_port()
        with UdpSource(port=port, fmt="cf32",
                       bind_addr="127.0.0.1") as src:
            assert src.read(1024).size == 0
            assert src.available == 0

    def test_bad_bind_raises(self):
        import pytest

        from solid_dsp_tpu.runtime import UdpSource

        with pytest.raises(OSError):
            UdpSource(port=5000, fmt="ci16", bind_addr="999.1.1.1")


def test_udp_source_feeds_rx_chain():
    """Live pipeline: UDP datagrams -> ring -> RxChain demodulation."""
    import socket
    import time

    import jax.numpy as jnp

    from solid_dsp_tpu.models.fm import fm_modulate
    from solid_dsp_tpu.models.rx_chain import RxChain, RxChainConfig
    from solid_dsp_tpu.runtime import UdpSource

    n = 16384
    msg = np.sin(2 * np.pi * 0.002 * np.arange(n))
    iq, _ = fm_modulate(jnp.asarray(msg, jnp.float64), 0.1)
    iq = (np.asarray(iq) * 0.5
          * np.exp(2j * np.pi * (0.2 / (2 * np.pi)) * np.arange(n))
          ).astype(np.complex64)

    port = TestUdpSource()._free_port()

    chain = RxChain(RxChainConfig(carrier_freq=0.2, decimation=4,
                                  agc_mode="block", demod="fm"))
    audio = []
    with UdpSource(port=port, fmt="cf32", bind_addr="127.0.0.1") as src:
        tx = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
        payload = iq.tobytes()
        for i in range(0, len(payload), 8192):
            tx.sendto(payload[i:i + 8192], ("127.0.0.1", port))
        tx.close()
        deadline = time.time() + 10.0
        got = 0
        while got < n and time.time() < deadline:
            block = src.read(4096)
            if block.size >= 4:
                take = (block.size // 4) * 4
                audio.append(np.asarray(chain.execute_block(block[:take])))
                got += take
            else:
                time.sleep(0.005)
        assert src.dropped == 0
    audio = np.concatenate(audio).real
    m4 = msg[::4]
    a = audio[512:]
    c = np.corrcoef(a, m4[512:512 + len(a)])[0, 1]
    assert c > 0.8, c


class TestTcpSources:
    def _serve(self, port, header, payload, stop_evt, cmds):
        import socket

        srv = socket.socket()
        srv.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        srv.bind(("127.0.0.1", port))
        srv.listen(1)
        srv.settimeout(5.0)
        conn, _ = srv.accept()
        if header:
            conn.sendall(header)
        conn.sendall(payload)
        conn.settimeout(0.2)
        try:
            while not stop_evt.is_set():
                try:
                    d = conn.recv(5)
                    if not d:
                        break
                    cmds.append(d)
                except socket.timeout:
                    pass
        finally:
            conn.close()
            srv.close()

    def test_rtl_tcp_client_end_to_end(self):
        import threading
        import time

        from solid_dsp_tpu.runtime import RtlTcpSource

        rng = np.random.default_rng(0)
        iq_u8 = rng.integers(0, 256, 20000, dtype=np.uint8)
        hdr = (b"RTL0" + (5).to_bytes(4, "big")
               + (29).to_bytes(4, "big"))
        stop_evt, cmds = threading.Event(), []
        th = threading.Thread(target=self._serve,
                              args=(41713, hdr, iq_u8.tobytes(),
                                    stop_evt, cmds))
        th.start()
        time.sleep(0.2)
        try:
            with RtlTcpSource("127.0.0.1", 41713) as sdr:
                assert sdr.tuner_type == 5      # R820T per the header
                sdr.set_center_freq(100_300_000)
                sdr.set_sample_rate(2_048_000)
                deadline = time.time() + 5.0
                x = np.zeros(0, np.complex64)
                while len(x) < 10000 and time.time() < deadline:
                    x = np.concatenate([x, sdr.read(1 << 16)])
                    time.sleep(0.05)
                expect = (iq_u8.astype(np.float32) - 127.5) / 127.5
                expect = expect[0::2] + 1j * expect[1::2]
                assert len(x) == 10000
                np.testing.assert_allclose(x, expect, atol=1e-6)
                assert sdr.dropped == 0
        finally:
            stop_evt.set()
            th.join()
        # 5-byte big-endian command wire format
        assert bytes.fromhex("0105fa74e0") in cmds
        assert bytes.fromhex("02001f4000") in cmds

    def test_raw_tcp_ci16_and_eof(self):
        import threading
        import time

        from solid_dsp_tpu.runtime import TcpSource

        rng = np.random.default_rng(1)
        iq = rng.integers(-30000, 30000, 8192, dtype=np.int16)
        stop_evt, cmds = threading.Event(), []
        th = threading.Thread(target=self._serve,
                              args=(41714, b"", iq.tobytes(), stop_evt,
                                    cmds))
        th.start()
        time.sleep(0.2)
        try:
            with TcpSource("127.0.0.1", 41714, fmt="ci16") as src:
                deadline = time.time() + 5.0
                x = np.zeros(0, np.complex64)
                while len(x) < 2048 and time.time() < deadline:
                    x = np.concatenate([x, src.read(4096)])
                    time.sleep(0.05)
                expect = iq.astype(np.float32) / 32767.0
                expect = expect[0::2] + 1j * expect[1::2]
                np.testing.assert_allclose(x, expect[: len(x)], atol=1e-6)
                stop_evt.set()          # server closes -> orderly EOF
                deadline = time.time() + 5.0
                while not src.eof and time.time() < deadline:
                    src.read(4096)
                    time.sleep(0.05)
                assert src.eof
                assert len(src.read(16)) == 0   # drained EOF: empty
        finally:
            stop_evt.set()
            th.join()

    def test_connect_refused_raises(self):
        from solid_dsp_tpu.runtime import TcpSource

        with pytest.raises(OSError):
            TcpSource("127.0.0.1", 1, fmt="ci16")   # nothing listens
