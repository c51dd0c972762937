"""CLI tests: the demo subcommand is the reference main.rs parity run."""

import numpy as np
import jax.numpy as jnp

from solid_dsp_tpu.__main__ import main
from solid_dsp_tpu.models.fm import fm_modulate
from solid_dsp_tpu.runtime import read_iq, write_iq


def test_demo_reference_parity(capsys):
    # 1024 samples is enough to check the golden head values
    assert main(["demo", "--samples", "1024"]) == 0
    out = capsys.readouterr().out
    # reference doctest golden: IIR step response sample 0
    # (src/filter/iir/mod.rs:267 — 0.05816769596076701)
    assert "0.058167695961" in out


def test_rx_roundtrip(tmp_path, capsys):
    n = 1 << 15
    msg = np.sin(2 * np.pi * 0.002 * np.arange(n)).astype(np.float32)
    iq, _ = fm_modulate(jnp.asarray(msg), 0.1)
    iq = np.asarray(iq) * 0.5 * np.exp(
        2j * np.pi * (0.2 / (2 * np.pi)) * np.arange(n))
    src = str(tmp_path / "in.ci16")
    dst = str(tmp_path / "out.cf32")
    write_iq(src, iq.astype(np.complex64), "ci16")

    assert main(["rx", src, "-o", dst, "--format", "ci16",
                 "--block", "8192"]) == 0
    y = read_iq(dst)
    assert y.shape == (n // 4,)
    # demodulated output correlates with the (decimated) message
    m4 = msg[::4]
    c = np.corrcoef(y.real[512:], m4[512:len(y)])[0, 1]
    assert c > 0.8


def test_spectrum(tmp_path, capsys):
    n = 8192
    x = 0.5 * np.exp(2j * np.pi * 0.1 * np.arange(n))
    src = str(tmp_path / "t.cf32")
    write_iq(src, x.astype(np.complex64))
    assert main(["spectrum", src, "--nfft", "4096"]) == 0
    import json

    rec = json.loads(capsys.readouterr().out)
    assert abs(rec["peak_freq"] - 0.1) < 1e-3
    assert rec["peak_db"] > rec["noise_floor_db"] + 40


def test_spectrum_prime_nfft_bluestein(tmp_path, capsys):
    """Non-pow2 (prime) nfft drives the Bluestein path through the CLI."""
    n = 2048
    x = 0.5 * np.exp(2j * np.pi * 0.25 * np.arange(n))
    src = str(tmp_path / "p.cf32")
    write_iq(src, x.astype(np.complex64))
    assert main(["spectrum", src, "--nfft", "1009"]) == 0
    import json

    rec = json.loads(capsys.readouterr().out)
    assert abs(rec["peak_freq"] - 0.25) < 1e-2
    assert rec["peak_db"] > rec["noise_floor_db"] + 30


def test_tx_rx_cli_roundtrip(tmp_path, capsys):
    """tx generates an FM recording that rx demodulates back."""
    import json

    rec = str(tmp_path / "gen.ci16")
    out = str(tmp_path / "audio.cf32")
    assert main(["tx", rec, "--mod", "fm", "--samples", "16384",
                 "--carrier", "0.2", "--interp", "4",
                 "--format", "ci16"]) == 0
    info = json.loads(capsys.readouterr().out)
    assert info["samples"] == 16384 * 4

    assert main(["rx", rec, "-o", out, "--format", "ci16",
                 "--carrier", "0.2", "--decimation", "4",
                 "--block", "16384"]) == 0
    audio = read_iq(out)
    msg = np.sin(2 * np.pi * 0.002 * np.arange(16384))
    a = audio.real[512:]
    best = max(abs(np.corrcoef(a, msg[512 - l: 512 - l + len(a)])[0, 1])
               for l in range(0, 40))
    assert best > 0.9, best


def test_cli_adsb_and_ais(tmp_path, capsys):
    from solid_dsp_tpu.models import adsb, ais

    rng = np.random.default_rng(0)
    # ADS-B recording
    f = adsb.encode_df17(0x4840D6, rng.integers(0, 2, 56))
    env = adsb.ppm_modulate(f, 2)
    x = np.zeros(4000, np.complex64)
    x[500: 500 + len(env)] = env
    pa = str(tmp_path / "adsb.cf32")
    write_iq(pa, x)
    assert main(["adsb", pa]) == 0
    out = capsys.readouterr().out
    assert '"icao": "4840D6"' in out and '"crc_ok": true' in out
    # AIS recording
    iq = ais.ais_transmit(ais.build_type1_payload(123456789, 1.0, 2.0), 8)
    pb = str(tmp_path / "ais.cf32")
    write_iq(pb, np.concatenate([np.zeros(200, np.complex64),
                                 iq.astype(np.complex64)]))
    assert main(["ais", pb]) == 0
    out = capsys.readouterr().out
    assert '"mmsi": 123456789' in out


def test_cli_resample(tmp_path, capsys):
    n = 1 << 15
    f_in = 0.1
    x = 0.5 * np.exp(2j * np.pi * f_in * np.arange(n)).astype(np.complex64)
    src = str(tmp_path / "in.cf32")
    dst = str(tmp_path / "out.cf32")
    write_iq(src, x)
    assert main(["resample", src, dst, "--rate", "0.4",
                 "--block", "8192"]) == 0
    y = read_iq(dst)
    assert abs(len(y) - 0.4 * n) < 100
    # tone moved to f_in / rate
    k = np.argmax(np.abs(np.fft.fft(y[1000:9192])))
    f_out = k / 8192
    assert abs(f_out - f_in / 0.4) < 2e-3
    capsys.readouterr()


def test_rx_wav_audio_output(tmp_path, capsys):
    import wave

    n = 1 << 16
    fs = 240_000.0                       # pretend capture rate
    tone_hz = 1000.0
    msg = np.sin(2 * np.pi * (tone_hz / fs) * np.arange(n)
                 ).astype(np.float32)
    iq, _ = fm_modulate(jnp.asarray(msg), 0.1)
    iq = np.asarray(iq) * 0.5 * np.exp(
        2j * np.pi * (0.2 / (2 * np.pi)) * np.arange(n))
    src = str(tmp_path / "in.cf32")
    wav = str(tmp_path / "out.wav")
    write_iq(src, iq.astype(np.complex64))
    assert main(["rx", src, "--wav", wav, "--rate", str(fs),
                 "--audio-rate", "48000", "--block", "16384"]) == 0
    with wave.open(wav, "rb") as w:
        assert w.getframerate() == 48000
        assert w.getnchannels() == 1
        pcm = np.frombuffer(w.readframes(w.getnframes()), "<i2")
    # length ~ n / fs seconds of 48 kHz audio
    assert abs(len(pcm) - n / fs * 48000) < 1500
    # the 1 kHz message tone dominates the audio spectrum
    a = pcm[2000:].astype(np.float64)
    A = np.abs(np.fft.rfft(a * np.hanning(len(a))))
    f = np.fft.rfftfreq(len(a), 1 / 48000)
    assert abs(f[10 + np.argmax(A[10:])] - tone_hz) < 30
    # --wav without --rate is a clean error
    assert main(["rx", src, "--wav", wav]) == 1
    capsys.readouterr()


def test_cli_monitor(tmp_path, capsys):
    import json as _json

    rng = np.random.default_rng(3)
    M = 32
    nb, B = 12, 32 * 256
    blocks = []
    for b in range(nb):
        x = 0.05 * (rng.standard_normal(B) + 1j * rng.standard_normal(B))
        if 2 <= b < 6:
            x = x + np.exp(2j * np.pi * (7 / M) * np.arange(B))
        blocks.append(x.astype(np.complex64))
    src = str(tmp_path / "wide.cf32")
    write_iq(src, np.concatenate(blocks))
    assert main(["monitor", src, "--channels", str(M),
                 "--block", str(B)]) == 0
    out = capsys.readouterr().out.strip().splitlines()
    rows = [_json.loads(line) for line in out]
    summary = rows[-1]
    assert summary["blocks"] == nb
    events = rows[:-1]
    assert any(e["channel"] == 7 for e in events) or \
        7 in summary["duty_cycle"]


def test_rx_wav_stereo_output(tmp_path, capsys):
    import wave

    from solid_dsp_tpu.models.fm import fm_stereo_mpx

    n = 1 << 17
    fs = 960_000.0                      # capture rate; demod rate 240 kHz
    t = np.arange(n // 4) / (fs / 4)
    left = np.sin(2 * np.pi * 700.0 * t).astype(np.float32)
    right = np.sin(2 * np.pi * 2100.0 * t).astype(np.float32)
    mpx = np.asarray(fm_stereo_mpx(jnp.asarray(left), jnp.asarray(right),
                                   fs / 4))
    # upsample MPX x4 (zero-order hold is fine for a test), FM modulate
    mpx4 = np.repeat(mpx, 4)[:n].astype(np.float32)
    iq, _ = fm_modulate(jnp.asarray(0.9 * mpx4 / np.abs(mpx4).max()), 0.1)
    iq = np.asarray(iq) * 0.5 * np.exp(
        2j * np.pi * (0.2 / (2 * np.pi)) * np.arange(n))
    src = str(tmp_path / "in.cf32")
    wav = str(tmp_path / "st.wav")
    write_iq(src, iq.astype(np.complex64))
    assert main(["rx", src, "--wav", wav, "--rate", str(fs),
                 "--stereo", "--audio-rate", "48000",
                 "--block", "32768"]) == 0
    with wave.open(wav, "rb") as w:
        assert w.getnchannels() == 2
        pcm = np.frombuffer(w.readframes(w.getnframes()), "<i2")
    L = pcm[0::2].astype(np.float64)
    R = pcm[1::2].astype(np.float64)

    def tone_power(a, hz):
        A = np.abs(np.fft.rfft(a[2000:] * np.hanning(len(a) - 2000)))
        f = np.fft.rfftfreq(len(a) - 2000, 1 / 48000)
        return float(A[np.argmin(np.abs(f - hz))] ** 2)

    # channel separation: each rail's own tone dominates the other's
    sep_L = 10 * np.log10(tone_power(L, 700) / tone_power(L, 2100))
    sep_R = 10 * np.log10(tone_power(R, 2100) / tone_power(R, 700))
    assert sep_L > 12 and sep_R > 12, (sep_L, sep_R)
    capsys.readouterr()


def test_cli_packets(tmp_path, capsys):
    import json as _json

    from solid_dsp_tpu.models.packet import PacketModem

    rng = np.random.default_rng(5)
    pm = PacketModem(payload_bytes=16)
    payloads = [rng.integers(0, 256, 16, dtype=np.uint8).tobytes()
                for _ in range(2)]
    parts = [np.zeros(400, np.complex64)]
    for p in payloads:
        parts += [np.asarray(pm.transmit(p)),
                  np.zeros(500, np.complex64)]
    s = np.concatenate(parts)
    s = s + 0.05 * (rng.standard_normal(len(s))
                    + 1j * rng.standard_normal(len(s)))
    src = str(tmp_path / "pk.cf32")
    write_iq(src, s.astype(np.complex64))
    assert main(["packets", src, "--payload-bytes", "16"]) == 0
    rows = [_json.loads(line) for line in
            capsys.readouterr().out.strip().splitlines()]
    assert rows[-1] == {"bursts": 2, "crc_ok": 2}
    assert bytes.fromhex(rows[0]["payload_hex"]) == payloads[0]
    # unsupported fec for the ofdm phy fails cleanly
    assert main(["packets", src, "--phy", "ofdm", "--fec", "turbo"]) == 1
    capsys.readouterr()


def test_cli_convert(tmp_path, capsys):
    rng = np.random.default_rng(9)
    x = (rng.uniform(-0.9, 0.9, 1000)
         + 1j * rng.uniform(-0.9, 0.9, 1000)).astype(np.complex64)
    a = str(tmp_path / "a.ci16")
    b = str(tmp_path / "b.cf32")
    write_iq(a, x, "ci16")
    assert main(["convert", a, b, "--format", "ci16",
                 "--out-format", "cf32"]) == 0
    y = read_iq(b)
    np.testing.assert_allclose(y, x, atol=1e-4)
    capsys.readouterr()
