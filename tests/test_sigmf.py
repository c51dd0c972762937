"""SigMF recording interop: round-trip, metadata, hash integrity."""

import json

import numpy as np
import pytest

from solid_dsp_tpu.runtime import read_sigmf, sigmf_paths, write_sigmf


def _iq(n, seed=0):
    rng = np.random.default_rng(seed)
    return (rng.standard_normal(n) + 1j * rng.standard_normal(n)).astype(
        np.complex64) * 0.5


def test_roundtrip_cf32(tmp_path):
    x = _iq(4096)
    base = str(tmp_path / "rec1")
    dp, mp = write_sigmf(base, x, sample_rate=2.4e6, center_freq=100.1e6,
                         description="test capture")
    y, meta = read_sigmf(base, check_hash=True)
    np.testing.assert_array_equal(np.asarray(y), x)
    g = meta["global"]
    assert g["core:datatype"] == "cf32_le"
    assert g["core:sample_rate"] == 2.4e6
    assert g["core:version"] == "1.0.0"
    assert meta["captures"][0]["core:frequency"] == 100.1e6
    assert "core:datetime" in meta["captures"][0]


def test_roundtrip_ci16_quantized(tmp_path):
    rng = np.random.default_rng(1)
    # bounded in (-0.9, 0.9): ci16 full scale is +-1, avoid clipping
    x = (0.9 * (2 * rng.random(2048) - 1)
         + 0.9j * (2 * rng.random(2048) - 1)).astype(np.complex64)
    base = str(tmp_path / "rec2")
    write_sigmf(base, x, sample_rate=1e6, fmt="ci16")
    y, meta = read_sigmf(base)
    assert meta["global"]["core:datatype"] == "ci16_le"
    # ci16 native scaling is lossy but monotone; correlation ~= 1
    c = np.vdot(np.asarray(y), x) / (np.linalg.norm(y) * np.linalg.norm(x))
    assert abs(c) > 0.999


def test_annotations_and_extension(tmp_path):
    x = _iq(128)
    base = str(tmp_path / "rec3.sigmf-data")  # extension tolerated
    write_sigmf(base, x, sample_rate=48e3,
                annotations=[{"sample_start": 10, "sample_count": 20,
                              "label": "burst"},
                             {"my:custom": 7}])
    _, meta = read_sigmf(str(tmp_path / "rec3.sigmf-meta"))
    a0 = meta["annotations"][0]
    assert a0["core:sample_start"] == 10
    assert a0["core:sample_count"] == 20
    assert a0["core:label"] == "burst"
    assert meta["annotations"][1]["my:custom"] == 7


def test_hash_detects_corruption(tmp_path):
    x = _iq(256)
    base = str(tmp_path / "rec4")
    dp, _ = write_sigmf(base, x, sample_rate=1e6)
    raw = bytearray(open(dp, "rb").read())
    raw[8] ^= 0xFF
    open(dp, "wb").write(bytes(raw))
    with pytest.raises(ValueError, match="sha512 mismatch"):
        read_sigmf(base, check_hash=True)
    # without checking, the (corrupt) data still loads
    y, _ = read_sigmf(base)
    assert len(y) == 256


def test_unknown_datatype_rejected(tmp_path):
    x = _iq(64)
    base = str(tmp_path / "rec5")
    write_sigmf(base, x, sample_rate=1e6)
    _, mp = sigmf_paths(base)
    meta = json.load(open(mp))
    meta["global"]["core:datatype"] = "rf32_be"
    json.dump(meta, open(mp, "w"))
    with pytest.raises(ValueError, match="core:datatype"):
        read_sigmf(base)


def test_unsupported_write_fmt(tmp_path):
    with pytest.raises(ValueError, match="unsupported SigMF format"):
        write_sigmf(str(tmp_path / "x"), _iq(8), 1e6, fmt="ci4")
