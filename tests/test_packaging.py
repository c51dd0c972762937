"""Packaging and bench-sweep structural tests (slow; full-suite only)."""

import json
import os
import subprocess
import sys
import zipfile

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_wheel_builds_and_installed_copy_self_builds(tmp_path):
    """pip wheel -> install to a target dir -> import the INSTALLED copy:
    the native runtime must self-build from the shipped source."""
    wheel_dir = tmp_path / "wheels"
    r = subprocess.run(
        [sys.executable, "-m", "pip", "wheel", REPO, "--no-deps",
         "--no-build-isolation", "-q", "-w", str(wheel_dir)],
        capture_output=True, text=True, timeout=600)
    assert r.returncode == 0, r.stderr[-2000:]
    wheels = list(wheel_dir.glob("*.whl"))
    assert len(wheels) == 1
    names = zipfile.ZipFile(wheels[0]).namelist()
    assert any("native_src/solid_runtime.cc" in n for n in names)

    target = tmp_path / "site"
    r = subprocess.run(
        [sys.executable, "-m", "pip", "install", str(wheels[0]),
         "--no-deps", "-q", "--target", str(target)],
        capture_output=True, text=True, timeout=300)
    assert r.returncode == 0, r.stderr[-2000:]
    code = (
        "import sys; sys.path.insert(0, %r)\n"
        "import solid_dsp_tpu\n"
        "assert %r in solid_dsp_tpu.__file__\n"
        "from solid_dsp_tpu.runtime import CircularBuffer\n"
        "cb = CircularBuffer(16); cb.push(complex(1, 2))\n"
        "assert len(cb) == 1 and cb.pop() == complex(1, 2)\n"
        "print('INSTALLED_OK')\n" % (str(target), str(target)))
    r = subprocess.run([sys.executable, "-c", code],
                       capture_output=True, text=True, timeout=300)
    assert "INSTALLED_OK" in r.stdout, (r.stdout[-500:], r.stderr[-2000:])


@pytest.mark.slow
def test_bench_all_smoke_sweep_structurally_clean():
    """BENCH_SMOKE=1 on CPU: every workload emits a metric row, none
    emits an error row — catches sweep breakage before a round-end run
    on the real chip."""
    code = ("import jax; jax.config.update('jax_platforms', 'cpu')\n"
            "import bench_all\n"
            "bench_all.main()\n")
    env = dict(os.environ, BENCH_SMOKE="1")
    r = subprocess.run([sys.executable, "-c", code], cwd=REPO, env=env,
                       capture_output=True, text=True, timeout=900)
    assert r.returncode == 0, r.stderr[-2000:]
    rows = []
    for line in r.stdout.splitlines():
        try:
            rows.append(json.loads(line))
        except ValueError:
            pass
    assert len(rows) >= 25, len(rows)
    errs = [row for row in rows if "error" in row]
    assert not errs, errs
