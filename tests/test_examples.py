"""Every example must run clean end-to-end (slow; full-suite only).

The examples self-assert their own acceptance criteria (SER/BER/SNR
gates), so exit code 0 is a real functional check, not a smoke import.
"""

import glob
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
EXAMPLES = sorted(glob.glob(os.path.join(REPO, "examples", "*.py")))


@pytest.mark.slow
@pytest.mark.parametrize("path", EXAMPLES,
                         ids=[os.path.basename(p) for p in EXAMPLES])
def test_example_runs_clean(path):
    if "resilient" in path:
        pytest.skip("spawns a supervisor loop; covered by test_fault")
    r = subprocess.run([sys.executable, path], capture_output=True,
                       text=True, timeout=600,
                       env=dict(os.environ, JAX_PLATFORMS=""))
    assert r.returncode == 0, (r.stdout[-1000:], r.stderr[-2000:])
