"""Pod-scale virtual-mesh proof of the north-star colclip configuration.

VERDICT r2 #2: nothing had ever run colclip with ``local_loss +
token_dist='ring'`` at 64 devices — the only mode whose memory math survives
the 32k-global-batch recipe (reference loss.py:235-243 token gather is ~9 GB
of bf16 token features per device at that scale). The probe must run in its
own subprocess because the device count is fixed at backend init (this
suite's conftest pins 8).
"""
import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_ring_token_loss_on_64_device_mesh():
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # probe sets its own device count
    env["PYTHONPATH"] = os.pathsep.join(
        p for p in [REPO, env.get("PYTHONPATH", "")] if p)
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tests", "ring64_probe.py"), "64"],
        env=env, text=True, capture_output=True, timeout=1200,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    result = json.loads(proc.stdout.strip().splitlines()[-1])
    assert result["n_devices"] == 64
    assert result["abs_diff"] < 1e-4, result
    assert result["updated_param_max_abs_diff"] < 1e-5, result
