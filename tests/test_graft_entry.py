"""The driver's multi-chip gate, collected as a test.

Round-4 lesson (VERDICT.md): `__graft_entry__.dryrun_multichip` is the
round's official multi-chip correctness record, but nothing in the suite
executed it, so a stale bitwise assert on a float-compute leg shipped red
while the relaxed pytest mesh matrix stayed green. This test runs the REAL
gate — all legs, same entry point the driver uses — in a clean subprocess
(the gate must own backend initialization: it forces an n-device virtual
CPU platform before first jax use, which an already-initialized pytest
process cannot re-do in-process).

Gate ≙ the multi-chip analog of the reference's single-stream inference
loop, /root/reference/bio_image_unet/unet/predict.py:184-202.
"""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_dryrun_multichip_gate():
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    # Drop any inherited device-count flag so the gate's own logic sets it.
    env.pop("XLA_FLAGS", None)
    proc = subprocess.run(
        [sys.executable, "-c",
         "import __graft_entry__ as g; g.dryrun_multichip(8)"],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=1800,
    )
    assert proc.returncode == 0, (
        f"dryrun_multichip(8) failed (rc={proc.returncode})\n"
        f"--- stdout ---\n{proc.stdout}\n--- stderr ---\n{proc.stderr}"
    )
    # Every leg prints an "OK"/"loss=" line; require the final leg's marker
    # so a silent early exit cannot pass.
    assert "sharded-dataset epoch via" in proc.stdout, (
        f"gate did not reach its final leg\n--- stdout ---\n{proc.stdout}")
