"""CI guard for the first-network runbook (VERDICT r4 #8).

``tools/first_network_run.sh`` is the one command that closes the
real-checkpoint evidence gap the day egress exists; nothing else executes
its code paths, so signature drift would rot it silently.  Its --dry-run
mode runs the offline prefix — the exact API constructions and tool flags
the networked steps use — and this test keeps that prefix green in CI.
"""

import os
import subprocess
import sys


def test_first_network_dry_run():
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    r = subprocess.run(
        ["bash", os.path.join(repo, "tools", "first_network_run.sh"),
         "--dry-run"],
        capture_output=True, text=True, timeout=300, env=env, cwd=repo,
    )
    sys.stdout.write(r.stdout[-2000:])
    sys.stderr.write(r.stderr[-2000:])
    assert r.returncode == 0
    assert "DRY RUN OK" in r.stdout
