"""Pre-snapshot checklist (VERDICT round-4 item 8: de-risk round close-out).

Round 4 shipped two process failures — a snapshot commit containing
never-executed code that broke the fast test tier, and a red driver
multi-chip artifact. This script runs, from a clean environment, exactly
what the driver will run:

  1. the fast test tier          (python -m pytest tests/ -q -m "not slow")
  2. the bench entry             (python bench.py)
  3. the driver's dryrun matrix  (XLA_FLAGS=--xla_force_host_platform_device_count=8
                                  JAX_PLATFORMS=cpu python -c
                                  "import __graft_entry__ as g; g.dryrun_multichip(8)")
  4. the single-chip entry compile check, on the virtual CPU backend
  5. the G2P accuracy gate       (python tools/g2p_eval.py)

Usage: python tools/preflight.py [--skip-bench]
Prints one PASS/FAIL line per check and a final JSON summary; exits nonzero
if anything failed. Run this before the final commit of a round — a snapshot
must contain zero never-executed code.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run(name: str, cmd: list[str], env_extra: dict | None = None,
        timeout: float = 1800.0) -> dict:
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)
    if env_extra:
        env.update(env_extra)
    t0 = time.monotonic()
    try:
        proc = subprocess.run(
            cmd, cwd=REPO, env=env, capture_output=True, text=True, timeout=timeout
        )
        rc, tail = proc.returncode, (proc.stdout + proc.stderr)[-800:]
    except subprocess.TimeoutExpired:
        rc, tail = 124, f"timed out after {timeout:.0f}s"
    dt = time.monotonic() - t0
    ok = rc == 0
    print(f"{'PASS' if ok else 'FAIL'}  {name}  ({dt:.1f}s, rc={rc})", flush=True)
    if not ok:
        print(tail, flush=True)
    return {"name": name, "ok": ok, "rc": rc, "seconds": round(dt, 1)}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--skip-bench", action="store_true",
                    help="skip bench.py (e.g. when the TPU tunnel is known-dead; "
                         "the driver will still run it, so prefer not to skip)")
    args = ap.parse_args()

    cpu8 = {
        "JAX_PLATFORMS": "cpu",
        "XLA_FLAGS": "--xla_force_host_platform_device_count=8",
    }
    results = [
        run("fast-test-tier",
            [sys.executable, "-m", "pytest", "tests/", "-q", "-m", "not slow"]),
        run("dryrun-multichip-driver-matrix",
            [sys.executable, "-c",
             "import __graft_entry__ as g; g.dryrun_multichip(8)"],
            env_extra=cpu8),
        run("entry-compile-check",
            [sys.executable, "-c",
             "import jax; jax.config.update('jax_platforms', 'cpu'); "
             "import __graft_entry__ as g; fn, a = g.entry(); "
             "out = jax.jit(fn).lower(*a).compile(); print('entry ok')"],
            env_extra={"JAX_PLATFORMS": "cpu"}),
        run("g2p-gate", [sys.executable, "tools/g2p_eval.py"]),
    ]
    if not args.skip_bench:
        results.append(run("bench", [sys.executable, "bench.py"], timeout=3600.0))

    ok = all(r["ok"] for r in results)
    print(json.dumps({"preflight_ok": ok, "checks": results}))
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
