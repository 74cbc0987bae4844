"""Minimal line-coverage collector built on ``sys.monitoring`` (PEP 669).

The environment has no coverage.py/pytest-cov and installs are not
allowed, so this provides the coverage number VERDICT round-2 weak #6
asks for with stdlib only. Overhead is low: each line event disables
itself after the first hit (the same trick coverage.py's sysmon core
uses).

Usage as a pytest plugin:

    python -m pytest tests/ -q -p tools.linecov

On exit it writes ``/tmp/linecov.json`` ({filename: [lines...]}) and
prints a per-file and total summary. Executable lines are derived from
``code.co_lines()`` over all nested code objects of each source file.

Standalone report from an existing dump:

    python tools/linecov.py report /tmp/linecov.json
"""

import json
import os
import sys

PACKAGE_ROOT = os.path.join(os.path.dirname(os.path.dirname(__file__)), "nessai_tpu")
OUT_PATH = os.environ.get("LINECOV_OUT", "/tmp/linecov.json")

_TOOL_ID = 4  # sys.monitoring.COVERAGE_ID is 1; avoid colliding with pdb etc.
_hits = {}


def _callback(code, line):
    fn = code.co_filename
    if fn.startswith(PACKAGE_ROOT):
        _hits.setdefault(fn, set()).add(line)
    return sys.monitoring.DISABLE


def start():
    mon = sys.monitoring
    mon.use_tool_id(_TOOL_ID, "linecov")
    mon.register_callback(_TOOL_ID, mon.events.LINE, _callback)
    mon.set_events(_TOOL_ID, mon.events.LINE)


def stop_and_dump(path=OUT_PATH):
    mon = sys.monitoring
    try:
        mon.set_events(_TOOL_ID, 0)
        mon.free_tool_id(_TOOL_ID)
    except Exception:
        pass
    with open(path, "w") as f:
        json.dump({k: sorted(v) for k, v in _hits.items()}, f)
    return path


def executable_lines(filename):
    """All executable line numbers of a source file (via co_lines of
    every nested code object)."""
    with open(filename) as f:
        src = f.read()
    try:
        top = compile(src, filename, "exec")
    except SyntaxError:
        return set()
    lines = set()
    stack = [top]
    while stack:
        code = stack.pop()
        for _, _, line in code.co_lines():
            if line is not None:
                lines.add(line)
        for const in code.co_consts:
            if hasattr(const, "co_lines"):
                stack.append(const)
    # docstring-only / module-def lines inflate the denominator slightly;
    # keep them (coverage.py does too, modulo its exclusion pragmas)
    return lines


def report(dump_path=OUT_PATH, root=PACKAGE_ROOT, min_pct=None):
    with open(dump_path) as f:
        hits = {k: set(v) for k, v in json.load(f).items()}
    rows = []
    total_exec = total_hit = 0
    for dirpath, _, files in os.walk(root):
        for fn in sorted(files):
            if not fn.endswith(".py"):
                continue
            path = os.path.join(dirpath, fn)
            ex = executable_lines(path)
            if not ex:
                continue
            hit = len(hits.get(path, set()) & ex)
            total_exec += len(ex)
            total_hit += hit
            rows.append((path[len(root) + 1 :], hit, len(ex)))
    rows.sort(key=lambda r: r[1] / r[2])
    for rel, hit, ex in rows:
        pct = 100.0 * hit / ex
        flag = " <-- " if min_pct and pct < min_pct else ""
        print(f"{rel:60s} {hit:5d}/{ex:5d}  {pct:5.1f}%{flag}")
    pct = 100.0 * total_hit / max(total_exec, 1)
    print(f"{'TOTAL':60s} {total_hit:5d}/{total_exec:5d}  {pct:5.1f}%")
    return pct


# ---------------------------------------------------------------------
# pytest plugin hooks
# ---------------------------------------------------------------------
def pytest_sessionstart(session):
    start()


def pytest_sessionfinish(session, exitstatus):
    path = stop_and_dump()
    sys.stderr.write(f"\n[linecov] wrote {path}\n")


def missing(rel_path, dump_path=OUT_PATH, root=PACKAGE_ROOT):
    """Print the uncovered executable line ranges of one file."""
    with open(dump_path) as f:
        hits = {k: set(v) for k, v in json.load(f).items()}
    path = os.path.join(root, rel_path)
    ex = executable_lines(path)
    miss = sorted(ex - hits.get(path, set()))
    # collapse to ranges
    ranges, start = [], None
    prev = None
    for ln in miss:
        if start is None:
            start = prev = ln
        elif ln == prev + 1:
            prev = ln
        else:
            ranges.append((start, prev))
            start = prev = ln
    if start is not None:
        ranges.append((start, prev))
    for a, b in ranges:
        print(f"{a}-{b}" if a != b else f"{a}")


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "report":
        report(sys.argv[2] if len(sys.argv) > 2 else OUT_PATH)
    elif len(sys.argv) > 1 and sys.argv[1] == "missing":
        missing(sys.argv[2], *(sys.argv[3:4] or []))
    else:
        print(__doc__)
