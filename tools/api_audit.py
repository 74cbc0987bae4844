"""Signature-parity audit: reference public API vs nessai_tpu.

Walks ``/root/reference/src/nessai`` with ``ast``, collects every public
function/method signature (module, qualname, parameter names), does the
same for ``nessai_tpu``, and reports reference callables whose name has
no counterpart in the repo, plus matched callables whose keyword
parameters are missing.

This is an audit aid, not a gate: nessai_tpu is a redesign, so some
internal helpers legitimately have no counterpart. The point is to make
the *deliberate* divergences visible so they can be documented in the
migration guide.

Usage: python tools/api_audit.py [--all]
  default: only report reference *public* names (no leading underscore)
  --all:   include private names too
"""

import ast
import os
import sys
from collections import defaultdict

REF = "/root/reference/src/nessai"
REPO = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "nessai_tpu")


def collect(root):
    """{name: [(module, qualname, [params...])]} for every def in *root*."""
    out = defaultdict(list)
    for dirpath, _dirnames, filenames in os.walk(root):
        for fn in filenames:
            if not fn.endswith(".py"):
                continue
            path = os.path.join(dirpath, fn)
            mod = os.path.relpath(path, root)
            try:
                tree = ast.parse(open(path).read())
            except SyntaxError:
                continue

            class V(ast.NodeVisitor):
                def __init__(self):
                    self.stack = []

                def visit_ClassDef(self, node):
                    self.stack.append(node.name)
                    self.generic_visit(node)
                    self.stack.pop()

                def _fn(self, node):
                    qual = ".".join(self.stack + [node.name])
                    a = node.args
                    params = (
                        [p.arg for p in a.posonlyargs]
                        + [p.arg for p in a.args]
                        + ([a.vararg.arg] if a.vararg else [])
                        + [p.arg for p in a.kwonlyargs]
                        + ([a.kwarg.arg] if a.kwarg else [])
                    )
                    out[node.name].append((mod, qual, params))
                    self.generic_visit(node)

                visit_FunctionDef = _fn
                visit_AsyncFunctionDef = _fn

            V().visit(tree)
    return out


def main():
    include_private = "--all" in sys.argv
    ref = collect(REF)
    repo = collect(REPO)

    missing_names = []
    missing_params = []
    for name, sites in sorted(ref.items()):
        if not include_private and name.startswith("_") and name != "__init__":
            continue
        if name not in repo:
            missing_names.append((name, sites))
            continue
        repo_params = set()
        for _m, _q, ps in repo[name]:
            repo_params.update(ps)
        for mod, qual, ps in sites:
            gone = [
                p
                for p in ps
                if p not in repo_params
                and not p.startswith("_")
                and p not in ("self", "cls", "args", "kwargs", "kwds")
            ]
            if gone:
                missing_params.append((name, mod, qual, gone))

    print(f"reference callables: {sum(len(v) for v in ref.values())}")
    print(f"repo callables:      {sum(len(v) for v in repo.values())}")
    print(f"\n== reference names with NO repo counterpart ({len(missing_names)}) ==")
    for name, sites in missing_names:
        locs = ", ".join(f"{m}:{q}" for m, q, _ in sites[:3])
        print(f"  {name}  [{locs}]")
    print(f"\n== matched names with missing keyword params ({len(missing_params)}) ==")
    for name, mod, qual, gone in missing_params:
        print(f"  {mod}:{qual}  missing {gone}")


if __name__ == "__main__":
    main()
