"""Repo lint (the reference's scripts/format.sh role, stdlib-only —
no ruff/black in this environment): byte-compiles every Python file and
enforces basic hygiene (no tabs, no trailing whitespace, LF endings).

  python scripts/lint.py          # check
"""

from __future__ import annotations

import os
import sys

ROOTS = ("gen3c_tpu", "tests", "scripts", "bench.py", "__graft_entry__.py")


def iter_py(repo: str):
    for root in ROOTS:
        path = os.path.join(repo, root)
        if os.path.isfile(path):
            yield path
            continue
        for dirpath, _, files in os.walk(path):
            for f in files:
                if f.endswith(".py"):
                    yield os.path.join(dirpath, f)


def main() -> int:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    problems = []
    for path in iter_py(repo):
        rel = os.path.relpath(path, repo)
        try:
            with open(path, "rb") as f:
                compile(f.read(), rel, "exec")
        except SyntaxError as e:
            problems.append(f"{rel}: does not compile: {e}")
            continue
        with open(path, "rb") as f:
            raw = f.read()
        if b"\r\n" in raw:
            problems.append(f"{rel}: CRLF line endings")
        for i, line in enumerate(raw.split(b"\n"), 1):
            if b"\t" in line:
                problems.append(f"{rel}:{i}: tab character")
            if line != line.rstrip():
                problems.append(f"{rel}:{i}: trailing whitespace")
    for p in problems:
        print(p)
    print(f"{'FAIL' if problems else 'OK'}: "
          f"{len(problems)} problem(s) in {sum(1 for _ in iter_py(repo))} files")
    return 1 if problems else 0


if __name__ == "__main__":
    sys.exit(main())
