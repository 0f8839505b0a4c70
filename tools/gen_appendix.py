"""Regenerate SURVEY.md Appendix A (registry ↔ §2 inventory map) from the
live query registry, so the docs-coverage guard can never drift from the
code. Run after any registration change::

    python tools/gen_appendix.py

Rewrites only the table body between the Appendix A header and EOF (the
appendix is the last section of SURVEY.md).
"""

from __future__ import annotations

import inspect
import re
import sys

sys.path.insert(0, "/root/repo")

from smfg_datawarehouse_spark.queries import all_queries  # noqa: E402

SURVEY = "/root/repo/SURVEY.md"
WIDTH = 110


def one_liner(doc: str) -> str:
    text = " ".join((doc or "(no docstring)").strip().split())
    text = text.replace("|", "\\|")
    if len(text) > WIDTH:
        text = text[:WIDTH] + "..."
    return text


def main() -> None:
    rows = []
    for name, fn in sorted(all_queries().items()):
        mod = fn.__module__.replace("smfg_datawarehouse_spark.", "")
        line = inspect.getsourcelines(fn)[1]
        rows.append(f"| `{name}` | `{mod}:{line}` | {one_liner(fn.__doc__)} |")

    src = open(SURVEY).read()
    m = re.search(r"(## Appendix A[^\n]*\n)", src)
    assert m, "Appendix A header not found"
    head_end = m.end()
    # keep the prose between the header and the first table row
    body_start = src.index("| query | where | what |", head_end)
    # replace ONLY the contiguous table: stop at the first non-table line
    # after it (e.g. a section added below Appendix A), never truncate to
    # EOF — a later '## ' heading must survive regeneration (ADVICE r6)
    tail_start = len(src)
    for match in re.finditer(r"\n(?!\|)", src[body_start:]):
        tail_start = body_start + match.start() + 1
        break
    table = (
        "| query | where | what |\n|---|---|---|\n" + "\n".join(rows) + "\n"
    )
    open(SURVEY, "w").write(src[:body_start] + table + src[tail_start:])
    print(f"Appendix A regenerated: {len(rows)} rows")


if __name__ == "__main__":
    main()
