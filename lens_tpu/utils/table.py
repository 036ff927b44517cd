"""Minimal ASCII table, replacing the reference's PrettyTable dependency
(reference run_model.py:305-308, sad.py:64-67)."""

from __future__ import annotations

from typing import Sequence


def ascii_table(field_names: Sequence[str], rows: Sequence[Sequence[object]]) -> str:
    cols = [list(map(str, col)) for col in zip(field_names, *rows)]
    widths = [max(len(c) for c in col) for col in cols]

    def line(ch: str = "-", junction: str = "+") -> str:
        return junction + junction.join(ch * (w + 2) for w in widths) + junction

    def fmt_row(vals: Sequence[str]) -> str:
        return "| " + " | ".join(v.center(w) for v, w in zip(vals, widths)) + " |"

    out = [line(), fmt_row([str(f) for f in field_names]), line()]
    for row in rows:
        out.append(fmt_row([str(v) for v in row]))
    out.append(line())
    return "\n".join(out)
