"""Alignment logs: the machine-readable observability surface.

Parity: ``AlignLog`` (align_within.rs:14-22), the tuple conversion
(functions.rs:8,26-40) and the printed table (align_within.rs:681-779).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Tuple


@dataclass
class AlignLog:
    contour_id: int
    matched_to: int
    rot_deg: float
    tx: float
    ty: float
    centroid: Tuple[float, float]


def logs_to_tuples(logs: List[AlignLog]):
    """(id, matched_to, rot_deg, tx, ty, centroid_x, centroid_y) tuples."""
    return [
        (l.contour_id, l.matched_to, l.rot_deg, l.tx, l.ty, l.centroid[0], l.centroid[1])
        for l in logs
    ]


def dump_table(title: str, logs: List[AlignLog]) -> None:
    headers = ["Contour", "Matched To", "Rotation (°)", "Tx", "Ty", "Centroid"]
    rows = [
        [
            str(l.contour_id),
            str(l.matched_to),
            f"{l.rot_deg:.2f}",
            f"{l.tx:.2f}",
            f"{l.ty:.2f}",
            f"({l.centroid[0]:.2f},{l.centroid[1]:.2f})",
        ]
        for l in logs
    ]
    widths = [len(h) for h in headers]
    for row in rows:
        for i, cell in enumerate(row):
            widths[i] = max(widths[i], len(cell))

    total_inner = sum(widths) + 3 * len(widths) - 1
    pad = max(total_inner - len(title), 0)
    print("\n+" + "-" * total_inner + "+")
    print("|" + " " * (pad // 2) + title + " " * (pad - pad // 2) + "|")
    sep = "+" + "".join("-" * (w + 2) + "+" for w in widths)
    print(sep)
    header_cells = "|"
    for h, w in zip(headers, widths):
        tp = w - len(h)
        header_cells += " " + " " * (tp // 2) + h + " " * (tp - tp // 2) + " |"
    print(header_cells)
    print(sep)
    for row in rows:
        line = "|"
        for cell, w in zip(row, widths):
            line += " " + cell + " " * (w - len(cell)) + " |"
        print(line)
    print(sep)
