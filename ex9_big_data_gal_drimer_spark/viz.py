"""Chart sinks (SURVEY.md §2.1 S14, reference main.py:162-231).

The reference renders matplotlib pie/bar PNGs from collected results.
matplotlib is not installed in this container, so each chart call
renders a PNG when matplotlib is importable and otherwise writes a
deterministic JSON chart spec with the same content (same filename
stem) — the data path (top-n + Others bucketing, label/value pairs)
is identical either way and is what the tests pin.
"""

from __future__ import annotations

import json
import os

try:  # pragma: no cover - not installed here
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    HAVE_MPL = True
except ImportError:
    HAVE_MPL = False


def _spec_path(out_path: str) -> str:
    return os.path.splitext(out_path)[0] + ".json"


def _write(kind: str, labels, values, title: str, out_path: str) -> str:
    """Render PNG if matplotlib exists, else persist the chart spec."""
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    if HAVE_MPL:  # pragma: no cover
        fig, ax = plt.subplots(figsize=(10, 7))
        if kind == "pie":
            ax.pie(values, labels=labels, autopct="%1.1f%%")
        else:
            ax.bar(range(len(values)), values)
            ax.set_xticks(range(len(labels)))
            ax.set_xticklabels(labels, rotation=45, ha="right")
        ax.set_title(title)
        fig.tight_layout()
        fig.savefig(out_path)
        plt.close(fig)
        return out_path
    spec = {
        "kind": kind,
        "title": title,
        "labels": list(map(str, labels)),
        "values": [float(v) for v in values],
    }
    path = _spec_path(out_path)
    with open(path, "w") as fh:
        json.dump(spec, fh, indent=2)
    return path


def create_pie_chart(
    pdf, label_col: str, value_col: str, title: str, out_path: str, top_n: int = 15
) -> str:
    """Pie of top-n + 'Others' (reference main.py:162-189).  Input is
    an already-collected (small) pandas frame, sorted desc by value."""
    pdf = pdf.sort_values(value_col, ascending=False)
    top = pdf.head(top_n)
    labels = list(top[label_col])
    values = list(top[value_col])
    rest = pdf[value_col][top_n:].sum()
    if rest > 0:
        labels.append("Others")
        values.append(rest)
    return _write("pie", labels, values, title, out_path)


def create_bar_chart(
    pdf, label_col: str, value_col: str, title: str, out_path: str, top_n: int = 20
) -> str:
    """Bar of top-n (reference main.py:192-231)."""
    pdf = pdf.sort_values(value_col, ascending=False).head(top_n)
    return _write("bar", list(pdf[label_col]), list(pdf[value_col]), title, out_path)
