"""plot_log — training-curve plot from the metrics log (S9 parity).

The reference's ``plot_log`` (utils.py:726-965) renders a 4-panel
matplotlib figure (loss / accuracy / F1 / time per epoch) from
log.txt. This container has no matplotlib, so the same panels are
rendered as a self-contained SVG with no dependencies — input is the
``log.json`` written by ``api.train``/``api.finetune`` (one row per
epoch+phase, the log.txt equivalent).
"""

from __future__ import annotations

import json

__all__ = ["plot_log"]

_W, _H = 420, 260  # per-panel
_PAD = 42
_COLORS = {"train": "#1f77b4", "valid": "#d62728"}


def _panel(rows, metric, title, x0, y0):
    """One line-chart panel as SVG elements."""
    series: dict[str, list[tuple[int, float]]] = {}
    for r in rows:
        if r["phase"] in _COLORS and metric in r:
            series.setdefault(r["phase"], []).append((r["epoch"], float(r[metric])))
    pts = [v for s in series.values() for _, v in s]
    epochs = [e for s in series.values() for e, _ in s]
    if not pts:
        return ""
    lo, hi = min(pts), max(pts)
    if hi - lo < 1e-12:
        hi = lo + 1.0
    e_lo, e_hi = min(epochs), max(epochs)
    if e_hi == e_lo:
        e_hi = e_lo + 1
    iw, ih = _W - 2 * _PAD, _H - 2 * _PAD

    def sx(e):
        return x0 + _PAD + iw * (e - e_lo) / (e_hi - e_lo)

    def sy(v):
        return y0 + _H - _PAD - ih * (v - lo) / (hi - lo)

    out = [
        f'<rect x="{x0 + _PAD}" y="{y0 + _PAD}" width="{iw}" height="{ih}" '
        f'fill="none" stroke="#ccc"/>',
        f'<text x="{x0 + _W / 2}" y="{y0 + 20}" text-anchor="middle" '
        f'font-size="14" font-family="sans-serif">{title}</text>',
        f'<text x="{x0 + _PAD - 6}" y="{y0 + _PAD + 4}" text-anchor="end" '
        f'font-size="10" font-family="sans-serif">{hi:.3g}</text>',
        f'<text x="{x0 + _PAD - 6}" y="{y0 + _H - _PAD + 4}" text-anchor="end" '
        f'font-size="10" font-family="sans-serif">{lo:.3g}</text>',
        f'<text x="{x0 + _W - _PAD}" y="{y0 + _H - _PAD + 16}" text-anchor="end" '
        f'font-size="10" font-family="sans-serif">epoch {e_hi}</text>',
    ]
    for phase, s in series.items():
        s = sorted(s)
        path = " ".join(
            f"{'M' if i == 0 else 'L'}{sx(e):.1f},{sy(v):.1f}"
            for i, (e, v) in enumerate(s)
        )
        out.append(
            f'<path d="{path}" fill="none" stroke="{_COLORS[phase]}" stroke-width="1.5"/>'
        )
        for e, v in s:
            out.append(
                f'<circle cx="{sx(e):.1f}" cy="{sy(v):.1f}" r="2" fill="{_COLORS[phase]}"/>'
            )
    return "".join(out)


def plot_log(log_path: str, output_path: str) -> str:
    """Render log.json → 4-panel SVG (loss, accuracy, macro F1,
    precision/recall are the reference's panels modulo wall-time,
    which the numpy fit does not record per epoch). Returns the
    output path."""
    with open(log_path) as fh:
        rows = [r for r in json.load(fh) if r["phase"] in ("train", "valid")]
    panels = [
        ("loss", "Loss"),
        ("acc", "Accuracy"),
        ("macro_f1", "Macro F1"),
        ("weighted_f1", "Weighted F1"),
    ]
    body = []
    for i, (metric, title) in enumerate(panels):
        x0 = (i % 2) * _W
        y0 = (i // 2) * _H
        body.append(_panel(rows, metric, title, x0, y0))
    legend = (
        f'<text x="{_W}" y="{2 * _H + 16}" text-anchor="middle" font-size="11" '
        f'font-family="sans-serif">'
        f'<tspan fill="{_COLORS["train"]}">— train</tspan>  '
        f'<tspan fill="{_COLORS["valid"]}">— valid</tspan></text>'
    )
    svg = (
        f'<svg xmlns="http://www.w3.org/2000/svg" width="{2 * _W}" '
        f'height="{2 * _H + 24}" style="background:#fff">'
        + "".join(body) + legend + "</svg>"
    )
    with open(output_path, "w") as fh:
        fh.write(svg)
    return output_path
