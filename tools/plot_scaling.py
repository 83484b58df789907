#!/usr/bin/env python3
"""Render time + speedup curves from bench_sweep.csv as SVG.

The Spark analog of the reference's report plots (graph.py): wall time vs
cores and speedup vs cores, with the serial (lowest-core) run as the
speedup baseline — the reference's NONE-baseline convention. Stdlib only
(the sandbox has no matplotlib); emits bench_scaling.svg next to the CSV.

Usage: python3 tools/plot_scaling.py [bench_sweep.csv] [bench_scaling.svg]
"""
import csv
import math
import sys

# chart tokens (light surface) — series-1 blue for the measured curve,
# secondary ink for the neutral ideal-scaling reference line
SURFACE = "#fcfcfb"
INK = "#0b0b0b"
INK2 = "#52514e"
GRID = "#e7e6e3"
SERIES = "#2a78d6"

W, H = 460, 340          # one panel
ML, MR, MT, MB = 56, 16, 44, 46  # margins


def load(path):
    with open(path) as f:
        rows = [r for r in csv.DictReader(f)]
    rows = sorted(rows, key=lambda r: int(r["cores"]))
    cores = [int(r["cores"]) for r in rows]
    secs = [float(r["sec"]) for r in rows]
    files = int(rows[0]["files"]) if rows else 0
    return cores, secs, files


def nice_ticks(lo, hi, n=5):
    if hi <= lo:
        return [lo]
    raw = (hi - lo) / n
    mag = 10 ** math.floor(math.log10(raw))
    step = next(s * mag for s in (1, 2, 2.5, 5, 10) if s * mag >= raw)
    t0 = math.floor(lo / step) * step
    ticks, t = [], t0
    while t <= hi + 1e-9:
        if t >= lo - 1e-9:
            ticks.append(round(t, 10))
        t += step
    return ticks


def panel(x0, title, cores, ys, ylab, extra_line=None, extra_label=None):
    """One panel: x = log2(cores), y = linear. extra_line = neutral
    dashed reference series (same x domain)."""
    xs = [math.log2(c) for c in cores]
    xlo, xhi = min(xs), max(xs)
    all_y = ys + (extra_line or [])
    ylo, yhi = 0.0, max(all_y) * 1.08
    pw, ph = W - ML - MR, H - MT - MB

    def X(v):
        return x0 + ML + (v - xlo) / (xhi - xlo or 1) * pw

    def Y(v):
        return MT + ph - (v - ylo) / (yhi - ylo or 1) * ph

    s = [f'<text x="{x0 + ML}" y="{MT - 24}" fill="{INK}" font-size="14" font-weight="600">{title}</text>']
    # recessive horizontal grid + y labels
    for t in nice_ticks(ylo, yhi):
        y = Y(t)
        s.append(f'<line x1="{x0 + ML}" y1="{y:.1f}" x2="{x0 + ML + pw}" y2="{y:.1f}" stroke="{GRID}" stroke-width="1"/>')
        lbl = f"{t:g}"
        s.append(f'<text x="{x0 + ML - 8}" y="{y + 4:.1f}" fill="{INK2}" font-size="11" text-anchor="end">{lbl}</text>')
    # x axis: one tick per measured core count
    for c, xv in zip(cores, xs):
        x = X(xv)
        s.append(f'<line x1="{x:.1f}" y1="{MT + ph}" x2="{x:.1f}" y2="{MT + ph + 4}" stroke="{INK2}" stroke-width="1"/>')
        s.append(f'<text x="{x:.1f}" y="{MT + ph + 18}" fill="{INK2}" font-size="11" text-anchor="middle">{c}</text>')
    s.append(f'<text x="{x0 + ML + pw / 2:.1f}" y="{MT + ph + 36}" fill="{INK2}" font-size="11" text-anchor="middle">cores (log scale)</text>')
    s.append(f'<text x="{x0 + 14}" y="{MT + ph / 2:.1f}" fill="{INK2}" font-size="11" text-anchor="middle" transform="rotate(-90 {x0 + 14} {MT + ph / 2:.1f})">{ylab}</text>')
    # neutral reference line first (under the data)
    if extra_line:
        pts = " ".join(f"{X(xv):.1f},{Y(yv):.1f}" for xv, yv in zip(xs, extra_line))
        s.append(f'<polyline points="{pts}" fill="none" stroke="{INK2}" stroke-width="1.5" stroke-dasharray="5 4"/>')
        s.append(f'<text x="{X(xs[-1]) - 4:.1f}" y="{Y(extra_line[-1]) - 6:.1f}" fill="{INK2}" font-size="11" text-anchor="end">{extra_label}</text>')
    # measured series: 2px line, 8px markers with a 2px surface ring
    pts = " ".join(f"{X(xv):.1f},{Y(yv):.1f}" for xv, yv in zip(xs, ys))
    s.append(f'<polyline points="{pts}" fill="none" stroke="{SERIES}" stroke-width="2"/>')
    for xv, yv in zip(xs, ys):
        s.append(f'<circle cx="{X(xv):.1f}" cy="{Y(yv):.1f}" r="4" fill="{SERIES}" stroke="{SURFACE}" stroke-width="2"/>')
    # selective direct labels: first and last point only
    for i in (0, len(xs) - 1):
        anchor = "start" if i == 0 else "end"
        dx = 6 if i == 0 else -6
        s.append(f'<text x="{X(xs[i]) + dx:.1f}" y="{Y(ys[i]) - 8:.1f}" fill="{INK}" font-size="11" text-anchor="{anchor}">{ys[i]:g}</text>')
    return "\n".join(s)


def main():
    src = sys.argv[1] if len(sys.argv) > 1 else "bench_sweep.csv"
    dst = sys.argv[2] if len(sys.argv) > 2 else "bench_scaling.svg"
    cores, secs, files = load(src)
    if len(cores) < 2:
        sys.exit(f"{src}: need >= 2 sweep rows (run Bench with SPARK_GRAFT_SCALE_SWEEP)")
    base_c, base_t = cores[0], secs[0]  # NONE-baseline: the serial / lowest-core run
    speedup = [round(base_t / t, 2) for t in secs]
    ideal = [c / base_c for c in cores]
    secs_r = [round(t, 1) for t in secs]

    total_w = W * 2 + 8
    svg = [
        f'<svg xmlns="http://www.w3.org/2000/svg" width="{total_w}" height="{H}" '
        f'viewBox="0 0 {total_w} {H}" font-family="system-ui, sans-serif">',
        f'<rect width="{total_w}" height="{H}" fill="{SURFACE}"/>',
        panel(0, f"Dedup wall time — {files:,} files", cores, secs_r, "seconds"),
        panel(W + 8, f"Speedup vs {base_c}-core baseline", cores, speedup,
              "speedup ×", extra_line=ideal, extra_label="ideal (linear)"),
        "</svg>",
    ]
    with open(dst, "w") as f:
        f.write("\n".join(svg) + "\n")
    eff = speedup[-1] / ideal[-1]
    print(f"{dst}: cores {cores[0]}..{cores[-1]}, speedup {speedup[-1]}x "
          f"(ideal {ideal[-1]:g}x, efficiency {eff:.2f})")


if __name__ == "__main__":
    main()
