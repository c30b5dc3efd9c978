#!/usr/bin/env python3
"""Generate the synthetic geometry set behind tests/golden/
geometry_ke_values_tpu.csv (disk / ellipse / bar / twin-disk obstacles in
the 128x32 sim2d_3 channel, type-1 near-wall ring with theta 0.5).

Usage: python scripts/make_golden_geometries.py <outdir>
Then:  python scripts/run_all_geometries.py <outdir> --final-time 0.4
"""
import sys
from pathlib import Path

import numpy as np

X, Y = 128, 32


def _disk(cx, cy, r):
    return lambda x, y: np.hypot(x - cx, y - cy) < r


def _ellipse(cx, cy, a, b):
    return lambda x, y: np.hypot((x - cx) / a, (y - cy) / b) < 1.0


def _bar(cx, cy, w, h):
    return lambda x, y: (abs(x - cx) < w) & (abs(y - cy) < h)


def _diamond(cx, cy, s):
    return lambda x, y: (abs(x - cx) + abs(y - cy)) < s


def _twin(cx, dy, r):
    return lambda x, y: (np.hypot(x - cx, y - (16 - dy)) < r) | (np.hypot(x - cx, y - (16 + dy)) < r)


def _build_shapes():
    """54 deterministic obstacle shapes (>=50 x on/off = the reference's
    run_all_geometries-scale golden sweep, reference run_all_geometries.py).
    The first six are the round-2 set, unchanged."""
    shapes = [
        ("1", lambda x, y: np.hypot(x - 32, y - 16) < 4),
        ("2", lambda x, y: np.hypot(x - 40, y - 12) < 5),
        ("3", lambda x, y: np.hypot((x - 36) / 1.8, y - 16) < 4),
        ("4", lambda x, y: (abs(x - 30) < 2) & (abs(y - 16) < 8)),
        ("5", lambda x, y: np.hypot(x - 28, y - 20) < 3.5),
        ("6", lambda x, y: (np.hypot(x - 34, y - 10) < 3) | (np.hypot(x - 34, y - 22) < 3)),
    ]
    n = 7
    for cx in (24, 32, 40, 48):
        for cy in (10, 16, 22):
            for r in (3.0, 4.5):
                shapes.append((str(n), _disk(cx, cy, r)))
                n += 1
    for a, b in ((6, 3), (3, 6), (7, 2.5)):
        for cx in (30, 42):
            for cy in (12, 20):
                shapes.append((str(n), _ellipse(cx, cy, a, b)))
                n += 1
    for w, h in ((2, 8), (8, 2), (3, 10)):
        for cx in (28, 40):
            shapes.append((str(n), _bar(cx, 16, w, h)))
            n += 1
    for s in (5, 7):
        for cx in (30, 42):
            shapes.append((str(n), _diamond(cx, 16, s)))
            n += 1
    for cx, dy, r in ((30, 7, 3.0), (38, 6, 2.5)):
        shapes.append((str(n), _twin(cx, dy, r)))
        n += 1
    return shapes


SHAPES = _build_shapes()


def main():
    out = Path(sys.argv[1] if len(sys.argv) > 1 else "golden_geos")
    out.mkdir(parents=True, exist_ok=True)
    xs, ys = np.meshgrid(np.arange(X), np.arange(Y), indexing="ij")
    for name, f in SHAPES:
        solid = f(xs, ys)
        lines = []
        for x in range(X):
            for y in range(Y):
                if solid[x, y]:
                    t, c = 2, [-1.0] * 8
                else:
                    near = any(
                        0 <= x + dx < X and 0 <= y + dy < Y and solid[x + dx, y + dy]
                        for dx in (-1, 0, 1) for dy in (-1, 0, 1))
                    t, c = (1, [0.5] * 8) if near else (0, [-1.0] * 8)
                lines.append(f"{x} {y} {t} " + " ".join(str(v) for v in c))
        (out / f"{name}.txt").write_text("\n".join(lines) + "\n")
    print(f"wrote {len(SHAPES)} geometries to {out}")


if __name__ == "__main__":
    main()
