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
SHAPES = [
    ("1", lambda x, y: np.hypot(x - 32, y - 16) < 4),
    ("2", lambda x, y: np.hypot(x - 40, y - 12) < 5),
    ("3", lambda x, y: np.hypot((x - 36) / 1.8, y - 16) < 4),
    ("4", lambda x, y: (abs(x - 30) < 2) & (abs(y - 16) < 8)),
    ("5", lambda x, y: np.hypot(x - 28, y - 20) < 3.5),
    ("6", lambda x, y: (np.hypot(x - 34, y - 10) < 3) | (np.hypot(x - 34, y - 22) < 3)),
]


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
