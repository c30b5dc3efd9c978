"""Lattice velocity-set descriptors for D3Q27, D2Q9 and D3Q7.

The direction *ordering convention* follows the reference framework's enums
(reference: include/lbm3d/defs.h:257-305) so that per-direction data such as
halo-sync direction subsets carry over one-to-one:

- names are 2/3-letter strings over {p, m, z} = {+1, -1, 0}, one letter per
  axis in x, y, z order (e.g. ``pzm`` = c = (+1, 0, -1));
- the rest particle comes first, then faces, then edges, then corners.

Everything here is static host-side metadata (NumPy, exact rationals where
possible); device code receives it as baked-in constants at trace time.
"""

from __future__ import annotations

import dataclasses
from fractions import Fraction
from functools import cached_property

import numpy as np

_LETTER = {"z": 0, "p": 1, "m": -1}
_INV_LETTER = {0: "z", 1: "p", -1: "m"}


def _name_to_c(name: str) -> tuple[int, ...]:
    return tuple(_LETTER[ch] for ch in name)


def _c_to_name(c) -> str:
    return "".join(_INV_LETTER[int(x)] for x in c)


@dataclasses.dataclass(frozen=True)
class LatticeDescriptor:
    """Static description of a lattice velocity set.

    Attributes:
      name: model name, e.g. ``"D3Q27"``.
      D: spatial dimension (2 or 3).
      Q: number of discrete velocities.
      names: direction names in enum order (reference defs.h:257-305).
      weights: lattice weights as exact :class:`fractions.Fraction`.
      i_cs2: 1/cs^2, inverse squared lattice speed of sound (3 for NSE
        lattices; 4 for the D3Q7 ADE lattice, reference d3q7/eq.h:13).
    """

    name: str
    D: int
    Q: int
    names: tuple[str, ...]
    weights: tuple[Fraction, ...]
    i_cs2: int = 3

    def __post_init__(self):
        assert len(self.names) == self.Q
        assert len(self.weights) == self.Q
        assert sum(self.weights) == 1

    @cached_property
    def c(self) -> np.ndarray:
        """Integer velocity vectors, shape [Q, D]."""
        arr = np.array([_name_to_c(n) for n in self.names], dtype=np.int32)
        arr.setflags(write=False)
        return arr

    @cached_property
    def w(self) -> np.ndarray:
        """Weights as float64, shape [Q]."""
        arr = np.array([float(x) for x in self.weights], dtype=np.float64)
        arr.setflags(write=False)
        return arr

    @cached_property
    def opp(self) -> np.ndarray:
        """Index of the opposite direction, shape [Q] (opp[q]: c[opp[q]] == -c[q])."""
        index = {tuple(v): i for i, v in enumerate(self.c.tolist())}
        arr = np.array([index[tuple(-x for x in v)] for v in self.c.tolist()], dtype=np.int32)
        arr.setflags(write=False)
        return arr

    @cached_property
    def _name_index(self) -> dict:
        return {n: i for i, n in enumerate(self.names)}

    def idx(self, name: str) -> int:
        """Direction index by name, e.g. ``d3q27.idx('ppp')``."""
        return self._name_index[name]

    def __getattr__(self, name: str):
        # Allow attribute-style access: D3Q27.ppp == D3Q27.idx('ppp').
        if name.startswith("_") or not (set(name) <= {"p", "m", "z"}):
            raise AttributeError(name)
        try:
            return self._name_index[name]
        except KeyError:
            raise AttributeError(name) from None

    def mirror(self, axis: int) -> np.ndarray:
        """Permutation that flips the direction component along ``axis``.

        mirror(axis)[q] = index of the direction equal to c[q] with its
        ``axis`` component negated.  Used by symmetry-plane BCs.
        """
        index = {tuple(v): i for i, v in enumerate(self.c.tolist())}
        out = []
        for v in self.c.tolist():
            vv = list(v)
            vv[axis] = -vv[axis]
            out.append(index[tuple(vv)])
        arr = np.array(out, dtype=np.int32)
        arr.setflags(write=False)
        return arr


def _weights_d3q27():
    table = {0: Fraction(8, 27), 1: Fraction(2, 27), 2: Fraction(1, 54), 3: Fraction(1, 216)}
    return table


# Enum order per reference include/lbm3d/defs.h:273-305.
_D3Q27_NAMES = (
    "zzz",
    "pzz", "mzz", "zpz", "zmz", "zzp", "zzm",
    "ppz", "mmz", "pmz", "mpz", "pzp", "mzm", "pzm", "mzp",
    "zpp", "zmm", "zpm", "zmp",
    "ppp", "mmm", "ppm", "mmp", "pmp", "mpm", "pmm", "mpp",
)

D3Q27 = LatticeDescriptor(
    name="D3Q27",
    D=3,
    Q=27,
    names=_D3Q27_NAMES,
    weights=tuple(
        _weights_d3q27()[sum(abs(x) for x in _name_to_c(n))] for n in _D3Q27_NAMES
    ),
)

# Enum order per reference include/lbm3d/defs.h:257-270 (x, y letters).
_D2Q9_NAMES = ("zz", "pz", "mz", "zp", "zm", "pp", "mm", "pm", "mp")


def _weights_d2q9():
    table = {0: Fraction(4, 9), 1: Fraction(1, 9), 2: Fraction(1, 36)}
    return table


D2Q9 = LatticeDescriptor(
    name="D2Q9",
    D=2,
    Q=9,
    names=_D2Q9_NAMES,
    weights=tuple(
        _weights_d2q9()[sum(abs(x) for x in _name_to_c(n))] for n in _D2Q9_NAMES
    ),
)

# D3Q7 for advection-diffusion; weights per reference d3q7/eq.h:15-17
# (w0 = 1/4 central, w1 = 1/8 non-central, cs^2 = 1/4).
_D3Q7_NAMES = ("zzz", "pzz", "mzz", "zpz", "zmz", "zzp", "zzm")

D3Q7 = LatticeDescriptor(
    name="D3Q7",
    D=3,
    Q=7,
    names=_D3Q7_NAMES,
    weights=(Fraction(1, 4),) + (Fraction(1, 8),) * 6,
    i_cs2=4,
)
