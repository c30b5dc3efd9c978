"""Pure-function op layer: equilibria, moments, collisions, streaming, BCs, macros."""
