"""Pallas TPU kernels: the fused collide-and-stream performance path."""
