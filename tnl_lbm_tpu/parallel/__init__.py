"""Device-mesh sharding and halo exchange (TPU-native domain decomposition)."""
