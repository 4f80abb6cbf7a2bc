"""Multi-chip sharding: device meshes, level shardings, halo exchange."""
