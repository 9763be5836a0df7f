"""Device mesh, spatial sharding, and collective layout (SPMD over ICI)."""
