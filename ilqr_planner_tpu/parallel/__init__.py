"""Device meshes, sharded batch solves, multi-host runtime."""
