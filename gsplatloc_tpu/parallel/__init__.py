from .sharded import make_tile_mesh, sharded_composite  # noqa: F401
