from .mesh import make_mesh, maybe_mesh_rows, row_sharded_step
