from .mesh import make_mesh, sharded_event_step
