from .mesh import make_mesh, plan_shardings
