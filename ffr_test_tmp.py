import jax
jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_compilation_cache_dir', '/tmp/jax_cache')
import sys; sys.path.insert(0, 'examples')
from free_flying_robot import build_problem
p = build_problem()
sol = p.solve()
print('FFR objective %.7f (expect 7.9101902) tol_met=%s' % (sol.objective, p.mesh_tolerance_met))
