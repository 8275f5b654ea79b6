import jax
jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_compilation_cache_dir', '/tmp/jax_cache')
import sys; sys.path.insert(0, 'examples')
from space_shuttle_reentry_trajectory import build_problem
p = build_problem()
sol = p.solve()
print('Shuttle objective %.5f (expect -0.59628) tol_met=%s' % (sol.objective, p.mesh_tolerance_met))
