import jax
jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_compilation_cache_dir', '/tmp/jax_cache')
import sys; sys.path.insert(0, 'examples')
from space_station_attitude_control import build_problem
p = build_problem()
sol = p.solve()
print('Station objective %.5f (expect 3.58675) tol_met=%s' % (sol.objective, p.mesh_tolerance_met))
