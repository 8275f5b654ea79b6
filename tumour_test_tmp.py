import jax
jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_compilation_cache_dir', '/tmp/jax_cache')
import sys; sys.path.insert(0, 'examples')
from tumour_anti_angiogenesis import build_problem
p = build_problem()
sol = p.solve()
print('Tumour objective %.2f (expect 7571.67) tol_met=%s' % (sol.objective, p.mesh_tolerance_met))
