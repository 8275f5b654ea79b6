import jax
jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_compilation_cache_dir', '/tmp/jax_cache')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
import numpy as np, sympy as sym
from pycollo_tpu import OptimalControlProblem

y, u = sym.symbols('y u')
problem = OptimalControlProblem(name='Hypersensitive')
phase = problem.new_phase(name='A')
phase.state_variables = y
phase.control_variables = u
phase.state_equations = [-y**3 + u]
phase.integrand_functions = [0.5*(y**2 + u**2)]
problem.objective_function = phase.integral_variables[0]
phase.bounds.initial_time = 0.0
phase.bounds.final_time = 10000.0
phase.bounds.state_variables = [[0, 2]]
phase.bounds.control_variables = [[-1, 8]]
phase.bounds.integral_variables = [[0, 2000]]
phase.bounds.initial_state_constraints = [[1.0, 1.0]]
phase.bounds.final_state_constraints = [[1.5, 1.5]]
phase.guess.time = [0.0, 10000.0]
phase.guess.state_variables = [[1.0, 1.5]]
phase.guess.control_variables = [[0.0, 0.0]]
phase.guess.integral_variables = 4
sol = problem.solve()
print('FINAL objective %.6f (expect 3.36206), tol met=%s' % (sol.objective, problem.mesh_tolerance_met))
