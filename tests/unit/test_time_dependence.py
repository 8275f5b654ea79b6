"""Time-dependent dynamics in both frontends + dynamicsymbols variables.

The reference has no continuous-time symbol (its state equations are
autonomous in ``t``; only ``t0``/``tF`` endpoint symbols exist,
``pycollo/phase.py:324-354``), but it accepts
``sympy.physics.mechanics.dynamicsymbols`` variables
(``pycollo/typing.py:26-33``).  This framework additionally binds the
symbol ``t`` in symbolic dynamics/path/integrand expressions to the
collocation node times — closing the round-1 hole where ``t`` in a sympy
expression was silently dropped.

Analytic oracle: maximize y(2) for y' = u * t, u in [0, 1], t in [0, 2]
=> u* = 1, y(2) = integral of t = 2.
"""

import numpy as np
import pytest
import sympy as sym


def _solve(problem):
    problem.settings.console_out_progress = False
    problem.settings.max_mesh_iterations = 2
    problem.settings.mesh_tolerance = 1e-6
    return problem.solve()


def _common_setup(problem, phase, y_var, u_var):
    problem.objective_function = -phase.final_state_variables[0]
    phase.bounds.initial_time = 0.0
    phase.bounds.final_time = 2.0
    phase.bounds.state_variables = [[-10, 10]]
    phase.bounds.control_variables = [[0, 1]]
    phase.bounds.initial_state_constraints = {y_var: 0.0}
    phase.guess.time = np.array([0.0, 2.0])
    phase.guess.state_variables = np.array([[0.0, 1.0]])
    phase.guess.control_variables = np.array([[0.5, 0.5]])


def test_symbolic_time_dependent_dynamics():
    from pycollo_tpu import OptimalControlProblem

    y, u, t = sym.symbols("y u t")
    problem = OptimalControlProblem(name="time-dep")
    phase = problem.new_phase(name="A")
    phase.state_variables = [y]
    phase.control_variables = u
    phase.state_equations = [u * t]
    _common_setup(problem, phase, y, u)
    sol = _solve(problem)
    assert abs(sol.objective - (-2.0)) < 1e-4


def test_symbolic_dynamicsymbols_variables():
    """dynamicsymbols('y u') are AppliedUndef functions of t
    (``pycollo/typing.py:26-33`` capability)."""
    from sympy.physics.mechanics import dynamicsymbols

    from pycollo_tpu import OptimalControlProblem

    y, u = dynamicsymbols("y u")
    t = dynamicsymbols._t
    problem = OptimalControlProblem(name="dynsyms")
    phase = problem.new_phase(name="A")
    phase.state_variables = [y]
    phase.control_variables = u
    phase.state_equations = [u * t]
    _common_setup(problem, phase, y, u)
    sol = _solve(problem)
    assert abs(sol.objective - (-2.0)) < 1e-4


def test_functional_time_dependent_dynamics():
    from pycollo_tpu import OptimalControlProblem

    problem = OptimalControlProblem(name="time-dep-fn")
    phase = problem.new_phase(name="A")
    phase.state_variables = ["y"]
    phase.control_variables = ["u"]
    phase.state_equations = lambda y, u, t, s: u[0] * t
    problem.objective_function = lambda ep: -ep.phase[0].yF[0]
    phase.bounds.initial_time = 0.0
    phase.bounds.final_time = 2.0
    phase.bounds.state_variables = [[-10, 10]]
    phase.bounds.control_variables = [[0, 1]]
    phase.bounds.initial_state_constraints = {"y": 0.0}
    phase.guess.time = np.array([0.0, 2.0])
    phase.guess.state_variables = np.array([[0.0, 1.0]])
    phase.guess.control_variables = np.array([[0.5, 0.5]])
    sol = _solve(problem)
    assert abs(sol.objective - (-2.0)) < 1e-4


def test_symbolic_state_named_t_wins_clash():
    """A state literally named ``t`` keeps its variable meaning (no time
    binding), so purely autonomous use of the name stays valid."""
    from pycollo_tpu import OptimalControlProblem

    t_state, u = sym.symbols("t u")
    problem = OptimalControlProblem(name="t-clash")
    phase = problem.new_phase(name="A")
    phase.state_variables = [t_state]
    phase.control_variables = u
    phase.state_equations = [u * t_state]
    problem.objective_function = -phase.final_state_variables[0]
    phase.bounds.initial_time = 0.0
    phase.bounds.final_time = 1.0
    phase.bounds.state_variables = [[0.5, 10]]
    phase.bounds.control_variables = [[0, 1]]
    phase.bounds.initial_state_constraints = {t_state: 1.0}
    phase.guess.time = np.array([0.0, 1.0])
    phase.guess.state_variables = np.array([[1.0, 2.0]])
    phase.guess.control_variables = np.array([[0.5, 0.5]])
    sol = _solve(problem)
    # y' = u*y, y(0)=1, u*=1 -> y(1) = e.
    assert abs(sol.objective - (-np.e)) < 1e-3
