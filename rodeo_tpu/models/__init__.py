r"""
Ready-to-use ODE model definitions in the block form expected by the solver
(the benchmark systems of the reference's JSS preprint Table 3 plus the
Lorenz63 flagship).
"""
