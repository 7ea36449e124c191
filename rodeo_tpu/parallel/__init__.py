r"""
Multi-device scaling utilities: device-mesh construction and sharded
vmapped MCMC chains / parameter sweeps (pure data parallelism over ICI —
the natural scale-out axes for this library, see SURVEY.md §5).
"""
