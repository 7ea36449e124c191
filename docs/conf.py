"""Sphinx configuration (mirrors the reference's readthedocs setup,
``/root/reference/docs/conf.py``; the tutorials under ``examples/`` are
myst-nb notebooks executed at build time).  The test suite does not need
sphinx — ``run_tutorials.py`` executes the tutorials standalone."""

project = "rodeo-tpu"
author = "rodeo-tpu developers"
release = "0.1.0"

extensions = [
    "myst_nb",
    "sphinx.ext.autodoc",
    "sphinx.ext.napoleon",
    "sphinx.ext.mathjax",
]

nb_execution_mode = "cache"
nb_execution_timeout = 600
myst_enable_extensions = ["dollarmath", "amsmath"]

exclude_patterns = ["_build"]
html_theme = "alabaster"
