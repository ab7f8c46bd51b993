"""Experiment drivers reproducing Convergence_and_Scaling/ + Solvers/ studies.

Each module is a CLI: ``python -m experiments.<name> [options]``. Results go
to ``data/*.txt`` in the reference's whitespace+header format; plots via
``python -m experiments.plots``.
"""
