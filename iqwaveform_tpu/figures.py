"""Plotting layer (reference figures.py). Full port lands incrementally;
this module is lazily imported by the package __init__."""

raise NotImplementedError('figures port in progress')
