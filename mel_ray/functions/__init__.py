"""Vectorized scalar/array kernels used inside ``map_batches`` stages.

All kernels are pure NumPy / PyArrow-compute over Arrow buffers — no
per-row Python in any hot path.  Analogue of the reference's scalar
function layer (SURVEY.md §2.8).
"""
