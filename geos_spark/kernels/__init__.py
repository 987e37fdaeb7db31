"""Vectorized numpy geometry kernels — the "GEOS" of the engine.

Each module documents the reference file:line whose semantics it
re-implements (semantics only; no code is translated from C++).
"""
