"""Measured-and-rejected kernel ablations (NOT on any production path).

Kept with their tests as negative-result documentation: each module's
docstring records what was tried and the measurement that rejected it
(see docs/PERF.md). Production kernels live one level up in
``lam_slide_tpu.ops``.
"""
