"""Local PyTorch-CPU oracle for parity testing.

The reference mount is empty (SURVEY.md §0), so the canonical yanx27-style
pure-PyTorch PointNet++ ops and models are re-typed here from their
published definitions (SURVEY.md §2) to serve as (a) the semantic oracle
for the JAX/Pallas ops and models, and (b) the "reference CPU throughput"
denominator of the 10x target (BASELINE.json:5).  Nothing in this package
is part of the TPU framework's runtime.
"""
