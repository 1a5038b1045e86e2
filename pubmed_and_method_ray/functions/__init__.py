"""Pure deterministic kernels — no Ray imports allowed in this package."""
