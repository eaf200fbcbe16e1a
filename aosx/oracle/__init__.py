"""NumPy/OpenCV oracle: line-faithful reimplementations of the reference
C++ nodes (sangbeom0321/Active-orchard-slam), used as the parity target for
the jitted TPU pipeline (SURVEY.md section 4, test strategy)."""
