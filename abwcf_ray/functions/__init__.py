"""Pure, vectorizable kernels: URL normalization, robots parsing/matching,
HTML link+text extraction, stable 64-bit hashing."""
