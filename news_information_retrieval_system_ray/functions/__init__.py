"""Pure computational kernels (no Ray imports)."""
