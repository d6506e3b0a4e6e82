"""Column expressions and numpy kernels shared by all operators."""
