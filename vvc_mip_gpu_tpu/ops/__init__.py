"""JAX/XLA/Pallas compute ops for the MIP pipeline."""
