"""map_batches stage bodies (classes = actor pools, functions = stateless tasks)."""
