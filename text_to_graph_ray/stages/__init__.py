"""Ray Data stage functions/classes. Each is a batch transform suitable for
``Dataset.map_batches`` — stateless functions for cheap per-row work, callable
classes (actor pools) only where per-worker state is worth amortizing."""
