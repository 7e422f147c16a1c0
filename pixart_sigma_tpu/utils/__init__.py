"""Runtime utilities: checkpoints, params, logging, profiling, config."""
