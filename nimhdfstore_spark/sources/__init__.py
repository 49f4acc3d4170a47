"""External-format connectors (SURVEY §7.1 M7). Parquet is the primary
backing store (the correctness/bench contract); HDF5 is the fidelity leg."""
