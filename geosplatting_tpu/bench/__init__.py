"""Self-contained benchmarks (quality + perf) for the TPU framework."""
