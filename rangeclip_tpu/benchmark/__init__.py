"""Benchmark harnesses (L8): throughput + robustness sweeps."""
