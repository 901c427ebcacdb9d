# benchmarks is a package so `python -m benchmarks.<name>` works from the
# repo root (plain `python benchmarks/<name>.py` puts benchmarks/ at
# sys.path[0] and the minidiff_tpu import fails).
