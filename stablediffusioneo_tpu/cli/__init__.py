"""Console entry points (installed as ``sdeo-*`` scripts by pyproject.toml).

Each module exposes ``main()``:

- ``bench``     — the tracked-config benchmark (repo-root ``bench.py`` shim)
- ``serve``     — HTTP serving with cross-request TPU batching
- ``score``     — the compute_score.py-equivalent scoring harness
- ``readiness`` — real-checkpoint parity drill (JAX vs torch mirrors)
- ``smoke``     — CLIP-engine bring-up check (trt_check.py analog)
"""
