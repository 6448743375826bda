"""Benchmark entry point — implementation: stablediffusioneo_tpu/cli/bench.py
(installed console script: ``sdeo-bench``).

The driver runs ``python bench.py`` from the repo root and reads JSON lines
from stdout: the flagship 512x512 20-step metric first, then one line per
tracked config as it completes, then a "tracked_configs" summary. This shim
only makes the repo-checkout invocation work without ``pip install -e .``.
"""

import os
import sys

try:
    from stablediffusioneo_tpu.cli.bench import main
except ImportError:  # repo checkout without `pip install -e .`
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from stablediffusioneo_tpu.cli.bench import main

if __name__ == "__main__":
    main()
