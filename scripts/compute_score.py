"""Compat shim — the implementation moved to
stablediffusioneo_tpu.cli.score (installed console script: ``sdeo-score``).
Kept so the documented ``python scripts/compute_score.py`` invocation works from a
repo checkout without ``pip install -e .``."""

if __name__ == "__main__":
    try:
        from stablediffusioneo_tpu.cli.score import main
    except ImportError:  # repo checkout without `pip install -e .`
        import os
        import sys

        sys.path.insert(0, os.path.dirname(
            os.path.dirname(os.path.abspath(__file__))))
        from stablediffusioneo_tpu.cli.score import main
    main()
