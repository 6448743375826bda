"""Compat shim — the implementation moved to
stablediffusioneo_tpu.cli.serve (installed console script: ``sdeo-serve``).
Kept so the documented ``python scripts/serve_http.py`` invocation works from a
repo checkout without ``pip install -e .``."""

if __name__ == "__main__":
    try:
        from stablediffusioneo_tpu.cli.serve import main
    except ImportError:  # repo checkout without `pip install -e .`
        import os
        import sys

        sys.path.insert(0, os.path.dirname(
            os.path.dirname(os.path.abspath(__file__))))
        from stablediffusioneo_tpu.cli.serve import main
    main()
