"""Compat shim — fixture generation moved to
stablediffusioneo_tpu.testing.fixtures; golden generation lives in
stablediffusioneo_tpu.testing.goldens.

  python scripts/make_fixtures.py [out_dir] [n] [size]   # fixture scenes
  python scripts/make_fixtures.py --goldens              # regenerate the
      committed tests/goldens/*.npz after an INTENDED numerical change
"""

import sys

if __name__ == "__main__":
    try:
        import stablediffusioneo_tpu  # noqa: F401
    except ImportError:  # repo checkout without `pip install -e .`
        import os

        sys.path.insert(0, os.path.dirname(
            os.path.dirname(os.path.abspath(__file__))))
    if "--goldens" in sys.argv:
        from stablediffusioneo_tpu.testing.goldens import main

        main([a for a in sys.argv[1:] if a != "--goldens"])
    else:
        from stablediffusioneo_tpu.testing.fixtures import main

        main(*(sys.argv[1:] or []))
