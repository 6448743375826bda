"""Verification assets that ship with the package (not only the test suite):

- ``torch_ref``  — torch mirror modules with checkpoint-identical state-dict
  naming; the independent executor behind the readiness drill's goldens and
  the converter/parity tests. Importing it requires ``torch`` (the
  ``mirrors`` extra).
- ``fixtures``   — deterministic synthetic fixture scenes (the
  ``pictures_croped/bird_*.jpg`` role; no photos can ship).
"""
