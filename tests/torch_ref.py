"""Compat shim — the torch mirror modules moved into the installable
package at stablediffusioneo_tpu/testing/torch_ref.py (they back the
readiness CLI's golden generator, not just the test suite). Tests keep
importing ``torch_ref`` via this shim."""

from stablediffusioneo_tpu.testing.torch_ref import *  # noqa: F401,F403
