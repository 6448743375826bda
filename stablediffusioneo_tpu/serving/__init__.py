"""Serving layer: cross-request batching over the compiled engine buckets.

The reference serves one request at a time (`hackathon.process`,
canny2image_TRT.py:51-92). On TPU, throughput comes from the batch
dimension: this layer gathers concurrent requests whose engine signatures
match (resolution bucket, steps, sampler, guess-mode, context length) into
one batched `sample_decode` call, with per-request prompts, seeds, guidance
scales and control strengths inside the batch.
"""

from stablediffusioneo_tpu.serving.server import (  # noqa: F401
    DiffusionServer,
    GenRequest,
)
from stablediffusioneo_tpu.serving.scheduler import (  # noqa: F401
    decide_cut,
    next_deadline_ms,
    pick_group,
)


def make_http_server(*args, **kwargs):  # noqa: D103 — lazy re-export
    from stablediffusioneo_tpu.serving.http_api import make_http_server as f

    return f(*args, **kwargs)
