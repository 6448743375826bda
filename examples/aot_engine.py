"""Engine build/serialize/load lifecycle — the torch2trt / onnx2trt example
equivalent (abroute_examples/infer/examples_python.py, onnx2trt.py:5-65).

Build offline (trace + serialize), ship the artifact, load + run online.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from stablediffusioneo_tpu.runtime.export import load_engine, save_engine
from stablediffusioneo_tpu.runtime.engine import Engine


def main():
    # 1. a model function (here: a toy MLP block)
    def mlp(w1, w2, x):
        return jax.nn.gelu(x @ w1) @ w2

    w1 = jax.random.normal(jax.random.PRNGKey(0), (256, 1024)) * 0.02
    w2 = jax.random.normal(jax.random.PRNGKey(1), (1024, 256)) * 0.02
    x = jnp.ones((8, 256))

    # 2. offline: trace + serialize at fixed shapes (onnx2trt analog)
    path = save_engine(
        "/tmp/sdeo_examples/mlp.sdeo", mlp,
        tuple(jax.ShapeDtypeStruct(a.shape, a.dtype) for a in (w1, w2, x)),
    )
    print("serialized engine:", path, os.path.getsize(path), "bytes")

    # 3. online: load + execute (Engine.load/infer analog)
    fn = load_engine(path)
    out = fn(w1, w2, x)
    print("engine output:", out.shape, float(out.mean()))

    # 4. or AOT-compile in place with introspection (Engine wrapper)
    eng = Engine(mlp, name="mlp").load(
        *(jax.ShapeDtypeStruct(a.shape, a.dtype) for a in (w1, w2, x))
    )
    print("engine info:", eng.get_engine_infor())


if __name__ == "__main__":
    main()
