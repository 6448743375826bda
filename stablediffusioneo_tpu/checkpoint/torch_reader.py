"""State-dict readers: torch pickle (zipfile format) and safetensors.

Equivalent of the reference's `load_state_dict` (cldm/model.py:8-21):
handles both formats, unwraps a nested `state_dict` key, and returns plain
numpy arrays (never torch tensors — downstream is pure JAX).

The torch-pickle path has two implementations:
  - `torch.load` when torch is importable (it is in dev/test environments);
  - a self-contained zip+pickle reader (`_read_torch_zip`) for
    torch-free deployments, covering the modern zipfile serialization
    format that all SD-1.5 / ControlNet checkpoints use.
"""

from __future__ import annotations

import io
import os
import pickle
import struct
import zipfile
from typing import Dict

import numpy as np

_DTYPE_MAP = {
    "FloatStorage": np.float32,
    "HalfStorage": np.float16,
    "BFloat16Storage": None,  # special-cased: numpy has no bf16
    "DoubleStorage": np.float64,
    "IntStorage": np.int32,
    "LongStorage": np.int64,
    "ShortStorage": np.int16,
    "CharStorage": np.int8,
    "ByteStorage": np.uint8,
    "BoolStorage": np.bool_,
}


class _LazyTensor:
    def __init__(self, storage_key, storage_dtype_name, numel):
        self.storage_key = storage_key
        self.storage_dtype_name = storage_dtype_name
        self.numel = numel
        self.shape = ()
        self.stride = ()
        self.storage_offset = 0


class _TorchUnpickler(pickle.Unpickler):
    """Minimal unpickler for torch zip checkpoints (no torch import)."""

    def __init__(self, f, zf: zipfile.ZipFile, prefix: str):
        super().__init__(f)
        self.zf = zf
        self.prefix = prefix

    def find_class(self, module, name):
        if module.startswith("torch") and name.endswith("Storage"):
            return name  # sentinel: storage type carried as its name
        if module == "torch._utils" and name == "_rebuild_tensor_v2":
            return self._rebuild_tensor_v2
        if module == "torch._utils" and name == "_rebuild_tensor":
            return self._rebuild_tensor
        if module == "collections" and name == "OrderedDict":
            return dict
        if module == "torch" and name in ("float32", "float16", "bfloat16", "int64"):
            return name
        raise pickle.UnpicklingError(f"blocked global {module}.{name}")

    def persistent_load(self, pid):
        # pid = ('storage', storage_type_name, key, location, numel)
        assert pid[0] == "storage"
        _, storage_type, key, _location, numel = pid
        return _LazyTensor(key, storage_type, numel)

    def _load_array(self, lazy: _LazyTensor) -> np.ndarray:
        name = f"{self.prefix}data/{lazy.storage_key}"
        raw = self.zf.read(name)
        if lazy.storage_dtype_name == "BFloat16Storage":
            u16 = np.frombuffer(raw, dtype=np.uint16)
            u32 = u16.astype(np.uint32) << 16
            return u32.view(np.float32)
        dtype = _DTYPE_MAP[lazy.storage_dtype_name]
        return np.frombuffer(raw, dtype=dtype)

    def _rebuild_tensor_v2(
        self, storage, storage_offset, size, stride, requires_grad, backward_hooks, *a
    ):
        flat = self._load_array(storage)
        arr = np.lib.stride_tricks.as_strided(
            flat[storage_offset:],
            shape=size,
            strides=[s * flat.itemsize for s in stride],
        )
        return np.ascontiguousarray(arr)

    def _rebuild_tensor(self, storage, storage_offset, size, stride):
        return self._rebuild_tensor_v2(storage, storage_offset, size, stride, False, None)


def _read_torch_zip(path: str) -> Dict[str, np.ndarray]:
    with zipfile.ZipFile(path) as zf:
        names = zf.namelist()
        pkl = [n for n in names if n.endswith("data.pkl")]
        if not pkl:
            raise ValueError(f"{path}: not a torch zip checkpoint")
        prefix = pkl[0][: -len("data.pkl")]
        with zf.open(pkl[0]) as f:
            obj = _TorchUnpickler(io.BytesIO(f.read()), zf, prefix).load()
    return obj


def _read_safetensors(path: str) -> Dict[str, np.ndarray]:
    from safetensors import safe_open

    out = {}
    with safe_open(path, framework="numpy") as f:
        keys = list(f.keys())
        bf16_keys = []
        for k in keys:
            try:
                out[k] = f.get_tensor(k)
            except (TypeError, ValueError):
                bf16_keys.append(k)  # numpy framework can't express bf16
    if bf16_keys:
        try:
            import torch
            from safetensors import safe_open as so

            with so(path, framework="pt") as f:
                for k in bf16_keys:
                    out[k] = f.get_tensor(k).float().numpy()
        except ImportError:
            # torch-free path: read raw bf16 bytes straight from the file
            # (header gives byte offsets) and upshift uint16<<16 -> fp32,
            # same trick _read_torch_zip uses for BFloat16Storage.
            for k, arr in _read_safetensors_raw_bf16(path, bf16_keys).items():
                out[k] = arr
    return out


def _read_safetensors_raw_bf16(path: str, keys) -> Dict[str, np.ndarray]:
    """Decode bf16 tensors from a safetensors file without torch.

    Format: 8-byte LE u64 header length, JSON header mapping name ->
    {dtype, shape, data_offsets:[start,end]} (offsets relative to the end
    of the header), then the flat data buffer.
    """
    import json

    want = set(keys)
    out: Dict[str, np.ndarray] = {}
    with open(path, "rb") as fh:
        (hlen,) = struct.unpack("<Q", fh.read(8))
        header = json.loads(fh.read(hlen))
        base = 8 + hlen
        for name, meta in header.items():
            if name == "__metadata__" or name not in want:
                continue
            if meta["dtype"] not in ("BF16", "bfloat16"):
                raise TypeError(
                    f"{path}:{name}: expected bf16, got {meta['dtype']}")
            start, end = meta["data_offsets"]
            fh.seek(base + start)
            raw = np.frombuffer(fh.read(end - start), dtype=np.uint16)
            f32 = (raw.astype(np.uint32) << 16).view(np.float32)
            out[name] = f32.reshape(meta["shape"])
    missing = want - set(out)
    if missing:
        raise KeyError(f"{path}: bf16 keys not found in header: {sorted(missing)}")
    return out


def load_torch_state_dict(path: str, prefer_torch: bool = True) -> Dict[str, np.ndarray]:
    """Load a .pth/.ckpt/.safetensors state dict as {name: numpy array}."""
    if path.endswith(".safetensors"):
        sd = _read_safetensors(path)
    else:
        sd = None
        if prefer_torch:
            try:
                import torch

                obj = torch.load(path, map_location="cpu", weights_only=True)
                sd = obj
            except ImportError:
                sd = None
        if sd is None:
            sd = _read_torch_zip(path)
    # unwrap nested {'state_dict': ...} (cldm/model.py:15-17)
    if "state_dict" in sd and isinstance(sd["state_dict"], dict):
        sd = sd["state_dict"]
    out = {}
    for k, v in sd.items():
        if hasattr(v, "detach"):  # torch tensor
            t = v.detach()
            if str(t.dtype) == "torch.bfloat16":
                t = t.float()
            v = t.cpu().numpy()
        if isinstance(v, np.ndarray):
            out[k] = v
    return out
