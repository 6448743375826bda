"""Diffusion schedule math.

Numpy-side precompute (host, once per sampler config) of everything the
reference computes in `ldm/modules/diffusionmodules/util.py`:
  - make_beta_schedule            (util.py:19-44, SD "linear" = sqrt-linear)
  - make_ddim_timesteps           (util.py:46-60, uniform/quad with +1 offset)
  - make_ddim_sampling_parameters (util.py:63-74, per-step alpha/alpha_prev/sigma)
plus the sinusoidal timestep embedding (util.py:154-174) which runs on-device.

All host-side outputs are float64->float32 numpy arrays; device code receives
them as constants captured by the jitted sampler scan.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


def make_beta_schedule(
    schedule: str = "linear",
    n_timestep: int = 1000,
    linear_start: float = 0.00085,
    linear_end: float = 0.0120,
    cosine_s: float = 8e-3,
) -> np.ndarray:
    """Beta schedule. SD's "linear" is linear in sqrt(beta)."""
    if schedule == "linear":
        betas = (
            np.linspace(
                linear_start ** 0.5, linear_end ** 0.5, n_timestep, dtype=np.float64
            )
            ** 2
        )
    elif schedule == "cosine":
        timesteps = np.arange(n_timestep + 1, dtype=np.float64) / n_timestep + cosine_s
        alphas = timesteps / (1 + cosine_s) * np.pi / 2
        alphas = np.cos(alphas) ** 2
        alphas = alphas / alphas[0]
        betas = 1 - alphas[1:] / alphas[:-1]
        betas = np.clip(betas, 0, 0.999)
    elif schedule == "sqrt_linear":
        betas = np.linspace(linear_start, linear_end, n_timestep, dtype=np.float64)
    elif schedule == "sqrt":
        betas = (
            np.linspace(linear_start, linear_end, n_timestep, dtype=np.float64) ** 0.5
        )
    else:
        raise ValueError(f"unknown beta schedule {schedule!r}")
    return betas.astype(np.float64)


def make_ddim_timesteps(
    ddim_discr_method: str,
    num_ddim_timesteps: int,
    num_ddpm_timesteps: int,
) -> np.ndarray:
    """Subsampled timestep indices for DDIM, with the reference's +1 offset."""
    if ddim_discr_method == "uniform":
        # ceil instead of the reference's floor division: identical for the
        # divisor step counts SD actually uses (20/50/...), but stays
        # in-range for non-divisor S where the reference's +1 offset would
        # index alphacums out of bounds (util.py:50-58 latent bug).
        c = -(-num_ddpm_timesteps // num_ddim_timesteps)
        ddim_timesteps = np.asarray(list(range(0, num_ddpm_timesteps, c)))
    elif ddim_discr_method == "quad":
        ddim_timesteps = (
            (np.linspace(0, np.sqrt(num_ddpm_timesteps * 0.8), num_ddim_timesteps)) ** 2
        ).astype(int)
    else:
        raise ValueError(f"unknown discretization {ddim_discr_method!r}")
    # +1 so alphas match the sampling range (see reference util.py:57-58)
    return ddim_timesteps + 1


def make_ddim_sampling_parameters(
    alphacums: np.ndarray,
    ddim_timesteps: np.ndarray,
    eta: float,
):
    """Per-DDIM-step (alpha_t, alpha_{t-1}, sigma_t)."""
    alphas = alphacums[ddim_timesteps]
    alphas_prev = np.asarray([alphacums[0]] + alphacums[ddim_timesteps[:-1]].tolist())
    sigmas = eta * np.sqrt(
        (1 - alphas_prev) / (1 - alphas) * (1 - alphas / alphas_prev)
    )
    return sigmas, alphas, alphas_prev


def timestep_embedding(
    timesteps: jax.Array,
    dim: int,
    max_period: int = 10000,
    dtype=jnp.float32,
) -> jax.Array:
    """Sinusoidal timestep embedding, computed in fp32.

    timesteps: (N,) — may be float or int. Returns (N, dim) laid out as
    concat[cos(args), sin(args)], matching the reference (util.py:154-174).
    """
    half = dim // 2
    # Host-side fp32 freqs matching torch's arithmetic bit-for-bit (fp32
    # arange * float64 scalar stays fp32 in torch; numpy needs the cast).
    freqs = np.exp(
        (-np.log(max_period) * np.arange(half, dtype=np.float32) / half).astype(
            np.float32
        )
    ).astype(np.float32)
    args = timesteps.astype(jnp.float32)[:, None] * jnp.asarray(freqs)[None, :]
    emb = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
    if dim % 2:
        emb = jnp.concatenate([emb, jnp.zeros_like(emb[:, :1])], axis=-1)
    return emb.astype(dtype)


class DiffusionSchedule:
    """Precomputed DDPM/DDIM schedule buffers (host-side numpy).

    The equivalent of DDIMSampler.make_schedule (cldm/ddim_hacked.py:23-52)
    plus the alphas_cumprod registration the missing LatentDiffusion would do.
    """

    def __init__(
        self,
        timesteps: int = 1000,
        linear_start: float = 0.00085,
        linear_end: float = 0.0120,
        schedule: str = "linear",
    ):
        self.num_timesteps = timesteps
        betas = make_beta_schedule(schedule, timesteps, linear_start, linear_end)
        alphas = 1.0 - betas
        self.betas = betas.astype(np.float32)
        self.alphas_cumprod = np.cumprod(alphas, axis=0)
        self.alphas_cumprod_prev = np.append(1.0, self.alphas_cumprod[:-1]).astype(
            np.float32
        )
        self.sqrt_alphas_cumprod = np.sqrt(self.alphas_cumprod).astype(np.float32)
        self.sqrt_one_minus_alphas_cumprod = np.sqrt(
            1.0 - self.alphas_cumprod
        ).astype(np.float32)

    def ddim(self, num_steps: int, eta: float = 0.0, method: str = "uniform"):
        """Returns dict of per-step arrays ordered in SAMPLING order (t high->low)."""
        ts = make_ddim_timesteps(method, num_steps, self.num_timesteps)
        sigmas, alphas, alphas_prev = make_ddim_sampling_parameters(
            self.alphas_cumprod, ts, eta
        )
        rev = slice(None, None, -1)
        return {
            "timesteps": np.ascontiguousarray(ts[rev]).astype(np.int32),
            "alphas": np.ascontiguousarray(alphas[rev]).astype(np.float32),
            "alphas_prev": np.ascontiguousarray(alphas_prev[rev]).astype(np.float32),
            "sigmas": np.ascontiguousarray(sigmas[rev]).astype(np.float32),
            "sqrt_one_minus_alphas": np.sqrt(
                1.0 - np.ascontiguousarray(alphas[rev])
            ).astype(np.float32),
        }
