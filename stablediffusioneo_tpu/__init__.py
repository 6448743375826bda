"""StableDiffusionEO-TPU — a TPU-native ControlNet-Stable-Diffusion inference framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of
MarToonLi/StableDiffusionEO (a torch->ONNX->TensorRT ControlNet-SD1.5
deployment pipeline). The four networks (CLIP text encoder, ControlNet,
Controlled-UNet, VAE) are functional JAX modules loaded directly from the
original torch checkpoints; the DDIM denoise loop is a single `lax.scan`
with classifier-free guidance batched across cond/uncond; the custom CUDA
GroupNorm+SiLU plugin and fused-QKV attention become Pallas TPU kernels; and
TensorRT's offline engine build becomes AOT `jax.jit` compilation per
resolution bucket backed by the persistent XLA compilation cache.

Reference parity map (file:line cites are into the reference repo):
  - app API `hackathon.process(...)`      -> pipeline.canny2image  (canny2image_TRT.py:18-92)
  - Engine runtime (.plan / CUDA graphs)  -> runtime.engine        (Engine.py:45-161)
  - DDIM `sample_simple` fused loop       -> pipeline.ddim         (cldm_trt/ddim_hacked.py:88-197)
  - GroupNorm+SiLU TRT plugin             -> ops.pallas.groupnorm  (plugin/groupNormPlugin/*)
  - fused-QKV CrossAttention export       -> ops.pallas.attention  (export_onnx_attention.py:48-216)
  - ControlNet / ControlledUnet / ControlLDM -> models.controlnet  (cldm/cldm.py)
  - SD UNet / SpatialTransformer          -> models.unet           (ldm/modules/diffusionmodules/openaimodel.py)
  - VAE Encoder/Decoder                   -> models.vae            (ldm/modules/diffusionmodules/model.py)
  - FrozenCLIPEmbedder                    -> models.clip           (ldm/modules/encoders/modules.py:60-144)
  - annotators (canny/HED/...)            -> annotators            (annotator/*)
  - compute_score harness                 -> scoring               (compute_score.py)
"""

__version__ = "0.4.0"
