"""blobctrl_tpu — a TPU-native (JAX/XLA/Pallas/pjit) element-level image-editing
framework with the capabilities of TencentARC/BlobCtrl.

Design principles (TPU-first, not a port):
  * NHWC activations everywhere (channels on the 128-lane axis).
  * Functional core: every model is (config, params-pytree, pure apply fn);
    everything in the denoising hot loop compiles to a single XLA graph.
  * bf16 compute / fp32 accumulation in norms + attention softmax.
  * Pallas kernels for the hot ops (flash attention, blob splatting).
  * Scaling via jax.sharding.Mesh + NamedSharding; data-parallel batch
    sharding with replicated (or optionally model-sharded) weights.
"""

__version__ = "0.1.0"


def __getattr__(name):
    """Lazy top-level re-exports (keeps `import blobctrl_tpu` light)."""
    if name == "BlobNetPipeline":
        from blobctrl_tpu.pipeline import BlobNetPipeline
        return BlobNetPipeline
    if name == "BlobCtrlSession":
        from blobctrl_tpu.apps.session import BlobCtrlSession
        return BlobCtrlSession
    if name == "load_pipeline":
        from blobctrl_tpu.params.io import load_pipeline
        return load_pipeline
    if name == "SamPredictor":
        from blobctrl_tpu.models.sam import SamPredictor
        return SamPredictor
    raise AttributeError(name)
