"""Shared task-API surface (the read-only attributes and model-residency
methods every reference pybind class exposes:
python/cpp/{translator,generator,whisper,encoder,wav2vec2}.cc)."""

from __future__ import annotations


class TaskAPIMixin:
    """Mixin for classes owning ``self.model`` (LoadedModel) and
    ``self._pool`` (WorkerPool)."""

    @property
    def compute_type(self) -> str:
        """Resolved compute type (e.g. ``int8_bfloat16`` on TPU)."""
        p = self.model.policy
        if p.weight_dtype == "int8":
            return ("int8_" + p.activation_dtype
                    if p.activation_dtype != "float32" else "int8")
        return p.weight_dtype

    @property
    def tensor_parallel(self) -> bool:
        return getattr(self, "_tensor_parallel", False)

    @property
    def num_workers(self) -> int:
        return self._pool.num_workers

    @property
    def num_queued_batches(self) -> int:
        return self._pool.num_queued_batches

    @property
    def num_active_batches(self) -> int:
        return self._pool.num_active_batches

    # Model residency (reference: replica_pool detach/set model).

    @property
    def model_is_loaded(self) -> bool:
        return getattr(self, "_unloaded_params", None) is None

    def unload_model(self, to_cpu: bool = True):
        """Move the weights off the accelerator (optionally keeping a host
        copy for a later load_model())."""
        import jax

        if not self.model_is_loaded:
            return
        cpu = jax.devices("cpu")[0]
        self._unloaded_params = (
            jax.device_put(self.model.params, cpu) if to_cpu else True)
        self.model.params = None
        engine = getattr(self, "engine", None)
        if engine is not None:
            engine._loop_fns.clear()
            engine._step_fns.clear()

    def load_model(self):
        """Reload weights onto the default device after unload_model()."""
        import jax

        if self.model_is_loaded:
            return
        if self._unloaded_params is True:
            raise RuntimeError(
                "Model was unloaded without keeping a host copy")
        self.model.params = jax.device_put(
            self._unloaded_params, jax.devices()[0])
        self._unloaded_params = None
